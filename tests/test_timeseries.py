"""Behavior invariants for the r4 additions: gap-filled rollup, exact
z-score anomalies, inverted index, column profiler, blocked fuzzy join.
(Value parity vs DuckDB is covered by test_oracle_parity.py; these pin
the semantic properties the hashes alone don't name.)
"""

from __future__ import annotations

from datetime import timedelta

from tests.conftest import SF_SMALL


def test_gapfill_contiguous_hours_and_locf(spark):
    from map_reduce_lite_spark.ops.timeseries import events_gapfill_hourly

    rows = events_gapfill_hourly(spark, SF_SMALL).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type, "no rows"
    filled_total = 0
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket)
        # contiguous hourly calendar between min and max
        for a, b in zip(rs, rs[1:]):
            assert b.bucket - a.bucket == timedelta(hours=1), (t, a.bucket, b.bucket)
        # endpoints are observed, not filled
        assert not rs[0].filled and not rs[-1].filled
        for r in rs:
            if r.filled:
                filled_total += 1
                assert r.n_events == 0
            else:
                assert r.n_events > 0
            # LOCF defined everywhere (first bucket is observed)
            assert r.locf_sum_value is not None
    assert filled_total > 0, "gap-fill vacuous: no empty hours at this SF"


def test_anomaly_zscore_matches_float_check(spark):
    from map_reduce_lite_spark.ops.timeseries import events_anomaly_zscore
    from map_reduce_lite_spark.relational.tables import load_table
    import math

    flagged = {
        r.event_id for r in events_anomaly_zscore(spark, SF_SMALL).collect()
    }
    assert flagged, "anomaly set vacuous at this SF"
    # float replay: flagged iff |v - mean| > 3*sigma (population), up to
    # the 1e-4 quantization — allow knife-edge tolerance band
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    stats: dict[str, list[float]] = {}
    for r in ev:
        stats.setdefault(r.event_type, []).append(r.value)
    mom = {
        t: (sum(vs) / len(vs), math.sqrt(max(sum(v * v for v in vs) / len(vs) - (sum(vs) / len(vs)) ** 2, 0.0)))
        for t, vs in stats.items()
    }
    for r in ev:
        mean, sd = mom[r.event_type]
        z = abs(r.value - mean) - 3 * sd
        if z > 1e-6:
            assert r.event_id in flagged, (r.event_id, z)
        elif z < -1e-6:
            assert r.event_id not in flagged, (r.event_id, z)


def test_inverted_index_bounded_postings(spark):
    from map_reduce_lite_spark.ops.index import (
        MIN_DF,
        POSTINGS_CAP,
        text_inverted_index,
    )

    rows = text_inverted_index(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert r.df >= MIN_DF
        assert len(ids) == min(r.df, POSTINGS_CAP)  # head block exactly
        assert ids == sorted(ids)


def test_profile_documents_key_column(spark):
    from map_reduce_lite_spark.ops.profile import profile_documents

    rows = {r.column_name: r for r in profile_documents(spark, SF_SMALL).collect()}
    doc = rows["doc_id"]
    assert doc.n_null == 0
    assert doc.n_distinct == doc.n_rows  # primary key property
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_fuzzy_link_blocked_and_verified(spark):
    from map_reduce_lite_spark.ops.linkage import (
        MAX_DIST,
        fuzzy_link_customer_supplier,
    )
    from map_reduce_lite_spark.relational.tables import load_table

    rows = fuzzy_link_customer_supplier(spark, SF_SMALL).collect()
    assert rows, "fuzzy link vacuous at this SF"
    c_nk = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF_SMALL, "customer").collect()
    }
    s_nk = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, SF_SMALL, "supplier").collect()
    }
    for r in rows:
        assert r.dist <= MAX_DIST
        assert c_nk[r.c_custkey] == s_nk[r.s_suppkey]  # blocking respected


def test_retention_cohort_matrix_invariants(spark):
    """Age-0 cell equals the cohort size (10000 bps); retention never
    exceeds 10000; every cohort has an age-0 row."""
    from map_reduce_lite_spark.ops.timeseries import events_retention_cohorts
    from tests.conftest import SF_SMALL

    rows = events_retention_cohorts(spark, SF_SMALL).collect()
    assert rows
    cohorts = {r.cohort_week for r in rows}
    age0 = {r.cohort_week: r for r in rows if r.age_weeks == 0}
    assert set(age0) == cohorts
    for r in rows:
        assert 0 < r.n_active <= r.cohort_size
        assert r.retention_bps <= 10000
        if r.age_weeks == 0:
            assert r.n_active == r.cohort_size and r.retention_bps == 10000


def test_user_paths_probabilities_sum_to_one(spark):
    """Per from_type, transition counts partition the outgoing edges:
    bps sum within floor-rounding of 10000, and total transitions =
    total events minus one per active user."""
    from pyspark.sql import functions as F

    from map_reduce_lite_spark.ops.timeseries import events_user_paths
    from map_reduce_lite_spark.relational.tables import load_table
    from tests.conftest import SF_SMALL

    out = events_user_paths(spark, SF_SMALL)
    rows = out.collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f_, rs in by_from.items():
        s = sum(r.prob_bps for r in rs)
        assert 10000 - len(rs) < s <= 10000, (f_, s)
    e = load_table(spark, SF_SMALL, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_trans for r in rows) == n_events - n_users


def test_stitched_sessionize_equals_plain_on_midnight_chains(spark):
    """The hierarchical (user, day) stitch must be answer-identical to
    the single-window sessionize on exactly the shapes the day split
    cuts through: sessions chaining across one and several midnights,
    whole days absorbed into the previous day's session, multi-session
    days whose first session merges backward, boundary gaps just above
    and below the 30-minute threshold, and ties on ts."""
    import datetime as dt

    from map_reduce_lite_spark.ops.timeseries import sessionize_stitched
    from map_reduce_lite_spark.relational.queries import sessionize

    t0 = dt.datetime(2024, 3, 1, 23, 50)
    m = dt.timedelta(minutes=1)
    rows = []
    # u1: one session chaining across TWO midnights (events every 20
    # min from 23:50 day1 through 00:30 day3 — day2 is absorbed whole)
    t = t0
    for i in range(75):
        rows.append((1, t, 1000 + i)); t += dt.timedelta(minutes=20)
    # u2: midnight gap exactly 30 min (merge: NOT a new session) then
    # a 31-min gap (new session)
    rows += [
        (2, dt.datetime(2024, 3, 1, 23, 45), 1), (2, dt.datetime(2024, 3, 2, 0, 15), 2),
        (2, dt.datetime(2024, 3, 2, 0, 46, 0, 1000), 3),
    ]
    # u3: multi-session day whose FIRST session merges backward across
    # midnight; later sessions must shift down by exactly one
    rows += [
        (3, dt.datetime(2024, 3, 1, 23, 55), 1),
        (3, dt.datetime(2024, 3, 2, 0, 10), 2),   # merges back
        (3, dt.datetime(2024, 3, 2, 9, 0), 3),    # day session 2 -> global 2
        (3, dt.datetime(2024, 3, 2, 18, 0), 4),   # day session 3 -> global 3
    ]
    # u4: ts tie at the midnight boundary (order falls to event_id)
    rows += [
        (4, dt.datetime(2024, 3, 2, 0, 0), 7), (4, dt.datetime(2024, 3, 2, 0, 0), 5),
        (4, dt.datetime(2024, 3, 1, 23, 59), 1),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    plain = sessionize(e).select(
        "user_id", "session_id", "n_events", "start_ms", "end_ms"
    )
    stitched = sessionize_stitched(e)
    assert plain.exceptAll(stitched).count() == 0
    assert stitched.exceptAll(plain).count() == 0
    # sanity on the shapes themselves
    got = {(r.user_id, r.session_id): r.n_events for r in stitched.collect()}
    assert got[(1, 1)] == 75          # one session spanning 3 calendar days
    assert got[(2, 1)] == 2 and got[(2, 2)] == 1
    assert got[(3, 1)] == 2 and (3, 4) not in got
