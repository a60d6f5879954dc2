"""Unit tests for ops/snapshot.py — the generic snapshot_diff contract.

The oracle-parity test covers snapshot_diff_documents end-to-end; these
pin the generic operator's classification semantics and carry-column
behavior on a constructed case where every status occurs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_lite_spark.ops.snapshot import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_snapshot_diff_classifies_all_statuses(spark):
    prev = _df(
        spark,
        [
            (1, "alpha", "web"),      # unchanged
            (2, "beta", "web"),       # changed in cur
            (3, "gamma", "books"),    # removed (absent from cur)
        ],
    )
    cur = _df(
        spark,
        [
            (1, "alpha", "web"),
            (2, "beta v2", "web"),
            (4, "delta", "code"),     # added (absent from prev)
        ],
    )
    out = {
        r["doc_id"]: (r["status"], r["source"])
        for r in snapshot_diff(prev, cur, carry_cols=("source",)).collect()
    }
    assert out == {
        1: ("unchanged", "web"),
        2: ("changed", "web"),
        3: ("removed", "books"),   # carry falls back to prev side
        4: ("added", "code"),      # carry comes from cur side
    }


def test_snapshot_diff_without_carry_cols(spark):
    prev = _df(spark, [(1, "a", "s")])
    cur = _df(spark, [(1, "b", "s")])
    rows = snapshot_diff(prev, cur).collect()
    assert [c for c in rows[0].asDict()] == ["doc_id", "status"]
    assert rows[0]["status"] == "changed"


def test_snapshot_diff_text_never_rides_the_join(spark):
    """The join inputs must be hash projections — text absent from the
    join's plan output (the 100 TB contract: 16 bytes/row shuffle)."""
    prev = _df(spark, [(1, "a", "s")])
    cur = _df(spark, [(1, "a", "s")])
    plan = (
        snapshot_diff(prev, cur)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # text feeds the hash below the join but the join itself only sees
    # (k, h_*): no raw text attribute may survive into the join output
    join_line = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_line, plan
    assert "text" not in join_line[0], join_line[0]


def test_full_refresh_funnel_is_consistent(spark):
    """pipeline_full_refresh composes diff → gates → incremental dedup:
    the funnel must be internally consistent (gates partition into
    dup + survive; gates never exceed the delta) and must agree with
    the standalone stages it composes."""
    from map_reduce_lite_spark.ops.pipeline import (
        pipeline_full_refresh,
        pipeline_incremental_refresh,
    )
    from tests.conftest import SF_SMALL

    out = pipeline_full_refresh(spark, SF_SMALL)
    rows = out.collect()
    assert rows, "empty funnel"
    for r in rows:
        assert r.n_gates <= r.n_delta
        assert r.n_dup + r.n_survive == r.n_gates
        assert r.n_survive == 0 or r.survive_tokens > 0
        assert r.status in ("added", "changed")
    # the (source, status, n_delta) margin must equal the standalone
    # incremental-refresh query's (same diff, same gate inputs)
    inc = {
        (r.source, r.status): r.n_delta
        for r in pipeline_incremental_refresh(spark, SF_SMALL).collect()
    }
    assert {(r.source, r.status): r.n_delta for r in rows} == inc


def test_incremental_stats_consistent_and_delta_sized(spark):
    """IVM contract: maintained == direct on every source, and the
    signed-delta path must not touch unchanged documents (the delta
    join count is bounded by the non-unchanged key count)."""
    from map_reduce_lite_spark.ops.snapshot import (
        _derived_snapshots,
        pipeline_incremental_stats,
        snapshot_diff,
    )
    from map_reduce_lite_spark.relational.tables import load_table
    from tests.conftest import SF_SMALL

    out = pipeline_incremental_stats(spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert r.consistent
        assert r.docs_direct == r.docs_maintained
        assert r.toks_direct == r.toks_maintained
    d = load_table(spark, SF_SMALL, "documents")
    prev, cur = _derived_snapshots(d)
    delta = snapshot_diff(prev, cur).filter(F.col("status") != "unchanged")
    assert 0 < delta.count() < d.count()  # a real, strict delta
