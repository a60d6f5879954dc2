"""Hypothesis property tests: Spark pipelines vs pure-Python references.

Each example ships a whole batch of rows through ONE Spark job, so the
suite stays fast despite per-example JVM round-trips.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from map_reduce_lite_spark.workloads.wordcount import TOKEN_SPLIT_RE

# curated alphabet where Python's str.isalpha() agrees with Java's \p{L}
# (plain letters across scripts + digits/punct/space/emoji as separators)
_ALPHABET = "abcXYZ 123 .,!?-éÿàÖΩλщ漢字한 🙂\n\t"

_docs = st.lists(
    st.text(alphabet=_ALPHABET, max_size=60), min_size=1, max_size=6
)


def _py_tokens(s: str) -> list[str]:
    """Reference tokenizer: split on non-alphabetic, lowercase — the
    reference semantics (workload/src/wc.rs:11-14, char::is_alphabetic)."""
    out, cur = [], []
    for ch in s.lower():
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@settings(max_examples=12, deadline=None)
@given(_docs)
def test_wc_tokenization_matches_reference(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = Counter(
        (r["w"], r["cnt"])
        for r in df.select(
            F.explode(F.split(F.lower("text"), TOKEN_SPLIT_RE)).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    want = Counter()
    for d in docs:
        for t in _py_tokens(d):
            want[t] += 1
    assert got == Counter({(w, n): 1 for w, n in want.items()})


_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=10**7),  # ms offset
    ),
    min_size=1,
    max_size=50,
)


def _py_sessionize(rows, gap_ms):
    """Reference gaps-and-islands: per user, sorted by (ts, event_id)."""
    by_user = {}
    for eid, (uid, ms) in enumerate(rows):
        by_user.setdefault(uid, []).append((ms, eid))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        sess, last = [], None
        sid = 0
        for ms, _ in evs:
            if last is None or ms - last > gap_ms:
                if sess:
                    out.append((uid, sid, len(sess), sess[0], sess[-1]))
                sess, sid = [], sid + 1
            sess.append(ms)
            last = ms
        if sess:
            out.append((uid, sid, len(sess), sess[0], sess[-1]))
    return Counter(out)


@settings(max_examples=12, deadline=None)
@given(_events)
def test_sessionize_matches_reference(spark, rows):
    from map_reduce_lite_spark.relational.queries import sessionize

    gap_ms = 60_000
    base = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1000)
    df = spark.createDataFrame(
        [(uid, eid, (base + ms) * 1000) for eid, (uid, ms) in enumerate(rows)],
        "user_id long, event_id long, us long",
    ).select("user_id", "event_id", F.timestamp_micros(F.col("us")).alias("ts"))
    got = Counter(
        (r["user_id"], r["session_id"], r["n_events"], r["start_ms"] - base, r["end_ms"] - base)
        for r in sessionize(df, gap_ms=gap_ms).collect()
    )
    assert got == _py_sessionize(rows, gap_ms)


_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _py_components(edges):
    """Union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component minimum
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return Counter(comp.items())


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_connected_components_matches_union_find(spark, edges):
    from map_reduce_lite_spark.ops.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = Counter(
        (r["node"], r["component"]) for r in connected_components(df).collect()
    )
    assert got == _py_components(edges)


def test_collocation_lift_bounds_and_symmetric_pairs(spark):
    """Pair counts bounded by marginals, lift matches the integer
    formula exactly, and every pair is emitted once with tok_a<tok_b."""
    from tests.conftest import SF_SMALL
    from map_reduce_lite_spark.ops.text import (
        COLLOC_SCALE,
        COLLOC_TOP_M,
        collocation_lift,
    )

    rows = collocation_lift(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= COLLOC_TOP_M * (COLLOC_TOP_M - 1) // 2
    seen = set()
    n_docs = None
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert (r["tok_a"], r["tok_b"]) not in seen
        seen.add((r["tok_a"], r["tok_b"]))
        assert 0 < r["n_ab"] <= min(r["n_a"], r["n_b"])
        if n_docs is None:
            # recover N from any row: lift = floor(S*N*n_ab/(n_a*n_b))
            from map_reduce_lite_spark.relational.tables import load_table

            n_docs = load_table(spark, SF_SMALL, "documents").count()
        assert r["lift_e6"] == (COLLOC_SCALE * n_docs * r["n_ab"]) // (
            r["n_a"] * r["n_b"]
        )


def test_assoc_rules_probability_bounds(spark):
    """Association-rule sanity: confidence <= 10000 bps, support >= the
    gate, every rule exists in both directions (same support), and
    lift is direction-symmetric."""
    from map_reduce_lite_spark.relational.queries3 import (
        ASSOC_MIN_SUPPORT,
        assoc_rules_brands,
    )
    from tests.conftest import SF_SMALL

    rows = assoc_rules_brands(spark, SF_SMALL).collect()
    assert rows
    idx = {(r.antecedent, r.consequent): r for r in rows}
    for r in rows:
        assert r.support >= ASSOC_MIN_SUPPORT
        assert 0 < r.confidence_bps <= 10000
        rev = idx[(r.consequent, r.antecedent)]
        assert rev.support == r.support
        assert rev.lift_bps == r.lift_bps


def test_rfm_buckets_partition_customers(spark):
    """RFM invariants: buckets in 1..4 on all dims, segment counts sum
    to the distinct customer count, and bucket-1 monetary customers
    exist (the top quartile is never empty)."""
    from map_reduce_lite_spark.relational.queries3 import rfm_segment_customers
    from map_reduce_lite_spark.relational.tables import load_table
    from tests.conftest import SF_SMALL

    rows = rfm_segment_customers(spark, SF_SMALL).collect()
    assert rows
    n_cust = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_bucket <= 4 and 1 <= r.f_bucket <= 4 and 1 <= r.m_bucket <= 4
    assert any(r.m_bucket == 1 for r in rows)
