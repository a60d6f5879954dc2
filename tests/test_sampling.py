"""Deterministic-sampling properties: membership is a pure function of
the row (stable under re-run and repartitioning), rates land near
target, and strata are respected. The exact membership set is pinned by
the DuckDB oracle (tests/test_oracle_parity.py); these tests pin the
properties that make the family trustworthy at scale.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_bernoulli_membership_stable_across_runs(spark):
    from map_reduce_lite_spark.ops.sampling import sample_bernoulli_docs

    first = {r["doc_id"] for r in sample_bernoulli_docs(spark, SF_SMALL).collect()}
    again = {r["doc_id"] for r in sample_bernoulli_docs(spark, SF_SMALL).collect()}
    assert first == again
    assert first, "sample must be non-empty"


def test_bernoulli_membership_stable_under_repartition(spark):
    """RNG sample() changes membership when partitioning changes; the
    hash sample must not."""
    from pyspark.sql import functions as F

    from map_reduce_lite_spark.ops.sampling import (
        BERNOULLI_BPS,
        SAMPLE_SALT,
        _bucket,
    )
    from map_reduce_lite_spark.relational.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    key = F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))
    base = {r["doc_id"] for r in d.filter(_bucket(key) < BERNOULLI_BPS).select("doc_id").collect()}
    reparted = {
        r["doc_id"]
        for r in d.repartition(17, "source")
        .filter(_bucket(key) < BERNOULLI_BPS)
        .select("doc_id")
        .collect()
    }
    assert base == reparted


def test_bernoulli_rate_near_target(spark):
    from map_reduce_lite_spark.ops.sampling import (
        BERNOULLI_BPS,
        sample_bernoulli_docs,
    )
    from map_reduce_lite_spark.relational.tables import load_table

    n_total = load_table(spark, SF_SMALL, "documents").count()
    n_kept = sample_bernoulli_docs(spark, SF_SMALL).count()
    rate = n_kept / n_total
    target = BERNOULLI_BPS / 10000
    # 500-doc corpus: 4 sigma of a Bernoulli(0.25) ≈ 0.077
    assert abs(rate - target) < 0.08, (rate, target)


def test_stratified_rates_respect_strata(spark):
    from map_reduce_lite_spark.ops.sampling import (
        STRATA_BPS,
        STRATA_DEFAULT_BPS,
        sample_stratified_sources,
    )

    rows = {r["source"]: r for r in sample_stratified_sources(spark, SF_SMALL).collect()}
    assert rows
    for source, r in rows.items():
        want_bps = STRATA_BPS.get(source, STRATA_DEFAULT_BPS)
        assert r["target_bps"] == want_bps
        assert 0 <= r["n_sampled"] <= r["n_total"]
    # the plan must actually differentiate: the keep-most stratum keeps a
    # larger fraction than the down-sample-hard stratum
    hard = rows["src0"]
    soft = rows["src2"]
    assert soft["n_sampled"] / soft["n_total"] > hard["n_sampled"] / hard["n_total"]


def test_heavy_hitters_deterministic_and_sorted(spark):
    from map_reduce_lite_spark.ops.sampling import TOPK_TOKENS, heavy_hitters_tokens

    rows = heavy_hitters_tokens(spark, SF_SMALL).collect()
    # tiny-SF vocabulary can be smaller than k; the cut itself is
    # deterministic because (n DESC, token ASC) is a total order
    assert 0 < len(rows) <= TOPK_TOKENS
    keyed = [(-r["n"], r["token"]) for r in rows]
    assert keyed == sorted(keyed), "must be (count DESC, token ASC) ordered"


def test_topk_per_stratum_exact_k_and_equals_single_window(spark):
    """Two-stage top-k must equal the naive one-window plan exactly, and
    deliver exactly k rows per stratum (corpus has >k docs per source)."""
    from pyspark.sql import Window, functions as F

    from map_reduce_lite_spark.ops.sampling import (
        SAMPLE_SALT,
        TOPK_PER_STRATUM,
        sample_topk_per_stratum,
    )
    from map_reduce_lite_spark.registry import md5_60bit
    from map_reduce_lite_spark.relational.tables import load_table

    got = sample_topk_per_stratum(spark, SF_SMALL).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r["source"], []).append((r["rk"], r["doc_id"], r["h"]))
    assert all(len(v) == TOPK_PER_STRATUM for v in per_src.values())
    assert all(sorted(rk for rk, _, _ in v) == list(range(1, TOPK_PER_STRATUM + 1))
               for v in per_src.values())

    d = load_table(spark, SF_SMALL, "documents")
    h = md5_60bit(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    naive = (
        d.select("doc_id", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_PER_STRATUM)
        .collect()
    )
    assert {(r["source"], r["doc_id"], r["rk"]) for r in naive} == {
        (r["source"], r["doc_id"], r["rk"]) for r in got
    }
