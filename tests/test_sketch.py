"""Sketch-op correctness: the HLL++ estimate must sit within its
configured relative standard deviation of the exact cardinality.

The sketch has no DuckDB oracle by construction (engine-specific HLL
layouts), so this property test IS its correctness gate — the driver
records a rows-only check, this pins the values.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_hll_within_rsd_of_exact(spark):
    from map_reduce_lite_spark.ops.text import sketch_distinct_raw

    rows = sketch_distinct_raw(spark, SF_SMALL).collect()
    assert rows, "no sources"
    for r in rows:
        exact = r["exact_distinct"]
        approx = r["approx_distinct"]
        assert exact > 0
        # 5% rsd ⇒ 3σ bound of 15%; generous but catches a broken sketch
        assert abs(approx - exact) / exact < 0.15, (r["source"], approx, exact)


def test_sketch_query_tolerance_flag_true(spark):
    """The driver-facing query's within_tolerance flag (the oracle
    asserts literal TRUE) must actually be computed and true."""
    import __spark_entry__ as e

    rows = e.queries()["sketch_distinct_tokens"](spark, SF_SMALL).collect()
    assert rows and all(r["within_tolerance"] for r in rows)


def test_rolling_hash_range_and_determinism(spark):
    import __spark_entry__ as e

    df = e.queries()["text_rolling_hash"](spark, SF_SMALL)
    rows = {r["doc_id"]: r["rolling_hash"] for r in df.collect()}
    again = {r["doc_id"]: r["rolling_hash"] for r in df.collect()}
    assert rows == again
    assert all(0 <= h < 2147483647 for h in rows.values())


def test_gk_quantiles_monotone_and_bounded(spark):
    from map_reduce_lite_spark.ops.text import sketch_quantiles_price
    from tests.conftest import SF_SMALL

    rows = sketch_quantiles_price(spark, SF_SMALL).collect()
    assert rows, "must produce one row per return flag"
    for r in rows:
        assert r.price_q25 <= r.price_q50 <= r.price_q75 <= r.price_q95


def test_gk_exact_mode_assumption_holds():
    """The GK quantile oracle (quantile_disc equality) is valid ONLY in
    the sketch's exact mode: percentile_approx returns the discrete
    quantile exactly while each group's distinct-value count is below
    the accuracy parameter. Checked at EVERY scale factor the harness
    touches (sf0.1 is what caught the old 1e5 accuracy silently leaving
    exact mode: ~2e5 distinct prices per group), so a testdata
    regeneration that crosses the bound fails a NAMED test instead of a
    hash mismatch deep in the driver."""
    import os

    import duckdb

    from map_reduce_lite_spark.ops.text import GK_EXACT_ACCURACY

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
            continue
        max_distinct = duckdb.sql(
            "SELECT MAX(cnt) FROM (SELECT COUNT(DISTINCT l_extendedprice) AS cnt "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY l_returnflag)"
        ).fetchone()[0]
        assert max_distinct < GK_EXACT_ACCURACY, (
            f"{sf_dir}: {max_distinct} distinct prices per group >= accuracy "
            f"{GK_EXACT_ACCURACY}: percentile_approx is no longer exact; raise "
            "the accuracy or switch the oracle to a tolerance check"
        )


def test_cms_never_underestimates_and_is_tight(spark):
    """Count-Min invariants on live data: estimates are lower-bounded by
    the exact count (structural guarantee), and overestimation stays
    within 3·(e/w)·N — the Markov bound with generous slack."""
    import math

    from pyspark.sql import functions as F

    from map_reduce_lite_spark.ops.text import CMS_WIDTH, sketch_cms_token_freq
    from map_reduce_lite_spark.relational.tables import load_table
    from tests.conftest import SF_SMALL

    out = sketch_cms_token_freq(spark, SF_SMALL).collect()
    assert out, "no top-k rows"
    assert all(r.no_underestimate for r in out)

    d = load_table(spark, SF_SMALL, "documents")
    n_tokens = (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .filter(F.length("t") > 0)
        .count()
    )
    bound = 3 * math.e / CMS_WIDTH * n_tokens
    worst = max(r.cms_est - r.exact_count for r in out)
    assert worst <= bound, f"overestimate {worst} > bound {bound:.1f}"


def test_cms_shard_merge_is_lossless(spark):
    """Cell-wise SUM of per-source CMS sketches must answer identically
    to the directly-built global sketch — the mergeability contract."""
    from map_reduce_lite_spark.ops.text import sketch_cms_merge_shards
    from tests.conftest import SF_SMALL

    out = sketch_cms_merge_shards(spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert r.merge_lossless, r
        assert r.est_merged >= r.exact_count  # CMS never underestimates
