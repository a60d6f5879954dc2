"""Skew mitigation: salted joins and two-stage aggregation.

AQE (`spark.sql.adaptive.skewJoin`) splits oversized shuffle partitions
automatically, and that is the first line of defense — it's on in
session.py. Salting is the manual fallback for the cases AQE can't fix:

- a SINGLE key so hot its row group exceeds what one task can hold
  (AQE splits partitions, but a sort-merge join still needs all rows
  for one key on one side in one task's stream);
- skewed windows/groupBys where the per-key state, not the partition,
  is the problem.

``salted_join`` spreads each hot key over ``n_salts`` tasks by salting
the big side and replicating the small side ×n_salts — the classic
trade: n_salts× more small-side shuffle volume for n_salts× big-side
parallelism. Result equality vs the plain join is guaranteed for any
salt assignment and pytest-checked.

``two_stage_agg`` pre-aggregates by (key, salt) then finishes by key —
only needed when the agg is NOT algebraic (Spark's partial aggregation
already does this transparently for sum/count/min/max); exposed here
for collect-style aggs whose map-side combine Spark skips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__mrl_salt"


def _row_salt(n_salts: int) -> Column:
    # deterministic within a run, uniform-ish across rows; any assignment
    # is correct — salt only routes rows, it never changes join keys
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Use when one join key carries a disproportionate share of ``big``
    and the small side can afford ×n_salts replication (it shuffles
    n_salts copies — keep it the dimension side)."""
    big_s = big.withColumn(SALT_COL, _row_salt(n_salts))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + [SALT_COL], how).drop(SALT_COL)


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """groupBy with a salted pre-aggregation stage.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` combine the
    partials per keys. The caller owns the algebra (e.g. partial
    count → final sum)."""
    salted = df.withColumn(SALT_COL, _row_salt(n_salts))
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
