"""Column-level data profiling — the data-quality summary pass
(null counts, distinct cardinality, min/max) a pipeline runs before
trusting a new drop of data (the Deequ / dbt-test / Great-Expectations
shape, expressed as one Spark aggregation).

Plan shape: ONE aggregation computes every column's stats in a single
scan; the per-column rows are then unpivoted driver-free with
``stack``. The multiple COUNT(DISTINCT)s compile to Catalyst's Expand
(one pass over the scan, x#columns row expansion) — at 100 TB you pay
#columns x scan in shuffle volume but only ONE read of the table;
switching to approx_count_distinct drops the expansion entirely, at
the cost of exactness (kept exact here because the oracle replays it).

Everything is emitted as strings/longs, so the driver hash pins exact
values with no float risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.registry import Query
from map_reduce_lite_spark.relational.tables import load_table

PROFILE_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per column of documents: (column, n_rows, n_null,
    n_distinct, min_str, max_str). Single-scan profiler."""
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"max_{c}"),
        ]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}" for c in PROFILE_COLUMNS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(PROFILE_COLUMNS)}, {stack_args}) "
            "AS (column_name, n_null, n_distinct, min_str, max_str)"
        ),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")


def _profile_sql() -> str:
    parts = [
        f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_str,
       MAX(CAST({c} AS VARCHAR)) AS max_str
FROM documents"""
        for c in PROFILE_COLUMNS
    ]
    return "\nUNION ALL\n".join(parts)


PROFILE_SQL = _profile_sql()


PROFILE_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query(
            "profile_documents",
            profile_documents,
            PROFILE_SQL,
            "single-scan column profiler: nulls, distincts, min/max",
        ),
    ]
}
