"""Snapshot diff — CDC-style incremental corpus refresh.

A 100 TB training corpus is not rebuilt from scratch; each refresh
diffs the new crawl snapshot against the previous one and processes
only the delta (added + changed docs re-enter the pipeline, removed
docs retire from the index). The reference has no incremental story —
its jobs always rescan the full input (mrl-worker reruns the map phase
over every S3 object) — so this is extension surface, same contract as
ops/curation.py.

Scale shape: both snapshots project ``(key, content_hash)`` FIRST —
the 60-bit hash is 8 bytes, so the full-outer join that classifies
every key shuffles 16 bytes/row instead of the document text (at
100 TB that is the difference between a metadata-sized shuffle and
re-moving the corpus). Text never rides the join; consumers fetch
changed docs by joining the delta's keys back to the source. The
classification itself is one projection over the joined row — no
window, no second pass — and the summary is a map-side-combined
groupBy over (source, status).

The demo derives both snapshots deterministically from the one
``documents`` table so the oracle can replay them exactly:

- previous = docs except ``doc_id % 17 = 3`` (those are ADDED in
  current), with ``doc_id % 13 = 0`` docs carrying a stale text
  suffix (those are CHANGED);
- current  = docs except ``doc_id % 19 = 7`` (those are REMOVED —
  present only in previous).

``snapshot_diff`` itself takes any two keyed DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.registry import Query, md5_60bit, sql_md5_60bit
from map_reduce_lite_spark.relational.tables import load_table


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Classify every key across two snapshots: added / removed /
    changed / unchanged.

    Projects (key, hash, carry...) per side before a full-outer join on
    the key — the join never moves ``content_col``. ``carry_cols`` ride
    from whichever side has the row (current wins when both do)."""
    p = prev.select(
        F.col(key_col).alias("k"),
        md5_60bit(F.col(content_col)).alias("h_prev"),
        *[F.col(c).alias(f"prev_{c}") for c in carry_cols],
    )
    c = cur.select(
        F.col(key_col).alias("k"),
        md5_60bit(F.col(content_col)).alias("h_cur"),
        *[F.col(c_).alias(f"cur_{c_}") for c_ in carry_cols],
    )
    joined = p.join(c, "k", "full_outer")
    status = (
        F.when(F.col("h_prev").isNull(), F.lit("added"))
        .when(F.col("h_cur").isNull(), F.lit("removed"))
        .when(F.col("h_prev") != F.col("h_cur"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    carries = [
        F.coalesce(F.col(f"cur_{c_}"), F.col(f"prev_{c_}")).alias(c_)
        for c_ in carry_cols
    ]
    return joined.select(F.col("k").alias(key_col), status.alias("status"), *carries)


def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, status) delta summary between the derived previous
    and current document snapshots (see module doc for the derivation)."""
    d = load_table(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [stale]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cur = d.filter(F.col("doc_id") % 19 != 7).select("doc_id", "source", "text")
    delta = snapshot_diff(prev, cur, carry_cols=("source",))
    return (
        delta.groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .select("source", "status", "n_docs", "min_doc_id")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH prev AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 3
), cur AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 19 <> 7
), p AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_prev, source AS prev_source
  FROM prev
), c AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_cur, source AS cur_source
  FROM cur
), delta AS (
  SELECT COALESCE(p.k, c.k) AS doc_id,
         CASE WHEN p.k IS NULL THEN 'added'
              WHEN c.k IS NULL THEN 'removed'
              WHEN p.h_prev <> c.h_cur THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(c.cur_source, p.prev_source) AS source
  FROM p FULL OUTER JOIN c ON p.k = c.k
)
SELECT source, status, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM delta GROUP BY source, status
"""


SNAPSHOT_QUERIES: dict[str, Query] = {
    "snapshot_diff_documents": Query(
        "snapshot_diff_documents",
        snapshot_diff_documents,
        SNAPSHOT_DIFF_SQL,
        "CDC-style snapshot diff: added/removed/changed/unchanged per source",
    ),
}
