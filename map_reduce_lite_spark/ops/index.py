"""Inverted-index construction — the classic MapReduce workload the
reference's wc/grep family points at (token -> posting list), built the
scale-safe way.

The naive build (``collect_list(doc_id)`` per token) is a memory bomb:
a stopword's posting list at 100 TB is billions of ids in ONE
aggregation buffer. The shape below bounds every buffer:

  tokenize -> DISTINCT (token, doc_id)            [one shuffle]
           -> row_number per token by doc_id      [reuses the same
                                                   hash partitioning]
           -> groupBy token: df = COUNT(*),
              postings = first K ids only         [buffer <= K ids]

``df`` (document frequency) is exact over ALL postings; only the
materialized posting sample is capped at K — the index layout real
systems use (posting lists are stored in blocks; the head block plus a
count is the summary). Low-df tokens (df < MIN_DF) are dropped, the
standard index-size lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from map_reduce_lite_spark.registry import Query
from map_reduce_lite_spark.relational.tables import load_table

POSTINGS_CAP = 8   # ids materialized per token (head block)
MIN_DF = 2         # drop hapax tokens from the index

_SQL_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token -> (document frequency, first-K posting list as CSV).

    Exact df for every token, bounded memory per aggregation buffer
    (module doc). The window and the final groupBy share the hash
    partitioning on token, so the build is one shuffle + one sort.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != "")
    )
    pairs = d.select("doc_id", F.explode(toks).alias("token"))
    rn = F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    head = pairs.withColumn("rn", rn)
    return (
        head.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.when(F.col("rn") <= POSTINGS_CAP, F.col("doc_id")))
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= MIN_DF)
    )


INVERTED_INDEX_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS token
  FROM documents
),
ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT token, COUNT(*) AS df,
       string_agg(CASE WHEN rn <= {POSTINGS_CAP} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM ranked
GROUP BY token
HAVING COUNT(*) >= {MIN_DF}
"""


INDEX_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query(
            "text_inverted_index",
            text_inverted_index,
            INVERTED_INDEX_SQL,
            "bounded-memory inverted index: exact df + head-K postings",
        ),
    ]
}
