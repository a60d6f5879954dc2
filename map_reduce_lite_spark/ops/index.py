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


VOCAB_K = 100  # closed-vocabulary size for the OOV health metric


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary rate against the corpus's own top-K
    vocabulary — the tokenizer-health metric a pipeline tracks per
    ingestion source (a source whose OOV spikes is drifting away from
    the tokenizer's training distribution).

    Plan: tokenize once; the vocabulary is a K-row aggregate (bounded
    by construction — broadcast back); the rate is one LEFT join + one
    conditional aggregation. Integer basis points, exact in both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.floor(F.col("n_oov") * 10000 / F.col("n_tokens"))
            .cast("long")
            .alias("oov_bps"),
        )
    )


OOV_RATE_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
t2 AS (SELECT * FROM toks WHERE length(token) > 0),
vocab AS (
  SELECT token FROM t2
  GROUP BY token
  ORDER BY COUNT(*) DESC, token ASC
  LIMIT {VOCAB_K}
)
SELECT t2.source,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(floor(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 10000.0
                  / COUNT(*)) AS BIGINT) AS oov_bps
FROM t2 LEFT JOIN vocab v ON t2.token = v.token
GROUP BY t2.source
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
        Query(
            "text_oov_rate",
            text_oov_rate,
            OOV_RATE_SQL,
            "per-source OOV rate vs corpus top-K vocabulary",
        ),
    ]
}
