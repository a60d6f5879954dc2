"""The four reference workloads run against the driver's synthetic tables.

These are the oracle-checkable forms of the workloads in ``workloads/``:
same pipeline shapes (SURVEY.md §2.2 W1-W10), but reading the parquet
test tables so the DuckDB oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.registry import Query, mrl_lower
from map_reduce_lite_spark.relational.tables import load_table
from map_reduce_lite_spark.workloads.wordcount import TOKEN_SPLIT_RE
from map_reduce_lite_spark.workloads.matrix_multiply import matrix_multiply
from map_reduce_lite_spark.workloads.vertex_degree import vertex_degree


def wc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count (W1-W2, workload/src/wc.rs) over documents.text.

    The repartition fans the CPU-heavy tokenize across all cores when the
    source is a single parquet file (one input split); on a real multi-file
    corpus Catalyst's input planning already provides the parallelism and
    AQE coalesces the extra exchange."""
    d = load_table(spark, sf_dir, "documents")
    fanout = max(spark.sparkContext.defaultParallelism, 8)
    words = (
        d.repartition(fanout)
        .select(F.explode(F.split(mrl_lower("text"), TOKEN_SPLIT_RE)).alias("word"))
        .filter(F.length("word") > 0)
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


WC_SQL = r"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(lower(text), '[^\p{L}]+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


def grep_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep (W3-W4, workload/src/grep.rs): literal-substring filter +
    projection — the predicate is pushed into the parquet scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("spark")).select("doc_id", "source", "text")


GREP_SQL = """
SELECT doc_id, source, text FROM documents WHERE text LIKE '%spark%'
"""


def vertex_degree_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex degree (W5-W6, workload/src/vertex_degree.rs) over the
    bipartite (orderkey, partkey) edge set from lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    edges = l.select(F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst"))
    return vertex_degree(edges)


VERTEX_DEGREE_SQL = """
SELECT vertex, COUNT(*) AS degree
FROM (
  SELECT l_orderkey AS vertex FROM lineitem
  UNION ALL
  SELECT l_partkey AS vertex FROM lineitem
)
GROUP BY vertex
"""


def matrix_multiply_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse matmul (W7-W10, workload/src/matrix_multiply.rs) — ONE Spark
    query (join + groupBy + sum) instead of the reference's two chained
    jobs. Matrices are derived deterministically from ``part``; values are
    small integers so double sums are exact and order-independent."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        (F.col("p_partkey") % 30).alias("row"),
        (F.col("p_size") % 20).alias("col"),
        F.col("p_size").cast("double").alias("value"),
        F.lit("A").alias("matrix"),
    )
    b = p.select(
        (F.col("p_size") % 20).alias("row"),
        (F.col("p_partkey") % 25).alias("col"),
        (F.col("p_partkey") % 7).cast("double").alias("value"),
        F.lit("B").alias("matrix"),
    )
    out = matrix_multiply(a.unionByName(b))
    return out.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.col("value").alias("value"),
    )


MM_SQL = """
WITH a AS (
  SELECT p_partkey % 30 AS i, p_size % 20 AS k, CAST(p_size AS DOUBLE) AS v
  FROM part
), b AS (
  SELECT p_size % 20 AS k, p_partkey % 25 AS j, CAST(p_partkey % 7 AS DOUBLE) AS v
  FROM part
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j, SUM(a.v * b.v) AS value
FROM a JOIN b ON a.k = b.k
GROUP BY a.i, b.j
"""


PARITY_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("wc_documents", wc_documents, WC_SQL, "reference wc (W1-W2)"),
        Query("grep_documents", grep_documents, GREP_SQL, "reference grep (W3-W4)"),
        Query("vertex_degree_lineitem", vertex_degree_lineitem, VERTEX_DEGREE_SQL, "reference vertex-degree (W5-W6)"),
        Query("matrix_multiply_synth", matrix_multiply_synth, MM_SQL, "reference matrix multiply (W7-W10)"),
    ]
}
