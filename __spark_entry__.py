"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2
(reference-parity workloads, the relational inventory, and the
training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
twin for each SQL-expressible one. Engine code lives in
``map_reduce_lite_spark/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from map_reduce_lite_spark.parity import PARITY_QUERIES
from map_reduce_lite_spark.relational.queries import RELATIONAL_QUERIES
from map_reduce_lite_spark.relational.queries2 import RELATIONAL_QUERIES_2
from map_reduce_lite_spark.streaming.windows import STREAMING_QUERIES
from map_reduce_lite_spark.ops import (
    DEDUP_QUERIES,
    MULTIMODAL_QUERIES,
    SIMILARITY_QUERIES,
    TEXT_QUERIES,
)
from map_reduce_lite_spark.ops.graph import GRAPH_QUERIES

ALL_QUERIES = {
    **PARITY_QUERIES,
    **RELATIONAL_QUERIES,
    **RELATIONAL_QUERIES_2,
    **STREAMING_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **TEXT_QUERIES,
    **MULTIMODAL_QUERIES,
    **GRAPH_QUERIES,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shape pricing summary on sf0.001."""
    return ALL_QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None}
