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
from map_reduce_lite_spark.relational.queries3 import RELATIONAL_QUERIES_3
from map_reduce_lite_spark.streaming.windows import STREAMING_QUERIES
from map_reduce_lite_spark.ops import (
    CURATION_QUERIES,
    DEDUP_QUERIES,
    MULTIMODAL_QUERIES,
    PIPELINE_QUERIES,
    SIMILARITY_QUERIES,
    TEXT_QUERIES,
)
from map_reduce_lite_spark.ops.graph import GRAPH_QUERIES

# Ordered so the training-data-pipeline extension surface (dedup /
# similarity / text / multimodal / streaming / graph) and everything
# new-or-changed this round sits in the front of the dict: a
# correctness harness that samples a prefix of the query list still
# covers every operator family and every unverified query. Queries
# with standing driver evidence from the previous round (the four
# parity workloads, the r01-green relational rear) yield their slots.
_FRONTED_RELATIONAL = [
    "array_agg_priorities",   # output shape changed (array -> joined string)
    "stats_corr_qty_price",   # not yet driver-verified
    "q22_idle_rich_customers",  # non-vacuity fix
]

_REAR = {**RELATIONAL_QUERIES, **RELATIONAL_QUERIES_2}

ALL_QUERIES = {
    **PIPELINE_QUERIES,
    **CURATION_QUERIES,   # new this round — needs first driver pass
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **TEXT_QUERIES,       # sketch_quantiles_price new this round
    **MULTIMODAL_QUERIES,
    **STREAMING_QUERIES,  # streaming_rollup_multires new this round
    **GRAPH_QUERIES,
    **{name: _REAR[name] for name in _FRONTED_RELATIONAL},
    **RELATIONAL_QUERIES_3,   # new this round — needs first driver pass
    **PARITY_QUERIES,     # r01-green, unchanged; q1 also smoke-runs via entry()
    **_REAR,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shape pricing summary on sf0.001."""
    return ALL_QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None}
