"""map_reduce_lite_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
MapReduce framework ``BlackTea13/map-reduce-lite`` (surveyed in
/root/repo/SURVEY.md) as idiomatic Spark DataFrame pipelines, plus the
large-scale training-data-pipeline extension surface (deduplication,
similarity search, multimodal columns, text analysis).

Layout:
  session     — SparkSession factory tuned for local testing / cluster scale
  engine      — submit(workload, ...) facade + named-workload registry
              (parity with the reference's mrl-ctl/standalone CLI surface)
  workloads/  — the four reference workloads as DataFrame pipelines
  relational/ — the relational query library over the TPC-H-ish tables
  ops/        — dedup, similarity search, text analysis, multimodal
  streaming/  — event-time windows (batch + Structured Streaming)
"""

from map_reduce_lite_spark.session import get_spark  # noqa: F401
from map_reduce_lite_spark.engine import Engine, WORKLOADS  # noqa: F401

__version__ = "0.1.0"
