"""The reference's four built-in workloads as Spark DataFrame pipelines.

Reference registry: workload/src/lib.rs:31-55 maps the names
``wc``, ``grep``, ``vertex-degree``, ``matrix-multiply-1``,
``matrix-multiply-2`` to (map_fn, reduce_fn) pairs. Here each workload is
a declarative DataFrame pipeline; Catalyst supplies the shuffle, external
sort, partial aggregation and spill behavior the reference hand-rolls
(standalone/src/engine.rs, mrl-worker/src/{map,reduce}.rs).
"""

from map_reduce_lite_spark.workloads.wordcount import word_count, word_count_lines
from map_reduce_lite_spark.workloads.grep import grep, grep_lines
from map_reduce_lite_spark.workloads.vertex_degree import vertex_degree, vertex_degree_lines
from map_reduce_lite_spark.workloads.matrix_multiply import (
    matrix_multiply,
    matrix_multiply_phase1,
    matrix_multiply_phase2,
)

__all__ = [
    "word_count",
    "word_count_lines",
    "grep",
    "grep_lines",
    "vertex_degree",
    "vertex_degree_lines",
    "matrix_multiply",
    "matrix_multiply_phase1",
    "matrix_multiply_phase2",
]
