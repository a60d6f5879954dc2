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


def _tune_allocator() -> None:
    """Raise glibc's mmap threshold in the harness process.

    The heavy DuckDB oracles (k-means CTEs, pair-join cosines) allocate
    and free millions of medium blocks across 32 threads; with the
    default dynamic mmap threshold glibc leaves tens of thousands of
    disjoint mappings behind, and once the process hits
    vm.max_map_count (65530 default) EVERY later allocation fails —
    observed as `bad_alloc` on KB-sized blocks and `can't start new
    thread` with >100 GB of free RAM. Serving medium blocks from
    arenas instead keeps the map count at roughly half (measured peak
    41k -> 33k over the heaviest oracle block). Linux/glibc only;
    silently a no-op elsewhere.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 64 * 1024 * 1024)  # M_MMAP_THRESHOLD = 64 MiB
    except Exception:
        pass


_tune_allocator()

from map_reduce_lite_spark.parity import PARITY_QUERIES
from map_reduce_lite_spark.relational.queries import RELATIONAL_QUERIES
from map_reduce_lite_spark.relational.queries2 import RELATIONAL_QUERIES_2
from map_reduce_lite_spark.relational.queries3 import RELATIONAL_QUERIES_3
from map_reduce_lite_spark.streaming.windows import STREAMING_QUERIES
from map_reduce_lite_spark.ops import (
    CLUSTERING_QUERIES,
    CURATION_QUERIES,
    DEDUP_QUERIES,
    INDEX_QUERIES,
    LINKAGE_QUERIES,
    MULTIMODAL_QUERIES,
    PIPELINE_QUERIES,
    PROFILE_QUERIES,
    PROJECTION_QUERIES,
    SAMPLING_QUERIES,
    SNAPSHOT_QUERIES,
    SIMILARITY_QUERIES,
    SPAN_QUERIES,
    TEXT_QUERIES,
    TIMESERIES_QUERIES,
)
from map_reduce_lite_spark.ops.graph import GRAPH_QUERIES

# Ordered so the driver's ~50-query prefix re-verification is spent
# where it matters, under a two-tier policy:
#   1. CHANGED/NEW queries this round go first — every query whose
#      builder or oracle was touched must get fresh driver evidence.
#   2. The remaining prefix slots hold the EVIDENCE-FRESHNESS ROTATION:
#      the queries whose last driver-green round is OLDEST (computed
#      from the cumulative CORRECTNESS_r*.json ledger at round start).
#      Each round the just-rechecked batch rotates to the rear and the
#      next-oldest batch rotates in, so no query's driver evidence ages
#      more than ~4 rounds (153 queries / ~38 rotation slots).
# Queries with fresher standing evidence follow in family order.
_REAR = {**RELATIONAL_QUERIES, **RELATIONAL_QUERIES_2}

_FAMILIES = {
    **TIMESERIES_QUERIES,
    **INDEX_QUERIES,
    **PROFILE_QUERIES,
    **LINKAGE_QUERIES,
    **PROJECTION_QUERIES,
    **SNAPSHOT_QUERIES,
    **PIPELINE_QUERIES,
    **SPAN_QUERIES,
    **CLUSTERING_QUERIES,
    **GRAPH_QUERIES,
    **SAMPLING_QUERIES,
    **TEXT_QUERIES,
    **CURATION_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
    **STREAMING_QUERIES,
    **PARITY_QUERIES,
    **RELATIONAL_QUERIES_3,
    **_REAR,
}

# Tier 1 — CHANGED/NEW in r10:
# multimodal_ppm_decode is new (real pure-numpy P6 decode round-trip);
# the k-NN trio was refactored onto the staged knn_topk_edges +
# sql_capped_bands_chain oracle CTE; leakage_safe_split is now
# cap-EXEMPT in both engines; fertility/coverage gained NULLIF div
# guards in both engines; pagerank and every connected_components
# consumer run the r10 lazy per-round checkpoint + leak-free
# _HardBarrier loop.
_FRONT_CHANGED = [
    "multimodal_ppm_decode",
    "curation_leakage_safe_split",
    "similarity_knn_graph",
    "similarity_nn_descent",
    "similarity_graph_hubness",
    "text_fertility_by_lang",
    "text_vocab_coverage",
    "pagerank_supplier_part",
    "dedup_components",
    "dedup_cluster_sizes",
    "dedup_survivors_docs",
]

# Tier 2 — evidence-freshness rotation, r10 batch: ALL 34 remaining
# r6-evidence queries (the exact set the r9 verdict enumerated — after
# this round no live query's driver evidence is older than r7), then
# the 5 alphabetically-first r7-age queries to fill the 50-slot window.
_ROTATION_OLDEST = [
    # r6 evidence (all 34 remaining)
    "curation_ccnet_buckets",
    "date_funcs_monthly",
    "distinct_segments",
    "embedding_dim_stats",
    "embedding_prefix_recall",
    "events_hourly",
    "grouping_sets_priority",
    "join_nation_region",
    "json_events",
    "math_funcs",
    "outer_join_order_counts",
    "percentile_quantity",
    "pipeline_semdedup_prune",
    "pivot_qty_by_status",
    "q12_priority_class",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q4_late_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "range_join_qty_bands",
    "rollup_returnflag",
    "salted_join_segments",
    "scd2_user_state",
    "semdedup_embeddings",
    "semi_join_customers",
    "setop_all_variants",
    "setop_nations",
    "similarity_ann_ivf_scaled",
    "string_funcs",
    "text_bigram_logprob",
    "text_bm25_search",
    "two_stage_agg_supplier",
    # r7 evidence (alphabetically first 5): window fill to 50
    "array_agg_priorities",
    "curation_contamination",
    "curation_dsir_weights",
    "curation_mixture_plan",
    "curation_pii_redact",
]

ALL_QUERIES = {
    **{name: _FAMILIES[name] for name in _FRONT_CHANGED},
    **{name: _FAMILIES[name] for name in _ROTATION_OLDEST},
    # Everything else in family order: fresher standing evidence.
    **_FAMILIES,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shape pricing summary on sf0.001."""
    return ALL_QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None}
