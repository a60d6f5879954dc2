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
#      more than ~4 rounds (178 queries / ~41 rotation slots).
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

# Tier 1 — CHANGED/NEW in r11:
# multimodal_ppm_resize is new (real nearest-neighbor P6 raster
# downsample, value-oracled through the integer NN map);
# leakage_safe_split's pair stage is now ADAPTIVE RE-BANDING
# (method="lsh_refine" + sql_refined_cands_chain, both engines) instead
# of cap-exempt; the embedding pair machinery was restructured around
# _band_self_join/_refined_candidate_ids (every lsh consumer re-checked);
# the three co-purchase graph queries route their lineage truncation
# through _checkpointer (reliable-checkpoint threading).
_FRONT_CHANGED = [
    "multimodal_ppm_resize",
    "curation_leakage_safe_split",
    "dedup_embedding_lsh",
    "dedup_components",
    "dedup_cluster_sizes",
    "dedup_survivors_docs",
    "graph_triangle_parts",
    "graph_label_propagation",
    "graph_kcore_parts",
]

# Tier 2 — evidence-freshness rotation, r11 batch: ALL 41 remaining
# r7-evidence queries (computed from the cumulative CORRECTNESS_r01-r10
# ledger at round open — after this round no live query's driver
# evidence is older than r8). multimodal_decode_stub (r11-changed:
# NULL moments on empty payloads) and the checkpoint_dir-threaded
# minhash/simhash queries are already in this set.
_ROTATION_OLDEST = [
    "curation_repetition_filter",
    "curation_sequence_packing",
    "curation_train_split",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_prod",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_span_removal",
    "events_rollup_multires",
    "multimodal_bytes",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q20_bolt_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_bruteforce",
    "sketch_distinct_tokens",
    "sketch_quantiles_price",
    "stats_corr_qty_price",
    "subquery_small_qty_revenue",
    "text_rolling_hash",
    "text_zipf_slope",
    "topk_parts",
    "vocab_bpe_apply",
    "window_lag_order_gap",
    "window_range_frame",
    "window_rank_suite",
    "window_running_revenue",
    "window_top3_orders",
    "window_value_suite",
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
