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

# Tier 1 — PLAN-CHANGED queries needing fresh driver evidence (r13):
# the 13 queries whose physical plans the r12 optimization commits
# changed AFTER this tier was last regenerated (so the driver's r12
# 50-sample never saw their new plans — the r12 verdict's top item),
# plus every query the r13 optimization round touches (components
# family round 2, the checkpoint-materialization audit, the clustering/
# pipeline construction-time fixes, embedding_top_pc job folding).
_FRONT_CHANGED = [
    # r12 plan-changed, driver-unverified (VERDICT r12 item 1):
    "text_bm25_search",
    "sketch_cms_token_freq",
    "sketch_cms_merge_shards",
    "text_js_divergence",
    "text_collocation_lift",
    "rfm_segment_customers",
    "assoc_rules_brands",
    "similarity_knn_graph",
    "similarity_nn_descent",
    "similarity_graph_hubness",
    "graph_kcore_parts",
    "graph_label_propagation",
    "pipeline_semdedup_prune",
    # r13 touch set:
    "dedup_components",
    "dedup_cluster_sizes",
    "dedup_survivors_docs",
    "curation_leakage_safe_split",
    "semdedup_embeddings",
    "cluster_embeddings_kmeans",
    "embedding_top_pc",
    "pipeline_full_refresh",
]

# Tier 2 — evidence-freshness rotation, r13 batch: the remaining
# queries whose last driver-green round is r9 (computed from the
# cumulative CORRECTNESS_r01-r12 ledger at round open), oldest tier
# first. 32 such queries exist after tier 1 claims 8 of the r9 set;
# the ~29 slots left in the driver's 50-query prefix cover all but the
# tail three (noted in order here so any larger sample reaches them).
_ROTATION_OLDEST = [
    "agg_stats_by_brand",
    "anti_join_customers",
    "asof_join_purchase_view",
    "attribution_last_touch",
    "case_bucket_acctbal",
    "cube_flag_status",
    "embedding_label_drift",
    "embedding_ood_score",
    "grep_documents",
    "matrix_multiply_synth",
    "multimodal_phash_dedup",
    "sample_bernoulli_docs",
    "sample_stratified_sources",
    "sample_topk_per_stratum",
    "similarity_ann_pq",
    "similarity_ann_rerank",
    "snapshot_diff_documents",
    "streaming_distinct_users",
    "streaming_serving_upsert",
    "streaming_topk_trending",
    "text_chunk_documents",
    "text_doc_fingerprint",
    "text_inverted_index",
    "text_lang_id",
    "text_oov_rate",
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_unigram_logprob",
    "vertex_degree_lineitem",
    "vocab_bpe_merges",
    "wc_documents",
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
