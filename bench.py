#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed as a full action (count of the result — forces the
whole plan without driver-side collection of wide rows). A warmup query
first absorbs JVM/session startup so per-query numbers reflect plan
execution, not bootstrap.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the reference workloads + the heavy relational shapes +
# one of each extension family
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "wc_documents",
    "vertex_degree_lineitem",
    "matrix_multiply_synth",
    "window_top3_orders",
    "sessionize_events",
    "cube_flag_status",
    "asof_join_purchase_view",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "similarity_bruteforce",
    "similarity_ann_ivf",
    "text_quality_score",
    "multimodal_frame_sample",
    "q6_forecast_revenue",
    "q18_large_orders",
    "funnel_sessions",
    "pagerank_supplier_part",
    "streaming_events_hourly",
    # added in round 2
    "pipeline_pretrain_curation",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "streaming_sessionize",
    "curation_contamination",
    "events_rollup_multires",
    # added in round 4
    "heavy_hitters_tokens",
    "sample_stratified_sources",
    "streaming_serving_upsert",
    "dedup_substring_spans",
    "cluster_embeddings_kmeans",
    "semdedup_embeddings",
    "sketch_cms_token_freq",
    # r4 continuation
    "events_gapfill_hourly",
    "text_inverted_index",
    "fuzzy_link_customer_supplier",
    "streaming_purchase_view_left",
    "snapshot_diff_documents",
    "similarity_hard_negatives",
    "pipeline_incremental_refresh",
    "curation_token_budget",
    "sample_topk_per_stratum",
]


def main() -> None:
    from map_reduce_lite_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="mrl_spark_bench")
    queries = entry_mod.queries()

    # warmup: touch every table once so file listing/footer reads are warm
    queries["join_nation_region"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # Settle cleaner debt from the PREVIOUS query before timing this
        # one: ContextCleaner frees broadcasts/shuffle state only on JVM
        # GC, and on the pre-sized heap GC won't run on its own — the
        # accumulated garbage otherwise lands in whichever later query
        # allocates hardest (measured 11.0s vs 2.8s on dedup_simhash
        # after 12 prior queries). GC time is deliberately OUTSIDE the
        # timed region: each number is the query's steady-state cost,
        # not its neighbors' cleanup.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        for _ in range(3):  # min of 3 runs: steady-state, GC-noise-resistant
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = None
    tail = Path(SF_DIR).name
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline query wall time at sf (sum over queries)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
