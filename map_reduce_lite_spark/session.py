"""SparkSession factory.

Defaults target the test harness (local[N], 32 shuffle partitions) but
every knob is chosen to also be the right call on a real cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace the reference's hand-rolled
  straggler race (mrl-coordinator/src/job_queue.rs:405-556) and its fixed
  ``hash(key) % n_workers`` partitioning (common/src/lib.rs:128-136).
- Arrow on: every Pandas-UDF extension operator (dedup shingling,
  embedding math, multimodal decode) moves batches, not rows.
- UTC session timezone: timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "map_reduce_lite_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit provide it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Straggler race (F15): re-run slow tasks on free executors, first
        # finisher wins — the built-in replacement for the reference's
        # ~240-line handling_stragglers/straggler_vs_free_worker
        # (mrl-coordinator/src/job_queue.rs:405-556, 608-695). A no-op on
        # local[N] (single executor) but THE conf a cluster deploy needs.
        .config("spark.speculation", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Pre-size the heap: with the default tiny -Xms, the first
        # shuffle-heavy query pays seconds of stop-the-world heap-growth
        # GC (measured 7.1s → 1.8s on dedup_simhash at sf0.1). On a real
        # cluster the same flag goes in spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g')}",
        )
        # ContextCleaner releases broadcasts/shuffle state only when the
        # JVM garbage-collects; on a big pre-sized heap GC may not run
        # for a long time, so a long session accumulates cleaner debt
        # and a later memory-hungry query pays it all at once (measured:
        # 11.0s → 2.8s on dedup_simhash after 12 prior queries). This is
        # the documented knob for exactly that: periodic System.gc() on
        # the driver (default 30min — far too lazy for a 24g -Xms heap).
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
