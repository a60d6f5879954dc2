"""Parquet table loading for the TPC-H-ish synthetic schema.

At 100 TB these reads are the dominant cost; everything here is a bare
``spark.read.parquet`` so Catalyst's column pruning and predicate pushdown
reach the scan (check ``.explain``: ReadSchema / PushedFilters). Never
cache or materialize here — operators decide what to persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata parquet table.

    SIDE EFFECT: pins ``spark.sql.session.timeZone`` to UTC on the
    given session (every call) — the engine's output contract is UTC
    regardless of host, and this is the one choke point every query
    passes through. A foreign session that deliberately set another
    zone will be overridden; set the zone AFTER load_table if you
    really need non-UTC rendering."""
    # The engine's output contract is UTC regardless of host: hourly
    # bucketing, date_trunc, and window() follow
    # spark.sql.session.timeZone, and an externally built driver
    # session inherits the HOST zone — where DST genuinely changes
    # results (observed: the hourly rollup emits 3550 rows under
    # America/New_York vs 3540 under UTC, same data). session.py pins
    # UTC for in-repo sessions; this covers foreign sessions too.
    # (unconditional set: conf.get validates its *default* argument, so
    # probing an unset conf with a sentinel throws INVALID_CONF_VALUE)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read nanos as long and convert with exact
        # integer division (float division is lossy at int64 magnitudes).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Plain timestamp[us] parquet reads as TIMESTAMP_NTZ in Spark 4.x,
            # which unix_millis() and friends reject. Session TZ is pinned to
            # UTC, so the cast is value-preserving and epoch_ms oracles match.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
