"""Structured Streaming event-time windows.

The reference has no streaming at all (SURVEY.md §2.3) — this is the
driver-mandated extension surface. Batch twins of these aggregations
live in relational/queries.py (events_hourly), so correctness is
checked by equivalence: run the stream with ``availableNow`` over the
same parquet and compare to the batch plan (tests/test_streaming.py).

Scale notes: watermark bounds state; tumbling windows shuffle once on
(window, key); at 100 TB the state store should be RocksDB
(`spark.sql.streaming.stateStore.providerClass`) and the source a real
log (Kafka), not parquet — the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (stand-in for Kafka/log source)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sf_dir}/events.parquet")
    )


def hourly_counts_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding window (1 hour, sliding every 15 min) mean value per type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "avg_value")
    )


def run_stream_to_memory(df: DataFrame, name: str, timeout_sec: int = 120) -> None:
    """Drain a stream with availableNow into an in-memory table ``name``
    (test/driver harness; complete mode suits the windowed aggregates)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    q.stop()
