"""Sources & sinks — the reference's scan/sink surface, Spark-native.

Reference parity:
- local glob text scan (standalone/src/engine.rs:27-40) → ``scan_lines``
  / ``scan_whole_files`` — Spark's text source accepts the same globs.
- S3 prefix scan + hand-rolled MinIO client (mrl-worker/src/map.rs:86-118,
  common/src/minio.rs:179-206) → the SAME calls with an ``s3a://`` path;
  the Hadoop S3A connector replaces ~400 lines of reference client code,
  adding multipart, retry and committer semantics for free.
- whole-file KeyValue model — one (filename, contents) record per input
  file (standalone/src/engine.rs:36-40, mrl-worker/src/map.rs:113-118) →
  ``scan_whole_files`` (``wholetext=True`` + ``input_file_name()``).
- text sink ``mr-out-{partition}`` (standalone/src/engine.rs:66-75,
  mrl-worker/src/reduce.rs:227-236) → ``write_sink(fmt="text")`` — Spark
  writes ``part-*`` files through a committer (staged rename ≈ the
  reference's straggler_copy + move_objects dance, job_queue.rs:650-656).

Beyond parity, ``read_source``/``write_sink`` expose csv/json/parquet/orc
— the formats a real corpus arrives in (orc, like parquet, gets
predicate pushdown + column pruning from the native reader). Scale notes: parquet reads get
predicate pushdown + column pruning from Catalyst (verify via
``.explain`` → PushedFilters/ReadSchema); ``partition_by`` writes
hive-layout directories so downstream reads partition-prune;
``maxPartitionBytes`` governs split sizing — no code needed per source.
``scan_whole_files`` is the one deliberately NON-scalable reader (a
whole file per row, like the reference); prefer ``scan_lines`` unless
per-file semantics are required (SURVEY.md §7 risk #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FORMATS = ("text", "csv", "json", "parquet", "orc")


def scan_lines(spark: SparkSession, path_glob: str, with_file: bool = False) -> DataFrame:
    """One row per line: (value [, file]). Globs expand like the
    reference's glob::glob loop; splits are planned by size, not by
    file count, so one giant file still parallelizes."""
    df = spark.read.text(path_glob)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def scan_whole_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per FILE: (file, content) — the reference's KeyValue scan
    model exactly (key=filename, value=whole contents)."""
    return spark.read.text(path_glob, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value").alias("content")
    )


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "text",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched reader. ``path`` may be a local path, a glob, or
    any Hadoop-FS URL (s3a://, hdfs://, …) — the reference's local-vs-S3
    split (engine.rs:27 vs map.rs:86) collapses into one call."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        # explicit schema beats inferSchema (a second full scan) at scale
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    THE pre-shuffle strategy for repeated big-big joins at 100 TB: both
    sides bucketed by the join key into the same bucket count join with
    NO exchange (and no sort, if sorted) — the shuffle is paid once at
    write time instead of per query. tests/test_bucketing.py asserts the
    exchange-free plan. Spark's bucketing is hive-compatible file
    layout; `spark.sql.sources.bucketing.enabled` is on by default."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    **options,
) -> int:
    """Rewrite a directory of small files into ~``target_file_bytes``
    files; returns the output file count.

    The small-files problem is endemic at 100 TB: streaming sinks,
    per-partition writers, and fine-grained hive partitions each leave
    thousands of KB-sized files, and every downstream scan then pays a
    task per file plus a driver-side listing that grows with file
    count, not data size. Compaction is the standing maintenance op
    (Delta/Iceberg expose it as OPTIMIZE / rewrite_data_files; on plain
    directories it is this rewrite).

    Sizing reads the source's actual on-disk bytes from the FileIndex
    (no data scan, no collect) and repartitions to
    ceil(bytes / target). ``repartition`` (round-robin, a shuffle) is
    deliberate: ``coalesce`` would merge co-located splits without
    rebalancing, propagating input skew into the output files — the
    shuffle IS the point of a compaction pass."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    df = read_source(spark, src_path, fmt=fmt, **options)
    # on-disk size from relation statistics (FileIndex listing — no data
    # scan, no collect); covers compressed bytes for parquet/orc
    stat_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n_files = max(1, -(-stat_bytes // target_file_bytes))
    write_sink(df.repartition(n_files), dst_path, fmt=fmt, mode="overwrite")
    return len(read_source(spark, dst_path, fmt=fmt).inputFiles())


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "text",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    **options,
) -> None:
    """Format-dispatched writer (≈ mr-out-{partition} sink for text).

    ``num_files`` bounds output file count via coalesce — the analog of
    the reference's fixed n_reduce=3 (standalone/src/main.rs:31), but
    chosen per write instead of hard-coded. ``partition_by`` writes
    hive-style key=value directories for downstream partition pruning."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    if num_files is not None:
        df = df.coalesce(num_files)
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
        writer = writer.option("header", options["header"])
    writer.format(fmt).save(path)


ZORDER_BITS = 16  # per-dimension resolution of the interleaved key


def _morton_key(cols: list[str], mins: dict[str, float], maxs: dict[str, float]):
    """Interleaved-bit (Morton / Z-order) key over numeric columns.

    Each column is range-quantized to ZORDER_BITS bits using its global
    min/max, then the bits are interleaved so that sorting by the key
    clusters rows that are close in EVERY dimension — parquet row-group
    min/max stats on each column become tight, and a filter on any of
    the z-ordered columns skips most files (the Delta OPTIMIZE ZORDER /
    Iceberg sort-order effect, on plain parquet directories).
    Pure JVM expression; no UDF."""
    quant = []
    for c in cols:
        lo, hi = mins[c], maxs[c]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << ZORDER_BITS) - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * ((1 << ZORDER_BITS) - 1)
            ),
        ).cast("long")
        quant.append(q)
    key = F.lit(0).cast("long")
    n = len(quant)
    for bit in range(ZORDER_BITS):
        for d, q in enumerate(quant):
            src_bit = F.shiftright(q, bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(src_bit, bit * n + d))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    num_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on a Z-order curve over ``zorder_by``.

    One tiny min/max agg fixes the quantization ranges (at scale: one
    scan-stats read, or carry known domain bounds), then
    ``repartitionByRange`` + in-partition sort on the Morton key lays
    rows out so every output file covers a small hyper-rectangle of the
    key space. Files then carry tight per-column min/max footers and
    selective filters on ANY z-ordered column prune most files — the
    multi-dimensional analog of partitioning, without the small-files
    blowup of hive-partitioning on high-cardinality keys."""
    aggs = []
    for c in zorder_by:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    mins = {c: row[f"mn_{c}"] for c in zorder_by}
    maxs = {c: row[f"mx_{c}"] for c in zorder_by}
    keyed = df.withColumn("__mrl_zkey", _morton_key(zorder_by, mins, maxs))
    (
        keyed.repartitionByRange(num_files, "__mrl_zkey")
        .sortWithinPartitions("__mrl_zkey")
        .drop("__mrl_zkey")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )
