"""Round-trip tests for the sources/sinks layer."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from map_reduce_lite_spark.sources import (
    read_source,
    scan_lines,
    scan_whole_files,
    write_sink,
)


@pytest.fixture()
def textdir(tmp_path):
    (tmp_path / "a.txt").write_text("alpha one\nalpha two\n")
    (tmp_path / "b.txt").write_text("beta one\n")
    return tmp_path


def test_scan_lines_glob(spark, textdir):
    df = scan_lines(spark, f"{textdir}/*.txt")
    assert df.count() == 3
    assert df.columns == ["value"]


def test_scan_lines_with_file(spark, textdir):
    df = scan_lines(spark, f"{textdir}/*.txt", with_file=True)
    files = {r["file"].rsplit("/", 1)[-1] for r in df.collect()}
    assert files == {"a.txt", "b.txt"}


def test_scan_whole_files_one_row_per_file(spark, textdir):
    rows = scan_whole_files(spark, f"{textdir}/*.txt").collect()
    by_name = {r["file"].rsplit("/", 1)[-1]: r["content"] for r in rows}
    assert set(by_name) == {"a.txt", "b.txt"}
    assert by_name["a.txt"] == "alpha one\nalpha two\n"
    assert by_name["b.txt"] == "beta one\n"


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    df = spark.createDataFrame(
        [Row(k=1, name="x", v=1.5), Row(k=2, name="y", v=2.5)]
    )
    out = str(tmp_path / f"out_{fmt}")
    write_sink(df, out, fmt=fmt, num_files=1)
    back = read_source(spark, out, fmt=fmt, schema="k bigint, name string, v double")
    got = sorted((r["k"], r["name"], r["v"]) for r in back.collect())
    assert got == [(1, "x", 1.5), (2, "y", 2.5)]


def test_text_sink_lines(spark, tmp_path):
    df = spark.createDataFrame([Row(value="l1"), Row(value="l2")])
    out = str(tmp_path / "out_text")
    write_sink(df, out, fmt="text", num_files=1)
    back = read_source(spark, out, fmt="text")
    assert sorted(r["value"] for r in back.collect()) == ["l1", "l2"]


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(part="a", v=i) for i in range(5)] + [Row(part="b", v=i) for i in range(3)]
    )
    out = str(tmp_path / "parted")
    write_sink(df, out, fmt="parquet", partition_by=["part"])
    assert (tmp_path / "parted" / "part=a").exists()
    back = read_source(spark, out, fmt="parquet").filter(F.col("part") == "a")
    assert back.count() == 5
    # partition filter must prune at plan level, not post-scan: the
    # FileScan's PartitionFilters list must actually carry the predicate
    # (the earlier `"PartitionFilters" in plan or count()==5` form was
    # vacuous — the count arm always passed)
    import re

    plan = back._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "part" in m.group(1) and "= a" in m.group(1), plan


def test_unknown_format_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        read_source(spark, str(tmp_path), fmt="avro")


def test_orc_predicate_pushdown(spark, tmp_path):
    """ORC goes through the same native scan machinery as parquet:
    filters must reach the file scan (PushedFilters), not run post-hoc."""
    df = spark.range(1000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS tag")
    out = str(tmp_path / "orc_pd")
    write_sink(df, out, fmt="orc")
    back = read_source(spark, out, fmt="orc").filter(F.col("k") > 900).select("k")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "k" in plan, plan
    assert back.count() == 99


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    """Compaction must merge a many-small-files directory into the
    target-size file count without changing the data multiset."""
    from map_reduce_lite_spark.sources.io import compact_files

    src = str(tmp_path / "small")
    df = spark.range(10_000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
    # 64 tiny files — the streaming-sink pathology
    write_sink(df.repartition(64), src, fmt="parquet")
    n_src = len(read_source(spark, src, fmt="parquet").inputFiles())
    assert n_src == 64

    dst = str(tmp_path / "compacted")
    n_out = compact_files(spark, src, dst, fmt="parquet",
                          target_file_bytes=16 * 1024 * 1024)
    assert n_out < n_src
    back = read_source(spark, dst, fmt="parquet")
    assert back.count() == 10_000
    assert back.agg(F.sum("k")).first()[0] == sum(range(10_000))


def test_zorder_write_skips_files(spark, tmp_path):
    """Z-order clustering must make per-file min/max footers selective
    on BOTH clustered columns: a narrow filter on either column should
    intersect far fewer files than under a round-robin layout."""
    from map_reduce_lite_spark.relational.tables import load_table
    from map_reduce_lite_spark.sources import write_zordered, write_sink
    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 8
    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "rr")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=n_files)
    write_sink(li.repartition(n_files), rpath, fmt="parquet")

    import pyarrow.parquet as pq
    import glob

    def file_ranges(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out.append((lo, hi))
        return out

    def files_hit(ranges, lo, hi):
        return sum(1 for a, b in ranges if not (b < lo or a > hi))

    for col in ["l_orderkey", "l_partkey"]:
        zr = file_ranges(zpath, col)
        rr = file_ranges(rpath, col)
        assert len(zr) == n_files and len(rr) == n_files
        gmin = min(a for a, _ in rr)
        gmax = max(b for _, b in rr)
        width = (gmax - gmin) // 10 or 1  # 10%-wide predicate
        lo = gmin + 4 * width
        hi = lo + width
        assert files_hit(zr, lo, hi) < files_hit(rr, lo, hi), (
            col,
            zr,
            rr,
        )
        # round-robin spreads every value range over every file
        assert files_hit(rr, lo, hi) == n_files

    # same rows, just reordered
    from map_reduce_lite_spark.sources import read_source

    assert read_source(spark, zpath, fmt="parquet").count() == li.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema drift across parquet drops: mergeSchema reads the union
    schema with nulls for the missing column — the ingestion posture
    for a source that added a field mid-stream."""
    from map_reduce_lite_spark.sources import read_source, write_sink

    old = spark.range(3).select(F.col("id").alias("k"))
    new = spark.range(3, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    )
    write_sink(old, str(tmp_path / "drop=1"), fmt="parquet")
    write_sink(new, str(tmp_path / "drop=2"), fmt="parquet")
    merged = read_source(
        spark, str(tmp_path) + "/drop=*", fmt="parquet", mergeSchema="true"
    )
    assert set(merged.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in merged.collect()}
    assert rows[0] is None and rows[4] == 40
