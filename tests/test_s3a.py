"""Object-store (S3A) path evidence — SURVEY §2 F2.

The reference's production mode is S3 end-to-end (mrl-worker/src/map.rs:
86-118 scans an S3 prefix; common/src/minio.rs:179-206 is a hand-rolled
MinIO client). Our ``read_source``/``write_sink`` take the same calls
with an ``s3a://`` URL and delegate to the Hadoop S3A connector.

This sandbox has no object store and no network, so the test has two
modes:

- If ``MRL_S3_ENDPOINT`` (+ ``MRL_S3_BUCKET``, ``MRL_S3_ACCESS_KEY``,
  ``MRL_S3_SECRET_KEY``) is set, run the REAL round-trip: write a
  DataFrame to ``s3a://bucket/...``, read it back, compare.
- Otherwise, still EXECUTE the s3a path and pin the exact blocking
  error: the pip-distributed PySpark ships no hadoop-aws/aws-sdk jars
  (verified: ``pyspark/jars`` contains no aws/s3 artifacts), so the
  FileSystem loader must fail with the documented
  ``ClassNotFoundException: org.apache.hadoop.fs.s3a.S3AFileSystem``.
  That converts "never executed" into executed, characterized evidence:
  the code path reaches Hadoop's FS dispatch and is blocked only by the
  absent connector jar, not by our code.

To run for real against MinIO/S3, provision the two jars on the
driver/executor classpath (e.g. ``spark.jars.packages =
org.apache.hadoop:hadoop-aws:3.4.x``) and set the env vars above.
"""

from __future__ import annotations

import os

import pytest

S3_ENDPOINT = os.environ.get("MRL_S3_ENDPOINT")


def _s3_conf(spark):
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", S3_ENDPOINT)
    hconf.set("fs.s3a.access.key", os.environ["MRL_S3_ACCESS_KEY"])
    hconf.set("fs.s3a.secret.key", os.environ["MRL_S3_SECRET_KEY"])
    hconf.set("fs.s3a.path.style.access", "true")
    hconf.set("fs.s3a.connection.ssl.enabled", "false")


@pytest.mark.skipif(not S3_ENDPOINT, reason="MRL_S3_ENDPOINT not set")
def test_s3a_round_trip(spark):
    """Real object-store round-trip (runs only with a provisioned store)."""
    from map_reduce_lite_spark.sources.io import read_source, write_sink

    _s3_conf(spark)
    bucket = os.environ["MRL_S3_BUCKET"]
    path = f"s3a://{bucket}/mrl_s3a_roundtrip"
    df = spark.range(1000).withColumnRenamed("id", "k")
    write_sink(df, path, fmt="parquet")
    back = read_source(spark, path, fmt="parquet")
    assert back.count() == 1000
    assert sorted(back.columns) == ["k"]


@pytest.mark.skipif(bool(S3_ENDPOINT), reason="real store available; blocker N/A")
def test_s3a_blocked_only_by_missing_connector_jar(spark):
    """Without a store, executing the s3a path must fail at Hadoop's
    FileSystem dispatch with the missing-connector error — proving the
    engine-side plumbing is reached and the ONLY gap is the jar this
    sandbox cannot install (no pip/network). Any OTHER failure mode
    (e.g. our dispatcher raising before Spark) fails this test."""
    from py4j.protocol import Py4JJavaError

    from map_reduce_lite_spark.sources.io import read_source

    with pytest.raises(Exception) as exc_info:
        read_source(spark, "s3a://mrl-nonexistent/prefix/*", fmt="parquet").count()
    msg = str(exc_info.value)
    assert isinstance(exc_info.value, Py4JJavaError) or "S3A" in msg or "s3a" in msg
    assert (
        "org.apache.hadoop.fs.s3a.S3AFileSystem" in msg
        or "ClassNotFoundException" in msg
        or "UnsupportedFileSystemException" in msg
    ), f"unexpected s3a failure mode:\n{msg[:2000]}"
