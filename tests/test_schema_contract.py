"""Schema contract for load_table outputs.

Round 3 postmortem: the testdata generator silently switched events.parquet
from TIMESTAMP(NANOS) to plain timestamp[us] (TIMESTAMP_NTZ in Spark 4.x),
which broke unix_millis() in two queries and crashed the whole bench before
any named test failed. This file turns any future drift of the parquet data
contract into a single, named test failure: load_table must always hand
operators the SAME logical schema regardless of how the driver regenerated
the files.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from map_reduce_lite_spark.relational.tables import TABLE_NAMES, load_table

from conftest import SF_SMALL

# Expected dtypes per table, post-normalization. Columns listed here must
# exist with exactly this Spark dtype; extra columns are allowed (additive
# drift is fine, type drift is not).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double", "p_type": "string", "p_size": "int"},
    # o_orderdate / l_shipdate are naive timestamps in the current data; both
    # engines treat NTZ identically for comparisons and date_format, so NTZ is
    # part of the contract here — but a flip to bigint/string must fail loudly.
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # The whole point: ts must be TIMESTAMP (with local-TZ semantics), never
    # bigint nanos and never TIMESTAMP_NTZ, whatever the parquet carries.
    "events": {
        "event_id": "bigint",
        "user_id": "bigint",
        "ts": "timestamp",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


def test_load_table_dtypes_match_contract(spark):
    problems = []
    for name in TABLE_NAMES:
        dtypes = dict(load_table(spark, SF_SMALL, name).dtypes)
        for col, want in EXPECTED[name].items():
            got = dtypes.get(col)
            if got != want:
                problems.append(f"{name}.{col}: want {want}, got {got}")
    assert not problems, "schema drift detected:\n" + "\n".join(problems)


def test_events_ntz_parquet_is_normalized(spark, tmp_path):
    """Write a plain timestamp[us] (NTZ) events parquet and prove load_table
    normalizes it to TIMESTAMP with identical UTC instants."""
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 11], pa.int64()),
            "ts": pa.array([1700000000000000, 1700000001500000], pa.timestamp("us")),
            "event_type": pa.array(["view", "purchase"]),
        }
    )
    d = tmp_path / "ntz"
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as F

    millis = [r[0] for r in df.select(F.unix_millis("ts")).orderBy("ts").collect()]
    assert millis == [1700000000000, 1700000001500]


def test_events_nanos_parquet_is_normalized(spark, tmp_path):
    """The older drift: TIMESTAMP(NANOS) parquet read as bigint must also
    land on TIMESTAMP with exact integer-division conversion."""
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([10], pa.int64()),
            "ts": pa.array([1700000000123456789], pa.timestamp("ns")),
            "event_type": pa.array(["view"]),
        }
    )
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(table, d / "events.parquet", coerce_timestamps=None)
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as F

    assert df.select(F.unix_micros("ts")).collect()[0][0] == 1700000000123456


def test_load_table_pins_session_timezone_utc(spark):
    """A foreign (driver-built) session inherits the host timezone, where
    DST changes hourly-bucketing row counts; load_table must pin UTC."""
    from map_reduce_lite_spark.relational.tables import load_table

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        load_table(spark, SF_SMALL, "documents")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
