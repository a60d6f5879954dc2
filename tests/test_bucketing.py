"""Bucketed co-located joins: the pay-shuffle-once layout.

Both fact tables bucketed by the join key into the same bucket count
must join with NO shuffle exchange on either side — at 100 TB this is
the difference between re-shuffling 100 TB per query and reading
co-located buckets. The test asserts the plan, not just the rows.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from map_reduce_lite_spark.relational.tables import load_table
from map_reduce_lite_spark.sources.io import write_bucketed
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf — managed test tables land in the
    # session default and are dropped (files included) even on failure,
    # so a red assertion can't leak tables into later runs
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    try:
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "key"), "b_orders", ["key"], 8
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "key"), "b_lineitem", ["key"], 8
        )
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # force sort-merge: broadcast would hide the bucketing benefit
        joined = bo.hint("merge").join(bl, "key").groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # the join inputs read bucketed files directly — no shuffle before the join
        assert "Exchange" not in join_section, plan

        # and the result matches the plain (shuffled) join
        plain = (
            orders.withColumnRenamed("o_orderkey", "key")
            .join(lineitem.withColumnRenamed("l_orderkey", "key"), "key")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
