"""Salted join / two-stage agg must be result-identical to the plain forms."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from map_reduce_lite_spark.relational.skew import salted_join, two_stage_agg


def _counter(df):
    cols = sorted(df.columns)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain(spark):
    # heavily skewed big side: 90% of rows carry key 1
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, ["k"])
    salted = salted_join(big, small, ["k"], n_salts=8)
    assert _counter(salted) == _counter(plain)


def test_salted_join_left_outer(spark):
    big = spark.range(0, 1000).select((F.col("id") % 60).alias("k"), F.col("id").alias("v"))
    small = spark.range(0, 50).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], n_salts=4, how="left")
    assert _counter(salted) == _counter(plain)


def test_two_stage_agg_count(spark):
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(F.lit("cold")).alias("k")
    )
    plain = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    staged = two_stage_agg(
        df,
        ["k"],
        partial_aggs=[F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("pn").cast("long").alias("n")],
    )
    assert _counter(staged) == _counter(plain)
