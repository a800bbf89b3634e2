"""Salted-join correctness: identical results to the plain join on a
skewed key distribution (one key owns 90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], "k LONG, name STRING"
    )
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k").select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "c")], "k LONG, v STRING"
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k LONG, w STRING")
    out = salted_join(big, small, "k", n_salts=4, how="left").collect()
    got = {(r["k"], r["v"], r["w"]) for r in out}
    assert got == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}
