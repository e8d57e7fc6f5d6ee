"""Salted-join / salted-aggregation equivalence tests (skew handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_platform_spark.functions.skew import salted_count_per_key, salted_join


def _skewed(spark):
    # 90% of rows share key 0 (a heavy hitter), the rest spread over 100 keys
    return spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.pmod(F.col("id"), 100)).alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_equals_plain_join(spark):
    large = _skewed(spark)
    small = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim"))
    plain = large.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    salted = salted_join(large, small, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    a = plain.toPandas().sort_values("k").reset_index(drop=True)
    b = salted.toPandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)


def test_salted_count_equals_plain_count(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count_per_key(df, "k", n_salts=16).collect()}
    assert salted == plain
