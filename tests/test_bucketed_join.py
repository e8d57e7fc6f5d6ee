"""Co-located join via bucketing: both sides bucketed by the join key ->
SortMergeJoin with no Exchange (shuffle-free), results identical to the
shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.plans.explain import explain_text
from cdc_platform_spark.sources.bucketed import read_bucketed, write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "k"), "bkt_orders", ["k"], 8, str(tmp_path / "o")
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "k"), "bkt_customer", ["k"], 8, str(tmp_path / "c")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_tables):
    o = read_bucketed(spark, "bkt_orders")
    c = read_bucketed(spark, "bkt_customer")
    # disable broadcast so the planner must choose SMJ; bucketing removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, "k").groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        plan = explain_text(joined)
        assert "SortMergeJoin" in plan
        join_section = plan.split("SortMergeJoin")[0]
        # no Exchange may feed the join (bucket co-location replaces the shuffle)
        assert "Exchange hashpartitioning(k" not in join_section, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # correctness: equals the plain shuffled join on raw parquet
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    expected = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    got = joined.toPandas().sort_values("c_mktsegment").reset_index(drop=True)
    assert got.equals(expected)
