"""EnrichedJoinViewSink: the materialized facts-⋈-latest-dim view must
converge to the batch join under any micro-batch split, re-enrich on
dimension updates, drop on dimension deletes, and heal its three-table
crash window on replay."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: N812
import pytest

from cdc_platform_spark.streaming.pipeline import to_envelope

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def env(spark):
    return to_envelope(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(400)
    ).localCheckpoint(eager=True)


def _batch_oracle(spark, env):
    from pyspark.sql import Window

    w = Window.partitionBy("pk").orderBy(F.col("offset").desc())
    dim = (
        env.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND op != 'd'")
        .select("pk", F.col("value").alias("dim_value"))
    )
    return env.join(dim, "pk").select(
        "seq", "pk", "event_type", F.col("value").alias("fact_value"), "dim_value"
    )


def _rows(df):
    return sorted(map(tuple, df.select("seq", "pk", "event_type", "fact_value", "dim_value").collect()))


def test_view_converges_under_any_batching(spark, tmp_path, env):
    from cdc_platform_spark.streaming.join_view import EnrichedJoinViewSink

    expected = _rows(_batch_oracle(spark, env))
    assert expected

    sink = EnrichedJoinViewSink(str(tmp_path / "jv"))
    for k in range(3):
        sink.write(env.filter(F.pmod(F.col("seq"), F.lit(3)) == k))
    assert _rows(sink.view(spark)) == expected


def test_dim_update_reenriches_and_delete_drops(spark, tmp_path, env):
    from cdc_platform_spark.streaming.join_view import EnrichedJoinViewSink

    sink = EnrichedJoinViewSink(str(tmp_path / "jv"))
    sink.write(env)
    some_pk = env.filter("op != 'd'").select("pk").first()["pk"]
    max_off = env.agg(F.max("offset")).first()[0]

    # late dimension UPDATE: every fact row of the key re-enriches
    upd = spark.createDataFrame(
        [(10**9, max_off + 1, some_pk, "u", "update", 123.5)],
        "seq long, offset long, pk long, op string, event_type string, value double",
    )
    sink.write(upd)
    got = sink.view(spark).filter(F.col("pk") == some_pk)
    assert got.count() > 0
    assert {r["dim_value"] for r in got.collect()} == {123.5}

    # late dimension DELETE: the key's rows drop from the inner join
    dele = spark.createDataFrame(
        [(10**9 + 1, max_off + 2, some_pk, "d", "error", None)],
        "seq long, offset long, pk long, op string, event_type string, value double",
    )
    sink.write(dele)
    assert sink.view(spark).filter(F.col("pk") == some_pk).count() == 0


def test_view_recovers_from_three_table_crash_window(spark, tmp_path, env):
    import os

    from cdc_platform_spark.streaming.join_view import EnrichedJoinViewSink

    sink = EnrichedJoinViewSink(str(tmp_path / "jv"))
    first = env.filter("seq % 2 = 0")
    second = env.filter("seq % 2 = 1")
    sink.write(first)
    expected = _rows(sink.view(spark))
    # mid-swap crash on all three tables
    for p in (sink.facts_path, sink.dim_path, sink.view_path):
        os.rename(p, f"{p}.old-deadbeef")
    assert _rows(sink.view(spark)) == expected
    sink.write(first)  # at-least-once replay: no duplicates
    assert _rows(sink.view(spark)) == expected
    sink.write(second)
    ref = EnrichedJoinViewSink(str(tmp_path / "ref"))
    ref.write(env)
    assert _rows(sink.view(spark)) == _rows(ref.view(spark))
