"""SQ3 late-data drop, approx-distinct tolerance, CLI run E2E."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from cdc_platform_spark.operators import load_all

from .conftest import SF_SMOKE

REGISTRY = load_all()


def test_watermark_drops_late_data(spark, tmp_path):
    """SQ3: with a 30min watermark in append mode, an event arriving a day
    late (after the watermark has advanced and been committed) is dropped —
    its window never appears in the output and the state-store metric
    records the drop.

    Note the watermark advances one micro-batch *after* the data that moves
    it (Spark's no-data-batch advancement), so the straggler is delivered
    only after ``processAllAvailable`` has committed the advanced watermark.
    """
    src = f"{tmp_path}/src"
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    rows_ddl = "event_id long, ts string, user_id long, event_type string, value double, props string"
    on_time = spark.createDataFrame(
        [(i, f"2024-01-02 0{i}:10:00", 1, "click", 1.0, "{}") for i in range(4)], rows_ddl
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late = spark.createDataFrame(
        [(99, "2024-01-01 00:05:00", 1, "click", 1.0, "{}")], rows_ddl
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out: list[pd.DataFrame] = []
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").cast("long").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", f"{tmp_path}/ck")
        .start()
    )
    try:
        on_time.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # data batch + no-data batch -> watermark = 02:40
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    emitted = (
        pd.concat([p for p in out if len(p)], ignore_index=True)
        if any(len(p) for p in out)
        else pd.DataFrame(columns=["ws", "n"])
    )
    late_window = pd.Timestamp("2024-01-01 00:00:00").value // 10**9
    assert late_window not in set(emitted["ws"]), "late event leaked past the watermark"
    assert (emitted["n"] == 1).all()
    assert dropped == 1, f"expected the straggler to be dropped by watermark, metrics={dropped}"


def test_approx_distinct_within_tolerance(spark, duck):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in REGISTRY["q12_approx_distinct"].builder(spark, SF_SMOKE).collect()
    }
    exact = dict(
        duck.sql("SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem GROUP BY 1").fetchall()
    )
    for flag, approx_n in approx.items():
        assert abs(approx_n - exact[flag]) / exact[flag] < 0.05, (flag, approx_n, exact[flag])


def test_cli_run_pipeline(spark, tmp_path, capsys, monkeypatch):
    from cdc_platform_spark.cli import main

    monkeypatch.setenv("OUT", str(tmp_path))
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").coalesce(2).write.parquet(f"{tmp_path}/src")
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        """
pipeline_id: cli-demo
source:
  path: ${OUT}/src
checkpoint_dir: ${OUT}/ck
dlq_path: ${OUT}/dlq
sinks:
  - id: state
    type: upsert
    path: ${OUT}/state
"""
    )
    assert main(["run", str(cfg)]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["status"] == "completed"
    state = spark.read.parquet(f"{tmp_path}/state").filter("op <> 'd'")
    expected = REGISTRY["q27_cdc_upsert_latest"].builder(spark, SF_SMOKE)
    assert state.count() == expected.count()


def test_approx_percentile_within_tolerance(spark, duck):
    """q73 is sketch-based (rows-only driver gate); tier 1 pins its accuracy
    against DuckDB's exact quantile_cont instead."""
    approx = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in REGISTRY["q73_approx_percentile"].builder(spark, SF_SMOKE).collect()
    }
    exact = {
        flag: (p50, p95, p99)
        for flag, p50, p95, p99 in duck.sql(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5), "
            "quantile_cont(l_extendedprice, 0.95), quantile_cont(l_extendedprice, 0.99) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, ps in approx.items():
        for got, want in zip(ps, exact[flag]):
            assert abs(got - want) / want < 0.02, (flag, got, want)
