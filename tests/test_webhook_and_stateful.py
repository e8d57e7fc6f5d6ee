"""Webhook sink (K1) and applyInPandasWithState stateful operator tests."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.operators import load_all
from cdc_platform_spark.streaming.pipeline import to_envelope
from cdc_platform_spark.streaming.stateful import running_user_stats
from cdc_platform_spark.streaming.webhook import WebhookSink

from .conftest import SF_SMOKE

REGISTRY = load_all()


class _Recorder(http.server.BaseHTTPRequestHandler):
    received: list[dict] = []
    fail_first_n = 0
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _Recorder.lock:
            if _Recorder.fail_first_n > 0:
                _Recorder.fail_first_n -= 1
                self.send_response(503)
                self.end_headers()
                return
            _Recorder.received.append(
                {"auth": self.headers.get("Authorization"), "body": json.loads(body)}
            )
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Recorder.received = []
    _Recorder.fail_first_n = 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/hook"
    srv.shutdown()


def test_webhook_delivers_reference_payload_shape(spark, http_server):
    env = to_envelope(spark.read.parquet(f"{SF_SMOKE}/events.parquet")).filter(F.col("offset") < 20)
    WebhookSink(http_server, auth_token="sekrit").write(env)
    assert len(_Recorder.received) == 20
    msg = _Recorder.received[0]
    assert msg["auth"] == "Bearer sekrit"
    assert set(msg["body"]) == {"key", "value", "metadata"}  # ref sinks/webhook.py:68-76 shape
    assert set(msg["body"]["metadata"]) == {"topic", "partition", "offset"}
    assert msg["body"]["metadata"]["topic"] == "cdc.public.users"


def test_webhook_retries_transient_failures(spark, http_server):
    _Recorder.fail_first_n = 3
    env = to_envelope(spark.read.parquet(f"{SF_SMOKE}/events.parquet")).filter(F.col("offset") < 5)
    WebhookSink(http_server, max_attempts=5, base_delay=0.01).write(env)
    assert len(_Recorder.received) == 5  # all delivered despite 3 transient 503s


def test_stateful_running_stats_accumulates_across_batches(spark, tmp_path):
    src = f"{tmp_path}/src"
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").repartition(4).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out: list = []
    q = (
        running_user_stats(to_envelope(stream))
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", f"{tmp_path}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(out) == 4  # one update emission per micro-batch
    import pandas as pd

    batches = [pdf.assign(_b=i) for i, pdf in enumerate(out)]
    final = pd.concat(batches).sort_values("_b").groupby("pk").last()
    batch_env = to_envelope(spark.read.parquet(src))
    expected = (
        batch_env.groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("offset").alias("max_offset"),
            (F.sum(F.round(F.col("value") * 100)).cast("long") / 100.0).alias("running_value"),
        )
        .toPandas()
        .set_index("pk")
        .sort_index()
    )
    final = final.sort_index()
    assert (final["n_events"] == expected["n_events"]).all()
    assert (final["max_offset"] == expected["max_offset"]).all()
    assert (abs(final["running_value"] - expected["running_value"]) < 1e-9).all()
    # last_event_type per key == event at global max offset
    latest = (
        batch_env.withColumn(
            "rn", F.row_number().over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("pk").orderBy(F.col("offset").desc()))
        )
        .filter("rn = 1")
        .select("pk", "event_type")
        .toPandas()
        .set_index("pk")
        .sort_index()
    )
    assert (final["last_event_type"] == latest["event_type"]).all()


def test_transform_with_state_latest_per_key(spark, tmp_path):
    """Spark 4 arbitrary-state operator: final per-key state equals the
    batch Q27 materialization (modulo delete tombstones, which this
    operator emits explicitly rather than dropping).

    transformWithStateInPandas's state server speaks protobuf; this
    container ships pyspark without the python protobuf package, so the
    operator is exercised where the dependency exists (any real cluster)
    and skipped here. applyInPandasWithState (tested above) covers the
    container-runnable stateful path."""
    pytest.importorskip("google.protobuf")
    from cdc_platform_spark.streaming.pipeline import to_envelope
    from cdc_platform_spark.streaming.stateful import latest_per_key_stream

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    env = to_envelope(events)
    src = f"{tmp_path}/src"
    env.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = latest_per_key_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_latest")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    # final state = last emitted update per pk (highest offset wins)
    w = Window.partitionBy("pk").orderBy(F.col("offset").desc())
    got = (
        spark.table("tws_latest")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND op <> 'd'")
        .select("pk", F.col("offset").alias("last_offset"), F.col("event_type").alias("last_event_type"),
                F.col("value").alias("last_value"))
        .toPandas()
        .sort_values("pk")
        .reset_index(drop=True)
    )
    expected = (
        REGISTRY["q27_cdc_upsert_latest"].builder(spark, SF_SMOKE)
        .toPandas()
        .sort_values("pk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected[got.columns.tolist()])
