"""Live Schema Registry monitor + registry-backed resolver (M1, S1).

Tested against a local stub registry server (the same posture as the
webhook sink tests): real HTTP, deterministic fixtures. Reference
behavior: streaming/schema_monitor.py:16-138 (poll + /compatibility
classification), streaming/consumer.py:97-110 (writer schema by id).
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from cdc_platform_spark.observability import (
    SchemaDriftError,
    SchemaRegistryClient,
    SchemaRegistryMonitor,
)
from cdc_platform_spark.sources.avro import (
    AVRO_ENVELOPE_SCHEMA,
    RegistrySchemaResolver,
)


class _StubRegistry(http.server.BaseHTTPRequestHandler):
    """In-memory Confluent-registry stub: subjects + schemas-by-id, and a
    /compatibility endpoint whose verdict the test scripts per subject."""

    state: dict = {}

    def _send(self, code: int, payload: dict | None) -> None:
        body = json.dumps(payload or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        parts = self.path.strip("/").split("/")
        if parts[:1] == ["subjects"] and parts[3:] == ["latest"]:
            data = self.state["subjects"].get(parts[1])
            self._send(200 if data else 404, data)
        elif parts[:2] == ["schemas", "ids"]:
            schema = self.state["by_id"].get(int(parts[2]))
            self._send(200 if schema else 404, {"schema": schema} if schema else None)
        else:
            self._send(404, None)

    def do_POST(self):  # noqa: N802
        parts = self.path.strip("/").split("/")
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if parts[:1] == ["compatibility"]:
            subject = parts[2]
            self._send(200, {"is_compatible": self.state["compatible"].get(subject, True)})
        else:
            self._send(404, None)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def registry():
    state = {"subjects": {}, "by_id": {}, "compatible": {}}
    handler = type("Handler", (_StubRegistry,), {"state": state})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_monitor_tracks_versions_and_warns_on_compatible_bump(registry):
    url, state = registry
    state["subjects"]["cdc.public.events-value"] = {
        "version": 1, "id": 1, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    mon = SchemaRegistryMonitor(url, ["cdc.public.events"], mode="halt")
    assert mon.poll_once() == []  # first sight: baseline, no event
    assert mon.known_versions["cdc.public.events-value"] == 1

    state["subjects"]["cdc.public.events-value"] = {
        "version": 2, "id": 7, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    state["compatible"]["cdc.public.events-value"] = True
    events = mon.poll_once()
    assert len(events) == 1 and events[0]["compatible"] is True
    assert not mon.incompatible_detected
    mon.ensure_compatible()  # compatible bump never halts


def test_monitor_halts_pipeline_on_incompatible_bump(registry):
    url, state = registry
    state["subjects"]["cdc.public.events-value"] = {
        "version": 1, "id": 1, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    stopped = []
    mon = SchemaRegistryMonitor(
        url, ["cdc.public.events"], mode="halt", on_incompatible=lambda: stopped.append(1)
    )
    mon.poll_once()
    state["subjects"]["cdc.public.events-value"] = {
        "version": 2, "id": 9, "schema": '{"type":"string"}',
    }
    state["compatible"]["cdc.public.events-value"] = False
    events = mon.poll_once()
    assert events[0]["compatible"] is False
    assert mon.incompatible_detected and stopped == [1]
    with pytest.raises(SchemaDriftError):
        mon.ensure_compatible()  # the per-micro-batch gate halts the query
    # warn mode records but never raises
    mon.mode = "warn"
    mon.ensure_compatible()


def test_monitor_survives_unreachable_registry():
    mon = SchemaRegistryMonitor(
        "http://127.0.0.1:9", ["t"], client=SchemaRegistryClient("http://127.0.0.1:9", timeout=0.2)
    )
    events = mon.poll_once()
    assert all(e["kind"] == "check_failed" for e in events)
    assert not mon.incompatible_detected  # unreachable is a warn, not a halt


def test_registry_schema_resolver_fetches_and_memoizes(registry):
    url, state = registry
    state["by_id"][42] = json.dumps(AVRO_ENVELOPE_SCHEMA)
    resolver = RegistrySchemaResolver(url)
    schema = resolver.schema_for(42)
    assert schema["name"] == "Envelope"
    assert resolver.known_ids() == [42]  # memoized for the JVM plan compile
    state["by_id"].clear()
    assert resolver.schema_for(42)["name"] == "Envelope"  # served from cache
    with pytest.raises(KeyError, match="77"):
        resolver.schema_for(77)


def test_pipeline_halts_on_incompatible_registry_bump(spark, registry, tmp_path):
    """End-to-end halt: the monitor is polled per micro-batch; when the stub
    registry publishes an incompatible version mid-stream, the next batch
    raises SchemaDriftError and the streaming query fails (reference
    stop_on_incompatible)."""
    from cdc_platform_spark.streaming.pipeline import AppendSink, CdcPipeline

    url, state = registry
    state["subjects"]["cdc.public.events-value"] = {
        "version": 1, "id": 1, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    mon = SchemaRegistryMonitor(url, ["cdc.public.events"], mode="halt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    events.limit(200).repartition(4).write.mode("overwrite").parquet(src)

    seen_batches = []
    orig_poll = mon.poll_once

    def poll_and_flip():
        events_out = orig_poll()
        seen_batches.append(1)
        if len(seen_batches) == 2:  # publish the breaking change mid-stream
            state["subjects"]["cdc.public.events-value"] = {
                "version": 2, "id": 9, "schema": '{"type":"string"}',
            }
            state["compatible"]["cdc.public.events-value"] = False
        return events_out

    mon.poll_once = poll_and_flip
    pipe = CdcPipeline(
        spark=spark,
        source_dir=src,
        checkpoint_dir=str(tmp_path / "ck"),
        sinks={"append": AppendSink(str(tmp_path / "append"))},
        max_files_per_trigger=1,
        schema_monitor=mon,
    )
    with pytest.raises(Exception, match="(?i)incompatible|SchemaDrift"):
        pipe.run_available_now()
    assert mon.incompatible_detected
    assert len(seen_batches) >= 3  # ran, saw the bump, halted on the next batch


def test_config_wires_registry_resolver_and_monitor(spark, tmp_path):
    """schema_registry_url + schema_monitor in the YAML config compile into
    a RegistrySchemaResolver-backed Avro envelope and an attached
    SchemaRegistryMonitor; monitor without a url is rejected."""
    from cdc_platform_spark.config.models import PipelineConfig, SinkConfig, SourceConfig
    from cdc_platform_spark.plans.compiler import compile_pipeline

    cfg = PipelineConfig(
        pipeline_id="k",
        source=SourceConfig(
            type="kafka",
            bootstrap_servers="b:9092",
            topics=["cdc.public.events"],
            value_format="avro",
            schema_registry_url="http://registry:8081",
        ),
        sinks=[SinkConfig(id="a", type="append", path=str(tmp_path / "a"))],
        schema_monitor="halt",
    )
    pipe = compile_pipeline(spark, cfg)
    assert pipe.schema_monitor is not None
    assert pipe.schema_monitor.mode == "halt"
    assert pipe.schema_monitor.topics == ["cdc.public.events"]
    assert pipe.schema_monitor.client.url == "http://registry:8081"

    with pytest.raises(Exception, match="schema_registry_url"):
        PipelineConfig(
            pipeline_id="k2",
            source=SourceConfig(type="parquet_stream", path="/tmp/x"),
            sinks=[SinkConfig(id="a", type="append", path=str(tmp_path / "b"))],
            schema_monitor="warn",
        )
