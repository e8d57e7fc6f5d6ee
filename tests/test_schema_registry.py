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
        if parts == ["subjects"]:
            names = sorted(
                set(self.state["subjects"]) | set(self.state.get("all_versions", {}))
            )
            self._send(200, names)
        elif parts[:1] == ["subjects"] and parts[2:3] == ["versions"]:
            subject = parts[1]
            # all_versions: {subject: {version: {...}}} for multi-version
            # subjects; "subjects" holds the latest (single) version.
            allv = self.state.get("all_versions", {}).get(subject)
            latest = self.state["subjects"].get(subject)
            if len(parts) == 3:  # version list
                if allv:
                    self._send(200, sorted(allv))
                elif latest:
                    self._send(200, [latest["version"]])
                else:
                    self._send(404, None)
            elif parts[3] == "latest":
                data = latest or (allv and allv[max(allv)]) or None
                self._send(200 if data else 404, data)
            else:
                v = int(parts[3])
                data = (allv or {}).get(v)
                if data is None and latest and latest.get("version") == v:
                    data = latest
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


def test_resolver_warm_seeds_ids_and_key_routing(registry):
    """warm() fetches every -key/-value subject version BEFORE plan build
    (the JVM multi-schema decode compiles one from_avro per known id) and
    attributes key ids by SUBJECT SUFFIX, not by the record-name heuristic
    — a registry whose key record is not literally named 'Key' still
    routes correctly (reference streaming/consumer.py:97-110 resolves by
    subject)."""
    url, state = registry
    key_schema = {"type": "record", "name": "EventsKey",  # NOT 'Key'
                  "fields": [{"name": "id", "type": "long"}]}
    state["all_versions"] = {
        "cdc.public.events-value": {
            1: {"version": 1, "id": 3, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA)},
            2: {"version": 2, "id": 9, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA)},
        },
        "cdc.public.events-key": {
            1: {"version": 1, "id": 5, "schema": json.dumps(key_schema)},
        },
    }
    resolver = RegistrySchemaResolver(url).warm(["cdc.public.events", "absent.topic"])
    assert resolver.known_ids() == [3, 5, 9]
    assert resolver.key_schema_ids() == {5}
    # explicit attribution wins over the name heuristic
    assert resolver.is_key_schema(5, key_schema)
    assert not resolver.is_key_schema(3, resolver.schema_for(3))


def test_resolver_warm_survives_unreachable_registry():
    resolver = RegistrySchemaResolver("http://127.0.0.1:9")
    assert resolver.warm(["t"]) is resolver  # best effort, no raise
    assert resolver.known_ids() == []


_FAKE_ENV_TYPE = (
    "struct<op:string,ts_ms:bigint,"
    "before:struct<id:bigint,event_type:string,value:double>,"
    "after:struct<id:bigint,event_type:string,value:double>,"
    "source:struct<lsn:bigint,table:string>>"
)
_FAKE_KEY_TYPE = "struct<id:bigint>"


def _stub_from_avro(monkeypatch, calls):
    """Stand-in for the JVM from_avro (the container lacks the spark-avro
    jar): records each schema it is asked to compile and yields a NULL
    struct of the right shape so the plan still analyzes end-to-end."""
    import pyspark.sql.avro.functions as avro_fns
    from pyspark.sql import functions as F

    def fake(col, schema_json, options=None):
        calls.append(json.loads(schema_json).get("name"))
        name = json.loads(schema_json).get("name")
        typ = _FAKE_KEY_TYPE if name in ("Key", "EventsKey") else _FAKE_ENV_TYPE
        return F.lit(None).cast(typ)

    monkeypatch.setattr(avro_fns, "from_avro", fake)


def _raw_frames(spark):
    return spark.createDataFrame(
        [("t", 0, 0, bytearray(b"\x00\x00\x00\x00\x01k"), bytearray(b"\x00\x00\x00\x00\x02v"))],
        "topic string, partition int, offset long, key binary, value binary",
    )


def test_cold_resolver_jvm_path_falls_back_to_pinned_schema(spark, monkeypatch):
    """An unwarmed RegistrySchemaResolver has no known ids; the JVM path
    must compile the pinned-reader-schema plan instead of an EMPTY
    multi-schema plan (which died in analysis on zero-arg coalesce in
    permissive mode, or silently nulled every envelope in strict mode)."""
    from cdc_platform_spark.sources.avro import _parse_with_from_avro

    calls: list = []
    _stub_from_avro(monkeypatch, calls)
    cold = RegistrySchemaResolver("http://127.0.0.1:9")
    df = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=True, resolver=cold
    )
    assert "decode_error" in df.columns and "op" in df.columns  # analyzed fine
    assert calls == ["Envelope", "Key"]  # pinned schemas, not a 0-decoder plan


def test_strict_multi_schema_plan_raises_on_unknown_id(spark, monkeypatch):
    """Strict (FAILFAST) JVM plan must fail the task on an unknown schema
    id — same posture as the Python fallback's KeyError — instead of
    silently emitting a null envelope."""
    from cdc_platform_spark.sources.avro import SchemaResolver, _parse_with_from_avro

    calls: list = []
    _stub_from_avro(monkeypatch, calls)
    seeded = SchemaResolver({3: AVRO_ENVELOPE_SCHEMA})
    df = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=False, resolver=seeded
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "raise_error" in plan
    # permissive keeps the quiet DLQ posture: diagnostic column, no raise
    df_p = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=True, resolver=seeded
    )
    plan_p = df_p._jdf.queryExecution().analyzed().toString()
    assert "raise_error" not in plan_p and "decode_error" in df_p.columns


def test_key_only_resolver_decodes_values_with_pinned_schema(spark, monkeypatch):
    """A resolver that only knows key-subject schemas still produces a
    valid plan: values decode with the pinned reader envelope, keys
    multi-version."""
    from cdc_platform_spark.sources.avro import SchemaResolver, _parse_with_from_avro

    key_schema = {"type": "record", "name": "EventsKey",
                  "fields": [{"name": "id", "type": "long"}]}
    calls: list = []
    _stub_from_avro(monkeypatch, calls)
    resolver = SchemaResolver({5: key_schema}, key_ids={5})
    df = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=True, resolver=resolver
    )
    assert "op" in df.columns
    assert "Envelope" in calls and "EventsKey" in calls


def test_resolver_warm_with_topic_pattern(registry):
    """Pattern-subscribed sources must warm too: warm() lists the
    registry's subjects and matches their topic part against the same
    regex Spark's subscribePattern takes."""
    url, state = registry
    state["all_versions"] = {
        "cdc.public.events-value": {
            1: {"version": 1, "id": 3, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA)},
        },
        "cdc.public.users-value": {
            1: {"version": 1, "id": 4, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA)},
        },
        "other.topic-value": {
            1: {"version": 1, "id": 9, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA)},
        },
    }
    resolver = RegistrySchemaResolver(url).warm([], topic_pattern=r"cdc\..*")
    assert resolver.known_ids() == [3, 4]  # other.topic excluded


def test_is_key_schema_union_of_attribution_and_name():
    """A seeded-but-unattributed key schema (record named 'Key') keeps its
    routing even after other ids gain explicit -key attribution."""
    from cdc_platform_spark.sources.avro import SchemaResolver

    named_key = {"type": "record", "name": "Key", "fields": []}
    env = {"type": "record", "name": "Envelope", "fields": []}
    r = SchemaResolver({5: named_key, 7: named_key, 3: env}, key_ids={5})
    assert r.is_key_schema(5, named_key)
    assert r.is_key_schema(7, named_key)  # name heuristic still applies
    assert not r.is_key_schema(3, env)


def test_strict_guard_survives_column_pruning(spark, monkeypatch):
    """The unknown-id raise must wrap EVERY decoded column: a consumer
    selecting only `after` still fails on an unknown id — attaching the
    guard to `op` alone let Catalyst prune it away."""
    from cdc_platform_spark.sources.avro import SchemaResolver, _parse_with_from_avro

    calls: list = []
    _stub_from_avro(monkeypatch, calls)
    seeded = SchemaResolver({3: AVRO_ENVELOPE_SCHEMA})
    df = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=False, resolver=seeded
    )
    pruned = df.select("after")
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan


def test_strict_guard_covers_unknown_key_ids(spark, monkeypatch):
    """Unknown KEY schema ids also fail strict mode (Python-fallback
    parity), but tombstones (null value) stay quiet."""
    from cdc_platform_spark.sources.avro import SchemaResolver, _parse_with_from_avro

    key_schema = {"type": "record", "name": "EventsKey",
                  "fields": [{"name": "id", "type": "long"}]}
    calls: list = []
    _stub_from_avro(monkeypatch, calls)
    seeded = SchemaResolver(
        {3: AVRO_ENVELOPE_SCHEMA, 5: key_schema}, key_ids={5}
    )
    df = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=False, resolver=seeded
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "raise_error" in plan
    # permissive: key-unknown surfaces as a decode_error branch, no raise
    df_p = _parse_with_from_avro(
        _raw_frames(spark), confluent_wire=True, permissive=True, resolver=seeded
    )
    plan_p = df_p._jdf.queryExecution().analyzed().toString()
    assert "raise_error" not in plan_p
    assert "unknown key schema id" in plan_p


def test_monitor_checks_new_schema_against_previous_version(registry):
    """Direction matters: the monitor must ask whether the NEW schema is a
    compatible evolution against the version we were consuming — posting
    the old schema against latest answered the wrong question (an old
    reader can ignore new required fields, so breaking bumps looked
    compatible)."""
    url, state = registry
    posts: list[str] = []
    state["subjects"]["t-value"] = {
        "version": 1, "id": 1, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    mon = SchemaRegistryMonitor(url, ["t"], mode="halt")
    orig = mon.client.check_compatibility

    def spy(subject, schema_str, version="latest"):
        posts.append((subject, json.loads(schema_str).get("name"), version))
        return orig(subject, schema_str, version=version)

    mon.client.check_compatibility = spy
    mon.poll_once()
    state["subjects"]["t-value"] = {
        "version": 2, "id": 9, "schema": '{"type":"record","name":"NewEnv","fields":[]}',
    }
    state["compatible"]["t-value"] = False
    events = mon.poll_once()
    assert events[0]["compatible"] is False and mon.incompatible_detected
    # the NEW schema was posted, against the PREVIOUS version
    assert posts == [("t-value", "NewEnv", 1)]


def test_monitor_expands_topic_pattern_per_poll(registry):
    """Pattern-subscribed pipelines have no static topic list; the monitor
    must expand the pattern against the registry's subjects on every poll
    (previously it silently monitored ZERO subjects in halt mode)."""
    url, state = registry
    state["subjects"]["orders.a-value"] = {
        "version": 1, "id": 1, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    mon = SchemaRegistryMonitor(url, [], mode="halt", topic_pattern=r"orders\..*")
    mon.poll_once()
    assert mon.known_versions == {"orders.a-value": 1}
    # a topic created AFTER the monitor started is picked up too
    state["subjects"]["orders.b-value"] = {
        "version": 1, "id": 2, "schema": json.dumps(AVRO_ENVELOPE_SCHEMA),
    }
    mon.poll_once()
    assert "orders.b-value" in mon.known_versions


def test_monitor_event_log_is_bounded():
    mon = SchemaRegistryMonitor(
        "http://127.0.0.1:9", ["t"], client=SchemaRegistryClient("http://127.0.0.1:9", timeout=0.1)
    )
    for _ in range(30):
        mon.poll_once()  # unreachable registry: check_failed events each poll
    assert len(mon.events) <= mon.MAX_EVENTS
