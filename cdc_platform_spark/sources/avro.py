"""Avro decode path for the Kafka CDC source (reference S1/S6).

The reference's Kafka consumer is registry-driven Avro: the connector
pins ``AvroConverter`` and the consumer resolves the value schema from
Schema Registry before decoding (reference streaming/consumer.py:97-110,
sources/debezium/config.py:54-58).  This engine pins the Debezium
envelope schema in code (no registry round-trip in the hot path) and
decodes the standard Confluent wire format: magic byte ``0x00`` +
4-byte big-endian schema id + Avro binary body.

Two decode paths behind one API (``parse_debezium_avro``):

- **JVM fast path** — ``pyspark.sql.avro.functions.from_avro`` with the
  pinned schema, whole-stage-codegen friendly.  Requires the
  ``spark-avro`` connector on the classpath (present on any real
  deployment; probed at analysis time).
- **Arrow-batched fallback** — a pure-Python schema-driven Avro binary
  reader inside ``mapInPandas``.  Used in environments without the
  connector jar (like this container); same output schema, verified
  byte-for-byte in tests against hand-constructed Avro.

The codec here implements the Avro 1.x binary spec for the subset the
envelope needs (null/boolean/int/long/double/string/bytes/union/record
with named-type references) — ~80 lines, no third-party dependency.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pinned schemas (the engine-side analogue of the registry subjects
# cdc.public.events-key / cdc.public.events-value)
# ---------------------------------------------------------------------------

AVRO_ROW_SCHEMA = {
    "type": "record",
    "name": "Row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "event_type", "type": ["null", "string"], "default": None},
        {"name": "value", "type": ["null", "double"], "default": None},
    ],
}

AVRO_SOURCE_SCHEMA = {
    "type": "record",
    "name": "Source",
    "fields": [
        {"name": "version", "type": "string"},
        {"name": "connector", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "snapshot", "type": ["null", "string"], "default": None},
        {"name": "db", "type": "string"},
        {"name": "schema", "type": "string"},
        {"name": "table", "type": "string"},
        {"name": "txId", "type": ["null", "long"], "default": None},
        {"name": "lsn", "type": ["null", "long"], "default": None},
    ],
}

AVRO_ENVELOPE_SCHEMA = {
    "type": "record",
    "name": "Envelope",
    "namespace": "cdc.public.events",
    "fields": [
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "before", "type": ["null", AVRO_ROW_SCHEMA], "default": None},
        {"name": "after", "type": ["null", "Row"], "default": None},
        {"name": "source", "type": AVRO_SOURCE_SCHEMA},
    ],
}

AVRO_KEY_SCHEMA = {
    "type": "record",
    "name": "Key",
    "namespace": "cdc.public.events",
    "fields": [{"name": "id", "type": "long"}],
}

AVRO_ENVELOPE_SCHEMA_JSON = json.dumps(AVRO_ENVELOPE_SCHEMA)
AVRO_KEY_SCHEMA_JSON = json.dumps(AVRO_KEY_SCHEMA)

CONFLUENT_HEADER_LEN = 5  # magic 0x00 + 4-byte schema id


# ---------------------------------------------------------------------------
# Minimal Avro binary codec (spec-compliant for the envelope's subset)
# ---------------------------------------------------------------------------


def _collect_names(schema: Any, names: dict[str, Any], enclosing_ns: str | None = None) -> None:
    """Index named types by BOTH bare name and fullname: Avro JSON may
    reference a previously-defined record either way ('Row' or
    'cdc.public.events.Row'), and registry-fetched schemas commonly use
    the fullname form.  Nested records inherit the enclosing namespace
    per the Avro spec."""
    if isinstance(schema, dict) and schema.get("type") == "record":
        ns = schema.get("namespace", enclosing_ns)
        names[schema["name"]] = schema
        if ns:
            names[f"{ns}.{schema['name']}"] = schema
        for f in schema["fields"]:
            _collect_names(f["type"], names, enclosing_ns=ns)
    elif isinstance(schema, list):
        for s in schema:
            _collect_names(s, names, enclosing_ns=enclosing_ns)


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(n: int, out: bytearray) -> None:
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _write_long(n: int, out: bytearray) -> None:
    _write_varint(_zigzag_encode(int(n)), out)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    raw, pos = _read_varint(buf, pos)
    return _zigzag_decode(raw), pos


def encode_value(schema: Any, value: Any, names: dict[str, Any] | None = None, out: bytearray | None = None) -> bytes:
    """Encode ``value`` (dicts for records, primitives otherwise) to Avro binary."""
    if names is None:
        names = {}
        _collect_names(schema, names)
    top = out is None
    if out is None:
        out = bytearray()
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: index, then value
        for idx, branch in enumerate(schema):
            branch_r = _resolve(branch, names)
            kind = branch_r if isinstance(branch_r, str) else branch_r.get("type")
            if value is None and kind == "null":
                _write_long(idx, out)
                break
            if value is not None and kind != "null":
                _write_long(idx, out)
                encode_value(branch_r, value, names, out)
                break
        else:
            raise ValueError(f"no union branch for {value!r} in {schema!r}")
        return bytes(out) if top else b""
    kind = schema if isinstance(schema, str) else schema["type"]
    if kind == "null":
        pass
    elif kind == "boolean":
        out.append(1 if value else 0)
    elif kind in ("int", "long"):
        _write_long(value, out)
    elif kind == "double":
        out += struct.pack("<d", float(value))
    elif kind in ("string", "bytes"):
        raw = value.encode("utf-8") if kind == "string" else bytes(value)
        _write_long(len(raw), out)
        out += raw
    elif kind == "record":
        for f in schema["fields"]:
            encode_value(f["type"], value[f["name"]], names, out)
    else:
        raise ValueError(f"unsupported Avro type {kind!r}")
    return bytes(out) if top else b""


def decode_value(schema: Any, buf: bytes, pos: int = 0, names: dict[str, Any] | None = None) -> tuple[Any, int]:
    """Decode Avro binary at ``pos``; returns (value, next_pos). Records
    decode to dicts keyed by field name."""
    if names is None:
        names = {}
        _collect_names(schema, names)
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        return decode_value(schema[idx], buf, pos, names)
    kind = schema if isinstance(schema, str) else schema["type"]
    if kind == "null":
        return None, pos
    if kind == "boolean":
        return bool(buf[pos]), pos + 1
    if kind in ("int", "long"):
        return _read_long(buf, pos)
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if kind == "string" else raw), pos + n
    if kind == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode_value(f["type"], buf, pos, names)
        return rec, pos
    raise ValueError(f"unsupported Avro type {kind!r}")


def confluent_frame(body: bytes, schema_id: int = 1) -> bytes:
    """Wrap an Avro body in the Confluent wire format the reference's
    AvroConverter produces: 0x00 magic + big-endian schema id + body."""
    return b"\x00" + struct.pack(">I", schema_id) + body


def confluent_body(frame: bytes) -> bytes:
    if not frame or frame[0] != 0:
        raise ValueError("not a Confluent-framed Avro message (bad magic byte)")
    return frame[CONFLUENT_HEADER_LEN:]


def confluent_schema_id(frame: bytes) -> int:
    """The 4-byte big-endian schema id inside a Confluent frame."""
    if not frame or frame[0] != 0 or len(frame) < CONFLUENT_HEADER_LEN:
        raise ValueError("not a Confluent-framed Avro message (bad magic byte)")
    return struct.unpack_from(">I", frame, 1)[0]


# ---------------------------------------------------------------------------
# Avro schema resolution (writer schema -> reader schema)
# ---------------------------------------------------------------------------

# (reader kind, writer kind) promotions the Avro spec allows.
_PROMOTIONS = frozenset(
    {
        ("long", "int"),
        ("double", "int"),
        ("double", "long"),
        ("string", "bytes"),
        ("bytes", "string"),
    }
)


def _kind(schema: Any, names: dict[str, Any]) -> Any:
    s = _resolve(schema, names)
    if isinstance(s, list):
        return "union"
    return s if isinstance(s, str) else s["type"]


def decode_resolved(
    writer: Any,
    reader: Any,
    buf: bytes,
    pos: int = 0,
    wnames: dict[str, Any] | None = None,
    rnames: dict[str, Any] | None = None,
) -> tuple[Any, int]:
    """Decode Avro binary written with ``writer`` into the shape of
    ``reader`` per the Avro spec's schema-resolution rules (the subset the
    envelope needs): writer-only fields are read and discarded, reader-only
    fields take their declared defaults, unions resolve by branch kind, and
    int->long / int,long->double / string<->bytes promote.

    This is what the reference consumer gets from Schema Registry's
    writer-schema lookup (reference streaming/consumer.py:97-110): a topic
    can carry multiple envelope versions mid-stream and every frame still
    decodes to the one reader shape the pipeline compiles against.
    """
    if wnames is None:
        wnames = {}
        _collect_names(writer, wnames)
    if rnames is None:
        rnames = {}
        _collect_names(reader, rnames)
    writer = _resolve(writer, wnames)
    reader = _resolve(reader, rnames)
    if isinstance(writer, list):  # writer union: index picks the branch
        idx, pos = _read_long(buf, pos)
        return decode_resolved(writer[idx], reader, buf, pos, wnames, rnames)
    wkind = writer if isinstance(writer, str) else writer["type"]
    if isinstance(reader, list):  # reader union: first branch that accepts
        for branch in reader:
            bkind = _kind(branch, rnames)
            if bkind == wkind or (bkind, wkind) in _PROMOTIONS:
                return decode_resolved(
                    writer, _resolve(branch, rnames), buf, pos, wnames, rnames
                )
        raise ValueError(f"no reader union branch accepts writer type {wkind!r}")
    rkind = reader if isinstance(reader, str) else reader["type"]
    if wkind == "record" and rkind == "record":
        rfields = {f["name"]: f for f in reader["fields"]}
        wfield_names = {f["name"] for f in writer["fields"]}
        rec: dict[str, Any] = {}
        for wf in writer["fields"]:
            if wf["name"] in rfields:
                rec[wf["name"]], pos = decode_resolved(
                    wf["type"], rfields[wf["name"]]["type"], buf, pos, wnames, rnames
                )
            else:  # writer-only field: skip over its bytes
                _, pos = decode_value(wf["type"], buf, pos, wnames)
        for rf in reader["fields"]:
            if rf["name"] not in wfield_names:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} absent from writer and has no default"
                    )
                rec[rf["name"]] = rf["default"]
        return rec, pos
    if wkind == rkind:
        return decode_value(writer, buf, pos, wnames)
    if (rkind, wkind) in _PROMOTIONS:
        value, pos = decode_value(writer, buf, pos, wnames)
        if rkind == "double":
            return float(value), pos
        if rkind == "string" and isinstance(value, bytes):
            return value.decode("utf-8"), pos
        if rkind == "bytes" and isinstance(value, str):
            return value.encode("utf-8"), pos
        return value, pos  # int -> long
    raise ValueError(f"cannot resolve writer type {wkind!r} to reader type {rkind!r}")


class SchemaResolver:
    """Pluggable schema-id -> writer-schema map (Confluent id space).

    The offline-testable stand-in for a live Schema Registry client: the
    reference consumer resolves the writer schema per message from the
    registry (reference streaming/consumer.py:97-110, sources/debezium/
    config.py:54-58); deployments with registry access can subclass and
    override ``schema_for`` to fetch + memoize over HTTP (see
    ``observability.SchemaRegistryClient`` for the transport).  Instances
    are broadcast into Arrow-batch workers, so they must stay picklable.
    """

    def __init__(self, schemas: dict[int, Any], key_ids: set[int] | None = None):
        self._schemas = dict(schemas)
        # Explicit key-subject schema ids.  When provided, key-vs-envelope
        # routing uses these instead of the record-name heuristic ("Key"),
        # which breaks for registries whose key record has another name.
        self._key_ids: set[int] = set(key_ids or ())

    def schema_for(self, schema_id: int) -> Any:
        try:
            return self._schemas[schema_id]
        except KeyError:
            raise KeyError(f"unknown schema id {schema_id}") from None

    def known_ids(self) -> list[int]:
        return sorted(self._schemas)

    def key_schema_ids(self) -> set[int]:
        """Schema ids registered under a ``-key`` subject.

        Empty when the resolver was seeded without key/value attribution;
        callers then fall back to the record-name heuristic."""
        return set(self._key_ids)

    def is_key_schema(self, schema_id: int, schema: Any) -> bool:
        # Union of explicit attribution and the record-name heuristic: a
        # seeded-but-unattributed key schema (record named 'Key') must not
        # lose its routing just because OTHER ids gained -key attribution
        # (e.g. after RegistrySchemaResolver.warm ran).
        if schema_id in self._key_ids:
            return True
        return isinstance(schema, dict) and schema.get("name") == "Key"


class RegistrySchemaResolver(SchemaResolver):
    """SchemaResolver backed by a live Schema Registry: unknown ids are
    fetched via ``GET /schemas/ids/{id}`` and memoized — exactly the
    reference consumer's per-message writer-schema lookup (reference
    streaming/consumer.py:97-110), minus the round-trip after the first
    frame of each version.

    ``known_ids`` still reports only the memoized ids: the JVM multi-schema
    path compiles one ``from_avro`` per known id, so warm the cache (or
    seed the map) before building the plan; the Python path fetches lazily
    inside the Arrow batch worker."""

    def __init__(
        self,
        registry_url: str,
        seed: dict[int, Any] | None = None,
        key_ids: set[int] | None = None,
    ):
        super().__init__(seed or {}, key_ids=key_ids)
        self.registry_url = registry_url

    def schema_for(self, schema_id: int) -> Any:
        try:
            return super().schema_for(schema_id)
        except KeyError:
            from cdc_platform_spark.observability import SchemaRegistryClient

            schema_str = SchemaRegistryClient(self.registry_url).schema_by_id(schema_id)
            if schema_str is None:
                raise KeyError(f"unknown schema id {schema_id}") from None
            schema = json.loads(schema_str)
            self._schemas[schema_id] = schema
            return schema

    def warm(
        self, topics: list[str], topic_pattern: str | None = None
    ) -> "RegistrySchemaResolver":
        """Fetch and memoize every registered version of each topic's
        ``-key``/``-value`` subject so ``known_ids()`` is populated BEFORE
        the JVM multi-schema plan is built (the plan compiles one
        ``from_avro`` per known id; a cold resolver would otherwise produce
        an empty plan — see ``_parse_with_from_avro``'s pinned-schema
        fallback for the cold-cache guard).

        Subject suffix also resolves key-vs-envelope routing explicitly:
        ids seen under ``-key`` go to ``key_schema_ids()``, replacing the
        record-name heuristic.  Unreachable registry / absent subjects are
        skipped (best effort); returns self for chaining.

        ``topic_pattern`` (a Java/Python-compatible regex, the same string
        Spark's ``subscribePattern`` takes) warms every registered subject
        whose topic part matches — pattern-subscribed sources would
        otherwise stay permanently cold."""
        import re

        from cdc_platform_spark.observability import SchemaRegistryClient

        client = SchemaRegistryClient(self.registry_url)
        topics = list(topics)
        if topic_pattern:
            try:
                pat = re.compile(topic_pattern)
                for subject in client.subjects():
                    for suffix in ("-key", "-value"):
                        if subject.endswith(suffix):
                            t = subject[: -len(suffix)]
                            if pat.fullmatch(t) and t not in topics:
                                topics.append(t)
            except Exception:  # noqa: BLE001 — registry unreachable: stay lazy
                pass
        for topic in topics:
            for suffix in ("-key", "-value"):
                subject = topic + suffix
                try:
                    versions = client.versions(subject)
                except Exception:  # noqa: BLE001 — registry unreachable: stay lazy
                    continue
                for v in versions:
                    try:
                        data = client.version(subject, v)
                    except Exception:  # noqa: BLE001
                        continue
                    if not data or "id" not in data or not data.get("schema"):
                        continue
                    sid = int(data["id"])
                    try:
                        self._schemas[sid] = json.loads(data["schema"])
                    except ValueError:
                        continue
                    if suffix == "-key":
                        self._key_ids.add(sid)
        return self


# ---------------------------------------------------------------------------
# Spark decode paths
# ---------------------------------------------------------------------------

_PARSED_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("pk", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("lsn", T.LongType()),
        T.StructField("source_table", T.StringType()),
    ]
)

# permissive mode appends the reference's poison-message diagnostic: the
# undecodable frame survives as (null envelope fields + error string) so the
# pipeline can route it to the DLQ instead of failing the micro-batch
_PARSED_SCHEMA_PERMISSIVE = T.StructType(
    _PARSED_SCHEMA.fields + [T.StructField("decode_error", T.StringType())]
)


_AVRO_PROBE_CACHE: dict[str, bool] = {}


def spark_avro_usable(spark) -> bool:
    """True when the spark-avro connector is on the classpath (probe: analyze
    a zero-row from_avro plan; AnalysisException means the jar is absent).
    Memoized per session — the classpath cannot change mid-session and this
    runs on the per-micro-batch hot path."""
    key = spark.sparkContext.applicationId
    if key in _AVRO_PROBE_CACHE:
        return _AVRO_PROBE_CACHE[key]
    try:
        from pyspark.sql.avro.functions import from_avro

        spark.range(0).select(
            from_avro(F.lit(b"").cast("binary"), AVRO_KEY_SCHEMA_JSON)
        ).schema
        usable = True
    except Exception:
        usable = False
    _AVRO_PROBE_CACHE[key] = usable
    return usable


def _schema_id_expr(col: str) -> F.Column:
    """Big-endian uint32 at bytes [2,5] of a Confluent frame, JVM-side.

    NULL for malformed frames (wrong magic byte or shorter than the
    5-byte header): ``substring`` would otherwise parse whatever bytes
    are available into a WRONG — possibly registered — schema id (e.g. a
    2-byte frame b'\\x00\\x01' would alias to id 1), silently routing the
    frame to the wrong decoder.  A NULL id is treated as unknown by the
    multi-schema guards, so malformed frames surface as poison instead."""
    c = F.col(col)
    valid = (F.length(c) >= CONFLUENT_HEADER_LEN) & (
        F.substring(c, 1, 1) == F.lit(b"\x00")
    )
    return F.when(
        valid, F.expr(f"cast(conv(hex(substring({col}, 2, 4)), 16, 10) as long)")
    )


def _parse_with_from_avro(
    frames: DataFrame,
    confluent_wire: bool,
    permissive: bool = False,
    resolver: SchemaResolver | None = None,
) -> DataFrame:
    """JVM decode: from_avro on the (unframed) body. Codegen-friendly —
    this is the 100 TB hot path on a real deployment.

    With a ``resolver``, the Confluent frame's schema id routes each row to
    the matching writer-schema ``from_avro`` (body masked to null for other
    ids — from_avro(null) is null, so each decoder only sees its own
    frames) and the per-version structs are projected onto the one reader
    shape; rows with unknown ids keep a null envelope and are DLQ-routed in
    permissive mode.

    ``permissive`` maps to from_avro's PERMISSIVE mode (undecodable frames
    become null structs instead of failing the task, mirroring the Python
    fallback's poison-frame posture); the default is from_avro's own
    FAILFAST."""
    from pyspark.sql.avro.functions import from_avro

    body = (
        F.expr(f"substring(value, {CONFLUENT_HEADER_LEN + 1}, 2147483647)")
        if confluent_wire
        else F.col("value")
    )
    key_body = (
        F.expr(f"substring(key, {CONFLUENT_HEADER_LEN + 1}, 2147483647)")
        if confluent_wire
        else F.col("key")
    )
    options = {"mode": "PERMISSIVE"} if permissive else {}
    if resolver is not None and confluent_wire and resolver.known_ids():
        # Multi-schema routing needs the id->schema map at PLAN time (one
        # from_avro per known id).  A cold resolver (e.g. an unwarmed
        # RegistrySchemaResolver — its cache fills lazily) has no ids, so
        # it falls through to the pinned-schema decode below instead of
        # compiling an empty plan (zero-arg coalesce / all-null envelopes).
        return _parse_multi_schema_from_avro(
            frames, body, key_body, options, permissive, resolver
        )
    v = from_avro(body, AVRO_ENVELOPE_SCHEMA_JSON, options)
    k = from_avro(key_body, AVRO_KEY_SCHEMA_JSON, options)
    cols = [
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        k["id"].alias("pk"),
        v["op"].alias("op"),
        v["ts_ms"].alias("ts_ms"),
        v["before"].alias("before"),
        v["after"].alias("after"),
        v["source"]["lsn"].alias("lsn"),
        v["source"]["table"].alias("source_table"),
    ]
    if permissive:
        # PERMISSIVE from_avro yields a null struct for a poison frame; a
        # tombstone (null Kafka value) also has a null envelope but is a
        # normal stream condition, so only non-null-value failures carry
        # the diagnostic
        cols.append(
            F.when(
                v["op"].isNull() & F.col("value").isNotNull(), F.lit("decode failed")
            )
            .cast("string")
            .alias("decode_error")
        )
    else:
        # strict mode fails the task on poison, so the column is always
        # null — but it must EXIST so every decode path (JSON, Avro
        # permissive, Avro strict) shares one output schema
        cols.append(F.lit(None).cast("string").alias("decode_error"))
    return frames.select(*cols)


def _writer_source_has(env_schema: Any, sub: str) -> bool:
    """True when the writer envelope's ``source`` record carries ``sub``.

    Guarding only on the top-level ``source`` field is not enough: a
    MySQL/Mongo-connector envelope HAS a source record but no ``lsn``
    sub-field, and accessing a missing struct field is a plan-time
    AnalysisException."""
    names: dict[str, Any] = {}
    _collect_names(env_schema, names)
    for f in env_schema.get("fields", []):
        if f["name"] == "source":
            t = f["type"]
            for b in t if isinstance(t, list) else [t]:
                b = _resolve(b, names)
                if isinstance(b, dict) and b.get("type") == "record":
                    return any(sf["name"] == sub for sf in b["fields"])
    return False


def _writer_row_schema(env_schema: Any, field: str) -> Any | None:
    """The writer's Row record for envelope field ``before``/``after`` (or
    None when the writer envelope lacks the field entirely)."""
    names: dict[str, Any] = {}
    _collect_names(env_schema, names)
    for f in env_schema.get("fields", []):
        if f["name"] == field:
            t = f["type"]
            branches = t if isinstance(t, list) else [t]
            for b in branches:
                b = _resolve(b, names)
                if isinstance(b, dict) and b.get("type") == "record":
                    return b
    return None


def _parse_multi_schema_from_avro(
    frames: DataFrame,
    body: F.Column,
    key_body: F.Column,
    options: dict,
    permissive: bool,
    resolver: SchemaResolver,
) -> DataFrame:
    """Schema-id-routed JVM decode: one ``from_avro`` per registered writer
    schema, each fed only its own frames (body masked to null otherwise),
    projected onto the pinned reader shape and coalesced. Stays a single
    narrow select — no shuffle, no branching into separate scans — so the
    multi-version topic costs one pass exactly like the pinned-schema path.
    """
    from pyspark.sql.avro.functions import from_avro

    sid_v = _schema_id_expr("value")
    sid_k = _schema_id_expr("key")
    env_versions: list[tuple[int, Any]] = []
    key_versions: list[tuple[int, Any]] = []
    for sid in resolver.known_ids():
        schema = resolver.schema_for(sid)
        # Routing prefers explicit -key subject attribution (set by
        # RegistrySchemaResolver.warm / SchemaResolver(key_ids=...)); the
        # record-name heuristic only backs up unattributed seeds.
        target = key_versions if resolver.is_key_schema(sid, schema) else env_versions
        target.append((sid, schema))
    reader_row_fields = (("id", "long"), ("event_type", "string"), ("value", "double"))

    def project_row(struct_col: F.Column, writer_row: Any | None) -> F.Column:
        """Writer-version Row struct -> reader Row shape (missing fields null)."""
        have = {f["name"] for f in writer_row["fields"]} if writer_row else set()
        cols = [
            (struct_col[n].cast(t) if n in have else F.lit(None).cast(t)).alias(n)
            for n, t in reader_row_fields
        ]
        return F.when(struct_col.isNotNull(), F.struct(*cols))

    # (sid, from_avro struct, writer schema) per envelope version; a
    # registry knowing only key schemas has no envelope version to route
    # on, so values decode with the pinned reader schema (keys stay
    # multi-version)
    if env_versions:
        decoded = [
            (sid, from_avro(F.when(sid_v == sid, body), json.dumps(schema), options), schema)
            for sid, schema in env_versions
        ]
    else:
        decoded = [
            (None, from_avro(body, AVRO_ENVELOPE_SCHEMA_JSON, options), AVRO_ENVELOPE_SCHEMA)
        ]

    def env_field(getter) -> F.Column:
        exprs = [e for e in (getter(v, s) for _, v, s in decoded) if e is not None]
        return F.coalesce(*exprs) if exprs else F.lit(None)

    def top(v, s, name, typ):
        return v[name].cast(typ) if any(f["name"] == name for f in s["fields"]) else None

    key_exprs = []
    for sid, schema in key_versions or [(None, AVRO_KEY_SCHEMA)]:
        masked = (
            F.when(sid_k == sid, key_body) if sid is not None else key_body
        )
        key_exprs.append(from_avro(masked, json.dumps(schema), options)["id"].cast("long"))

    known_env_ids = [s for s, _ in env_versions]
    known_key_ids = [s for s, _ in key_versions]
    # NULL-safe unknowns: a malformed frame gives a NULL schema id (see
    # _schema_id_expr), and `~NULL.isin(...)` is NULL — which would fall
    # straight through F.when and silently emit a null envelope in strict
    # mode. Treat a NULL id as unknown explicitly.
    unknown_id = (
        F.col("value").isNotNull() & (sid_v.isNull() | ~sid_v.isin(*known_env_ids))
        if known_env_ids
        else F.lit(False)  # pinned fallback: no id space to be unknown in
    )
    # value.isNotNull() keeps tombstones quiet: the Python fallback
    # swallows key-decode errors on the tombstone branch (null value is a
    # normal stream condition), raising/diagnosing only for data rows.
    unknown_key_id = (
        F.col("key").isNotNull()
        & F.col("value").isNotNull()
        & (sid_k.isNull() | ~sid_k.isin(*known_key_ids))
        if known_key_ids
        else F.lit(False)
    )

    def sid_text(sid: F.Column) -> F.Column:
        # never NULL (a NULL message would make raise_error/decode_error
        # themselves NULL and hide the poison row)
        return F.coalesce(sid.cast("string"), F.lit("<malformed frame>"))

    def strict_guard(expr: F.Column) -> F.Column:
        """Strict semantics must match the Python fallback: an unknown
        schema id (value OR key) FAILS THE TASK (KeyError there).  The
        guard wraps EVERY decoded output column — attaching it to one
        column only would let Catalyst column-pruning eliminate it for
        consumers that never read that column, silently reproducing the
        null-envelope data loss it exists to prevent."""
        if permissive or (not known_env_ids and not known_key_ids):
            return expr
        bad_sid = F.when(unknown_id, sid_text(sid_v)).otherwise(sid_text(sid_k))
        return F.when(
            unknown_id | unknown_key_id,
            F.raise_error(F.concat(F.lit("unknown schema id "), bad_sid)),
        ).otherwise(expr)

    cols = [
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        strict_guard(F.coalesce(*key_exprs)).alias("pk"),
        strict_guard(env_field(lambda v, s: top(v, s, "op", "string"))).alias("op"),
        strict_guard(env_field(lambda v, s: top(v, s, "ts_ms", "long"))).alias("ts_ms"),
        strict_guard(
            env_field(
                lambda v, s: project_row(v["before"], _writer_row_schema(s, "before"))
                if any(f["name"] == "before" for f in s["fields"])
                else None
            )
        ).alias("before"),
        strict_guard(
            env_field(
                lambda v, s: project_row(v["after"], _writer_row_schema(s, "after"))
                if any(f["name"] == "after" for f in s["fields"])
                else None
            )
        ).alias("after"),
        strict_guard(
            env_field(
                lambda v, s: v["source"]["lsn"].cast("long")
                if _writer_source_has(s, "lsn")
                else None
            )
        ).alias("lsn"),
        strict_guard(
            env_field(
                lambda v, s: v["source"]["table"].cast("string")
                if _writer_source_has(s, "table")
                else None
            )
        ).alias("source_table"),
    ]
    if permissive:
        # Key-poison rows keep their decoded value fields here (the Python
        # fallback nulls the whole envelope because its key decode fails
        # first) — same DLQ routing via decode_error, strictly more
        # information retained.
        cols.append(
            F.when(
                unknown_id,
                F.concat(F.lit("unknown schema id "), sid_text(sid_v)),
            )
            .when(
                unknown_key_id,
                F.concat(F.lit("unknown key schema id "), sid_text(sid_k)),
            )
            .when(
                # op presence must be guarded per writer version (env_field/
                # top semantics): a registered envelope without a top-level
                # 'op' would otherwise crash this expression at plan time
                F.col("value").isNotNull()
                & env_field(lambda v, s: top(v, s, "op", "string")).isNull(),
                F.lit("decode failed"),
            )
            .cast("string")
            .alias("decode_error")
        )
    else:
        cols.append(F.lit(None).cast("string").alias("decode_error"))
    return frames.select(*cols)


def _parse_with_python(
    frames: DataFrame,
    confluent_wire: bool,
    permissive: bool,
    resolver: SchemaResolver | None = None,
) -> DataFrame:
    """Arrow-batched fallback decode (container path): the pure-Python codec
    inside mapInPandas. Batch-at-a-time, no per-row Python round trips
    through the JVM.

    With a ``resolver``, each frame's Confluent schema id selects the
    writer schema and ``decode_resolved`` projects it onto the pinned
    reader envelope; unknown ids are poison frames (permissive -> DLQ
    diagnostic, strict -> task failure)."""
    env_schema = AVRO_ENVELOPE_SCHEMA
    key_schema = AVRO_KEY_SCHEMA

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        env_names: dict[str, Any] = {}
        _collect_names(env_schema, env_names)

        def decode_frame(frame: bytes, reader: Any, is_key: bool = False) -> Any:
            """One frame -> reader-shaped value, honoring the schema id."""
            if not confluent_wire:
                return decode_value(reader, frame)[0]
            body = confluent_body(frame)
            if resolver is None or (is_key and not resolver.key_schema_ids()):
                # JVM parity: with no key-subject attribution the JVM path
                # decodes keys with the PINNED reader schema (key_versions
                # empty) — consulting the resolver here would KeyError on
                # every key frame for an envelope-only-seeded resolver,
                # poisoning 100% of rows on this path only.
                names = env_names if reader is env_schema else None
                return decode_value(reader, body, names=names)[0]
            writer = resolver.schema_for(confluent_schema_id(frame))
            return decode_resolved(writer, reader, body)[0]
        cols = [
            "topic", "partition", "offset", "pk", "op", "ts_ms",
            "before", "after", "lsn", "source_table", "decode_error",
        ]
        for pdf in batches:
            rows = []
            for topic, partition, offset, key, value in zip(
                pdf["topic"], pdf["partition"], pdf["offset"], pdf["key"], pdf["value"]
            ):
                row = {
                    "topic": topic,
                    "partition": int(partition),
                    "offset": int(offset),
                    "pk": None,
                    "op": None,
                    "ts_ms": None,
                    "before": None,
                    "after": None,
                    "lsn": None,
                    "source_table": None,
                    "decode_error": None,
                }
                if value is None:
                    # Debezium tombstone (null value after a delete, for log
                    # compaction): a normal stream condition, not a poison
                    # frame — keep the quiet null-envelope row the JSON path
                    # produces, with the key's pk when decodable
                    try:
                        if key is not None:
                            row["pk"] = decode_frame(bytes(key), key_schema, is_key=True)["id"]
                    except Exception:  # noqa: BLE001
                        pass
                    if permissive:
                        row["decode_error"] = None
                    rows.append(row)
                    continue
                try:
                    # key first: a value-poison frame keeps its decodable pk
                    # so the DLQ row stays key-routable (reference posture).
                    # A NULL key on a data row is legal (keyless producer /
                    # table without a primary key): pk stays null, exactly
                    # like the JVM (from_avro(null) -> null) and JSON paths
                    # — bytes(None) would otherwise poison a decodable row.
                    if key is not None:
                        row["pk"] = decode_frame(bytes(key), key_schema, is_key=True)["id"]
                    v = decode_frame(bytes(value), env_schema)
                    row.update(
                        op=v["op"],
                        ts_ms=v["ts_ms"],
                        before=v["before"],
                        after=v["after"],
                        lsn=v["source"]["lsn"],
                        source_table=v["source"]["table"],
                    )
                    if permissive:
                        row["decode_error"] = None
                except Exception as e:  # noqa: BLE001 — poison frame
                    if not permissive:
                        raise
                    row["decode_error"] = f"{type(e).__name__}: {e}"[:500]
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return frames.mapInPandas(decode_batches, schema=_PARSED_SCHEMA_PERMISSIVE)


def parse_debezium_avro(
    frames: DataFrame,
    confluent_wire: bool = True,
    permissive: bool = False,
    resolver: SchemaResolver | None = None,
) -> DataFrame:
    """Raw Kafka binary records (topic, partition, offset, key, value) ->
    parsed envelope, schema-identical to ``debezium.parse_debezium``'s JSON
    output, so ``to_flat_envelope`` and every sink compose unchanged.

    Decodes the reference's actual wire format (registry-framed Avro);
    prefers the JVM ``from_avro`` decoder when the connector jar is
    present, else the Arrow-batched Python codec.

    ``permissive=True`` keeps undecodable frames as rows with null envelope
    fields and a ``decode_error`` diagnostic (from_json PERMISSIVE-mode
    semantics) so the pipeline quarantines poison messages via the DLQ
    instead of failing the micro-batch — the reference's poison-message
    posture (P7)."""
    if spark_avro_usable(frames.sparkSession):
        return _parse_with_from_avro(frames, confluent_wire, permissive, resolver)
    return _parse_with_python(frames, confluent_wire, permissive, resolver)
