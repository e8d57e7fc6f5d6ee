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


def _collect_names(schema: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, dict) and schema.get("type") == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            _collect_names(f["type"], names)
    elif isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)


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


def _parse_with_from_avro(
    frames: DataFrame, confluent_wire: bool, permissive: bool = False
) -> DataFrame:
    """JVM decode: from_avro on the (unframed) body. Codegen-friendly —
    this is the 100 TB hot path on a real deployment.

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
    return frames.select(*cols)


def _parse_with_python(frames: DataFrame, confluent_wire: bool, permissive: bool) -> DataFrame:
    """Arrow-batched fallback decode (container path): the pure-Python codec
    inside mapInPandas. Batch-at-a-time, no per-row Python round trips
    through the JVM."""
    env_schema = AVRO_ENVELOPE_SCHEMA
    key_schema = AVRO_KEY_SCHEMA

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        env_names: dict[str, Any] = {}
        _collect_names(env_schema, env_names)
        cols = [
            "topic", "partition", "offset", "pk", "op", "ts_ms",
            "before", "after", "lsn", "source_table",
        ] + (["decode_error"] if permissive else [])
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
                }
                if value is None:
                    # Debezium tombstone (null value after a delete, for log
                    # compaction): a normal stream condition, not a poison
                    # frame — keep the quiet null-envelope row the JSON path
                    # produces, with the key's pk when decodable
                    try:
                        if key is not None:
                            kbody = (
                                confluent_body(bytes(key)) if confluent_wire else bytes(key)
                            )
                            row["pk"] = decode_value(key_schema, kbody)[0]["id"]
                    except Exception:  # noqa: BLE001
                        pass
                    if permissive:
                        row["decode_error"] = None
                    rows.append(row)
                    continue
                try:
                    kbody = confluent_body(bytes(key)) if confluent_wire else bytes(key)
                    vbody = confluent_body(bytes(value)) if confluent_wire else bytes(value)
                    k, _ = decode_value(key_schema, kbody)
                    v, _ = decode_value(env_schema, vbody, names=env_names)
                    row.update(
                        pk=k["id"],
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

    schema = _PARSED_SCHEMA_PERMISSIVE if permissive else _PARSED_SCHEMA
    return frames.mapInPandas(decode_batches, schema=schema)


def parse_debezium_avro(
    frames: DataFrame, confluent_wire: bool = True, permissive: bool = False
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
        return _parse_with_from_avro(frames, confluent_wire, permissive)
    return _parse_with_python(frames, confluent_wire, permissive)
