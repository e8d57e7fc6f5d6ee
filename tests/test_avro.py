"""Avro decode path (ref S1/S6: registry-framed Avro Kafka values).

Tier-1 codec tests pin the binary format against HAND-CONSTRUCTED byte
strings (independent of our own encoder), then the Spark path decodes
encoder-produced frames end-to-end. The full identity roundtrip against
the DuckDB oracle is the registry query q51_avro_envelope_roundtrip.
"""

from __future__ import annotations

import struct

import pytest

from cdc_platform_spark.sources.avro import (
    AVRO_ENVELOPE_SCHEMA,
    AVRO_KEY_SCHEMA,
    confluent_body,
    confluent_frame,
    decode_value,
    encode_value,
    parse_debezium_avro,
    spark_avro_usable,
)


def test_long_encoding_known_bytes():
    # Avro spec: zigzag + base-128 varint, little-endian groups
    assert encode_value("long", 5) == b"\x0a"
    assert encode_value("long", -3) == b"\x05"
    assert encode_value("long", 0) == b"\x00"
    assert encode_value("long", 64) == b"\x80\x01"
    assert decode_value("long", b"\x0a")[0] == 5
    assert decode_value("long", b"\x05")[0] == -3
    assert decode_value("long", b"\x80\x01")[0] == 64


def test_key_record_known_bytes():
    # record {id: long} for id=5 is exactly the long encoding
    assert encode_value(AVRO_KEY_SCHEMA, {"id": 5}) == b"\x0a"
    assert decode_value(AVRO_KEY_SCHEMA, b"\x0a")[0] == {"id": 5}


def test_string_union_double_known_bytes():
    # string "c": length 1 (zigzag 2) + utf8
    assert encode_value("string", "c") == b"\x02c"
    # union ["null","string"]: branch index then value; null is index 0
    assert encode_value(["null", "string"], None) == b"\x00"
    assert encode_value(["null", "string"], "ab") == b"\x02\x04ab"
    assert decode_value(["null", "string"], b"\x00")[0] is None
    assert decode_value(["null", "string"], b"\x02\x04ab")[0] == "ab"
    # double: 8-byte IEEE little-endian
    assert encode_value("double", 1.5) == struct.pack("<d", 1.5)


def test_roundtrip_tricky_values():
    vals = [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 1234567890123456789]
    for v in vals:
        assert decode_value("long", encode_value("long", v))[0] == v
    env = {
        "op": "u",
        "ts_ms": 1700000000123,
        "before": {"id": 7, "event_type": None, "value": -0.0},
        "after": {"id": 7, "event_type": "purchase", "value": 3.25},
        "source": {
            "version": "2.5",
            "connector": "postgresql",
            "name": "cdc",
            "ts_ms": 1700000000123,
            "snapshot": None,
            "db": "app",
            "schema": "public",
            "table": "users",
            "txId": None,
            "lsn": 991,
        },
    }
    got, pos = decode_value(AVRO_ENVELOPE_SCHEMA, encode_value(AVRO_ENVELOPE_SCHEMA, env))
    assert got == env
    assert pos == len(encode_value(AVRO_ENVELOPE_SCHEMA, env))  # consumed exactly


def test_confluent_framing():
    body = encode_value(AVRO_KEY_SCHEMA, {"id": 42})
    frame = confluent_frame(body, schema_id=17)
    assert frame[0] == 0
    assert struct.unpack(">I", frame[1:5])[0] == 17
    assert confluent_body(frame) == body
    with pytest.raises(ValueError):
        confluent_body(b"\x01junk")


def test_parse_debezium_avro_spark_path(spark):
    """Spark decode (the container's Arrow-batched fallback; from_avro on a
    real deployment) must produce the same schema as the JSON parser and
    the right values for framed messages."""
    assert spark_avro_usable(spark) in (True, False)  # probe never raises
    envs = []
    for i, op in [(1, "c"), (2, "u"), (3, "d")]:
        img = {"id": i, "event_type": "purchase", "value": float(i) * 1.5}
        envs.append(
            (
                "cdc.public.users",
                i % 8,
                100 + i,
                bytearray(confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": i}))),
                bytearray(
                    confluent_frame(
                        encode_value(
                            AVRO_ENVELOPE_SCHEMA,
                            {
                                "op": op,
                                "ts_ms": 1700000000000 + i,
                                "before": None if op == "c" else img,
                                "after": None if op == "d" else img,
                                "source": {
                                    "version": "2.5",
                                    "connector": "postgresql",
                                    "name": "cdc",
                                    "ts_ms": 1700000000000 + i,
                                    "snapshot": "false",
                                    "db": "app",
                                    "schema": "public",
                                    "table": "users",
                                    "txId": i,
                                    "lsn": 1000 + i,
                                },
                            },
                        )
                    )
                ),
            )
        )
    frames = spark.createDataFrame(
        envs, "topic string, partition int, offset long, key binary, value binary"
    )
    parsed = parse_debezium_avro(frames, confluent_wire=True).orderBy("offset")
    rows = parsed.collect()
    assert [r["pk"] for r in rows] == [1, 2, 3]
    assert [r["op"] for r in rows] == ["c", "u", "d"]
    assert [r["lsn"] for r in rows] == [1001, 1002, 1003]
    assert rows[0]["before"] is None and rows[0]["after"]["value"] == 1.5
    assert rows[2]["after"] is None and rows[2]["before"]["id"] == 3
    assert [r["source_table"] for r in rows] == ["users", "users", "users"]
    # schema parity with the JSON parser keeps every sink downstream unchanged
    from cdc_platform_spark.sources.debezium import parse_debezium

    json_frames = spark.createDataFrame(
        [("t", 0, 1, '{"id": 1}', '{"op":"c","ts_ms":1}')],
        "topic string, partition int, offset long, key_json string, value_json string",
    )
    assert [f.name for f in parsed.schema.fields] == [
        f.name for f in parse_debezium(json_frames).schema.fields
    ]


def test_permissive_decode_quarantines_poison_frames(spark):
    """Poison-message posture (ref P7): a frame that fails Avro decode
    survives permissive parsing as a null-enveloped row with a
    decode_error diagnostic (DLQ-routable); strict mode fails the batch."""
    good_val = confluent_frame(
        encode_value(
            AVRO_ENVELOPE_SCHEMA,
            {
                "op": "c",
                "ts_ms": 1700000000001,
                "before": None,
                "after": {"id": 1, "event_type": "signup", "value": 1.0},
                "source": {
                    "version": "2.5", "connector": "postgresql", "name": "cdc",
                    "ts_ms": 1700000000001, "snapshot": "false", "db": "app",
                    "schema": "public", "table": "users", "txId": 1, "lsn": 11,
                },
            },
        )
    )
    good_key = confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 1}))
    frames = spark.createDataFrame(
        [
            ("t", 0, 1, bytearray(good_key), bytearray(good_val)),
            ("t", 0, 2, bytearray(good_key), bytearray(b"\x01garbage-no-magic")),
        ],
        "topic string, partition int, offset long, key binary, value binary",
    )
    rows = parse_debezium_avro(frames, permissive=True).orderBy("offset").collect()
    assert rows[0]["decode_error"] is None and rows[0]["pk"] == 1
    assert rows[1]["decode_error"] is not None and rows[1]["op"] is None
    assert rows[1]["offset"] == 2  # coordinates survive for DLQ routing

    with pytest.raises(Exception):
        parse_debezium_avro(frames, permissive=False).collect()


def test_kafka_envelope_avro_composition(spark):
    """The Avro decode chain composes into the flat engine envelope the
    sinks consume; decode_error travels along in permissive mode."""
    from cdc_platform_spark.sources.kafka import kafka_envelope_avro

    val = confluent_frame(
        encode_value(
            AVRO_ENVELOPE_SCHEMA,
            {
                "op": "r",  # snapshot read normalizes to 'c'
                "ts_ms": 1700000000002,
                "before": None,
                "after": {"id": 9, "event_type": "signup", "value": 2.0},
                "source": {
                    "version": "2.5", "connector": "postgresql", "name": "cdc",
                    "ts_ms": 1700000000002, "snapshot": "true", "db": "app",
                    "schema": "public", "table": "users", "txId": 2, "lsn": 22,
                },
            },
        )
    )
    key = confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 9}))
    frames = spark.createDataFrame(
        [("cdc.public.users", 1, 5, bytearray(key), bytearray(val))],
        "topic string, partition int, offset long, key binary, value binary",
    )
    out = kafka_envelope_avro(frames).collect()
    assert len(out) == 1
    r = out[0]
    assert r["op"] == "c" and r["pk"] == 9 and r["value"] == 2.0
    assert r["decode_error"] is None
    assert {"seq", "topic", "partition", "offset", "op", "pk", "event_type", "value"} <= set(
        out[0].asDict()
    )


def test_avro_codec_roundtrip_property():
    """Property: encode->decode is the identity for arbitrary envelope
    values (hypothesis over ops, nulls, extreme longs, unicode strings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    longs = st.integers(min_value=-(2**62), max_value=2**62)
    opt_str = st.one_of(st.none(), st.text(max_size=20))
    opt_long = st.one_of(st.none(), longs)
    row = st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {
                "id": longs,
                "event_type": opt_str,
                "value": st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=True, width=64),
                ),
            }
        ),
    )
    env = st.fixed_dictionaries(
        {
            "op": st.sampled_from(["c", "u", "d", "r"]),
            "ts_ms": longs,
            "before": row,
            "after": row,
            "source": st.fixed_dictionaries(
                {
                    "version": st.text(max_size=8),
                    "connector": st.just("postgresql"),
                    "name": st.text(max_size=8),
                    "ts_ms": longs,
                    "snapshot": opt_str,
                    "db": st.text(max_size=8),
                    "schema": st.text(max_size=8),
                    "table": st.text(max_size=12),
                    "txId": opt_long,
                    "lsn": opt_long,
                }
            ),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(env=env)
    def check(env):
        body = encode_value(AVRO_ENVELOPE_SCHEMA, env)
        got, pos = decode_value(AVRO_ENVELOPE_SCHEMA, body)
        assert got == env
        assert pos == len(body)

    check()


def test_value_format_config_selects_avro_decode(tmp_path):
    from cdc_platform_spark.config.models import PipelineConfig, SinkConfig, SourceConfig

    cfg = PipelineConfig(
        pipeline_id="k",
        source=SourceConfig(
            type="kafka",
            bootstrap_servers="b:9092",
            topics=["t"],
            value_format="avro",
        ),
        sinks=[SinkConfig(id="a", type="append", path=str(tmp_path / "a"))],
    )
    assert cfg.source.value_format == "avro"


def test_tombstone_null_value_is_not_poison(spark):
    """Debezium tombstones (null value after a delete, for log compaction)
    are a normal stream condition: both strict and permissive decode keep a
    quiet null-envelope row with the key's pk — never a decode_error, never
    a batch failure (parity with the JSON path's null-row behavior)."""
    key = confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 7}))
    frames = spark.createDataFrame(
        [("t", 0, 3, bytearray(key), None)],
        "topic string, partition int, offset long, key binary, value binary",
    )
    strict = parse_debezium_avro(frames, permissive=False).collect()
    assert len(strict) == 1 and strict[0]["pk"] == 7 and strict[0]["op"] is None
    perm = parse_debezium_avro(frames, permissive=True).collect()
    assert perm[0]["decode_error"] is None and perm[0]["pk"] == 7


def test_avro_probe_is_memoized(spark):
    from cdc_platform_spark.sources.avro import _AVRO_PROBE_CACHE

    r1 = spark_avro_usable(spark)
    assert spark.sparkContext.applicationId in _AVRO_PROBE_CACHE
    assert spark_avro_usable(spark) == r1


# ---------------------------------------------------------------------------
# Schema-id-aware decode (writer-schema resolution, ref consumer.py:97-110)
# ---------------------------------------------------------------------------

import copy

from cdc_platform_spark.sources.avro import (  # noqa: E402
    SchemaResolver,
    confluent_schema_id,
    decode_resolved,
)


def _envelope_v2():
    """v2 adds a nullable ``region`` column to Row and a nullable
    ``tx_status`` envelope field — the additive evolution the reference's
    schema monitor classifies as compatible."""
    v2 = copy.deepcopy(AVRO_ENVELOPE_SCHEMA)
    row = v2["fields"][2]["type"][1]  # before: ["null", Row]
    row["fields"].append({"name": "region", "type": ["null", "string"], "default": None})
    v2["fields"].append({"name": "tx_status", "type": ["null", "string"], "default": None})
    return v2


def _mk_value(schema, i, op, region=None):
    img = {"id": i, "event_type": "purchase", "value": float(i) * 1.5}
    if any(f["name"] == "region" for f in schema["fields"][2]["type"][1]["fields"]):
        img = dict(img, region=region)
    env = {
        "op": op,
        "ts_ms": 1700000000000 + i,
        "before": None,
        "after": img,
        "source": {
            "version": "2.5", "connector": "postgresql", "name": "cdc",
            "ts_ms": 1700000000000 + i, "snapshot": "false", "db": "app",
            "schema": "public", "table": "users", "txId": i, "lsn": 1000 + i,
        },
    }
    if any(f["name"] == "tx_status" for f in schema["fields"]):
        env["tx_status"] = "committed"
    return encode_value(schema, env)


def test_confluent_schema_id_extraction():
    frame = confluent_frame(b"\x02", schema_id=73)
    assert confluent_schema_id(frame) == 73
    with pytest.raises(ValueError):
        confluent_schema_id(b"\x01\x00\x00\x00\x01x")


def test_decode_resolved_skips_writer_only_and_fills_reader_defaults():
    v2 = _envelope_v2()
    body = _mk_value(v2, 7, "u", region="emea")
    # v2 writer -> v1 reader: region and tx_status are skipped cleanly
    v1_view, pos = decode_resolved(v2, AVRO_ENVELOPE_SCHEMA, body)
    assert pos == len(body)
    assert v1_view["op"] == "u" and v1_view["after"]["id"] == 7
    assert "region" not in v1_view["after"] and "tx_status" not in v1_view
    # v1 writer -> v2 reader: the added fields take their declared defaults
    body1 = _mk_value(AVRO_ENVELOPE_SCHEMA, 3, "c")
    v2_view, pos1 = decode_resolved(AVRO_ENVELOPE_SCHEMA, v2, body1)
    assert pos1 == len(body1)
    assert v2_view["after"]["region"] is None and v2_view["tx_status"] is None
    assert v2_view["after"]["value"] == 4.5


def test_decode_resolved_promotions():
    writer = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "int"}]}
    reader_long = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "long"}]}
    reader_dbl = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "double"}]}
    body = encode_value(writer, {"x": 41})
    assert decode_resolved(writer, reader_long, body)[0] == {"x": 41}
    assert decode_resolved(writer, reader_dbl, body)[0] == {"x": 41.0}


def test_decode_resolved_missing_field_without_default_raises():
    writer = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "int"}]}
    reader = {
        "type": "record", "name": "R",
        "fields": [{"name": "x", "type": "int"}, {"name": "y", "type": "int"}],
    }
    with pytest.raises(ValueError, match="no default"):
        decode_resolved(writer, reader, encode_value(writer, {"x": 1}))


def test_multi_version_topic_decodes_with_resolver(spark):
    """A topic carrying v1 and v2 envelope frames mid-stream decodes to the
    one reader shape when the resolver maps both schema ids; an unframed
    id is a poison frame (DLQ-routed in permissive mode)."""
    v2 = _envelope_v2()
    resolver = SchemaResolver({1: AVRO_ENVELOPE_SCHEMA, 2: v2, 10: AVRO_KEY_SCHEMA})
    rows = []
    for i, (sid, schema) in enumerate([(1, AVRO_ENVELOPE_SCHEMA), (2, v2)], start=1):
        rows.append(
            (
                "cdc.public.users", i % 8, 100 + i,
                bytearray(confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": i}), 10)),
                bytearray(confluent_frame(_mk_value(schema, i, "c", region="emea"), sid)),
            )
        )
    # frame with an id the resolver doesn't know
    rows.append(
        (
            "cdc.public.users", 3, 103,
            bytearray(confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 3}), 10)),
            bytearray(confluent_frame(_mk_value(AVRO_ENVELOPE_SCHEMA, 3, "c"), 99)),
        )
    )
    frames = spark.createDataFrame(
        rows, "topic string, partition int, offset long, key binary, value binary"
    )
    parsed = parse_debezium_avro(
        frames, confluent_wire=True, permissive=True, resolver=resolver
    ).orderBy("offset")
    got = parsed.collect()
    assert [r["pk"] for r in got] == [1, 2, 3]
    assert [r["op"] for r in got] == ["c", "c", None]
    assert got[0]["after"]["value"] == 1.5 and got[1]["after"]["value"] == 3.0
    assert "region" not in got[1]["after"].asDict()
    assert got[0]["decode_error"] is None and got[1]["decode_error"] is None
    assert "99" in got[2]["decode_error"]
    # strict mode: the unknown id fails the batch (reference FAILFAST posture)
    strict = parse_debezium_avro(frames, confluent_wire=True, resolver=resolver)
    with pytest.raises(Exception, match="(?i)schema id|SparkException"):
        strict.collect()


def test_decode_resolved_random_evolution_property():
    """Property: for ANY additive evolution of a random record schema
    (nullable-with-default fields appended at any nesting level, fields
    reordered never — Avro forbids that — plus int->long/double
    promotions), a value encoded with either version decodes through
    ``decode_resolved`` to the other version's shape: writer-only fields
    dropped, reader-only fields defaulted, promoted values widened."""
    import random as _random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    base_types = ["int", "long", "double", "string", ["null", "string"], ["null", "long"]]

    @st.composite
    def schema_and_value(draw):
        n_fields = draw(st.integers(min_value=1, max_value=5))
        rng = _random.Random(draw(st.integers(0, 2**31)))
        fields, value = [], {}
        for i in range(n_fields):
            t = rng.choice(base_types)
            name = f"f{i}"
            fields.append({"name": name, "type": t})
            if t == "int":
                value[name] = draw(st.integers(-(2**31) + 1, 2**31 - 1))
            elif t == "long":
                value[name] = draw(st.integers(-(2**62), 2**62))
            elif t == "double":
                value[name] = draw(st.floats(allow_nan=False, allow_infinity=False, width=64))
            elif t == "string":
                value[name] = draw(st.text(max_size=12))
            else:  # nullable union
                inner = st.text(max_size=8) if t[1] == "string" else st.integers(-(2**31), 2**31)
                value[name] = draw(st.one_of(st.none(), inner))
        writer = {"type": "record", "name": "R", "fields": fields}
        # evolve: append 1-2 defaulted fields + promote ints
        evolved_fields = []
        for f in fields:
            t = f["type"]
            if t == "int" and rng.random() < 0.5:
                t = rng.choice(["long", "double"])
            evolved_fields.append({"name": f["name"], "type": t})
        n_new = rng.randint(1, 2)
        for j in range(n_new):
            evolved_fields.append(
                {"name": f"new{j}", "type": ["null", "string"], "default": None}
            )
        reader = {"type": "record", "name": "R", "fields": evolved_fields}
        return writer, reader, value

    from cdc_platform_spark.sources.avro import decode_resolved

    @settings(max_examples=120, deadline=None)
    @given(sv=schema_and_value())
    def check(sv):
        writer, reader, value = sv
        body = encode_value(writer, value)
        # writer(v1) -> reader(v2): new fields defaulted, promotions widened
        up, pos = decode_resolved(writer, reader, body)
        assert pos == len(body)
        for f in reader["fields"]:
            name = f["name"]
            if name.startswith("new"):
                assert up[name] is None
            elif f["type"] == "double" and isinstance(value[name], int):
                assert up[name] == float(value[name])
            else:
                assert up[name] == value[name]
        # reader(v2) value -> writer(v1) shape: new fields dropped cleanly.
        # (Only when no promotion happened: Avro resolution cannot narrow.)
        evolved = reader["fields"]
        if all(f["type"] == w["type"] for f, w in zip(evolved, writer["fields"])):
            v2 = dict(value, **{f["name"]: None for f in evolved if f["name"].startswith("new")})
            body2 = encode_value(reader, v2)
            down, pos2 = decode_resolved(reader, writer, body2)
            assert pos2 == len(body2)
            assert down == value

    check()


def test_unknown_schema_id_flows_to_dlq_route(spark):
    """End-to-end poison posture for schema evolution: a frame with an
    unregistered schema id survives the resolver-aware envelope as a
    decode_error row that the DLQ predicate (ref P7) selects, while the
    known-id frames flow clean — the unknown WRITER version quarantines
    instead of poisoning the batch or silently misdecoding."""
    from cdc_platform_spark.sources.avro import SchemaResolver
    from cdc_platform_spark.sources.kafka import kafka_envelope_avro

    resolver = SchemaResolver({1: AVRO_ENVELOPE_SCHEMA, 10: AVRO_KEY_SCHEMA})
    env_val = {
        "op": "c",
        "ts_ms": 1700000000005,
        "before": None,
        "after": {"id": 5, "event_type": "signup", "value": 5.0},
        "source": {
            "version": "2.5", "connector": "postgresql", "name": "cdc",
            "ts_ms": 1700000000005, "snapshot": "false", "db": "app",
            "schema": "public", "table": "users", "txId": 5, "lsn": 55,
        },
    }
    key = bytearray(confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 5}), 10))
    good = bytearray(confluent_frame(encode_value(AVRO_ENVELOPE_SCHEMA, env_val), 1))
    unknown = bytearray(confluent_frame(encode_value(AVRO_ENVELOPE_SCHEMA, env_val), 42))
    frames = spark.createDataFrame(
        [("t", 0, 1, key, good), ("t", 0, 2, key, unknown)],
        "topic string, partition int, offset long, key binary, value binary",
    )
    env = kafka_envelope_avro(frames, resolver=resolver)
    rows = {r["offset"]: r for r in env.collect()}
    assert rows[1]["decode_error"] is None and rows[1]["op"] == "c"
    assert rows[2]["decode_error"] is not None and "42" in rows[2]["decode_error"]
    assert rows[2]["pk"] == 5  # key decoded -> the DLQ row stays key-routable
    quarantined = env.filter("decode_error IS NOT NULL")
    assert quarantined.count() == 1 and quarantined.first()["offset"] == 2


def _env_bytes(i, op="c"):
    img = {"id": i, "event_type": "purchase", "value": float(i)}
    return confluent_frame(
        encode_value(
            AVRO_ENVELOPE_SCHEMA,
            {
                "op": op,
                "ts_ms": 1700000000000 + i,
                "before": None,
                "after": img,
                "source": {
                    "version": "2.5", "connector": "postgresql", "name": "cdc",
                    "ts_ms": 1700000000000 + i, "snapshot": "false", "db": "app",
                    "schema": "public", "table": "users", "txId": i, "lsn": 1000 + i,
                },
            },
        )
    )


def test_null_key_data_row_decodes(spark):
    """A keyless producer (value != null, key = None) must decode like the
    JVM/JSON paths: pk null, envelope intact — not a task failure (strict)
    or a poisoned row (permissive)."""
    frames = spark.createDataFrame(
        [("t", 0, 1, None, bytearray(_env_bytes(7)))],
        "topic string, partition int, offset long, key binary, value binary",
    )
    strict = parse_debezium_avro(frames, confluent_wire=True, permissive=False).collect()
    assert strict[0]["pk"] is None and strict[0]["op"] == "c"
    perm = parse_debezium_avro(frames, confluent_wire=True, permissive=True).collect()
    assert perm[0]["decode_error"] is None and perm[0]["after"]["id"] == 7


def test_envelope_only_resolver_pinned_decodes_keys(spark):
    """A resolver seeded with envelope schemas only (no key attribution)
    must decode KEY frames with the pinned reader schema — consulting it
    for the key's registry id KeyErrored every data row on the Python
    path while the JVM path worked."""
    from cdc_platform_spark.sources.avro import SchemaResolver

    resolver = SchemaResolver({3: AVRO_ENVELOPE_SCHEMA})
    frames = spark.createDataFrame(
        [(
            "t", 0, 1,
            bytearray(confluent_frame(encode_value(AVRO_KEY_SCHEMA, {"id": 9}), schema_id=10)),
            bytearray(confluent_frame(encode_value(AVRO_ENVELOPE_SCHEMA, {
                "op": "c", "ts_ms": 1, "before": None,
                "after": {"id": 9, "event_type": "e", "value": 1.0},
                "source": {"version": "v", "connector": "c", "name": "n", "ts_ms": 1,
                           "snapshot": "false", "db": "d", "schema": "s", "table": "t",
                           "txId": 1, "lsn": 5},
            }), schema_id=3)),
        )],
        "topic string, partition int, offset long, key binary, value binary",
    )
    rows = parse_debezium_avro(
        frames, confluent_wire=True, permissive=False, resolver=resolver
    ).collect()
    assert rows[0]["pk"] == 9 and rows[0]["op"] == "c"


def test_schema_id_expr_rejects_malformed_frames(spark):
    """Truncated or wrong-magic frames must yield a NULL schema id — the
    raw substring parse aliased b'\\x00\\x01' to id 1, routing the frame
    to a wrong registered decoder."""
    from cdc_platform_spark.sources.avro import _schema_id_expr

    df = spark.createDataFrame(
        [
            (1, bytearray(b"\x00\x01")),               # truncated header
            (2, bytearray(b"\x01\x00\x00\x00\x01x")),  # wrong magic
            (3, bytearray(confluent_frame(b"body", schema_id=7))),
        ],
        "i long, value binary",
    )
    got = {r.i: r.sid for r in df.select("i", _schema_id_expr("value").alias("sid")).collect()}
    assert got == {1: None, 2: None, 3: 7}


def test_codec_resolves_fullname_type_references():
    """Registry schemas may reference named types by FULLNAME
    ('cdc.public.events.Row'); the codec indexed bare names only and
    failed with 'unsupported Avro type'."""
    schema = {
        "type": "record",
        "name": "Env",
        "namespace": "cdc.public.events",
        "fields": [
            {"name": "a", "type": {"type": "record", "name": "Row",
                                   "fields": [{"name": "x", "type": "long"}]}},
            {"name": "b", "type": ["null", "cdc.public.events.Row"]},
        ],
    }
    value = {"a": {"x": 1}, "b": {"x": 2}}
    body = encode_value(schema, value)
    decoded, _ = decode_value(schema, body)
    assert decoded == value


def test_resume_after_checkpoint_dedups_commit_history(spark):
    """Several checkpoint rows per partition (a commit-history table) must
    not fan out the join or resurrect already-committed offsets."""
    from cdc_platform_spark.sources.cloud import resume_after_checkpoint

    frames = spark.createDataFrame(
        [("s", 3, off, "{}", "{}") for off in (50, 150, 250)],
        "topic string, partition int, offset long, key_json string, value_json string",
    )
    ckpt = spark.createDataFrame(
        [(3, 100), (3, 200)], "partition int, committed_offset long"
    )
    got = sorted(r.offset for r in resume_after_checkpoint(frames, ckpt).collect())
    assert got == [250]  # 150 not resurrected by stale row 100; no duplicates
