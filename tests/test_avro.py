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
