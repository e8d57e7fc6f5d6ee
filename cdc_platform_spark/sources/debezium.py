"""Debezium envelope schema + parser (the reference's canonical wire form).

The reference's Kafka path carries the standard Debezium envelope
``{op: c|u|d|r, ts_ms, before, after, source{connector, db, schema,
table, txId, lsn, ...}}`` (reference tests/benchmark/helpers.py:103-160,
asserted in tests/integration/test_postgres_cdc.py:96-108), decoded via
Schema Registry Avro.  In Spark the same normalization is one
``from_json`` (or ``from_avro``) with an explicit schema — no registry
round-trips in the hot path, schema pinned in code.

``parse_debezium`` turns a raw transport frame (topic, partition,
offset, key/value JSON strings) into the engine's flat envelope —
exactly the reference's consumer-normalization step
(sources/kafka/source.py:47-66) as a column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("snapshot", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("txId", T.LongType()),
        T.StructField("lsn", T.LongType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", ROW_SCHEMA),
        T.StructField("after", ROW_SCHEMA),
        T.StructField("source", SOURCE_SCHEMA),
    ]
)

KEY_SCHEMA = T.StructType([T.StructField("id", T.LongType())])


def parse_debezium(frames: DataFrame) -> DataFrame:
    """(topic, partition, offset, key_json, value_json) -> flat engine envelope.

    Debezium op codes map directly: c/r (snapshot read) create, u update,
    d delete; the order key is (partition, offset) exactly as in the
    reference's per-partition workers.

    Poison posture: ``from_json`` yields a null struct for malformed
    JSON, which previously surfaced as a SILENT null-op row — the merge
    could pick it as latest-per-key (highest offset) and the served state
    would drop the key entirely.  The ``decode_error`` column marks such
    frames (value present, envelope undecodable) so the DLQ filter can
    quarantine them, exactly like the Avro path's permissive diagnostic.
    """
    v = F.from_json(F.col("value_json"), ENVELOPE_SCHEMA)
    k = F.from_json(F.col("key_json"), KEY_SCHEMA)
    return frames.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        k["id"].alias("pk"),
        v["op"].alias("op"),
        v["ts_ms"].alias("ts_ms"),
        v["before"].alias("before"),
        v["after"].alias("after"),
        v["source"]["lsn"].alias("lsn"),
        v["source"]["table"].alias("source_table"),
        F.when(
            F.col("value_json").isNotNull() & v["op"].isNull(),
            F.lit("decode failed"),
        )
        .cast("string")
        .alias("decode_error"),
    )


def to_flat_envelope(env: DataFrame) -> DataFrame:
    """Parsed Debezium envelope -> the engine's flat envelope (the shape
    every sink consumes, identical to streaming.pipeline.to_envelope's
    output): post-image fields for upserts, pre-image for deletes,
    snapshot reads ('r') normalized to creates (reference semantics:
    snapshot rows are initial inserts, config/models.py:40-46).

    A ``decode_error`` column (permissive Avro decode) passes through, so
    poison frames stay routable to the DLQ downstream."""
    row = F.coalesce(F.col("after"), F.col("before"))
    cols = [
        F.col("offset").alias("seq"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.when(F.col("op") == "r", "c").otherwise(F.col("op")).alias("op"),
        F.coalesce(F.col("pk"), row["id"]).alias("pk"),
        row["event_type"].alias("event_type"),
        row["value"].alias("value"),
        F.lit(None).cast("string").alias("props"),
        F.timestamp_millis(F.col("ts_ms")).alias("event_ts"),
    ]
    if "decode_error" in env.columns:
        cols.append(F.col("decode_error"))
    return env.select(*cols)
