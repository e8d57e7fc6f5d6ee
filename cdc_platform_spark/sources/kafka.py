"""Kafka CDC source (reference S1: streaming/consumer.py:39-214).

The reference's consumer hand-manages subscribe/poll/deserialize/commit;
on Spark the same capability is the built-in Kafka source — offsets live
in the query checkpoint (replacing the reference's min-watermark commit
A1), per-partition ordering is task-level, and backpressure is
``maxOffsetsPerTrigger`` (replacing the bounded per-partition queues F3).

What remains engine code is exactly two pure functions:
- ``kafka_stream_options``: config -> readStream options (the analogue of
  the reference's consumer config assembly, streaming/consumer.py:56-74),
- ``kafka_frames``: the raw Kafka record shape -> transport frames for
  ``sources.debezium.parse_debezium`` (the reference's
  consumer-normalization step, sources/kafka/source.py:47-66).

Both are unit-testable without a broker; ``read_kafka_stream`` composes
them onto ``readStream.format("kafka")`` for a live deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.sources.debezium import parse_debezium


def kafka_stream_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Build the Kafka readStream option map (one of topics / topic_pattern)."""
    if (topics is None) == (topic_pattern is None):
        raise ValueError("exactly one of topics / topic_pattern is required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if topics is not None:
        opts["subscribe"] = ",".join(topics)
    else:
        opts["subscribePattern"] = topic_pattern
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_frames(records: DataFrame) -> DataFrame:
    """Kafka record schema (key/value binary, topic, partition, offset) ->
    transport frames (topic, partition, offset, key_json, value_json).

    The reference deserializes Avro via Schema Registry here
    (streaming/consumer.py:97-110); this engine pins the envelope schema in
    code and decodes JSON wire format — ``from_avro`` drops in for Avro
    topics without touching anything downstream.
    """
    return records.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("key").cast("string").alias("key_json"),
        F.col("value").cast("string").alias("value_json"),
    )


def kafka_envelope(records: DataFrame) -> DataFrame:
    """Raw Kafka records -> flat engine envelope (decode + normalize)."""
    return parse_debezium(kafka_frames(records))


def kafka_envelope_avro(
    records: DataFrame, permissive: bool = True, resolver=None
) -> DataFrame:
    """Raw Kafka records with Confluent-framed Avro values -> flat engine
    envelope (the reference's actual wire path: AvroConverter + registry
    framing). Permissive by default so poison frames survive as
    null-enveloped rows for DLQ routing instead of failing the batch.

    ``resolver`` (a ``sources.avro.SchemaResolver``) turns on schema-id
    routing: each frame decodes with its writer schema, resolved onto the
    pinned reader envelope (registry-driven deployments pass a
    ``RegistrySchemaResolver``)."""
    from cdc_platform_spark.sources.avro import parse_debezium_avro
    from cdc_platform_spark.sources.debezium import to_flat_envelope

    parsed = parse_debezium_avro(
        records, confluent_wire=True, permissive=permissive, resolver=resolver
    )
    return to_flat_envelope(parsed)


def read_kafka_stream(spark: SparkSession, **options_kwargs) -> DataFrame:
    """Live readStream over Kafka, already decoded to the engine envelope."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(**options_kwargs).items():
        reader = reader.option(k, v)
    return kafka_envelope(reader.load())


def raw_kafka_stream(spark: SparkSession, **options_kwargs) -> DataFrame:
    """Undecoded Kafka readStream (decode happens per micro-batch via
    ``kafka_envelope_flat`` so DLQ capture sees the raw frames)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(**options_kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_envelope_flat(records: DataFrame) -> DataFrame:
    """Raw Kafka records -> the engine's flat envelope (sink-ready)."""
    from cdc_platform_spark.sources.debezium import to_flat_envelope

    return to_flat_envelope(parse_debezium(kafka_frames(records)))
