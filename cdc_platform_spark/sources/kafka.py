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


# Spark-level reader options the kafka_options passthrough must never
# clobber — they are owned by the explicit kafka_stream_options parameters.
_RESERVED_OPTIONS = {
    "subscribe",
    "subscribepattern",
    "assign",
    "startingoffsets",
    "endingoffsets",
    "maxoffsetspertrigger",
    "failondataloss",
    "kafka.bootstrap.servers",
}


def kafka_stream_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    kafka_options: dict[str, str] | None = None,
) -> dict[str, str]:
    """Build the Kafka readStream option map (one of topics / topic_pattern).

    ``kafka_options`` forwards arbitrary consumer properties to the Kafka
    client — Spark's Kafka source passes every ``kafka.``-prefixed option
    straight through, which is how SASL/SSL auth is configured (the
    reference assembles the equivalent librdkafka properties in
    streaming/auth.py:10-60).  Keys are accepted with or without the
    ``kafka.`` prefix (it is added when absent); Spark-level reader options
    (subscribe, startingOffsets, ...) are rejected here — set them via the
    explicit parameters.
    """
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
    for key, value in (kafka_options or {}).items():
        full = key if key.startswith("kafka.") else f"kafka.{key}"
        if key.lower() in _RESERVED_OPTIONS or full.lower() in _RESERVED_OPTIONS:
            raise ValueError(
                f"kafka_options may not override reader option {key!r}; "
                "use the explicit kafka_stream_options parameter"
            )
        opts[full] = str(value)
    return opts


def kafka_auth_options(
    mechanism: str,
    username: str | None = None,
    password: str | None = None,
    aws_region: str | None = None,  # accepted for parity; MSK IAM resolves region itself
    ssl_truststore_location: str | None = None,
    ssl_truststore_type: str | None = None,
    ssl_keystore_location: str | None = None,
    ssl_keystore_type: str | None = None,
) -> dict[str, str]:
    """Managed-Kafka auth recipes as ``kafka.*`` passthrough options
    (reference streaming/auth.py:10-90 builds the librdkafka equivalents;
    Spark's Kafka source uses the Java client, so SASL is configured via
    JAAS strings and callback-handler classes instead of ``oauth_cb``).

    Mechanisms (reference KafkaAuthMechanism parity):
    - ``none``: {} — plaintext.
    - ``plain`` / ``scram-sha-256`` / ``scram-sha-512``: SASL_SSL with the
      matching LoginModule; Confluent Cloud is ``plain`` with the API
      key/secret as username/password.
    - ``aws-msk-iam``: MSK's IAM SASL mechanism; the cluster must have the
      ``aws-msk-iam-auth`` jar on the executor classpath (public coords
      ``software.amazon.msk:aws-msk-iam-auth``), which resolves region and
      credentials from the default AWS provider chain.
    - ``gcp-oauthbearer``: GCP Managed Service for Apache Kafka; needs the
      ``managedkafka-auth-login-handler`` jar (public coords
      ``com.google.cloud.hosted.kafka:managed-kafka-auth-login-handler``),
      which mints tokens from Application Default Credentials.

    SSL store locations apply to any mechanism (private-CA clusters /
    mTLS); stores may be JKS/PKCS12 or, on Kafka clients >= 2.7, PEM via
    ``*_type='PEM'``.
    """
    mech = mechanism.lower().replace("_", "-")
    opts: dict[str, str] = {}
    if mech == "none":
        pass
    elif mech in ("plain", "scram-sha-256", "scram-sha-512"):
        if username is None or password is None:
            raise ValueError(f"{mech} requires username and password")
        module = (
            "org.apache.kafka.common.security.plain.PlainLoginModule"
            if mech == "plain"
            else "org.apache.kafka.common.security.scram.ScramLoginModule"
        )
        jaas_user = username.replace("\\", "\\\\").replace('"', '\\"')
        jaas_pass = password.replace("\\", "\\\\").replace('"', '\\"')
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.mechanism"] = "PLAIN" if mech == "plain" else mech.upper()
        opts["kafka.sasl.jaas.config"] = (
            f'{module} required username="{jaas_user}" password="{jaas_pass}";'
        )
    elif mech == "aws-msk-iam":
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.mechanism"] = "AWS_MSK_IAM"
        opts["kafka.sasl.jaas.config"] = (
            "software.amazon.msk.auth.iam.IAMLoginModule required;"
        )
        opts["kafka.sasl.client.callback.handler.class"] = (
            "software.amazon.msk.auth.iam.IAMClientCallbackHandler"
        )
    elif mech in ("gcp-oauthbearer", "oauthbearer"):
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.mechanism"] = "OAUTHBEARER"
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required;"
        )
        if mech == "gcp-oauthbearer":
            opts["kafka.sasl.login.callback.handler.class"] = (
                "com.google.cloud.hosted.kafka.auth.GcpLoginCallbackHandler"
            )
    else:
        raise ValueError(
            f"unknown auth mechanism {mechanism!r}; expected one of none, plain, "
            "scram-sha-256, scram-sha-512, aws-msk-iam, gcp-oauthbearer, oauthbearer"
        )
    if ssl_truststore_location:
        opts["kafka.ssl.truststore.location"] = ssl_truststore_location
        if ssl_truststore_type:
            opts["kafka.ssl.truststore.type"] = ssl_truststore_type
    if ssl_keystore_location:
        opts["kafka.ssl.keystore.location"] = ssl_keystore_location
        if ssl_keystore_type:
            opts["kafka.ssl.keystore.type"] = ssl_keystore_type
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

    return to_flat_envelope(kafka_envelope(records))
