"""Kafka auth passthrough (reference streaming/auth.py:10-90).

The reference builds librdkafka auth properties per mechanism; on Spark
the same capability is `kafka.*`-prefixed readStream options forwarded
verbatim to the Java Kafka client (SASL via JAAS strings + callback
handler classes instead of Python oauth callbacks).  Everything here is
option-map assembly — unit-testable without a broker.
"""

from __future__ import annotations

import pytest

from cdc_platform_spark.sources.kafka import (
    kafka_auth_options,
    kafka_stream_options,
)


def test_passthrough_prefixes_and_forwards_kafka_options():
    opts = kafka_stream_options(
        "b:9092",
        topics=["t1", "t2"],
        kafka_options={
            "security.protocol": "SASL_SSL",  # bare key -> kafka. prefixed
            "kafka.sasl.mechanism": "PLAIN",  # already prefixed -> verbatim
        },
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["subscribe"] == "t1,t2"


def test_passthrough_rejects_reader_option_clobber():
    for bad in ("subscribe", "startingOffsets", "kafka.bootstrap.servers", "maxOffsetsPerTrigger"):
        with pytest.raises(ValueError, match="may not override"):
            kafka_stream_options("b:9092", topics=["t"], kafka_options={bad: "x"})


def test_plain_recipe_confluent_cloud():
    """Confluent Cloud = SASL_SSL + PLAIN with the API key/secret."""
    opts = kafka_auth_options("plain", username="API_KEY", password="API_SECRET")
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.sasl.jaas.config"] == (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        'username="API_KEY" password="API_SECRET";'
    )


@pytest.mark.parametrize("mech", ["scram-sha-256", "scram-sha-512", "SCRAM_SHA_512"])
def test_scram_recipes(mech):
    opts = kafka_auth_options(mech, username="u", password="p")
    assert opts["kafka.sasl.mechanism"].startswith("SCRAM-SHA-")
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]


def test_jaas_escaping_of_quotes_and_backslashes():
    opts = kafka_auth_options("plain", username="u", password='p"w\\x')
    assert 'password="p\\"w\\\\x";' in opts["kafka.sasl.jaas.config"]


def test_msk_iam_recipe():
    opts = kafka_auth_options("aws-msk-iam", aws_region="eu-west-1")
    assert opts["kafka.sasl.mechanism"] == "AWS_MSK_IAM"
    assert opts["kafka.sasl.jaas.config"] == (
        "software.amazon.msk.auth.iam.IAMLoginModule required;"
    )
    assert opts["kafka.sasl.client.callback.handler.class"] == (
        "software.amazon.msk.auth.iam.IAMClientCallbackHandler"
    )


def test_gcp_oauthbearer_recipe():
    opts = kafka_auth_options("gcp-oauthbearer")
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"
    assert "OAuthBearerLoginModule required;" in opts["kafka.sasl.jaas.config"]
    assert opts["kafka.sasl.login.callback.handler.class"] == (
        "com.google.cloud.hosted.kafka.auth.GcpLoginCallbackHandler"
    )


def test_generic_oauthbearer_has_no_gcp_handler():
    opts = kafka_auth_options("oauthbearer")
    assert "kafka.sasl.login.callback.handler.class" not in opts


def test_ssl_store_options_and_none_mechanism():
    assert kafka_auth_options("none") == {}
    opts = kafka_auth_options(
        "none",
        ssl_truststore_location="/etc/ca.pem",
        ssl_truststore_type="PEM",
        ssl_keystore_location="/etc/client.p12",
        ssl_keystore_type="PKCS12",
    )
    assert opts["kafka.ssl.truststore.location"] == "/etc/ca.pem"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.type"] == "PKCS12"


def test_missing_credentials_and_unknown_mechanism_raise():
    with pytest.raises(ValueError, match="requires username and password"):
        kafka_auth_options("plain", username="only-user")
    with pytest.raises(ValueError, match="unknown auth mechanism"):
        kafka_auth_options("kerberos-magic")


def test_auth_options_compose_into_stream_options():
    """The recipe output feeds straight into kafka_stream_options /
    SourceConfig.kafka_options."""
    auth = kafka_auth_options("plain", username="u", password="p")
    opts = kafka_stream_options("b:9092", topics=["t"], kafka_options=auth)
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.bootstrap.servers"] == "b:9092"


def test_source_config_accepts_kafka_options():
    from cdc_platform_spark.config.models import PipelineConfig, SinkConfig, SourceConfig

    cfg = PipelineConfig(
        pipeline_id="auth",
        source=SourceConfig(
            type="kafka",
            bootstrap_servers="b:9092",
            topics=["t"],
            kafka_options=kafka_auth_options("aws-msk-iam"),
        ),
        sinks=[SinkConfig(id="a", type="append", path="/tmp/a")],
    )
    assert cfg.source.kafka_options["kafka.sasl.mechanism"] == "AWS_MSK_IAM"
