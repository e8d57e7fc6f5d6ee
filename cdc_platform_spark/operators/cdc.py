"""CDC materialization operators (SURVEY.md §2B Q26-Q30).

These re-express the reference platform's core dataflow semantics on
the driver's ``events`` fixture:

- envelope projection + metadata enrichment (ref P2-P6:
  sources/wal/reader.py:187-220, sinks/iceberg.py:124-130),
- append vs latest-per-key upsert materialization (ref K3/J1/W2:
  sinks/iceberg.py:124-197),
- min-watermark offset commit math (ref A1: pipeline/runner.py:355-383),
- DLQ accounting (ref P7: streaming/dlq.py:41-56),
- exactly-once = replay + idempotent dedup (ref J4: README.md:411-419).

Fixture mapping (events: event_id, ts/ts_ns, user_id, event_type,
value, props):
- ``seq``/``offset``   := event_id  (globally monotone, unique)
- ``pk``               := user_id
- ``op``               := signup->'c', error->'d', else 'u'
- ``partition``        := pmod(user_id, 8)  (keyed partitioning, ref W1)
- ``topic``            := 'cdc.public.users'

Scale notes: latest-per-key is one shuffle on pk (window or
max_by-style aggregation — both map-side combinable); at 100 TB this
becomes MERGE INTO an Iceberg table per micro-batch (storage-side
state), never driver-side. The watermark/DLQ queries are pure
groupBy aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import money, sorted_view
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table

TOPIC = "cdc.public.users"

# Shared DuckDB fragment: the envelope view of `events`.
ORACLE_ENVELOPE = f"""
    SELECT event_id AS seq,
           '{TOPIC}' AS topic,
           CAST(((user_id % 8) + 8) % 8 AS BIGINT) AS partition,  -- pmod parity (negative keys)
           event_id AS "offset",
           CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
           user_id AS pk,
           event_type,
           value,
           props
    FROM events
"""

# Shared construct->parse roundtrip oracle: q50 (JSON wire) and q51 (Avro
# wire) must reach the IDENTICAL flat form — one definition, two decoders.
ORACLE_FLAT_ROUNDTRIP = """
        WITH ordered AS (
            SELECT event_id, user_id, event_type, value,
                   CAST(epoch_ns(ts) AS BIGINT) // 1000000 AS ts_ms,
                   CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
                   LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
            FROM events
        )
        SELECT event_id AS lsn, user_id AS pk, op, ts_ms,
               CASE WHEN op = 'c' THEN NULL ELSE prev_value END AS before_value,
               CASE WHEN op = 'd' THEN NULL ELSE value END AS after_value,
               'users' AS source_table
        FROM ordered
        ORDER BY lsn
"""



def envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> CDC envelope projection (ref P3/P4, sources/wal/reader.py:202-220)."""
    e = load_table(spark, "events", sf_dir)
    return e.select(
        F.col("event_id").alias("seq"),
        F.lit(TOPIC).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("long").alias("partition"),
        F.col("event_id").alias("offset"),
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
        F.col("user_id").alias("pk"),
        "event_type",
        "value",
        "props",
    )


@register(
    "q26_cdc_append",
    category="cdc",
    doc=(
        "Append materialization: envelope + _cdc_* metadata columns, one row per "
        "change event (ref K3 append path, sinks/iceberg.py:124-133)."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE})
        SELECT seq, pk, op, value,
               topic AS _cdc_topic,
               partition AS _cdc_partition,
               "offset" AS _cdc_offset
        FROM env
        ORDER BY seq
    """,
)
def q26_cdc_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    return (
        env.select(
            "seq",
            "pk",
            "op",
            "value",
            F.col("topic").alias("_cdc_topic"),
            F.col("partition").alias("_cdc_partition"),
            F.col("offset").alias("_cdc_offset"),
        )
        .orderBy("seq")
    )


@register(
    "q27_cdc_upsert_latest",
    category="cdc",
    doc=(
        "THE core CDC query: latest state per key from the change stream — upsert "
        "apply with delete removal (ref J1/W2, sinks/iceberg.py:187-197; oracle form "
        "FIXTURES.md §3b). Order key = offset (arrival order per partition, "
        "ref pipeline/runner.py:140-162)."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE}),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY "offset" DESC) AS rn
            FROM env
        )
        SELECT pk, "offset" AS last_offset, event_type AS last_event_type, value AS last_value
        FROM ranked
        WHERE rn = 1 AND op <> 'd'
        ORDER BY pk
    """,
)
def q27_cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy(F.col("offset").desc())
    latest = (
        env.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select(
            "pk",
            F.col("offset").alias("last_offset"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
    # the final ORDER BY's range sampling must not re-run the per-key
    # window over the full change stream (guide §7.2 duplicated subtrees)
    return sorted_view(latest, "pk")


@register(
    "q28_min_watermark",
    category="cdc",
    doc=(
        "Min-watermark commit math: per partition, each sink's max durably-flushed "
        "offset; commit = min over sinks + 1 (ref A1/A2, pipeline/runner.py:355-383, "
        "sinks/iceberg.py:202-205). Sinks simulated by deterministic flush predicates."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE}),
        s AS (
            SELECT partition,
                   MAX(CASE WHEN value < 150.0 THEN "offset" END) AS a,
                   MAX(CASE WHEN op <> 'd' THEN "offset" END) AS b
            FROM env GROUP BY partition
        )
        SELECT partition,
               CAST(a AS BIGINT) AS sink_a_max,
               CAST(b AS BIGINT) AS sink_b_max,
               CAST(CASE WHEN a IS NULL OR b IS NULL THEN NULL
                    ELSE LEAST(a, b) + 1 END AS BIGINT) AS committed
        FROM s
        ORDER BY partition
    """,
)
def q28_min_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    sink_a = F.max(F.when(F.col("value") < 150.0, F.col("offset")))
    sink_b = F.max(F.when(F.col("op") != "d", F.col("offset")))
    agg = env.groupBy("partition").agg(
        sink_a.cast("long").alias("sink_a_max"),
        sink_b.cast("long").alias("sink_b_max"),
    )
    # Min-watermark SAFETY: a sink that has flushed NOTHING has no
    # watermark, so the partition commits nothing (NULL) — least() skips
    # NULLs on both engines, which would otherwise commit to the OTHER
    # sink's offset+1 and permanently skip redelivery to the empty sink.
    committed = F.when(
        F.col("sink_a_max").isNotNull() & F.col("sink_b_max").isNotNull(),
        F.least("sink_a_max", "sink_b_max") + 1,
    ).cast("long")
    return agg.select(
        "partition", "sink_a_max", "sink_b_max", committed.alias("committed")
    ).orderBy("partition")


@register(
    "q29_dlq_accounting",
    category="cdc",
    doc=(
        "DLQ accounting: failed ('d'/error) events quarantined with diagnostics, "
        "aggregated per (topic, partition) and joined back to per-partition totals "
        "(ref P7, streaming/dlq.py:41-56)."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE}),
        dlq AS (
            SELECT topic, partition, COUNT(*) AS n_failed,
                   COUNT(DISTINCT pk) AS n_failed_keys,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS failed_value
            FROM env WHERE op = 'd'
            GROUP BY topic, partition
        ),
        tot AS (SELECT partition, COUNT(*) AS n_total FROM env GROUP BY partition)
        SELECT t.partition, d.topic AS dlq_topic, d.n_failed, d.n_failed_keys,
               d.failed_value, t.n_total
        FROM tot t LEFT JOIN dlq d ON t.partition = d.partition
        ORDER BY t.partition
    """,
)
def q29_dlq_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    dlq = (
        env.filter(F.col("op") == "d")
        .groupBy("topic", "partition")
        .agg(
            F.count(F.lit(1)).alias("n_failed"),
            F.countDistinct("pk").alias("n_failed_keys"),
            F.sum(money("value")).cast("double").alias("failed_value"),
        )
    )
    tot = env.groupBy("partition").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tot.join(dlq, "partition", "left")
        .select(
            "partition",
            F.col("topic").alias("dlq_topic"),
            "n_failed",
            "n_failed_keys",
            "failed_value",
            "n_total",
        )
        .orderBy("partition")
    )


@register(
    "q30_dedup_exactly_once",
    category="cdc",
    doc=(
        "Exactly-once: at-least-once redelivery (replay of the top-10%% offset "
        "suffix) + idempotent dedup on (partition, offset); final upsert state must "
        "equal single-delivery state (ref J4, README.md:411-419). Oracle is the "
        "single-delivery Q27 state — dedup must make the union collapse to it."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE}),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY "offset" DESC) AS rn
            FROM env
        )
        SELECT pk, "offset" AS last_offset, event_type AS last_event_type, value AS last_value
        FROM ranked
        WHERE rn = 1 AND op <> 'd'
        ORDER BY pk
    """,
)
def q30_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    # Replay the suffix: redeliver every event in the top 10% of offsets (per full
    # stream) — duplicates with identical (partition, offset), like a consumer
    # restart from an old checkpoint.  The cutoff stays IN the plan as a
    # broadcast single-row join (no driver .collect(): one lazy composable
    # plan, no extra scheduled job; the broadcast-scalar crossJoin is the
    # q53/tpch_like scale-free pattern).
    # default sketch accuracy: the oracle is the single-delivery Q27 state,
    # so ANY deterministic cutoff yields the same deduped result — the
    # previous accuracy=INT_MAX made the per-partition sketch state scale
    # with the data for zero benefit
    cutoff = env.agg(
        F.expr("percentile_approx(offset, 0.9)").alias("replay_cutoff")
    )
    replay = env.crossJoin(F.broadcast(cutoff)).filter(
        F.col("offset") >= F.col("replay_cutoff")
    ).drop("replay_cutoff")
    redelivered = env.unionAll(replay)
    deduped = redelivered.dropDuplicates(["partition", "offset"])
    w = Window.partitionBy("pk").orderBy(F.col("offset").desc())
    latest = (
        deduped.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select(
            "pk",
            F.col("offset").alias("last_offset"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
    # sorted_view inline (the q27 fix): the final ORDER BY's range sampling
    # must not re-run the dedup + per-key window over the replayed stream
    return sorted_view(latest, "pk")


@register(
    "q50_debezium_envelope_roundtrip",
    category="cdc",
    doc=(
        "Debezium envelope fidelity: build the reference's canonical wire form "
        "(op/ts_ms/before/after/source — tests/benchmark/helpers.py:103-160) from "
        "the event stream with windowed before-images, serialize to JSON, parse "
        "back via the explicit envelope schema (sources/debezium.py), and "
        "materialize. Construct->parse must be the identity (oracle computes the "
        "flat form directly)."
    ),
    oracle=ORACLE_FLAT_ROUNDTRIP,
)
def q50_debezium_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.sources.debezium import parse_debezium

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    # the before-image is the PRIOR row state: event_type must lag along
    # with value, or deletes would carry a chimera before-row (current
    # event_type + previous value)
    before_row = F.struct(
        F.col("user_id").alias("id"),
        F.col("prev_event_type").alias("event_type"),
        F.col("prev_value").alias("value"),
    )
    after_row = F.struct(
        F.col("user_id").alias("id"), F.col("event_type"), F.col("value")
    )
    staged = (
        e.withColumn("prev_value", F.lag("value").over(w))
        .withColumn("prev_event_type", F.lag("event_type").over(w))
        .withColumn("op", op)
    )
    frames = staged.select(
        F.lit(TOPIC).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(F.struct(F.col("user_id").alias("id"))).alias("key_json"),
        F.to_json(
            F.struct(
                F.col("op"),
                F.expr("ts_ns div 1000000").alias("ts_ms"),
                F.when(F.col("op") != "c", before_row).alias("before"),
                F.when(F.col("op") != "d", after_row).alias("after"),
                F.struct(
                    F.lit("2.5").alias("version"),
                    F.lit("postgresql").alias("connector"),
                    F.lit("cdc").alias("name"),
                    F.expr("ts_ns div 1000000").alias("ts_ms"),
                    F.lit("false").alias("snapshot"),
                    F.lit("app").alias("db"),
                    F.lit("public").alias("schema"),
                    F.lit("users").alias("table"),
                    F.col("event_id").alias("txId"),
                    F.col("event_id").alias("lsn"),
                ).alias("source"),
            )
        ).alias("value_json"),
    )
    parsed = parse_debezium(frames)
    return (
        parsed.select(
            F.col("lsn"),
            "pk",
            "op",
            "ts_ms",
            F.col("before")["value"].alias("before_value"),
            F.col("after")["value"].alias("after_value"),
            "source_table",
        )
        .orderBy("lsn")
    )


@register(
    "q51_avro_envelope_roundtrip",
    category="cdc",
    doc=(
        "Avro wire-format fidelity (the reference's actual Kafka encoding: "
        "registry-framed Avro via AvroConverter, streaming/consumer.py:97-110): "
        "build the Debezium envelope from the event stream, serialize each "
        "record to Confluent-framed Avro binary with the pinned schema "
        "(sources/avro.py), decode back via parse_debezium_avro, and flatten. "
        "Encode->frame->decode must be the identity (oracle computes the flat "
        "form directly, same as q50)."
    ),
    oracle=ORACLE_FLAT_ROUNDTRIP,
)
def q51_avro_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.sources.avro import (
        AVRO_ENVELOPE_SCHEMA,
        AVRO_KEY_SCHEMA,
        _collect_names,
        confluent_frame,
        encode_value,
        parse_debezium_avro,
    )

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    staged = e.select(
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id"),
        F.col("user_id"),
        op.alias("op"),
        F.expr("ts_ns div 1000000").alias("ts_ms"),
        F.lag("value").over(w).alias("prev_value"),
        F.lag("event_type").over(w).alias("prev_event_type"),
        F.col("value"),
        F.col("event_type"),
    )

    def encode_batches(batches):
        import pandas as pd

        names = {}
        _collect_names(AVRO_ENVELOPE_SCHEMA, names)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                def img(val, event_type):
                    return {
                        "id": int(r.user_id),
                        "event_type": None if event_type is None or (
                            isinstance(event_type, float) and pd.isna(event_type)
                        ) else event_type,
                        "value": None if pd.isna(val) else float(val),
                    }

                env = {
                    "op": r.op,
                    "ts_ms": int(r.ts_ms),
                    # before-image = PRIOR row state (lagged event_type too)
                    "before": None if r.op == "c" else img(r.prev_value, r.prev_event_type),
                    "after": None if r.op == "d" else img(r.value, r.event_type),
                    "source": {
                        "version": "2.5",
                        "connector": "postgresql",
                        "name": "cdc",
                        "ts_ms": int(r.ts_ms),
                        "snapshot": "false",
                        "db": "app",
                        "schema": "public",
                        "table": "users",
                        "txId": int(r.event_id),
                        "lsn": int(r.event_id),
                    },
                }
                rows.append(
                    {
                        "topic": TOPIC,
                        "partition": int(r.partition),
                        "offset": int(r.event_id),
                        "key": confluent_frame(
                            encode_value(AVRO_KEY_SCHEMA, {"id": int(r.user_id)})
                        ),
                        "value": confluent_frame(encode_value(AVRO_ENVELOPE_SCHEMA, env, names)),
                    }
                )
            yield pd.DataFrame(rows, columns=["topic", "partition", "offset", "key", "value"])

    # The window exchange upstream is AQE-coalesced to a couple of
    # partitions (the shuffled bytes are tiny) — but the NEXT stage is the
    # compute-bound Python codec, which must run at full width. An explicit
    # round-robin repartition pins the parallelism AQE can't see it needs.
    frames = staged.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode_batches, schema="topic string, partition int, offset long, key binary, value binary"
    )
    parsed = parse_debezium_avro(frames, confluent_wire=True)
    return (
        parsed.select(
            F.col("lsn"),
            "pk",
            "op",
            "ts_ms",
            F.col("before")["value"].alias("before_value"),
            F.col("after")["value"].alias("after_value"),
            "source_table",
        )
        .orderBy("lsn")
    )


@register(
    "q54_scd2_history",
    category="cdc",
    doc=(
        "SCD Type-2 reconstruction: the change stream becomes per-key version "
        "history with validity intervals [offset, next_offset) and a current-row "
        "flag (open interval + not deleted). The history-table materialization "
        "complementing Q26 (append) and Q27 (latest-state)."
    ),
    oracle=f"""
        WITH env AS ({ORACLE_ENVELOPE})
        SELECT pk,
               "offset" AS valid_from_offset,
               LEAD("offset") OVER w AS valid_to_offset,
               op, event_type, value,
               CAST(CASE WHEN LEAD("offset") OVER w IS NULL AND op <> 'd' THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM env
        WINDOW w AS (PARTITION BY pk ORDER BY "offset")
        ORDER BY pk, valid_from_offset
    """,
)
def q54_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("offset")
    nxt = F.lead("offset").over(w)
    return (
        env.select(
            "pk",
            F.col("offset").alias("valid_from_offset"),
            nxt.alias("valid_to_offset"),
            "op",
            "event_type",
            "value",
            F.when(nxt.isNull() & (F.col("op") != "d"), 1).otherwise(0).cast("long").alias("is_current"),
        )
        .orderBy("pk", "valid_from_offset")
    )
