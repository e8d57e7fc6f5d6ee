"""Pub/Sub and Kinesis transport adapters (reference S3/S4) as pure
column transforms.

The reference fabricates Kafka-like (partition, offset) coordinates for
both cloud transports so the rest of the pipeline is transport-agnostic:

- Pub/Sub has no partitions: it derives 16 "virtual partitions" from
  ``md5(ordering_key) % 16`` and counts a synthetic per-partition offset
  in arrival order (reference sources/pubsub/source.py:22-23, 169-174).
- Kinesis maps shard -> partition 1:1 and uses the sequence number as
  the offset; restart resumes AFTER_SEQUENCE_NUMBER per shard from a
  checkpoint table (reference sources/kinesis/source.py:24-28, 146-168,
  checkpoint.py:14-119).

Here both normalizations are declarative: the md5 bucket is a JVM hash
expression, the synthetic offset is a window row_number over the arrival
order key, and checkpoint resume is an anti-condition join against a
(partition, committed_offset) table — no per-message Python, no state
outside the DataFrame. On Spark the checkpoint table is only needed when
bridging FROM a live Kinesis consumer; Spark-native sources use the query
checkpoint instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_VIRTUAL_PARTITIONS = 16  # reference sources/pubsub/source.py:22-23


def pubsub_frames(messages: DataFrame, n_partitions: int = N_VIRTUAL_PARTITIONS) -> DataFrame:
    """Pub/Sub messages -> transport frames with fabricated coordinates.

    Input columns: ``message_id string, ordering_key string,
    publish_time timestamp, key_json string, value_json string``.
    Output adds ``topic`` (= ordering_key, which the reference sets to
    "schema.table"), ``partition`` = md5 bucket of the ordering key, and
    ``offset`` = arrival-order row_number within the partition
    (publish_time, message_id as the deterministic tiebreak).
    """
    md5_60bit = F.conv(F.substring(F.md5(F.col("ordering_key")), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("partition").orderBy("publish_time", "message_id")
    return (
        messages.withColumn("partition", F.pmod(md5_60bit, F.lit(n_partitions)).cast("int"))
        .withColumn("offset", F.row_number().over(w).cast("long") - F.lit(1))
        .select(
            F.col("ordering_key").alias("topic"),
            "partition",
            "offset",
            "key_json",
            "value_json",
        )
    )


def kinesis_frames(records: DataFrame, stream_name: str = "cdc") -> DataFrame:
    """Kinesis records -> transport frames (shard = partition 1:1).

    Input columns: ``shard_id string ('shardId-000000000007'),
    sequence_number long, partition_key string, key_json string,
    value_json string``. The shard ordinal becomes the partition id and
    the sequence number is already a monotone per-shard offset.
    """
    shard_ordinal = F.regexp_extract(F.col("shard_id"), r"(\d+)$", 1).cast("int")
    return records.select(
        F.lit(stream_name).alias("topic"),
        shard_ordinal.alias("partition"),
        F.col("sequence_number").cast("long").alias("offset"),
        "key_json",
        "value_json",
    )


def resume_after_checkpoint(frames: DataFrame, checkpoint: DataFrame) -> DataFrame:
    """AFTER_SEQUENCE_NUMBER resume: drop every frame at or below the
    committed offset of its partition (reference kinesis/source.py:146-168
    restoring from DynamoDB). ``checkpoint`` columns: ``partition,
    committed_offset``. Partitions without a checkpoint row replay from
    the start (TRIM_HORIZON), exactly like the reference.
    """
    # one row per partition, LATEST commit wins: a commit-history table
    # with several rows per partition would otherwise fan the join out
    # (duplicating frames) and let a stale row resurrect already-committed
    # offsets through the filter
    ckpt = checkpoint.groupBy(F.col("partition").alias("_ckpt_partition")).agg(
        F.max("committed_offset").alias("_ckpt_offset")
    )
    return (
        frames.join(ckpt, frames["partition"] == ckpt["_ckpt_partition"], "left")
        .filter(F.col("_ckpt_offset").isNull() | (F.col("offset") > F.col("_ckpt_offset")))
        .drop("_ckpt_partition", "_ckpt_offset")
    )
