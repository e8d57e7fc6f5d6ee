"""SparkSession factory with scale-oriented defaults.

The session config is chosen for the 100 TB design point and scaled
down for local testing:

- AQE on (runtime re-planning: shuffle-partition coalescing, skew-join
  splitting, dynamic broadcast conversion) — this is the knob set that
  replaces all the hand-tuned batching/parallelism config of the
  reference platform (reference config/defaults/platform.yaml:
  poll_batch_size / deser_pool_size / max_buffered_messages).
- Arrow-accelerated pandas interchange for the Pandas-UDF operators
  (dedup / similarity / text) so Python touches data only in
  vectorized batches.
- Shuffle partitions default to cores locally; on a real cluster this
  is overridden to ~2-3x total cores and AQE coalesces the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdc-platform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    Parameters mirror what a cluster deployment would override via
    spark-submit; local tests run with ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Adaptive execution: the scale-out workhorse ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # --- Arrow for every Python<->JVM hop (Pandas UDFs, toPandas) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Scan sizing: 128 MB splits, same as a production cluster ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- Broadcast threshold: dims like region/nation/supplier always broadcast ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Timestamps: fixture `events.ts` is parquet TIMESTAMP(NANOS), which
        # Spark cannot represent; read as LongType ns (full fidelity) and let the
        # registry derive a us-truncated TimestampType column for windowing. ---
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # --- Local-mode memory: generous driver heap, off-heap disabled ---
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate SILENTLY IGNORES builder configs when a session already
    # exists (a notebook/library may have created one first) — re-assert
    # the runtime-settable configs that change RESULT SEMANTICS, so e.g.
    # a local-timezone pre-existing session cannot shift every
    # window/unix_timestamp result away from the UTC the oracles assume.
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": shuffle,
        **(extra_conf or {}),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — static confs can't be reset; skip
            pass
    spark.sparkContext.setLogLevel("WARN")
    return spark
