"""Streaming event-time windows with watermarks (SURVEY.md SQ2-SQ4).

The reference has no event-time processing (its only watermark is the
delivery-offset watermark, ref A1) — these are the Spark built-ins
that complete the surface: tumbling/sliding/session windows over the
envelope stream with late-data handling via ``withWatermark``.

Verified by batch≡stream equivalence in tests: running the stream
with availableNow over the fixture files must produce the same final
table as the batch operators in operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_platform_spark.functions import money


def tumbling_counts(env: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h counts per event_type with late-data watermark (SQ2/SQ3)."""
    return (
        env.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(money("value")).cast("double").alias("value_sum"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def session_counts(env: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per key with watermark (SQ4)."""
    return (
        env.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("w"), "pk")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "pk",
            F.unix_micros(F.col("w.start")).cast("long").alias("session_start_us"),
            "n_events",
        )
    )
