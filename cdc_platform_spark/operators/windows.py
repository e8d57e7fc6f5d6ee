"""Event-time windowing operators (SURVEY.md §2B SQ2/SQ4 batch forms).

The reference has no event-time windows — its only windows are
wall-clock flush timers (ref W3: sinks/iceberg.py:214-224) and the
offset watermark (ref A1).  These operators add the standard
event-time analytics surface with Spark built-ins; the streaming forms
(withWatermark + the same window exprs) live in
cdc_platform_spark/streaming and are tested for batch≡stream
equivalence in tests/.

Determinism: window boundaries are exact integer floor operations on
epoch time; outputs carry epoch-second BIGINTs, never raw timestamps
(events.ts is ns-precision, which Spark truncates to us — see
sources/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.functions import dsum, materialize, money, sorted_view
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table


@register(
    "w_tumbling_hourly",
    category="window-time",
    doc="Tumbling 1h event-time window: counts + exact value sum per (window, event_type).",
    oracle="""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
)
def w_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "value_sum"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "w_sliding_2h_1h",
    category="window-time",
    doc=(
        "Sliding window (2h length, 1h slide): every event lands in two windows. "
        "Oracle expands the assignment explicitly (event at t -> windows starting "
        "at trunc(t) and trunc(t)-1h)."
    ),
    oracle="""
        WITH assign AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start, value FROM events
            UNION ALL
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - 3600 AS window_start, value FROM events
        )
        SELECT window_start, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM assign
        GROUP BY window_start
        ORDER BY window_start
    """,
)
def w_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "value_sum"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "n",
            "value_sum",
        )
        .orderBy("window_start")
    )


@register(
    "w_session_per_user",
    category="window-time",
    doc=(
        "Session windows (30 min gap) per user — gaps-and-islands oracle. A new "
        "session starts when the gap from the previous event is >= 30 min "
        "(session_window semantics: event windows [t, t+gap) merge iff they overlap)."
    ),
    oracle="""
        WITH t AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us, value
            FROM events
        ),
        marked AS (
            SELECT user_id, t_us, value,
                   CASE WHEN t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us) >= 1800000000
                        OR LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM t
        ),
        sessions AS (
            SELECT user_id, t_us, value,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
            FROM marked
        )
        SELECT user_id, CAST(MIN(t_us) AS BIGINT) AS session_start_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM sessions
        GROUP BY user_id, session_no
        ORDER BY user_id, session_start_us
    """,
)
def w_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return sorted_view(
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "value_sum"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).cast("long").alias("session_start_us"),
            "n_events",
            "value_sum",
        ),
        "user_id", "session_start_us",
    )


@register(
    "w_range_interval_frame",
    category="window-time",
    doc=(
        "Value-range window frame over event time: for every event, the "
        "count and exact value sum of the SAME USER's events in the "
        "trailing hour (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over "
        "epoch seconds — a frame defined by TIME DISTANCE, not row count; "
        "complements q16's ROWS frames). Deterministic because range "
        "frames are value-defined: peers at equal timestamps always share "
        "one frame on both engines, and the aggregate is an exact decimal "
        "sum. One shuffle on user_id + per-partition sort — the frame "
        "never crosses the partition key at any scale."
    ),
    oracle="""
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s,
                   CAST(value AS DECIMAL(18,2)) AS v
            FROM events
        )
        SELECT event_id, user_id, ts_s,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
               CAST(CAST(SUM(v) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS sum_last_hour
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
)
def w_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.expr("ts_ns div 1000000000").alias("ts_s"),
        money("value").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts_s",
            F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
            F.sum("v").over(w).cast("decimal(18,2)").cast("double").alias("sum_last_hour"),
        )
        .orderBy("event_id")
    )


@register(
    "w_gapfill_locf",
    category="window-time",
    doc=(
        "Gap-filled hourly series with LOCF (TimescaleDB time_bucket_gapfill"
        " + locf semantics, which neither Spark nor the reference has "
        "natively): hourly (event_type) aggregates projected onto the DENSE "
        "hour grid spanning the stream — absent hours appear with n=0 and "
        "the value carried forward from the latest preceding observed hour. "
        "Scale shape: one agg shuffle of the raw data; the grid is "
        "|keys| x |hours| (generated, never shuffled wide — bounds enter "
        "the plan as a broadcast scalar row) and LOCF is a per-key running "
        "last() over the GRID, bounded by grid size not event count. The "
        "oracle fills via DuckDB's ASOF LEFT JOIN — an independent "
        "formulation of the same semantics."
    ),
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
            FROM events
        ),
        grid AS (
            SELECT et.event_type, gs.h
            FROM (SELECT DISTINCT event_type FROM events) et,
                 (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) gs
        )
        SELECT g.event_type, CAST(epoch(g.h) AS BIGINT) AS hour_start,
               COALESCE(hy.n, 0) AS n,
               locf.v AS v_locf
        FROM grid g
        LEFT JOIN hourly hy ON hy.event_type = g.event_type AND hy.h = g.h
        ASOF LEFT JOIN hourly locf ON g.event_type = locf.event_type AND g.h >= locf.h
        ORDER BY g.event_type, hour_start
    """,
)
def w_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).withColumn(
        # exact integer hour bucket from the ns clock (epoch >= 0)
        "hour_s", F.expr("(ts_ns div 3600000000000) * 3600").cast("long")
    )
    hourly = e.groupBy("event_type", "hour_s").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "v"),
    )
    return gapfill_locf_grid(hourly)


def gapfill_locf_grid(hourly: DataFrame) -> DataFrame:
    """THE gap-fill + LOCF tail over an hourly (event_type, hour_s, n, v)
    aggregate — shared by the batch ``w_gapfill_locf`` and the streaming
    ``sq_gapfill_locf_stream`` serve view, so the two definitions cannot
    drift.  Grid bounds enter as a broadcast 1-row aggregate; the LOCF
    running ``last()`` is per-key over the GRID, bounded by grid size
    (|keys| x |hours|), never event count."""
    from pyspark.sql import Window

    # the hourly aggregate feeds THREE subtrees (bounds, keys, the grid
    # left-join) plus the final sort's range-partition sampling pass; it is
    # grid-bounded (|keys| x |hours| rows), so materialize it once instead
    # of re-running the upstream aggregation per consumer (guide §7.2)
    hourly = hourly.transform(materialize)
    bounds = hourly.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    keys = hourly.select("event_type").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))).alias("hour_s"),
    )
    w_locf = (
        Window.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour_s"], "left")
        .withColumn("v_locf", F.last("v", ignorenulls=True).over(w_locf))
        .select(
            "event_type",
            F.col("hour_s").alias("hour_start"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            "v_locf",
        )
        .orderBy("event_type", "hour_start")
    )
