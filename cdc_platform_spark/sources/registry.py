"""Batch table registry over the driver-generated parquet fixtures.

The reference platform's "sources" are transport adapters that
normalize everything into one envelope (reference sources/base.py:13-26
``SourceEvent``).  In the Spark engine the equivalent normalization is
a schema'd ``spark.read`` — Catalyst then owns predicate pushdown and
column pruning into the parquet scan, which the reference could only
approximate with source-side table include-lists (reference
sources/debezium/config.py:53).

At 100 TB these reads are the hot path: we never infer schemas
(inference = an extra full-file-footer pass), we read directories not
files where possible, and we leave filters/projections to the caller
so they reach the scan (``PushedFilters`` in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

# Fact tables whose scans should be spread across cores when the fixture
# arrives as a handful of row-group splits (local mode). On a cluster the
# input has >= parallelism/2 splits and spread() is a no-op, so the plan
# gains no exchange at scale. Dimensions are deliberately excluded — a
# repartition there would only add a pointless tiny shuffle ahead of their
# broadcast. documents/embeddings keep their call-site spreads (the text/
# dedup operators already guard their compute-bound stages).
SPREAD_TABLES = frozenset({"lineitem", "orders", "events"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table. Schema comes from parquet metadata (no inference pass).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as a
    LongType of epoch-nanoseconds. We keep that full-fidelity value as
    ``ts_ns`` (the deterministic order/hash key) and derive a
    us-truncated TimestampType ``ts`` for date functions and windows.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in SPREAD_TABLES:
        from cdc_platform_spark.functions import spread

        # Catalyst pushes filters and column pruning THROUGH the round-robin
        # repartition (verified: PushedFilters/ReadSchema unchanged), so the
        # map phase — scans, broadcast-join probes, decimal partial
        # aggregates — runs at full width instead of the fixture's 1-3
        # row-group splits.
        df = spread(df)
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Parquet TIMESTAMP(NANOS) under nanosAsLong. Integer division:
            # epoch-ns (~1.7e18) exceeds double's 2^53 exact range, so
            # `floor(ts / 1000)` would be off by up to 1us.
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type is not None and ts_type.startswith("timestamp"):
            # Parquet TIMESTAMP(MICROS/MILLIS), possibly NTZ: normalize to
            # plain TIMESTAMP (the session timezone is UTC — session.py —
            # so the NTZ->TZ cast interprets the naive value as UTC,
            # matching DuckDB's naive-as-UTC epoch semantics) and derive
            # the integer order/hash key (DuckDB epoch_ns(ts) equivalent —
            # micros * 1000, exact in int64). Downstream consumers
            # (watermarks, unix_timestamp, window()) expect TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
