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

# No table is spread at load time. Scan-bound plans (pushed-filter scan ->
# broadcast probe -> map-side partial agg) are exchange-free on the fact
# side and a load-time round-robin repartition only inserts a full-width
# shuffle they never needed (measured: q51 3.5x, q27 2.5x, q26 2.1x slower
# at sf0.1). Compute-bound operators (text_*, dedup_*, mm_*) call
# ``functions.spread`` at their own call sites, where the repartition buys
# parallelism for the expensive narrow stage that follows.
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
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Parquet TIMESTAMP(NANOS) under nanosAsLong. Integer division:
            # epoch-ns (~1.7e18) exceeds double's 2^53 exact range, so
            # `floor(ts / 1000)` would be off by up to 1us.
            # `div` truncates toward ZERO; pre-epoch (negative) nanos need
            # FLOOR semantics to match DuckDB's epoch_us — subtracting the
            # (always non-negative) pmod makes the division exact.
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
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
