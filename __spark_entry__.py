"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``cdc_platform_spark`` package; this file
only adapts its operator registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_platform_spark.operators import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session-level settings to a driver-provided session.

    The driver may hand us a vanilla session; the one setting that changes
    scan *semantics* (parquet TIMESTAMP(NANOS) -> LongType for events.ts)
    must be active before any read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the TPC-H Q1-shaped pricing summary (exact-decimal
    grouped aggregation), the engine's canonical scan->shuffle->agg path.
    """
    _configure(spark)
    registry = load_all()
    return registry["q10_agg_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_all()

    def make(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return registry[name].builder(spark, sf_dir)

        run.__name__ = name
        run.__doc__ = registry[name].doc
        return run

    return {name: make(name) for name in sorted(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for approx/non-SQL ops)."""
    registry = load_all()
    return {name: q.oracle for name, q in sorted(registry.items()) if q.oracle is not None}
