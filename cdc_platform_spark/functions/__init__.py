"""Column-expression helpers shared across operators.

All helpers keep arithmetic exact (DECIMAL / integer) until the final
cast, so Spark and the DuckDB oracle produce bit-identical values —
the engine's equivalent of the reference's decimal-as-string policy
(reference sources/debezium/config.py:66 ``decimal.handling.mode``)
taken one step further: decimals stay *numbers*, but every hashed
output is either exact or a deterministic double derived from an exact
value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Monetary / fraction columns in the fixtures carry <= 2 decimal digits;
# DECIMAL(18,2) holds them exactly at any realistic magnitude.
MONEY = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Exact-decimal view of a 2-dp double column (price, discount, value)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column, alias: str) -> Column:
    """Deterministic SUM: exact decimal sum, surfaced as DOUBLE."""
    return F.sum(money(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum cast to double, / count (IEEE).

    Spark's AVG(decimal) and DuckDB's AVG(decimal) round differently;
    sum-exact-then-IEEE-divide is identical on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)


def revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """Exact extended revenue term price*(1-discount) as DECIMAL."""
    return money(price) * (F.lit(1).cast(MONEY) - money(discount))


def oracle_davg(col: str) -> str:
    """DuckDB SQL fragment matching :func:`davg`."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col})"


def oracle_dsum(col: str) -> str:
    """DuckDB SQL fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


ORACLE_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def spread(df, min_factor: int = 2):
    """Repartition a coarsely-partitioned input ahead of compute-bound narrow
    transforms (single-row-group fixture files read as one split). On a real
    cluster with many input splits this is a no-op."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target // min_factor:
        return df.repartition(target)
    return df


def distributed_prefix_sum(df, order_col: str, value_col: str, out_col: str = "prefix"):
    """EXCLUSIVE running sum of ``value_col`` in ``order_col`` order, the
    scale-safe way: range-partition on the order column (materialized once so
    both passes share identical boundaries), reduce each partition to ONE
    total, window the #partitions-row totals table for exclusive offsets,
    broadcast back, add the partition-local running sum.

    PRECONDITION: ``order_col`` must be unique. With duplicate keys the
    partition-local exclusive window's ordering among ties is
    nondeterministic, so re-runs could assign tied rows different prefixes
    (every current caller orders by a primary key).

    The naive ``Window.orderBy(order_col)`` with no partitioning funnels the
    whole dataset through a single task. Here the full data crosses the wire
    a bounded number of times — the range partitioning, plus the hash
    exchanges Catalyst inserts after ``localCheckpoint`` erases the range
    partitioning from the plan (the _psum_pid window and join) — but no
    stage ever serializes the whole dataset through ONE task; the only
    single-task structure is the #partitions-row offsets window, which is
    bounded metadata (the same class as zipWithIndex's offset collection).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: N812 (local: avoid cycle at import)

    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    parted = (
        df.repartitionByRange(n_parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_psum_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_off = Window.orderBy("_psum_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parted.groupBy("_psum_pid")
        .agg(F.sum(value_col).alias("_psum_total"))
        .withColumn("_psum_offset", F.coalesce(F.sum("_psum_total").over(w_off), F.lit(0)))
        .select("_psum_pid", "_psum_offset")
    )
    w_loc = (
        Window.partitionBy("_psum_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parted.withColumn("_psum_local", F.coalesce(F.sum(value_col).over(w_loc), F.lit(0)))
        .join(F.broadcast(offsets), "_psum_pid")
        .withColumn(out_col, F.col("_psum_offset") + F.col("_psum_local"))
        .drop("_psum_pid", "_psum_local", "_psum_offset")
    )
