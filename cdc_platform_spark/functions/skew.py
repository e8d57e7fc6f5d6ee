"""Skew-handling utilities: salted joins for heavy-hitter keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the static
fallback for the cases AQE can't fix — e.g. a single key holding >50%
of a join side, or aggregation state that must be spread before the
final combine.

``salted_join`` replicates the (small) right side N ways and scatters
the (large) left side across N salt buckets, so one hot key occupies N
reducers instead of one. Semantics are identical to the plain inner
equi-join (verified by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side, replicate the small side.

    The shuffle key becomes (on, salt) — a hot key spreads over ``n_salts``
    reducers. The small side grows by ``n_salts``x, so this is for
    moderate-size right sides that still exceed the broadcast threshold.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_large = large.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    spark = small.sparkSession
    salts = spark.range(n_salts).select(F.col("id").alias(SALT_COL))
    replicated_small = small.crossJoin(salts)
    out = salted_large.join(replicated_small, [on, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_count_per_key(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation with explicit salting: count per (key, salt)
    then combine — the classic hot-key aggregation spread. (Spark's hash
    aggregate already does map-side partials; this form additionally spreads
    the REDUCE side of one hot key over n_salts reducers.)"""
    salted = df.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, SALT_COL).agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy(key).agg(F.sum("c").cast("long").alias("n"))
