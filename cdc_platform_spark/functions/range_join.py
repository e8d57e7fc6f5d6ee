"""Binned range join: non-equi interval matching as an equi-join.

A join on ``point BETWEEN lo AND hi`` with NO equality key gives
Catalyst exactly two physical options: BroadcastNestedLoopJoin (only
when one side fits in memory) or a cartesian product — both are
scale-killers once the interval side grows past broadcast size.

The standard fix (the same trick behind Databricks' range-join bin
optimization and the interval-join implementations in Flink and
KDB-style asof engines) is to discretize the range dimension into
fixed-width bins:

- each POINT row maps to exactly one bin: ``floor(point / width)``,
- each INTERVAL row is exploded to every bin it overlaps
  (``ceil((hi - lo) / width) + 1`` rows, small when the bin width is
  chosen near the typical interval length),
- the join becomes an EQUI-join on the bin id, hash-partitionable and
  AQE-skew-splittable like any other shuffle join, followed by the
  exact residual predicate.

Correctness does not depend on the bin width — every (point, interval)
pair with ``lo <= point <= hi`` shares at least the bin containing the
point — only the explode factor and the candidate-pair selectivity do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIN_COL = "__range_bin"


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point: str | Column,
    lo: str | Column,
    hi: str | Column,
    bin_width: int,
    how: str = "inner",
    closed: str = "both",
) -> DataFrame:
    """Join point rows to interval rows with ``lo <= point <= hi`` (or the
    half-open variant) via bin discretization — one hash shuffle on the
    bin id instead of a nested-loop/cartesian plan.

    ``point``/``lo``/``hi`` are integer columns in the same unit (e.g.
    epoch micros); ``bin_width`` is in that unit.  ``closed`` is
    ``"both"`` (lo <= p <= hi) or ``"left"`` (lo <= p < hi).  All columns
    of both inputs survive; the internal bin column does not.

    At 100 TB: both sides shuffle on hash(bin) only; an interval explodes
    into O(interval_len / bin_width + 1) rows, so pick the bin width near
    the typical interval length.  Heavily-hit bins (a hotspot hour) are
    ordinary join-key skew — AQE skew-join or functions.skew.salted_join
    applies unchanged because the join IS an equi-join.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")
    p = F.col(point) if isinstance(point, str) else point
    lo_c = F.col(lo) if isinstance(lo, str) else lo
    hi_c = F.col(hi) if isinstance(hi, str) else hi

    def bin_of(c: Column) -> Column:
        # exact floor division for the full long range: double division
        # (F.floor(c / w)) silently rounds above 2^53, which epoch-nanos
        # exceed — decimal division stays exact.
        return F.floor(c.cast("decimal(38,0)") / F.lit(bin_width)).cast("long")

    left = points.withColumn(BIN_COL, bin_of(p))
    # explode each interval into the bins it overlaps
    right = intervals.withColumn(
        BIN_COL, F.explode(F.sequence(bin_of(lo_c), bin_of(hi_c)))
    )
    residual = (p >= lo_c) & ((p <= hi_c) if closed == "both" else (p < hi_c))
    return left.join(right, on=BIN_COL, how=how).filter(residual).drop(BIN_COL)
