"""Bucketed-table support: co-located, shuffle-free joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Writing
both sides bucketed (and sort-ordered) by the join key lets Spark plan
a SortMergeJoin with NO Exchange on either side — the join runs
bucket-to-bucket. This module wraps the write/read pattern; the test
asserts the Exchange-free plan and result equality with the shuffled
join.

This is the engine's co-location story (the reference's analogue is
keyed partitioning at produce time, reference sources/pubsub/source.py:
169-174 — it co-locates per key for ordering, not for joins; joins are
new surface here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Persist as a bucketed+sorted external parquet table in the session
    catalog. Both join sides must use the same (cols, n_buckets)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
