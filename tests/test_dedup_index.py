"""MinHashIndexSink: the incremental LSH index + pair view must converge
to the batch dedup_minhash_lsh result under any micro-batch split, and
updates/deletes must retract stale pairs."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: N812
import pytest

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def cdc_rows(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    wave0 = d.select(
        "doc_id", F.col("doc_id").alias("offset"), F.lit("c").alias("op"), "text"
    )
    upd = d.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 11 != 3)).select(
        "doc_id",
        (F.col("doc_id") + 10**6).alias("offset"),
        F.lit("u").alias("op"),
        F.concat(F.col("text"), F.lit(" spark dedup stream spark dedup stream")).alias("text"),
    )
    dels = d.filter(F.col("doc_id") % 11 == 3).select(
        "doc_id",
        (F.col("doc_id") + 10**6).alias("offset"),
        F.lit("d").alias("op"),
        F.lit(None).cast("string").alias("text"),
    )
    return wave0.unionByName(upd).unionByName(dels).localCheckpoint(eager=True)


def _pairs(sink, spark):
    return sorted(map(tuple, sink.pairs(spark).collect()))


def test_pair_view_converges_under_any_batching(spark, tmp_path, cdc_rows):
    from cdc_platform_spark.streaming.dedup_index import MinHashIndexSink

    whole = MinHashIndexSink(str(tmp_path / "one"))
    whole.write(cdc_rows)
    expected = _pairs(whole, spark)
    assert expected, "smoke fixture must produce near-dup pairs"

    split = MinHashIndexSink(str(tmp_path / "many"))
    for k in range(3):  # interleaves insert/update/delete waves across batches
        split.write(cdc_rows.filter(F.pmod(F.col("offset"), F.lit(3)) == k))
    assert _pairs(split, spark) == expected


def test_deletes_and_updates_retract_stale_pairs(spark, tmp_path, cdc_rows):
    from cdc_platform_spark.streaming.dedup_index import MinHashIndexSink

    inserts = cdc_rows.filter(F.col("op") == "c")
    sink = MinHashIndexSink(str(tmp_path / "idx"))
    sink.write(inserts)
    before = sink.pairs(spark)
    deleted = {r["doc_id"] for r in cdc_rows.filter(F.col("op") == "d").collect()}
    # the planted near-dups include deleted ids — the retraction is exercised
    assert before.filter(
        F.col("doc_a").isin(deleted) | F.col("doc_b").isin(deleted)
    ).count() > 0
    sink.write(cdc_rows.filter(F.col("op") != "c"))
    after = sink.pairs(spark)
    assert (
        after.filter(F.col("doc_a").isin(deleted) | F.col("doc_b").isin(deleted)).count()
        == 0
    )


def test_pair_view_matches_batch_operator_without_cdc(spark, tmp_path):
    """Insert-only stream == the registered batch dedup_minhash_lsh query."""
    from cdc_platform_spark.operators import load_all
    from cdc_platform_spark.streaming.dedup_index import MinHashIndexSink

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    rows = d.select(
        "doc_id", F.col("doc_id").alias("offset"), F.lit("c").alias("op"), "text"
    )
    sink = MinHashIndexSink(str(tmp_path / "idx"))
    for k in range(3):
        sink.write(rows.filter(F.pmod(F.col("doc_id"), F.lit(3)) == k))
    got = sorted(map(tuple, sink.pairs(spark).collect()))
    expected = sorted(
        map(tuple, load_all()["dedup_minhash_lsh"].builder(spark, SF_SMOKE).collect())
    )
    assert got == expected


def test_index_and_pair_views_recover_from_crash_window(spark, tmp_path, cdc_rows):
    """Crash between the index swap and the pairs swap (or mid-swap of
    either dir) must heal: displaced .old-* snapshots are restored on the
    next call, and a batch replay converges to the same views."""
    import os

    from cdc_platform_spark.streaming.dedup_index import MinHashIndexSink

    sink = MinHashIndexSink(str(tmp_path / "idx"))
    first = cdc_rows.filter(F.pmod(F.col("offset"), F.lit(2)) == 0)
    second = cdc_rows.filter(F.pmod(F.col("offset"), F.lit(2)) == 1)
    sink.write(first)
    expected_pairs = _pairs(sink, spark)
    # mid-swap crash on BOTH views: live dirs displaced, tmp never landed
    os.rename(sink.pairs_path, f"{sink.pairs_path}.old-deadbeef")
    os.rename(sink.index_path, f"{sink.index_path}.old-deadbeef")
    assert _pairs(sink, spark) == expected_pairs
    # replay of the same batch (at-least-once delivery) is a no-op
    sink.write(first)
    assert _pairs(sink, spark) == expected_pairs
    # and the stream continues correctly afterwards
    sink.write(second)
    reference = MinHashIndexSink(str(tmp_path / "ref"))
    reference.write(cdc_rows)
    assert _pairs(sink, spark) == _pairs(reference, spark)
