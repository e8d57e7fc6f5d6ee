"""Multimodal decode-seam tests: the import-gated PIL path and the
deterministic stub must expose the identical Arrow/mapInPandas contract.

The container has no PIL, so the real-decode test self-skips there and
runs on any PIL-capable host (same gating pattern as the Spark-4
transformWithState test); the stub-path tests always run.
"""

from __future__ import annotations

import base64

import pytest

from cdc_platform_spark.operators.multimodal import (
    DECODE_SCHEMA,
    HAS_PIL,
    decode_binary_column,
    fake_decode_batch,
    real_decode_batch,
)

from .conftest import SF_SMOKE

# a valid 1x1 PNG, hand-embedded so the test needs no encoder library
PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQ"
    "DwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


@pytest.mark.skipif(HAS_PIL, reason="container-path check: PIL absent")
def test_real_decode_raises_cleanly_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        list(real_decode_batch(iter([])))


@pytest.mark.skipif(not HAS_PIL, reason="real decode needs PIL")
def test_real_decode_reads_png_and_tolerates_poison(spark):
    df = spark.createDataFrame(
        [(1, bytearray(PNG_1X1)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_binary_column(df, use_real=True).collect()}
    assert rows[1]["format"] == "png"
    assert (rows[1]["width"], rows[1]["height"]) == (1, 1)
    assert rows[1]["n_bytes"] == len(PNG_1X1)
    # poison payload: NULL format, 0x0 dims, row survives
    assert rows[2]["format"] is None
    assert (rows[2]["width"], rows[2]["height"]) == (0, 0)


def test_decode_binary_column_stub_matches_registered_query(spark):
    """use_real=False must reproduce the registered mm_decode_metadata
    stub exactly (same md5-residue metadata) on the same payloads."""
    import pyspark.sql.functions as F  # noqa: N812

    from cdc_platform_spark.functions import spread
    from cdc_platform_spark.operators import load_all
    from cdc_platform_spark.sources.registry import load_table

    d = spread(load_table(spark, "documents", SF_SMOKE)).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    via_api = (
        decode_binary_column(d, use_real=False).orderBy("doc_id").toPandas()
    )
    via_query = (
        load_all()["mm_decode_metadata"].builder(spark, SF_SMOKE).toPandas()
    )
    assert via_api.equals(via_query)


def test_default_decoder_selection_matches_gate():
    """decode_binary_column's auto mode must track the import gate, so a
    PIL-capable host silently upgrades and the container silently stubs."""
    import inspect

    src = inspect.getsource(decode_binary_column)
    assert "use_real = HAS_PIL" in src
    # and the two decoders share the output schema contract
    assert "format" in DECODE_SCHEMA and "width" in DECODE_SCHEMA
    assert callable(fake_decode_batch) and callable(real_decode_batch)


def test_feature_store_null_payload_upsert_is_not_silently_dropped(spark, tmp_path):
    """A non-delete event with a NULL payload has a NULL content hash; the
    content-addressed decode join must not drop it (that would leave the
    key's PRIOR version live with no error signal).  It merges with NULL
    metadata so the latest-offset row wins, like every other event."""
    import pyspark.sql.functions as F

    from cdc_platform_spark.streaming.feature_store import MultimodalFeatureStoreSink

    rows = spark.createDataFrame(
        [
            (1, 10, "c", b"payload-one"),
            (1, 20, "u", None),  # null-payload update MUST win
            (2, 10, "c", b"payload-two"),
            (3, 10, "c", None),  # insert born with no payload still appears
        ],
        "doc_id long, offset long, op string, payload binary",
    )
    sink = MultimodalFeatureStoreSink(str(tmp_path / "fs"), n_buckets=4, use_real=False)
    sink.write(rows)
    feats = {r["doc_id"]: r for r in sink.features(spark).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[1]["n_bytes"] is None and feats[1]["format"] is None
    assert feats[2]["n_bytes"] == len(b"payload-two")
    assert feats[3]["n_bytes"] is None
    # the winning row is the null-payload update, not the old version
    state = {r["doc_id"]: r for r in sink.state(spark).collect()}
    assert state[1]["offset"] == 20


def test_feature_store_sink_converges_and_versions_dont_mix(spark, tmp_path):
    """MultimodalFeatureStoreSink: decode-on-write state must equal the
    batch decode over the post-CDC payloads under any batching; a batch
    carrying insert+update of one asset must keep the update's metadata
    (content-addressed decode cannot mix versions); deletes tombstone."""
    import pyspark.sql.functions as F

    from cdc_platform_spark.operators.multimodal import decode_binary_column
    from cdc_platform_spark.streaming.feature_store import MultimodalFeatureStoreSink

    from .conftest import SF_SMOKE

    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 60")
    )
    enc = lambda c: F.encode(c, "utf-8")  # noqa: E731
    wave0 = d.select(
        "doc_id", F.col("doc_id").alias("offset"), F.lit("c").alias("op"),
        enc(F.col("text")).alias("payload"),
    )
    upd = d.filter("doc_id % 7 = 0 AND doc_id % 11 <> 3").select(
        "doc_id", (F.col("doc_id") + 10**6).alias("offset"), F.lit("u").alias("op"),
        enc(F.concat(F.col("text"), F.lit(" v2"))).alias("payload"),
    )
    dels = d.filter("doc_id % 11 = 3").select(
        "doc_id", (F.col("doc_id") + 10**6).alias("offset"), F.lit("d").alias("op"),
        F.lit(None).cast("binary").alias("payload"),
    )
    rows = wave0.unionByName(upd).unionByName(dels).localCheckpoint(eager=True)

    live = (
        rows.groupBy("doc_id")
        .agg(F.max_by(F.struct("offset", "op", "payload"), F.col("offset")).alias("m"))
        .select("doc_id", "m.op", "m.payload")
        .filter("op != 'd'")
        .select("doc_id", "payload")
    )
    expected = sorted(
        map(tuple, decode_binary_column(live, use_real=False).collect())
    )

    # any batching converges — including insert+update sharing a batch
    # (offset % 2 interleaves the waves) and a redelivery
    sink = MultimodalFeatureStoreSink(str(tmp_path / "fs"), n_buckets=8, use_real=False)
    batches = [rows.filter(F.pmod(F.col("offset"), F.lit(2)) == k) for k in range(2)]
    for b in batches:
        sink.write(b)
    sink.write(batches[0])  # at-least-once redelivery is a no-op
    got = sorted(
        map(
            tuple,
            sink.features(spark)
            .select("doc_id", "n_bytes", "format", "width", "height")
            .collect(),
        )
    )
    assert got == expected and got

    # tombstone GC inherited from the shared base class
    assert spark.read.parquet(sink.path).filter("op = 'd'").count() > 0
    sink.compact(spark, tombstone_horizon=10**9)
    assert spark.read.parquet(sink.path).filter("op = 'd'").count() == 0
    got2 = sorted(
        map(
            tuple,
            sink.features(spark)
            .select("doc_id", "n_bytes", "format", "width", "height")
            .collect(),
        )
    )
    assert got2 == expected
