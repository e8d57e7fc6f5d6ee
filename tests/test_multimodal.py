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
