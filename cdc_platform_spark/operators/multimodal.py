"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs — the Spark
pattern for decode / feature-extract / resize / frame-sample stages.

The container's oracle path is a STUB: :func:`fake_decode_batch` derives
deterministic pseudo-metadata from the payload's md5 (hashlib.md5 ==
Spark md5 == DuckDB md5, so the whole pipeline stays oracle-verifiable
end to end).  The REAL decode path, :func:`real_decode_batch`, is
import-gated on PIL (same pattern as streaming/stateful.py's Spark-4
version gate): on a PIL-capable host it is a drop-in replacement with
the identical Arrow batch contract, reachable through
:func:`decode_binary_column`.  The registered ``mm_*`` queries ALWAYS
use the stub — their DuckDB oracles mirror the md5 arithmetic, and the
fixtures' payloads are utf-8 text, not genuine image bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.functions import sorted_view
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table

DECODE_SCHEMA = "doc_id long, n_bytes long, format string, width long, height long"
FORMATS = ("jpeg", "png", "webp")

try:  # import-gated real decoder — PIL is absent in the test container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover — exercised only where PIL is missing
    _PILImage = None
    HAS_PIL = False


def real_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode over Arrow batches of (doc_id, payload, n_bytes, h60).

    Same Iterator[pd.DataFrame] -> Iterator[pd.DataFrame] contract as
    fake_decode_batch, so it swaps into the same mapInPandas call site.
    The per-payload loop is inherent — an image codec is per-row work;
    the Arrow transfer keeps the batch boundary vectorized.  Undecodable
    payloads yield format=NULL and 0x0 dims instead of killing the job
    (poison-row tolerance, same stance as the DLQ decode paths).

    Raises NotImplementedError without PIL so the documented swap-in
    fails with THIS error, not a confusing iterator-vs-DataFrame one.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL (pip install pillow); use "
            "fake_decode_batch for the deterministic container/oracle path"
        )
    import io

    for pdf in batches:
        fmts: list[str | None] = []
        widths: list[int] = []
        heights: list[int] = []
        for payload in pdf["payload"]:
            try:
                with _PILImage.open(io.BytesIO(payload)) as im:
                    fmts.append((im.format or "").lower())
                    widths.append(int(im.width))
                    heights.append(int(im.height))
            except Exception:  # noqa: BLE001 — any codec failure is a poison row
                fmts.append(None)
                widths.append(0)
                heights.append(0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"],
                "format": pd.Series(fmts, dtype="object"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
            }
        )


def decode_binary_column(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use_real: bool | None = None,
) -> DataFrame:
    """Decode a binary image column into typed metadata.

    ``use_real=None`` picks the PIL decoder when importable and falls back
    to the deterministic stub otherwise; pass False to force the stub
    (the oracle-verifiable path) or True to require PIL (raises without it).
    """
    if use_real is None:
        use_real = HAS_PIL
    payload = F.col(payload_col)
    payloads = df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        md5_h60(payload).alias("h60"),
    )
    return payloads.mapInPandas(
        real_decode_batch if use_real else fake_decode_batch, schema=DECODE_SCHEMA
    )


def md5_h60(col: F.Column) -> F.Column:
    """First 15 hex digits of md5 as a 60-bit long, computed JVM-side
    (hashlib.md5 == Spark md5 == DuckDB md5, and 60 bits fits a long
    exactly). Hashing upstream keeps the Arrow-batch Python stages pure
    numpy — no per-row Python anywhere in mm_*."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder over Arrow batches of
    (doc_id, payload, n_bytes, h60).

    Pseudo-metadata from the JVM-computed md5 residue: format = h % 3,
    width/height from further residues — bit-identical to the SQL oracle's
    md5 arithmetic. A real decoder reads ``payload`` instead and ignores
    ``h60``; the batch shape is identical.
    """
    import numpy as np

    formats = np.array(FORMATS)
    for pdf in batches:
        h60 = pdf["h60"].to_numpy()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"],
                "format": formats[h60 % 3],
                "width": (16 * (1 + h60 % 120)).astype("int64"),
                "height": (16 * (1 + (h60 // 120) % 68)).astype("int64"),
            }
        )


def decoded_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> decoded metadata via the Arrow-batched decode
    stage — the shared front half of mm_decode_metadata and mm_resize_plan,
    routed through :func:`decode_binary_column` (one definition of the
    payload projection + decode plumbing), pinned to the stub decoder
    because the fixtures' payloads are text and the oracles mirror the
    md5 arithmetic.  Note: the decode stage itself is a Python
    mapInPandas, NOT whole-stage codegen; only the downstream shape math
    is codegen."""
    # No spread() here (r14): the round-robin exchange ships the payload
    # bytes — the heavy opaque column — just to parallelize a trivially
    # cheap Arrow stage, and each of the 32 post-exchange tasks pays a
    # Python-worker round trip (guide §8: never shuffle payloads to
    # parallelize cheap work; §2.3 project-before-exchange).  On a real
    # deployment scan parallelism tracks input splits, which is where the
    # decode stage's parallelism comes from.  Measured at sf0.1:
    # 0.68 -> 0.27 s (interleaved A/B, min of 5).
    d = load_table(spark, "documents", sf_dir)
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return decode_binary_column(payloads, use_real=False)



@register(
    "mm_decode_metadata",
    category="multimodal",
    doc=(
        "Binary-column pipeline: utf-8 payload bytes -> Arrow-batched mapInPandas "
        "'decode' (stub) -> typed metadata. Verifies the binary encoding, UDF "
        "batch shape, and schema plumbing end to end via md5 parity."
    ),
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CASE CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 3
                    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
               CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 120) AS BIGINT) AS width,
               CAST(16 * (1 + (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) // 120) % 68) AS BIGINT) AS height
        FROM documents
        ORDER BY doc_id
    """,
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sorted_view: the Arrow decode stage must not run twice for the
    # range-partition sample (functions.sorted_view)
    return sorted_view(decoded_meta(spark, sf_dir), "doc_id")


@register(
    "mm_frame_sample",
    category="multimodal",
    doc=(
        "Frame-sampling plumbing: each binary payload expands to a deterministic "
        "number of 'frames' (1 + md5 % 4) with per-frame offsets — the mapInPandas "
        "1-to-N expansion shape used for video frame extraction."
    ),
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   1 + CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 4 AS n_frames
            FROM documents
        )
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(f * 40 AS BIGINT) AS ts_ms
        FROM meta, unnest([0, 1, 2, 3]) AS t(f)
        WHERE f < n_frames
        ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): see decoded_meta — split-tracked parallelism at scale,
    # and locally the exchange + 32 Python worker round trips cost more
    # than the single-stream Arrow pass saves
    d = load_table(spark, "documents", sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    payloads = d.select(
        "doc_id", (md5_h60(payload) % 4 + 1).cast("long").alias("n_frames")
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized 1-to-N expansion: repeat each doc by its frame count,
            # then number frames with a per-doc resetting arange
            n_frames = pdf["n_frames"].to_numpy()
            idx = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(n_frames.sum()) - starts
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[idx],
                    "frame_idx": frame_idx.astype("int64"),
                    "ts_ms": (frame_idx * 40).astype("int64"),
                }
            )

    return sorted_view(
        payloads.mapInPandas(
            sample_frames, schema="doc_id long, frame_idx long, ts_ms long"
        ),
        "doc_id", "frame_idx",
    )


RESIZE_TARGET = 256  # fit longest side to 256, preserve aspect (integer math)


@register(
    "mm_resize_plan",
    category="multimodal",
    doc=(
        "Resize-stage plumbing: decoded (width, height) metadata -> integer "
        f"fit-to-{RESIZE_TARGET} output dims (longest side {RESIZE_TARGET}, "
        "aspect preserved, floor division — the deterministic shape math a "
        "real resize kernel receives; the pixel op itself is the stubbed "
        "decode's swap-in point). The shape math runs in whole-stage "
        "codegen downstream of the Arrow decode stage."
    ),
    oracle=f"""
        WITH meta AS (
            SELECT doc_id,
                   CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 120) AS BIGINT) AS width,
                   CAST(16 * (1 + (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) // 120) % 68) AS BIGINT) AS height
            FROM documents
        )
        SELECT doc_id, width, height,
               CAST(CASE WHEN width >= height THEN {RESIZE_TARGET}
                    ELSE (width * {RESIZE_TARGET}) // height END AS BIGINT) AS out_width,
               CAST(CASE WHEN width >= height THEN (height * {RESIZE_TARGET}) // width
                    ELSE {RESIZE_TARGET} END AS BIGINT) AS out_height
        FROM meta
        ORDER BY doc_id
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = decoded_meta(spark, sf_dir)
    w, h = F.col("width"), F.col("height")
    t = F.lit(RESIZE_TARGET)
    return sorted_view(
        meta.select(
            "doc_id",
            "width",
            "height",
            F.when(w >= h, t).otherwise((w * t).cast("long") / h).cast("long").alias("out_width"),
            F.when(w >= h, (h * t).cast("long") / w).otherwise(t).cast("long").alias("out_height"),
        ),
        "doc_id",
    )


N_FEATURES = 8


@register(
    "mm_feature_extract",
    category="multimodal",
    doc=(
        f"Feature-extraction plumbing: each binary payload -> {N_FEATURES} "
        "deterministic integer features (md5-chained residues standing in for "
        "a real extractor's output vector; same Arrow batch shape a model UDF "
        "would use). Oracle mirrors the md5 arithmetic exactly."
    ),
    oracle=f"""
        SELECT doc_id,
               {", ".join(f"CAST(CAST(concat('0x', substr(md5(text || '#{i}'), 1, 15)) AS BIGINT) % 1000 AS BIGINT) AS f{i}" for i in range(N_FEATURES))}
        FROM documents
        ORDER BY doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): see decoded_meta
    d = load_table(spark, "documents", sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    # the md5 chaining runs JVM-side; the Arrow stage below is the pure-numpy
    # batch transform a real model UDF would replace
    payloads = d.select(
        "doc_id",
        *[
            md5_h60(F.concat(payload, F.lit(f"#{i}".encode()))).alias(f"h{i}")
            for i in range(N_FEATURES)
        ],
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            for i in range(N_FEATURES):
                out[f"f{i}"] = (pdf[f"h{i}"].to_numpy() % 1000).astype("int64")
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"f{i} long" for i in range(N_FEATURES))
    return sorted_view(payloads.mapInPandas(extract, schema=schema), "doc_id")
