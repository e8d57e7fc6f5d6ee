"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs — the Spark
pattern for decode / feature-extract / resize / frame-sample stages.

The real decode libraries are not in this container, so the decode
step is a STUB: :func:`fake_decode_batch` derives deterministic
pseudo-metadata from the payload's md5 (hashlib.md5 == Spark md5 ==
DuckDB md5, so the whole pipeline stays oracle-verifiable end to end).
A production deployment swaps ``fake_decode_batch`` for a real decoder
with the same signature — the Spark-side plumbing (binary encoding,
schema, Arrow batch shape, partitioning) is exactly what ships.

``real_decode_batch`` marks the unimplemented real path explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.functions import spread
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table

DECODE_SCHEMA = "doc_id long, n_bytes long, format string, width long, height long"
FORMATS = ("jpeg", "png", "webp")


def real_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode — requires PIL/libvips, not present in this container.

    Same Iterator[pd.DataFrame] -> Iterator[pd.DataFrame] contract as
    fake_decode_batch, so the documented swap-in (pass this to mapInPandas
    in fake_decode_batch's place) fails with THIS error, not a confusing
    iterator-vs-DataFrame type error."""
    raise NotImplementedError(
        "real image decode requires an imaging library; use fake_decode_batch "
        "for the deterministic test path"
    )
    yield  # pragma: no cover — marks this as a generator (mapInPandas contract)


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
    stage — the shared front half of mm_decode_metadata and mm_resize_plan
    (one definition of the payload projection + decode plumbing).  Note:
    the decode stage itself is a Python mapInPandas, NOT whole-stage
    codegen; only the downstream shape math is codegen."""
    d = spread(load_table(spark, "documents", sf_dir))
    payload = F.encode(F.col("text"), "utf-8")
    payloads = d.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        md5_h60(payload).alias("h60"),
    )
    return payloads.mapInPandas(fake_decode_batch, schema=DECODE_SCHEMA)



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
    return decoded_meta(spark, sf_dir).orderBy("doc_id")


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
    d = spread(load_table(spark, "documents", sf_dir))
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

    return payloads.mapInPandas(
        sample_frames, schema="doc_id long, frame_idx long, ts_ms long"
    ).orderBy("doc_id", "frame_idx")


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
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.when(w >= h, t).otherwise((w * t).cast("long") / h).cast("long").alias("out_width"),
        F.when(w >= h, (h * t).cast("long") / w).otherwise(t).cast("long").alias("out_height"),
    ).orderBy("doc_id")


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
    d = spread(load_table(spark, "documents", sf_dir))
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
    return payloads.mapInPandas(extract, schema=schema).orderBy("doc_id")
