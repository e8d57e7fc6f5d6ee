"""Round-13 adjudication repro for the BENCH_r12 `maint_corpus_compact`
7.30 s reading (VERDICT r12 finding #1).

Mirrors bench.py's serving-state build + maintenance section EXACTLY
(same sf, same corpus seed, same tombstone seed, same 3-run loop), but
parameterized on whether the `maint_export_publish` block runs first —
the one bench-harness change upstream of the compact in round 12.

Usage:
    python tools/repro_maint_compact.py with-export
    python tools/repro_maint_compact.py no-export

Prints one JSON line with the per-run sample arrays for both verbs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(variant: str) -> None:
    from pyspark.sql import functions as F

    from cdc_platform_spark.session import get_spark
    from cdc_platform_spark.streaming.dedup_index import CuratedCorpusSink

    spark = get_spark(app_name="repro-maint-compact")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    serving_dir = tempfile.mkdtemp(prefix="cdc-repro-maint-")
    out: dict = {"variant": variant, "sf": SF_DIR}
    try:
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "source", "text"
        )
        corpus = CuratedCorpusSink(f"{serving_dir}/corpus", n_buckets=16)
        t0 = time.perf_counter()
        corpus.write(
            d.select(
                "doc_id",
                F.col("doc_id").alias("offset"),
                F.lit("c").alias("op"),
                "text",
                "lang",
                "source",
            )
        )
        out["corpus_build_sec"] = round(time.perf_counter() - t0, 3)

        if variant == "with-export":
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                corpus.export_to_table(
                    spark, f"{serving_dir}/export_tbl", decontaminated=True
                )
                samples.append(round(time.perf_counter() - t0, 3))
            out["maint_export_publish"] = samples

        corpus.write(
            d.filter(F.col("doc_id") % 37 == 0).select(
                "doc_id",
                (F.col("doc_id") + F.lit(10**9)).alias("offset"),
                F.lit("d").alias("op"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("source"),
            )
        )
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            corpus.compact(spark, tombstone_horizon=10**12)
            samples.append(round(time.perf_counter() - t0, 3))
        out["maint_corpus_compact"] = samples
    finally:
        shutil.rmtree(serving_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "with-export")
