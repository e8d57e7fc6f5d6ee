"""Round-14 serving/maintenance profiler: bench.py's serving-state setup,
then per-read timing + plan + stage attribution (same methodology as
tools/profile_r14.py, applied to the serve_*/maint_* bench rows).

Run: PYTHONPATH=/root/repo python tools/profile_serving_r14.py [--names serve_mix_sample ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def _at_least_one(v: str) -> int:
        n = int(v)
        if n < 1:
            # --stages reads jobs_before (set inside the run loop) after the
            # loop, and min(samples) needs a non-empty array (ADVICE r14)
            raise argparse.ArgumentTypeError("--runs must be >= 1")
        return n

    ap.add_argument("--runs", type=_at_least_one, default=3)
    ap.add_argument("--tag", default=None, help="write plans/r14/<name>_<tag>.txt")
    ap.add_argument("--plans-subdir", default="r14", help="plans/<subdir>/ for plan captures")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        pq_seeds,
        pq_subvectors,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from cdc_platform_spark.plans.explain import explain_text
    from cdc_platform_spark.session import get_spark
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        BucketedIvfPqIndexSink,
        IvfCellProjection,
        ivf_cluster_sample_from_index,
        ivf_drift_from_index,
        ivf_pq_search_from_index,
        pq_recon_from_index,
        rotate_ivf_pq_generation,
    )
    from cdc_platform_spark.streaming.dedup_index import CuratedCorpusSink

    spark = get_spark(
        app_name="profile-serving-r14",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        url = f"http://localhost:4049/api/v1/applications/{app_id}/{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plandir = os.path.join(here, "plans", args.plans_subdir)
    os.makedirs(plandir, exist_ok=True)

    SF_DIR = args.sf
    serving_dir = tempfile.mkdtemp(prefix="cdc-prof-serving-")
    try:
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "source", "text"
        )
        corpus = CuratedCorpusSink(f"{serving_dir}/corpus", n_buckets=16)
        corpus.write(
            d.select(
                "doc_id", F.col("doc_id").alias("offset"), F.lit("c").alias("op"),
                "text", "lang", "source",
            )
        )
        e = _fixed_embeddings(spark, SF_DIR).localCheckpoint(eager=True)
        cents = train_ivf_centroids(e)
        seeds = pq_seeds(e)
        codebooks = train_pq_codebooks(pq_subvectors(e.select("vec_id", "a")), seeds)
        ranks = seeds.withColumn(
            "code", (F.row_number().over(Window.orderBy("cent_id")) - 1).cast("long")
        )
        vec_rows = e.select(
            "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
        )
        flat = BucketedIvfFlatIndexSink(f"{serving_dir}/flat", cents, n_buckets=16)
        flat.write(vec_rows)
        pq = BucketedIvfPqIndexSink(
            f"{serving_dir}/pq", cents, codebooks, ranks, n_buckets=16
        )
        pq.write(vec_rows)

        reads = {
            "serve_curated": lambda: corpus.curated(spark),
            "serve_decontaminated": lambda: corpus.decontaminated(spark),
            "serve_contamination_report": lambda: corpus.contamination_report(spark),
            "serve_clusters": lambda: corpus.clusters(spark),
            "serve_shard_manifest": lambda: corpus.shard_manifest(spark),
            "serve_mix_sample": lambda: corpus.mix_sample(spark),
            "serve_mix_tokens": lambda: corpus.mix_sample_tokens(spark),
            "serve_cluster_reps": lambda: corpus.cluster_representatives(spark),
            "serve_export": lambda: corpus.export_docs(spark, decontaminated=True),
            "serve_ivf_pq_search": lambda: ivf_pq_search_from_index(
                pq.state(spark), flat.state(spark), cents, codebooks, ranks
            ),
            "serve_cluster_sample": lambda: ivf_cluster_sample_from_index(
                flat.state(spark)
            ),
            "serve_ivf_drift": lambda: ivf_drift_from_index(flat.state(spark), cents),
            "serve_pq_recon": lambda: pq_recon_from_index(flat.state(spark), codebooks),
        }

        names = args.names or list(reads.keys())

        def profile_action(name: str, make_df, action=None):
            """warmup + min-of-N over `action` (defaults to noop-save of make_df())."""
            if action is None:
                def action():  # noqa: ANN202
                    make_df().write.format("noop").mode("overwrite").save()
            if args.tag and make_df is not None:
                with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(explain_text(make_df()))
            spark.sparkContext.setJobDescription(f"{name} warmup")
            t0 = time.perf_counter()
            action()
            warm = round(time.perf_counter() - t0, 3)
            samples = []
            import gc

            for i in range(args.runs):
                gc.collect()
                spark._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"{name} run{i}")
                if args.stages and i == args.runs - 1:
                    jobs_before = {j["jobId"] for j in rest("jobs")}
                t0 = time.perf_counter()
                action()
                samples.append(round(time.perf_counter() - t0, 3))
            row: dict = {"warm": warm, "samples": samples, "min": min(samples)}
            if args.stages:
                new_jobs = [j for j in rest("jobs") if j["jobId"] not in jobs_before]
                stage_ids = sorted({s for j in new_jobs for s in j["stageIds"]})
                stages = []
                for s in rest("stages?status=complete"):
                    if s["stageId"] in stage_ids:
                        stages.append(
                            {
                                "stage": s["stageId"],
                                "name": s["name"].split("\n")[0][:60],
                                "tasks": s["numCompleteTasks"],
                                "wall_ms": (s.get("executorRunTime") or 0),
                                "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                                "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                                "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                                "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
                            }
                        )
                row["stages"] = sorted(stages, key=lambda x: -x["wall_ms"])[:12]
            print(json.dumps({name: row}), flush=True)
            return row

        out = {}
        for name in names:
            if name in reads:
                out[name] = profile_action(name, reads[name])

        # maintenance verbs (only when asked by name)
        if args.names and any(n.startswith("maint_") for n in args.names):
            if "maint_export_publish" in args.names:
                out["maint_export_publish"] = profile_action(
                    "maint_export_publish",
                    None,
                    lambda: corpus.export_to_table(
                        spark, f"{serving_dir}/export_tbl", decontaminated=True
                    ),
                )
            # seed tombstones as bench.py does
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
            if "maint_corpus_compact" in args.names:
                out["maint_corpus_compact"] = profile_action(
                    "maint_corpus_compact",
                    None,
                    lambda: corpus.compact(spark, tombstone_horizon=10**12),
                )
            if "maint_cell_refresh_delta" in args.names:
                proj = IvfCellProjection(f"{serving_dir}/proj")
                proj.refresh_from_primary(spark, flat)  # bootstrap
                state = {"i": 0}

                def refresh():
                    i = state["i"]
                    delta = e.filter(F.col("vec_id") % 50 == i % 50).select(
                        "vec_id",
                        (F.col("vec_id") + F.lit((i + 1) * 10**9)).alias("offset"),
                        F.lit("u").alias("op"),
                        "a",
                    )
                    flat.write(delta)
                    state["i"] += 1
                    t0 = time.perf_counter()
                    proj.refresh_from_primary(spark, flat)
                    print(f"  refresh inner {time.perf_counter()-t0:.3f}")

                out["maint_cell_refresh_delta"] = profile_action(
                    "maint_cell_refresh_delta", None, refresh
                )
            if "maint_pq_rotate" in args.names:
                gen = {"i": 0}

                def rotate():
                    gen["i"] += 1
                    rotate_ivf_pq_generation(
                        spark, pq, flat, f"{serving_dir}/pq_gen{gen['i']}",
                        cents, codebooks, ranks,
                    )

                out["maint_pq_rotate"] = profile_action("maint_pq_rotate", None, rotate)

        print("TOTAL " + json.dumps({n: r["min"] for n, r in out.items()}))
    finally:
        shutil.rmtree(serving_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
