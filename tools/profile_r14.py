"""Round-14 optimization profiler: per-query timing + plan + stage breakdown.

For each named registry query at $SPARK_GRAFT_SF_DIR (default sf0.1):
  - capture .explain("formatted") to plans/r14/<name>_<tag>.txt
  - noop-sink timing, warm-up + min of N (same methodology as bench.py)
  - per-stage wall/metric breakdown via the Spark UI REST API so the
    expensive stage (scan / exchange / python / window) is identifiable

Run: PYTHONPATH=/root/repo python tools/profile_r14.py [--tag before] [--runs 3] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true", help="skip writing the plan file")
    ap.add_argument("--plans-subdir", default="r14", help="plans/<subdir>/ for plan captures")
    ap.add_argument("--stages", action="store_true", help="dump per-stage REST metrics of the last run")
    ap.add_argument("--sql", action="store_true", help="dump per-node SQL metrics of the last run")
    args = ap.parse_args()

    from cdc_platform_spark.operators import load_all
    from cdc_platform_spark.plans.explain import explain_text
    from cdc_platform_spark.session import get_spark

    registry = load_all()
    spark = get_spark(
        app_name="profile-r14",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plandir = os.path.join(here, "plans", args.plans_subdir)
    os.makedirs(plandir, exist_ok=True)

    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        url = f"http://localhost:4049/api/v1/applications/{app_id}/{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    out: dict[str, dict] = {}
    for name in args.names:
        df = registry[name].builder(spark, args.sf)
        if not args.no_plan:
            with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(explain_text(df))

        def run() -> float:
            d = registry[name].builder(spark, args.sf)
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"{name} warmup")
        run()
        samples = []
        import gc

        for i in range(args.runs):
            gc.collect()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            if args.stages and i == args.runs - 1:
                jobs_before = {j["jobId"] for j in rest("jobs")}
            samples.append(round(run(), 3))
        row: dict = {"samples": samples, "min": min(samples)}
        if args.stages:
            new_jobs = [j for j in rest("jobs") if j["jobId"] not in jobs_before]
            stage_ids = sorted({s for j in new_jobs for s in j["stageIds"]})
            stages = []
            for s in rest("stages?status=complete"):
                if s["stageId"] in stage_ids:
                    stages.append(
                        {
                            "stage": s["stageId"],
                            "name": s["name"].split("\n")[0][:70],
                            "tasks": s["numCompleteTasks"],
                            "wall_ms": (s.get("executorRunTime") or 0),
                            "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                            "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                            "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                            "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
                            "spill_mb": round((s.get("diskBytesSpilled") or 0) / 1e6, 1),
                        }
                    )
            row["stages"] = sorted(stages, key=lambda x: -x["wall_ms"])
        if args.sql:
            execs = rest("sql?length=1000&details=true&planDescription=false")
            last = max(execs, key=lambda e: e["id"])
            nodes = []
            for nd in last.get("nodes", []):
                ms = {m["name"]: m["value"] for m in nd.get("metrics", [])}
                keep = {
                    k: v
                    for k, v in ms.items()
                    if any(
                        t in k
                        for t in (
                            "time",
                            "rows",
                            "spill",
                            "data size",
                            "shuffle bytes",
                            "bytes written",
                        )
                    )
                }
                if keep:
                    nodes.append({"node": f"{nd['nodeId']}:{nd['nodeName']}", **keep})
            row["sql_nodes"] = nodes
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    print("TOTAL " + json.dumps({n: r["min"] for n, r in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
