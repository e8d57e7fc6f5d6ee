"""A/B two repo trees (e.g. HEAD vs the r13 worktree) on named bench queries.

VERDICT r14 item 1: the driver flagged q10/q05/q26/q51 as regressed at 32
cores, while the 8-core run and unchanged plan shapes said noise.  Settle it
the way tools/ab_shuffle_writer.py settles config A/Bs: alternating fresh
JVMs per arm (A = tree A, B = tree B), bench.py methodology inside each JVM
(warm-up + min-of-N with GC between runs), min over all JVMs per arm.

Run:
  PYTHONPATH=/root/repo python tools/ab_trees.py \
      --tree-a /root/repo --tree-b /root/r13tree --rounds 5 \
      q10_agg_pricing_summary q05_join_multiway q26_cdc_append q51_shipping_priority
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

WORKER = """
import json, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from cdc_platform_spark.operators import load_all
from cdc_platform_spark.session import get_spark

names = json.loads(sys.argv[2])
sf = sys.argv[3]
registry = load_all()
spark = get_spark(app_name="ab-trees")
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name in names:
    def run():
        df = registry[name].builder(spark, sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    run()  # warm-up
    samples = []
    for _ in range(3):
        samples.append(round(run(), 3))
        import gc
        gc.collect(); spark._jvm.System.gc()
    out[name] = samples
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_arm(repo: str, names: list[str], sf: str) -> dict[str, list[float]]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the worker pins sys.path itself
    p = subprocess.run(
        [sys.executable, "-c", WORKER, repo, json.dumps(names), sf],
        capture_output=True, text=True, timeout=1800, env=env, cwd=repo,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-3000:], file=sys.stderr)
    print(p.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"worker failed for {repo}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tree-a", default="/root/repo")
    ap.add_argument("--tree-b", default="/root/r13tree")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    acc = {"A": {n: [] for n in args.names}, "B": {n: [] for n in args.names}}
    for r in range(args.rounds):
        for arm, repo in (("A", args.tree_a), ("B", args.tree_b)):
            res = run_arm(repo, args.names, args.sf)
            for n, samples in res.items():
                acc[arm][n].extend(samples)
            print(f"round {r} arm {arm}({repo}): " + json.dumps(res), flush=True)
    print("\n== per-query summary (min / median over all JVMs) ==")
    for n in args.names:
        a, b = acc["A"][n], acc["B"][n]
        print(
            f"{n}: A={min(a):.3f}/{statistics.median(a):.3f}  "
            f"B={min(b):.3f}/{statistics.median(b):.3f}  "
            f"min-delta A vs B {100 * (min(a) - min(b)) / min(b):+.1f}%"
        )
    print("RAW " + json.dumps(acc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
