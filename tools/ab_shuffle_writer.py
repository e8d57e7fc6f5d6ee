"""A/B the shuffle writer path for the bench session (round 14).

With spark.sql.shuffle.partitions=32 (< spark.shuffle.sort.bypassMergeThreshold
default 200) every exchange uses the BypassMergeSortShuffleWriter: R partition
files per map task, created then concatenated.  At the 100 TB design point
R >> 200 so production always takes the sort-based writer (one file + index
per map task); forcing it locally (bypassMergeThreshold=0) both matches the
production code path and avoids M*R file creations on this filesystem.

bypassMergeThreshold is a core conf fixed at context start, so the A/B runs
alternating fresh JVMs: A B A B ... with min-of-runs per arm.

Run: PYTHONPATH=/root/repo python tools/ab_shuffle_writer.py [--rounds 3] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time
sys.path.insert(0, "/root/repo")
from cdc_platform_spark.operators import load_all
from cdc_platform_spark.session import get_spark

names = json.loads(sys.argv[1])
extra = json.loads(sys.argv[2])
sf = sys.argv[3]
registry = load_all()
spark = get_spark(app_name="ab-shuffle", extra_conf=extra)
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name in names:
    def run():
        df = registry[name].builder(spark, sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    run()  # warm-up
    samples = [round(run(), 3) for _ in range(3)]
    import gc
    gc.collect(); spark._jvm.System.gc()
    out[name] = samples
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_arm(names: list[str], extra: dict[str, str], sf: str) -> dict[str, list[float]]:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, json.dumps(names), json.dumps(extra), sf],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-3000:], file=sys.stderr)
    print(p.stderr[-3000:], file=sys.stderr)
    raise RuntimeError("worker failed")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--conf", default='{"spark.shuffle.sort.bypassMergeThreshold": "0"}',
                    help="JSON extra conf for arm B (arm A = engine defaults)")
    args = ap.parse_args()
    conf_b = json.loads(args.conf)

    acc = {"A": {n: [] for n in args.names}, "B": {n: [] for n in args.names}}
    for r in range(args.rounds):
        for arm, extra in (("A", {}), ("B", conf_b)):
            res = run_arm(args.names, extra, args.sf)
            for n, samples in res.items():
                acc[arm][n].extend(samples)
            print(f"round {r} arm {arm}: " + json.dumps(res), flush=True)
    print("\n== mins over all JVMs ==")
    for n in args.names:
        a, b = min(acc["A"][n]), min(acc["B"][n])
        print(f"{n}: A(default)={a:.3f}  B={b:.3f}  delta={100 * (b - a) / a:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
