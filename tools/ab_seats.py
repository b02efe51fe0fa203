"""Interleaved worktree A/B for bench seats (the repo's established
methodology for settling code questions on a drift-prone host: run
tree A and tree B back-to-back per round so ambient regime changes
cancel; compare per-seat minima across rounds).

Usage:
  python tools/ab_seats.py <rounds> <runs> <seatA,seatB,...> \
      <label=tree_path> <label=tree_path> [...]

Each (round, tree) leg is a fresh subprocess/SparkSession that ages
the listed seats once (untimed), then per seat: clearCache +
release_tracked + System.gc, one warm-up, <runs> timed runs, min
reported. Output: per-leg JSON lines and a final per-seat summary of
min-over-rounds per tree.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEG_CODE = r"""
import json, os, sys, time
tree = sys.argv[1]
seats = sys.argv[2].split(",")
runs = int(sys.argv[3])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, tree)
from rootstock_collective_state_sync_spark import get_spark
from rootstock_collective_state_sync_spark.caching import release_tracked
from rootstock_collective_state_sync_spark.plans.registry import bench_queries
spark = get_spark("ab_seats")
qs = bench_queries()
for name in seats:
    spark.sparkContext.setJobDescription(f"age:{name}")
    qs[name](spark, sf_dir).count()
    spark.catalog.clearCache(); release_tracked()
out = {}
for name in seats:
    spark.catalog.clearCache(); release_tracked()
    spark._jvm.System.gc()
    spark.sparkContext.setJobDescription(f"ab:{name}")
    qs[name](spark, sf_dir).count()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    out[name] = round(min(samples), 4)
print("ABLEG " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    rounds = int(sys.argv[1])
    runs = int(sys.argv[2])
    seats = sys.argv[3]
    trees = [a.split("=", 1) for a in sys.argv[4:]]
    results: dict[str, dict[str, list[float]]] = {
        lbl: {s: [] for s in seats.split(",")} for lbl, _ in trees
    }
    for r in range(rounds):
        for lbl, path in trees:
            env = dict(os.environ)
            env["PYTHONPATH"] = path
            p = subprocess.run(
                [sys.executable, "-c", LEG_CODE, path, seats, str(runs)],
                capture_output=True,
                text=True,
                env=env,
                cwd=path,
            )
            line = next(
                (l for l in p.stdout.splitlines() if l.startswith("ABLEG ")),
                None,
            )
            if line is None:
                print(f"round {r} {lbl}: LEG FAILED", file=sys.stderr)
                print(p.stdout[-2000:], file=sys.stderr)
                print(p.stderr[-2000:], file=sys.stderr)
                sys.exit(1)
            leg = json.loads(line[6:])
            for s, v in leg.items():
                results[lbl][s].append(v)
            print(f"round {r} {lbl}: {leg}", flush=True)
    print("\nper-seat min over rounds:")
    labels = [lbl for lbl, _ in trees]
    for s in seats.split(","):
        row = "  ".join(f"{lbl}={min(results[lbl][s]):.3f}" for lbl in labels)
        print(f"{s:32s} {row}")
    print("ABSUMMARY " + json.dumps(
        {lbl: {s: min(v) for s, v in per.items()} for lbl, per in results.items()}
    ))


if __name__ == "__main__":
    main()
