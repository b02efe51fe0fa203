"""Headline benchmark: runs the bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is executed twice: a warm-up (JIT/codegen/page-cache) and a
timed run; the timed run materializes results via count() on the
driver (no collect of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rootstock_collective_state_sync_spark import get_spark
    from rootstock_collective_state_sync_spark.plans.registry import bench_queries

    spark = get_spark("bench")
    qs = bench_queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        fn(spark, sf_dir).count()  # warm-up (JIT, codegen, page cache)
        best = float("inf")
        for _ in range(2):  # best-of-2: damps GC/plan-cache jitter
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
