"""Per-round sf1 decade sweep (r10 verdict item 7): build the
constructed sf1 point (tools/scale_data.py, 10x sf0.1,
dup-density-preserving), time every bench-tagged query at sf0.1 AND
sf1 (median-of-3 warm, same harness discipline as bench.py), and emit
``BENCH_sf1_r<N>.json`` at the repo root so decade-scale regressions
are tracked round-over-round like the sf0.1 bench. The paired
pure-CPU calibration probe runs before and after so ratios can be
host-drift-normalized.

The artifact is gated by ``tests/test_scaling_artifact.py``: the
celled-graph family must stay on its linear asymptote, and no
headline query's sf1/sf0.1 ratio may double round-over-round.

r12 (verdict item 4): the sf0.1 and sf1 legs are INTERLEAVED per
query with a per-query calibration probe — the r11 artifact ran all
sf1 legs last and the host slowed 2.1x mid-sweep, inflating every
late ratio (dedup_minhash_lsh read 13.3x where the drift-adjusted
truth was ~6x). Per-query pairing means both legs of a ratio see the
same host regime; ``calibration_per_query`` records the probe beside
each pair.

Usage: PYTHONPATH=/root/repo python tools/sf1_bench.py <round_no>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_data import build  # noqa: E402

RUNS = 3


def _time_one(spark, name, sf_dir):
    from rootstock_collective_state_sync_spark.caching import release_tracked
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    spark.catalog.clearCache()
    release_tracked()
    spark._jvm.System.gc()
    fn = SPECS[name].fn
    fn(spark, sf_dir).count()  # warm-up
    release_tracked()
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        ts.append(time.perf_counter() - t0)
        release_tracked()
    return round(sorted(ts)[RUNS // 2], 4)


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    from bench import _calibrate, _calibrate_mt

    from rootstock_collective_state_sync_spark.plans.registry import SPECS
    from rootstock_collective_state_sync_spark.session import get_spark

    sf1_dir = build(os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"))
    names = sorted(n for n, s in SPECS.items() if "bench" in s.tags)
    calibration = _calibrate()
    calibration_mt = _calibrate_mt()
    spark = get_spark("sf1-bench")
    t01, t1, cal_q = {}, {}, {}
    for n in names:  # interleaved: both legs of a ratio share a regime
        cal_q[n] = _calibrate()
        t01[n] = _time_one(spark, n, "/root/testdata/sf0.1")
        t1[n] = _time_one(spark, n, sf1_dir)
    calibration_end = _calibrate()
    calibration_mt_end = _calibrate_mt()
    spark.stop()

    ratios = {
        n: round(t1[n] / t01[n], 3) if t01[n] > 0 else None for n in names
    }
    payload = {
        "metric": "sf1_decade_sweep",
        "round": round_no,
        "sf0_1": t01,
        "sf1": t1,
        "ratio_sf1_over_sf0_1": ratios,
        "calibration_sec": calibration,
        "calibration_end_sec": calibration_end,
        # the MULTI-CORE probe (r12 verdict item 4): an ambient
        # co-tenant stealing cores inflates 32-way stages while the
        # single-thread probe reads equal — round-over-round readers
        # normalize by this when the MT regime differs >1.2x
        "calibration_mt_sec": calibration_mt,
        "calibration_mt_end_sec": calibration_mt_end,
        "calibration_per_query": cal_q,
        "runs_per_query": RUNS,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_sf1_r{round_no:02d}.json",
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
