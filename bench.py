"""Headline benchmark: runs the bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query runs once as warm-up (JIT/codegen/page-cache), then
``SPARK_GRAFT_BENCH_RUNS`` (default 7) timed runs; the reported figure
is the MEDIAN, with per-query [min, max] spread AND the per-query MIN
(``queries_min``) persisted alongside. The min is the stall-robust
statistic: the r08 driver run recorded ``window_session`` at 0.526 s
(floor 0.512) where the identical commit measures 0.357 s (floor 0.29)
hours later — a sustained ambient host stall inflated every sample in
that measurement window, so even the floor lied. Round-over-round
comparisons should prefer ``queries_min[q] / calibration_sec`` ratios;
``calibration_end_sec`` (same probe, run AFTER the queries) bounds
mid-run host drift that a single start-of-run probe cannot see.
Results materialize via count() on the driver (no collect of wide
rows).

Two-layer output (r15 verdict items 1+8): stdout is ONE compact JSON
line sized to survive the driver's 2000-char tail — its ``queries``
map carries the per-query MINIMA (``queries_stat: "min"``) plus the
``contaminated_seats`` labels; the lossless record (medians, spread,
calibration probes) goes to ``BENCH_latest.full.json``. A seat whose
within-run max/min spread exceeds 3x is labeled contaminated and
excluded from cross-round ratio math by ``tools/bench_compare.py``.

CROSS-ROUND COMPARISON NOTE (r18, r17 verdict item 3): the timed
loop reuses Spark's CacheManager across the 7 samples — each rebuilt
frame plan-matches onto the warm-up run's persisted intermediates, so
``queries``/``queries_min`` for persist-using seats (dedup/kmv/assoc)
are STEADY-STATE (cache-hit) figures. That has been true since round
1, so those two maps keep the old semantics for comparability with
BENCH_r01..r17; the additive ``queries_cold`` map (full artifact)
re-times each seat with ``clearCache()+release_tracked()`` before
EVERY sample, so each cold sample pays its own persist fills — the
per-sample-isolated statistic. Compare cold-to-cold or steady-to-
steady across rounds, never mixed. r18 also gates
``regime_identified`` on the fresh-page-fault probe (see
``_calibrate_pf``; r17 verdict item 6) — the probe geometry changed
in r18 (mmap touch-only), so pf readings are comparable from r18 on.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

# Pin BLAS to one thread per process BEFORE numpy loads (r17): the MT
# calibration probe runs 8 concurrent matmul threads — with a
# multi-threaded OpenBLAS each spawns #cores more, and the probe
# measures thread-thrash instead of core availability (measured 0.60 s
# vs 0.17 s for the IDENTICAL quiet host depending on the caller's
# inherited OPENBLAS_NUM_THREADS). The probe must be a property of the
# HOST, not of the launcher's environment. Executor-side pinning for
# the query kernels themselves lives in session.py (same rationale:
# 32 concurrent Python workers want 1 BLAS thread each).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _calibrate() -> float:
    """Fixed pure-CPU workload (numpy matmul + md5 loop), median of 3:
    a host-speed yardstick recorded alongside the query timings. The
    same code measured 25-40 % apart hours apart on this VM (noisy
    neighbor / frequency capping), so round-over-round comparisons
    should read `queries[q] / calibration_sec` ratios, not raw
    seconds."""
    import hashlib

    import numpy as np

    samples = []
    a = np.arange(512 * 512, dtype=np.float64).reshape(512, 512) / 1e6
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            a = a @ a % 1.7  # bounded values, fixed flop count
        h = b"x"
        for _ in range(200_000):
            h = hashlib.md5(h).digest()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 4)


#: Clean-regime band for the fresh-page-fault probe (r18). The floor
#: is the quiet-host reading of the r18 mmap-touch geometry below
#: (~0.10-0.14 s per 256 MiB observed across identified runs); a run
#: whose probe exceeds CLEAN x BAND is labeled pf_degraded and loses
#: `regime_identified` (r17 verdict item 6 / advice item 2: the pf
#: reading was recorded but never folded into the label, so a
#: fault-degraded run could still self-label identified).
PF_CLEAN_SEC = 0.14
PF_BAND = 2.0


def _calibrate_pf(mb: int = 256) -> float:
    """FRESH-PAGE-FAULT yardstick beside the CPU probes (r17): touch
    one double per 4 KiB page of a virgin anonymous ``mmap`` block,
    median of 3. Motivation: the r17 final-anchor attempt measured
    EVERY seat 1.5-2.4x above its floor (kaplan_meier 1.31 vs 0.66,
    in-run bursts to 22 s) while BOTH CPU probes read FASTER than the
    clean anchor run (0.258 vs 0.325 st / 0.108 vs 0.144 mt) and an
    interleaved worktree A/B exonerated the code — the host regime
    that poisons Spark work (hypervisor page-fault servicing on a
    memory-ballooned guest; every fresh JVM/Arrow/worker page waits
    on the host) is INVISIBLE to probes that loop over small reused
    buffers. This probe measures exactly that: ~65k page faults on
    virgin memory.

    r18 rebuild (r17 advice item 3): the first version allocated via
    ``np.zeros`` and timed allocation + touch — dependent on glibc
    taking the mmap path (an arena-reuse or allocator change silently
    re-reads cached pages) and polluted by the calloc itself. Now the
    block comes straight from anonymous ``mmap.mmap(-1, ...)`` (fresh
    zero pages by construction, new address every iteration) and the
    timed region is ONLY the touch loop. GEOMETRY SENSITIVITY: the
    reading is a property of (mb, stride 4 KiB, double writes);
    compare across runs of the same geometry only — r17 artifacts
    (np.zeros geometry, alloc included) are not directly comparable
    to r18+ readings."""
    import mmap

    import numpy as np

    samples = []
    n = mb * 1024 * 1024 // 8
    for _ in range(3):
        m = mmap.mmap(-1, mb * 1024 * 1024)
        a = np.frombuffer(m, dtype=np.float64, count=n)
        t0 = time.perf_counter()
        a[::512] = 1.0
        samples.append(time.perf_counter() - t0)
        del a
        m.close()
    return round(sorted(samples)[1], 4)


def _calibrate_mt(threads: int = 8) -> float:
    """MULTI-CORE yardstick beside the single-thread probe: a noisy
    co-tenant stealing cores is invisible to one thread (r12 measured
    every Arrow-UDF bench seat inflated 1.3-1.5x while the 1-thread
    probe read equal; the r10-code worktree reproduced the same
    inflation under the same host regime — code exonerated) but
    throttles N concurrent GIL-releasing matmuls exactly like it
    throttles executor threads. Median of 3."""
    import threading

    import numpy as np

    def work():
        a = np.arange(256 * 256, dtype=np.float64).reshape(256, 256) / 1e6
        for _ in range(30):
            a = a @ a % 1.7

    samples = []
    for _ in range(3):
        ts = [threading.Thread(target=work) for _ in range(threads)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 4)


def _settled_mt(max_probes: int = 5, tol: float = 1.10) -> float:
    """MT probe with a settle loop: probe until two consecutive
    readings agree within ``tol`` (or the probe budget runs out) and
    return the MINIMUM seen. All three r16 runs' START probes read
    1.8-6x their end probes on a host whose quiet floor was dead
    stable at ~0.104 (verified by back-to-back identified probes) —
    a process-start transient that made every run self-label
    unidentified even when the queries ran quiet. The minimum of a
    settled sequence is the regime, not the transient."""
    vals = [_calibrate_mt()]
    for _ in range(max_probes - 1):
        vals.append(_calibrate_mt())
        if max(vals[-2:]) / min(vals[-2:]) <= tol:
            break
    return min(vals)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rootstock_collective_state_sync_spark import get_spark
    from rootstock_collective_state_sync_spark.caching import release_tracked
    from rootstock_collective_state_sync_spark.plans.registry import bench_queries

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))
    cold_runs = int(os.environ.get("SPARK_GRAFT_BENCH_COLD_RUNS", "2"))
    calibration = _calibrate()
    calibration_mt = _settled_mt()
    # r18 (r17 verdict item 6): the pf probe now GATES the anchor —
    # if the start-of-run reading is outside the clean band, re-probe
    # up to 5 windows (30 s apart) and start the timed run from the
    # best reading seen, so a transient degraded window no longer
    # burns the whole bench attempt. If the host stays degraded the
    # run proceeds (the driver needs its one JSON line) but labels
    # itself pf_degraded / not regime_identified.
    calibration_pf = _calibrate_pf()
    pf_retries = 0
    while calibration_pf > PF_CLEAN_SEC * PF_BAND and pf_retries < 5:
        time.sleep(30)
        calibration_pf = min(calibration_pf, _calibrate_pf())
        pf_retries += 1
    spark = get_spark("bench")
    qs = bench_queries()
    # r17 (measurement fix, guide §1): one untimed session-aging
    # pre-pass over every seat before the first timed window. The
    # JVM's session-start transient (tiered JIT compilation + lazy
    # driver-heap growth faulting fresh pages in from the host) does
    # NOT fit inside the first seat's single warm-up run — it decays
    # over the first ~30-60 s of varied work, so whichever seats run
    # first eat 10-100x in-run bursts. That is exactly the chronic
    # contamination signature of the FIRST FOUR seats in bench order
    # (assoc_rules / embedding_gram / kmv_overlap /
    # q3_shipping_priority carried contaminated labels in r15, r16,
    # and all three r17 pre-fix runs, while an aged-session probe of
    # the same seats ran clean). The pre-pass ages the session the
    # same way for every seat, so position in the run order no longer
    # decides which seats get poisoned measurements.
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"age:{name}")
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        release_tracked()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    for name, fn in qs.items():
        # start every query from an empty Spark cache: persisted
        # intermediates from earlier queries otherwise fight this
        # query's execution memory and get evicted mid-measurement —
        # the main source of cross-round bench noise
        spark.catalog.clearCache()
        release_tracked()  # drop refs so the tracked list stays bounded
        # settle the JVM heap before measuring: the r07 ann_lsh_topk
        # spread ([1.09, 5.87] s around a 1.14 s median) was a single
        # GC/eviction stall inside a timed run, not a plan change
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"bench:{name}")
        fn(spark, sf_dir).count()  # warm-up (JIT, codegen, page cache)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
        spread[name] = [round(samples[0], 4), round(samples[-1], 4)]
        # r18 (r17 verdict item 3): COLD samples. The steady-state
        # loop above reuses Spark's CacheManager across samples —
        # each rebuilt frame plan-matches onto the warm-up run's
        # persisted intermediates, so min-of-7 for persist-using
        # seats (dedup/kmv/assoc) is a cache-HIT figure. These extra
        # samples clear the cache and tracked persists BEFORE EACH
        # sample, so every sample pays its own persist fills.
        # ``queries``/``queries_min`` keep the rounds-1..17 steady-
        # state semantics for cross-round comparability;
        # ``queries_cold`` is the additive per-sample-isolated map
        # (min of ``SPARK_GRAFT_BENCH_COLD_RUNS``, default 2).
        cold_samples = []
        for _ in range(cold_runs):
            spark.catalog.clearCache()
            release_tracked()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            cold_samples.append(time.perf_counter() - t0)
        if cold_samples:
            cold[name] = round(min(cold_samples), 4)
    mins = {n: s[0] for n, s in spread.items()}
    # r15 verdict item 1: per-seat contamination labels. The r15 run
    # was "regime-identified" (probe swing 1.10) yet carried a 61x
    # in-run burst (assoc_rules [2.69, 165.5] s) and left 4 light
    # seats 1.7-2.8x above their r14 bands on unchanged code — the
    # run-level probe cannot see a burst confined to one seat's timed
    # window. Any seat whose within-run max/min spread exceeds 3x is
    # labeled here and EXCLUDED from cross-round ratio math
    # (tools/bench_compare.py drops labeled seats from the shared
    # set); its min is still reported, because the floor of a bursty
    # window is usually sound, but it no longer gates comparisons.
    contaminated = {
        n: round(s[1] / s[0], 2)
        for n, s in spread.items()
        if s[0] > 0 and s[1] / s[0] > 3.0
    }
    calibration_end = _calibrate()
    calibration_mt_end = _settled_mt()
    calibration_pf_end = _calibrate_pf()
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # r13 verdict item 9: self-labeling regime identification. The MT
    # normalization is only meaningful when the 8-thread probe is
    # stable around the run (SCALING.md r13: it swung 2.5x WITHIN one
    # round); the 1.2x band is the documented identification rule,
    # now emitted as data so round-over-round comparisons
    # (tools/bench_compare.py) can pick raw vs MT-normalized columns
    # mechanically instead of by prose.
    mt_probe_swing = round(
        max(calibration_mt, calibration_mt_end)
        / min(calibration_mt, calibration_mt_end),
        4,
    )
    # r18 (r17 verdict item 6 / advice item 2): regime identification
    # now ALSO requires both fresh-page-fault probe readings inside
    # the clean band — a fault-degraded host regime is invisible to
    # the CPU probes (BENCH_head_check: every seat 1.5-2.4x degraded,
    # mt swing 1.14, self-labeled identified). pf_degraded is emitted
    # separately so consumers can see WHICH leg failed the label.
    pf_degraded = (
        max(calibration_pf, calibration_pf_end) > PF_CLEAN_SEC * PF_BAND
    )
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # self-describing statistics (r16 advice): the full file's
        # `queries` map is per-query MEDIANS while the stdout line's
        # is MINIMA — both records now label their own statistic so
        # no consumer has to know which artifact it is reading
        "queries_stat": "median",
        "queries_min": mins,
        "queries_cold": cold,
        "cold_runs_per_query": cold_runs,
        "spread": spread,
        "contaminated_seats": contaminated,
        "calibration_sec": calibration,
        "calibration_end_sec": calibration_end,
        "calibration_mt_sec": calibration_mt,
        "calibration_mt_end_sec": calibration_mt_end,
        "calibration_pf_sec": calibration_pf,
        "calibration_pf_end_sec": calibration_pf_end,
        "pf_retries": pf_retries,
        "pf_degraded": pf_degraded,
        "mt_probe_swing": mt_probe_swing,
        "regime_identified": mt_probe_swing < 1.2 and not pf_degraded,
        "runs_per_query": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # r15 verdict item 8: the driver's per-round artifact keeps only
    # the LAST 2000 characters of stdout; the full result line is
    # ~3.1 kB, so BENCH_r13..r15 all recorded `"parsed": null`. The
    # stdout line is therefore a COMPACT self-contained record —
    # the per-query map printed once, as the MINIMA (the stall-robust
    # statistic every cross-round comparison already uses), under
    # both contract names; medians + spread live in the lossless
    # full-file artifact written below.
    stdout_line = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "queries": mins,
        "queries_min": mins,
        "queries_stat": "min",
        "value_stat": "median_total",
        "contaminated_seats": contaminated,
        "mt_probe_swing": mt_probe_swing,
        "regime_identified": result["regime_identified"],
        "pf_degraded": pf_degraded,
        "calibration_pf_sec": calibration_pf,
        "sf": result["sf"],
        "full_artifact": "BENCH_latest.full.json",
    }
    line = json.dumps(stdout_line, separators=(",", ":"))
    if len(line) > 1900:  # stay inside the driver's 2000-char tail
        stdout_line.pop("queries_min")
        line = json.dumps(stdout_line, separators=(",", ":"))
    print(line)
    # persist the full JSON to a file as the lossless record (r12
    # verdict item 3)
    out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        str(Path(__file__).resolve().parent / "BENCH_latest.full.json"),
    )
    try:
        Path(out).write_text(json.dumps(result, indent=1) + "\n")
    except OSError as e:
        print(f"bench: could not write {out}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
