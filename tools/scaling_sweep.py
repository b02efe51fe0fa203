"""Scale-factor sweep: median-of-3 warm wall-clock for a representative
query set at every driver scale factor — the data behind SCALING.md.

Usage: PYTHONPATH=/root/repo python tools/scaling_sweep.py
Prints one JSON object {sf: {query: seconds}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "semantic_dedup",
    "ann_lsh_topk",
    "pq_topk",
    "line_dedup",
    "ngram_novelty",
    "embedding_gram",
    "q1_pricing_summary",
    "bpe_fertility",
    "llm_token_count",
    "dedup_funnel",
]


def main() -> None:
    from rootstock_collective_state_sync_spark.plans.registry import SPECS
    from rootstock_collective_state_sync_spark.session import get_spark

    queries = sys.argv[1:] or QUERIES  # optional explicit query list
    spark = get_spark("scaling")
    out: dict[str, dict[str, float]] = {}
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        out[sf] = {}
        for name in queries:
            from rootstock_collective_state_sync_spark.caching import (
                release_tracked,
            )

            spark.catalog.clearCache()
            spark._jvm.System.gc()
            fn = SPECS[name].fn
            fn(spark, d).count()  # warm-up
            release_tracked()  # every timed run pays its own persists
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, d).count()
                ts.append(time.perf_counter() - t0)
                release_tracked()
            out[sf][name] = round(sorted(ts)[1], 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
