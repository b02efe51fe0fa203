"""Dump .explain("formatted") for named registry queries to
plans/<round>/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (guide §1). The round directory defaults
to r18; override with $SPARK_GRAFT_PLANS_ROUND.

Usage: python tools/dump_plans.py <suffix> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    from rootstock_collective_state_sync_spark import get_spark
    from rootstock_collective_state_sync_spark.caching import plan_only_builds
    from rootstock_collective_state_sync_spark.plans.registry import SPECS
    from tools.plan_audit import plan_str

    spark = get_spark(
        "dump_plans",
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    with plan_only_builds():
        for n in names:
            df = SPECS[n].fn(spark, sf_dir)
            (out_dir / f"{n}_{suffix}.txt").write_text(plan_str(spark, df))
            print(f"wrote {n}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
