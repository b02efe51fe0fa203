"""Driver-window planner: codifies the rotation policy the rounds use.

Reads every ``CORRECTNESS_r*.json`` the driver has produced to build
the ever-hash-green set, diffs the registry against it, and classifies
every query for the NEXT round's 50-slot window:

1. ``never``   — has no hash-green driver row in any round (highest
   priority: evidence debt);
2. ``changed`` — its plan module changed since the last recorded round
   (``git diff --name-only <last-round-tag-or-commit>``) — pass the
   base commit as argv[1] to enable this class;
3. ``anchor``  — multi-round green and unchanged (fills the remainder,
   most-recently-rotated-out first is left to the human).

Usage:
    PYTHONPATH=/root/repo python tools/window_planner.py [base_commit]

Prints a classification report and a ready-to-paste candidate list.
The tool only READS artifacts; editing ``_DRIVER_WINDOW`` stays a
reviewed change in ``plans/registry.py``.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ever_green() -> dict[str, str]:
    """query -> latest round with a SATISFIED driver row: hash-green
    for oracled queries, rows-only (spark_rows > 0, err is None or
    'no_oracle') for the by-design rows-only sketches. Counting ONLY
    hash_match made rows-only queries permanently invisible to the
    rotation — exactly how `heavy_hitter_tokens` went seven rounds
    with zero driver evidence (r08 verdict item 1)."""
    out: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).split("_")[1].split(".")[0]
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            hash_ok = rec.get("hash_match")
            rows_only_ok = (
                not rec.get("oracle_rows")
                and (rec.get("spark_rows") or 0) > 0
                and rec.get("err") in (None, "no_oracle")
            )
            if hash_ok or rows_only_ok:
                out[name] = rnd
    return out


def changed_since(base: str) -> set[str]:
    """Registry queries whose defining plan/operator modules changed."""
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", base, "--"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout.splitlines()
    except subprocess.CalledProcessError:
        return set()
    touched = {f for f in diff if f.endswith(".py")}
    if not touched:
        return set()
    # conservative: if ANY plans/ or operators/ module changed, flag
    # every query whose wrapper module is in the touched set
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    changed = set()
    for name, spec in SPECS.items():
        mod = spec.fn.__module__.replace(".", "/") + ".py"
        if any(t.endswith(mod.split("/")[-1]) and "plans" in t for t in touched):
            changed.add(name)
    return changed


def main() -> int:
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    green = ever_green()
    base = sys.argv[1] if len(sys.argv) > 1 else None
    changed = changed_since(base) if base else set()
    # rows-only queries are full citizens here: they must earn a
    # rows-only driver row just like oracled queries earn hashes
    never = [n for n in SPECS if n not in green]
    rows_only = [n for n, s in SPECS.items() if not s.oracle]
    anchors = [
        n for n in SPECS if n in green and n not in changed
    ]
    print(f"registry: {len(SPECS)} queries "
          f"({len(SPECS) - len(rows_only)} oracled, {len(rows_only)} rows-only)")
    print(f"ever-satisfied (hash-green or rows-only row): {len(green)}")
    print(f"\nNEVER driver-checked ({len(never)}) — must take slots:")
    for n in never:
        print(f"  {n}")
    if base:
        ch = sorted(changed - set(never))
        print(f"\nCHANGED since {base} ({len(ch)}) — re-earn rows:")
        for n in ch:
            print(f"  {n}")
    n_fill = 50 - len(never) - (len(changed - set(never)) if base else 0)
    print(f"\nanchor slots remaining: {max(n_fill, 0)} "
          f"(pick from {len(anchors)} green+unchanged candidates)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
