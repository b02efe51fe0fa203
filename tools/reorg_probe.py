"""Streaming reorg-leg probe (r18, r17 verdict item 9): run the
reorg-scale pytest leg twice in separate subprocesses — once with the
store-read size-adaptive coalesce ACTIVE (normal tree) and once with
it DISABLED (the pre-r17 behavior, reproduced by patching the byte
parse so the coalesce falls back to the planner layout, exactly its
failure mode when the conf was unparsable) — and print the timing
lines side by side. The reorg leg reads dozens of KB-scale bucketed
snapshots through VersionedTable.read, the path the coalesce targets.

Usage: PYTHONPATH=/root/repo python tools/reorg_probe.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DISABLE_PATCH = (
    "import rootstock_collective_state_sync_spark.sinks.table as _t\n"
    "def _raise(v):\n"
    "    raise ValueError('coalesce disabled for probe')\n"
    "_t._parse_bytes_conf = _raise\n"
)


def run_leg(disable: bool) -> str:
    conftest_extra = DISABLE_PATCH if disable else ""
    code = (
        "import sys; sys.path.insert(0, %r)\n" % REPO
        + conftest_extra
        + "import pytest\n"
        + "raise SystemExit(pytest.main(['-m', '', '-q', '-s',\n"
        + "    %r]))\n" % (REPO + "/tests/test_reorg_scale.py")
    )
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    m = re.search(r"\[reorg-scale N=\d+\][^\n]*", p.stdout)
    if not m:
        print(p.stdout[-3000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"leg (disable={disable}) produced no timing line")
    return m.group(0)


def main() -> None:
    # interleave: off, on, off, on — ambient drift shows up as
    # within-pair disagreement
    for i in range(2):
        off = run_leg(disable=True)
        print(f"pair {i} coalesce OFF: {off}", flush=True)
        on = run_leg(disable=False)
        print(f"pair {i} coalesce ON:  {on}", flush=True)


if __name__ == "__main__":
    main()
