"""Merge N gated sf1 sweep artifacts into one round artifact —
MECHANICALLY, with the note generated from the identification fields
(r16 verdict item 8: the hand-written r16 merge_note contradicted its
own `unidentified_seats` field; a note derived from the fields cannot).

Merge rule (pair-local, regime-honest): for each seat, among the runs
where the seat earned a pair-stationary in-band bracket, keep the
PAIR from the run with the smallest sf1 leg (the best identified
measurement). Per-leg minima ACROSS runs are deliberately not taken —
an sf0.1 floor from one regime divided into an sf1 floor from another
is not a ratio anyone measured. A seat no run identified keeps its
smallest-bracket-spread pair and stays in `unidentified_seats`.
Isolated retests merge the same way. Margin fields carry over from
whichever run supplied the pair; sub-1%-margin seats stay suspect.

Usage: python tools/sf1_merge.py OUT.json RUN1.json RUN2.json [...]
"""

from __future__ import annotations

import json
import sys

BAND_DEFAULT = 1.2


def _seat_key(d: dict, n: str):
    b = (d.get("calibration_per_query") or {}).get(n)
    spread = max(b) / min(b) if b and b[0] and b[1] else float("inf")
    return spread


def merge(runs: list[dict]) -> dict:
    names = sorted(set().union(*(r["sf0_1"].keys() for r in runs)))
    band = runs[0].get("probe_band", BAND_DEFAULT)
    out = {
        "metric": "sf1_decade_sweep",
        "round": max(r.get("round", 0) for r in runs),
        "merged_runs": len(runs),
        "probe_band": band,
        "runs_per_query": runs[0].get("runs_per_query"),
        "sf0_1": {},
        "sf1": {},
        "ratio_sf1_over_sf0_1": {},
        "calibration_per_query": {},
        "bracket_margin": {},
        "isolated_retest": {},
    }
    unidentified, suspect = [], []
    for n in names:
        cands = [r for r in runs if n in r["sf0_1"]]
        ident = [
            r for r in cands if n not in (r.get("unidentified_seats") or ())
        ]
        if ident:
            pick = min(ident, key=lambda r: r["sf1"][n])
        else:
            pick = min(cands, key=lambda r: _seat_key(r, n))
            unidentified.append(n)
        out["sf0_1"][n] = pick["sf0_1"][n]
        out["sf1"][n] = pick["sf1"][n]
        out["ratio_sf1_over_sf0_1"][n] = pick["ratio_sf1_over_sf0_1"][n]
        out["calibration_per_query"][n] = (
            pick.get("calibration_per_query") or {}
        ).get(n)
        margin = (pick.get("bracket_margin") or {}).get(n)
        if margin is None:
            b = out["calibration_per_query"][n]
            if b and b[0] and b[1]:
                margin = round((band - max(b) / min(b)) / band, 4)
        out["bracket_margin"][n] = margin
        if ident and margin is not None and margin < 0.01:
            suspect.append(n)
        iso = [
            r["isolated_retest"][n]
            for r in cands
            if n in (r.get("isolated_retest") or {})
        ]
        if iso:
            iso_id = [i for i in iso if i.get("identified")]
            out["isolated_retest"][n] = min(
                iso_id or iso, key=lambda i: i.get("ratio") or float("inf")
            )
    # artifact-level probes: settled start of the FIRST run, end of the
    # LAST — the merged record spans the whole measurement campaign
    for k in ("calibration_sec", "calibration_mt_sec"):
        out[k] = runs[0].get(k)
    for k in ("calibration_end_sec", "calibration_mt_end_sec"):
        out[k] = runs[-1].get(k)
    out["probe_ref_mt_sec"] = min(
        r.get("probe_ref_mt_sec") or float("inf") for r in runs
    )
    out["global_retries_used"] = sum(
        r.get("global_retries_used") or 0 for r in runs
    )
    out["regime_identified"] = not unidentified
    out["unidentified_seats"] = sorted(unidentified)
    out["suspect_seats"] = sorted(suspect)
    # the note is GENERATED from the fields above — it cannot disagree
    # with them (r16 item 8)
    bits = [
        f"best identified pair per seat over {len(runs)} gated sweeps",
        "(pair-local: each ratio's two legs come from one run's bracket)",
    ]
    if unidentified:
        bits.append(
            "never pair-stationary in any run: " + ", ".join(sorted(unidentified))
        )
    if suspect:
        bits.append(
            "identified by <1% of the band (suspect): " + ", ".join(sorted(suspect))
        )
    iso_used = sorted(out["isolated_retest"])
    if iso_used:
        bits.append("isolated end-of-sweep retests recorded for: " + ", ".join(iso_used))
    out["merge_note"] = "; ".join(bits)
    return out


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: sf1_merge.py OUT.json RUN1.json RUN2.json [...]")
    runs = [json.load(open(p)) for p in sys.argv[2:]]
    out = merge(runs)
    with open(sys.argv[1], "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out["merge_note"])


if __name__ == "__main__":
    main()
