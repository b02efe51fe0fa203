"""Round-over-round bench comparison table generator (r13 verdict
item 9's consumer): reads two LOSSLESS bench artifacts
(``BENCH_latest.full.json`` format) and emits the SCALING.md markdown
block — shared-seat per-query minima, raw ratios, MT-normalized
ratios — with the normalization's VALIDITY decided mechanically from
the artifacts' ``regime_identified`` flags instead of prose: the MT
column is printed only when BOTH runs' 8-thread probes were stable
(swing < 1.2x) around their own run, the documented identification
rule bench.py now emits as data.

Usage:
    python tools/bench_compare.py OLD.full.json NEW.full.json
"""

from __future__ import annotations

import json
import sys


def compare(old_path: str, new_path: str) -> str:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    o_min = old.get("queries_min") or old["queries"]
    n_min = new.get("queries_min") or new["queries"]
    # r15 verdict item 1: seats labeled contaminated (within-run
    # max/min spread > 3x) in EITHER artifact drop out of the ratio
    # math — a burst confined to one seat's timed window is invisible
    # to the run-level probe swing, so the per-seat label is the only
    # mechanical way to keep a poisoned measurement out of the gate.
    contaminated = sorted(
        set(old.get("contaminated_seats") or {})
        | set(new.get("contaminated_seats") or {})
    )
    shared = sorted((set(o_min) & set(n_min)) - set(contaminated))

    def regime(d: dict) -> "bool | None":
        # pre-r14 artifacts carry the probes but not the flag — derive
        # it so old rounds stay comparable
        if "regime_identified" in d:
            return bool(d["regime_identified"])
        a, b = d.get("calibration_mt_sec"), d.get("calibration_mt_end_sec")
        if not a or not b:
            return None
        return max(a, b) / min(a, b) < 1.2

    o_ok, n_ok = regime(old), regime(new)
    identified = bool(o_ok) and bool(n_ok)
    mt_ratio = None
    if old.get("calibration_mt_sec") and new.get("calibration_mt_sec"):
        o_probe = min(
            old["calibration_mt_sec"], old.get("calibration_mt_end_sec") or 1e9
        )
        n_probe = min(
            new["calibration_mt_sec"], new.get("calibration_mt_end_sec") or 1e9
        )
        mt_ratio = n_probe / o_probe

    lines = []
    hdr = "| query | old min (s) | new min (s) | raw |"
    sep = "|---|---|---|---|"
    if identified and mt_ratio:
        hdr += " MT-norm |"
        sep += "---|"
    lines.append(hdr)
    lines.append(sep)
    o_tot = n_tot = 0.0
    for q in shared:
        o, n = o_min[q], n_min[q]
        o_tot += o
        n_tot += n
        row = f"| `{q}` | {o:.3f} | {n:.3f} | {n / o:.2f}x |"
        if identified and mt_ratio:
            row += f" {n / o / mt_ratio:.2f}x |"
        lines.append(row)
    summary = (
        f"shared-{len(shared)} totals: {o_tot:.2f} -> {n_tot:.2f} s = "
        f"{n_tot / o_tot:.3f}x raw"
    )
    if identified and mt_ratio:
        summary += (
            f", {n_tot / o_tot / mt_ratio:.3f}x MT-normalized "
            f"(probe ratio {mt_ratio:.3f}; both runs regime-identified: "
            f"swings {old.get('mt_probe_swing', 'n/a')} / "
            f"{new.get('mt_probe_swing', 'n/a')} < 1.2)"
        )
    else:
        why = []
        if o_ok is False:
            why.append(f"OLD probe swing {old.get('mt_probe_swing', '>1.2')}")
        if n_ok is False:
            why.append(f"NEW probe swing {new.get('mt_probe_swing', '>1.2')}")
        if o_ok is None or n_ok is None:
            why.append("probe fields missing")
        summary += (
            "; MT normalization NOT identified ("
            + ", ".join(why)
            + ") - read raw ratios only"
        )
    lines.append("")
    lines.append(summary)
    if contaminated:
        lines.append("")
        lines.append(
            "excluded contaminated seats (within-run spread > 3x): "
            + ", ".join(
                f"`{q}` (old {((old.get('contaminated_seats') or {}).get(q)) or '-'}x"
                f", new {((new.get('contaminated_seats') or {}).get(q)) or '-'}x)"
                for q in contaminated
            )
        )
    only_new = sorted(set(n_min) - set(o_min))
    if only_new:
        lines.append("")
        lines.append(
            "new seats (not in the shared set): "
            + ", ".join(f"`{q}` {n_min[q]:.3f} s" for q in only_new)
        )
    return "\n".join(lines)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    print(compare(sys.argv[1], sys.argv[2]))
