"""tools/sf1_merge.py: the merged sweep artifact must be pair-local
(each ratio's legs come from ONE run) and its note must be generated
from the identification fields, never free prose that can contradict
them (r16 verdict item 8)."""

from __future__ import annotations

from tools.sf1_merge import merge


def _run(seats, unidentified=(), round_no=17, brackets=None, iso=None):
    return {
        "metric": "sf1_decade_sweep",
        "round": round_no,
        "probe_band": 1.2,
        "runs_per_query": 3,
        "sf0_1": {n: a for n, (a, b) in seats.items()},
        "sf1": {n: b for n, (a, b) in seats.items()},
        "ratio_sf1_over_sf0_1": {
            n: round(b / a, 3) for n, (a, b) in seats.items()
        },
        "calibration_per_query": brackets
        or {n: [0.1, 0.105] for n in seats},
        "unidentified_seats": list(unidentified),
        "isolated_retest": iso or {},
        "calibration_sec": 0.3,
        "calibration_mt_sec": 0.1,
        "calibration_end_sec": 0.3,
        "calibration_mt_end_sec": 0.11,
        "probe_ref_mt_sec": 0.1,
        "global_retries_used": 2,
    }


def test_merge_prefers_best_identified_pair_and_stays_pair_local():
    r1 = _run({"a": (1.0, 3.0), "b": (2.0, 9.0)}, unidentified=["b"])
    r2 = _run({"a": (1.2, 2.4), "b": (2.1, 8.0)}, unidentified=["b"])
    out = merge([r1, r2])
    # seat a: both identified -> run with the smaller sf1 leg wins,
    # and BOTH legs come from that run (2.4/1.2, not min-of-legs 2.4/1.0)
    assert out["sf1"]["a"] == 2.4 and out["sf0_1"]["a"] == 1.2
    assert out["ratio_sf1_over_sf0_1"]["a"] == 2.0
    # seat b: no run identified -> stays unidentified in the merge
    assert out["unidentified_seats"] == ["b"]
    assert out["regime_identified"] is False


def test_merge_note_is_derived_from_fields():
    r1 = _run(
        {"a": (1.0, 3.0), "c": (1.0, 1.1)},
        unidentified=["c"],
        brackets={"a": [0.1, 0.1199], "c": [0.1, 0.3]},
    )
    out = merge([r1])
    # every seat named in the note appears in the matching field
    assert "c" in out["merge_note"]
    assert out["unidentified_seats"] == ["c"]
    # seat a passed within <1% of the 1.2 band -> suspect, and the
    # note says so because it is generated from the field
    assert out["suspect_seats"] == ["a"]
    assert "suspect" in out["merge_note"]


def test_merge_carries_isolated_retest():
    iso = {"a": {"sf0_1": 1.0, "sf1": 3.4, "ratio": 3.4, "identified": True}}
    r1 = _run({"a": (1.0, 4.3)}, iso=iso)
    out = merge([r1])
    assert out["isolated_retest"]["a"]["ratio"] == 3.4
    assert "isolated" in out["merge_note"]
