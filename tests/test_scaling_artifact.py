"""Gate on the per-round sf1 decade artifact (r10 verdict items 1+7):
BENCH_sf1_r<N>.json is emitted by tools/sf1_bench.py each round; this
test fails the build when (a) the celled-graph family leaves its
linear asymptote again (the r10 `weak` was graph_assortativity at
18x/decade under fixed 16-cell geometry), or (b) any headline query's
sf1/sf0.1 ratio DOUBLES round-over-round (host-drift-normalized via
the paired calibration probes)."""

from __future__ import annotations

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bench seats built on the celled kNN edge path (auto cell geometry)
CELLED = {"graph_assortativity"}
# measured 2.9x at r11 (auto geometry); 8 leaves room for host noise
# while still failing long before the 18x fixed-geometry shape
CELLED_MAX_RATIO = 8.0


def _artifacts():
    return sorted(glob.glob(os.path.join(ROOT, "BENCH_sf1_r*.json")))


def _mid_drift(d: dict) -> float:
    """How much the host slowed between the artifact's start and end
    calibration probes (sf1 legs run last, so they absorb this).
    r13 (r12 verdict item 4): prefer the MULTI-CORE probes when
    present — the r12 contention regime inflated 32-way stages
    1.3-1.5x while the single-thread probe read dead equal, so the
    1-thread drift ratio systematically under-corrects."""
    c0 = d.get("calibration_mt_sec") or d.get("calibration_sec")
    c1 = d.get("calibration_mt_end_sec") or d.get("calibration_end_sec")
    if not c0 or not c1:
        return 1.0
    return max(1.0, c1 / c0)


def test_celled_family_stays_linear_per_decade():
    arts = _artifacts()
    if not arts:
        pytest.skip("no BENCH_sf1 artifact yet (tools/sf1_bench.py)")
    d = json.load(open(arts[-1]))
    drift = _mid_drift(d)
    for q in CELLED & set(d["ratio_sf1_over_sf0_1"]):
        ratio = d["ratio_sf1_over_sf0_1"][q] / drift
        assert ratio <= CELLED_MAX_RATIO, (
            f"{q}: sf1/sf0.1 = {d['ratio_sf1_over_sf0_1'][q]} "
            f"(drift-adjusted {ratio:.2f}) > {CELLED_MAX_RATIO} — the "
            f"celled geometry has left the linear family; check that "
            f"num_cells still derives from corpus size "
            f"(operators/similarity.auto_num_cells)"
        )


def test_no_headline_ratio_doubles_round_over_round():
    """Like-with-like only (r11 verdict item 4): pre-r12 artifacts ran
    every sf1 leg LAST and divided all ratios by one whole-sweep drift
    factor — an uneven correction (the r11 host slowed 2.1x mid-sweep,
    deflating early queries' normalized ratios far below truth).
    r12+ artifacts interleave the sf0.1/sf1 legs per query
    (``calibration_per_query`` marks the format), so their ratios are
    drift-free by construction; comparing a deflated old artifact
    against an honest new one misfires on every query. The doubling
    gate therefore only compares artifacts of the SAME format."""
    arts = _artifacts()
    if len(arts) < 2:
        pytest.skip("needs two rounds of BENCH_sf1 artifacts")
    prev, cur = json.load(open(arts[-2])), json.load(open(arts[-1]))
    if ("calibration_per_query" in cur) != ("calibration_per_query" in prev):
        pytest.skip(
            "artifact formats differ (whole-sweep-drift vs per-query "
            "interleaved) — ratios are not comparable; the gate resumes "
            "next round with two interleaved artifacts"
        )
    # r14: the identification band applied BETWEEN artifacts, the same
    # rule bench.py now emits as `regime_identified` (SCALING.md r13):
    # when the two rounds' multi-core regimes differ beyond 1.2x, a
    # per-leg throughput spike can move any single ratio several-fold
    # in either direction (r14 measured the SAME sf1 leg at 239.8 s
    # and 22.4 s back-to-back under a 5.4x inter-round MT-probe shift)
    # and the whole comparison is unidentified — like the
    # format-mismatch skip above, resume when regimes match again.
    def _mt(d):
        a = d.get("calibration_mt_sec")
        b = d.get("calibration_mt_end_sec")
        vals = [v for v in (a, b) if v]
        return min(vals) if vals else None

    mp, mc = _mt(prev), _mt(cur)
    if mp and mc and max(mp, mc) / min(mp, mc) > 1.2:
        pytest.skip(
            f"multi-core regimes differ {max(mp, mc) / min(mp, mc):.2f}x "
            f"between artifacts (> the 1.2x identification band) — "
            f"cross-round ratio comparison unidentified; see SCALING.md"
        )

    # r15: the WITHIN-artifact companion of the same rule. A sweep
    # whose own start/end multi-core probes disagree beyond the band
    # measured its legs under a shifting regime, so its ratios are
    # unidentified no matter how well the two rounds' minima align —
    # the r15 sweep's probes swung 3.5x within one run and "measured"
    # sub-1.0 decade ratios on two seats, the physically-impossible
    # tell (SCALING.md r15).
    def _swing(d):
        a, b = d.get("calibration_mt_sec"), d.get("calibration_mt_end_sec")
        if not (a and b):
            return None
        return max(a, b) / min(a, b)

    # r17 (r16 advice, medium): an artifact that self-labels
    # `regime_identified` earned a pair-stationary bracket for EVERY
    # seat — per-seat identification supersedes the coarse min-vs-end
    # swing heuristic, which a quiet mid-sweep dip could trip even
    # when every measurement window was steady. The swing skip only
    # applies to artifacts without per-seat identification.
    for label, d in (("prev", prev), ("cur", cur)):
        if "regime_identified" in d:
            continue  # per-seat brackets carry identification
        sw = _swing(d)
        if sw and sw > 1.2:
            pytest.skip(
                f"{label} artifact's own multi-core probes swung "
                f"{sw:.2f}x within the sweep (> the 1.2x band) — its "
                f"ratios are unidentified; see SCALING.md r15"
            )
    pr, cr = prev["ratio_sf1_over_sf0_1"], cur["ratio_sf1_over_sf0_1"]
    pd_, cd = _mid_drift(prev), _mid_drift(cur)
    # seats without a pair-stationary bracket (or that passed by
    # < 1% of the band) are not evidence on either side of the gate
    skip_seats = set()
    for d in (prev, cur):
        skip_seats |= set(d.get("unidentified_seats") or ())
        skip_seats |= set(d.get("suspect_seats") or ())
    bad = []
    for q in (set(pr) & set(cr)) - skip_seats:
        if pr[q] and cr[q] and (cr[q] / cd) > 2.0 * (pr[q] / pd_):
            bad.append((q, pr[q], cr[q]))
    assert not bad, f"decade-scale regressions (prev_ratio, cur_ratio): {bad}"


def test_bench_full_artifact_is_lossless():
    """r12 verdict item 3: the driver's BENCH_rNN.json keeps only a
    front-truncated stdout `tail` (r12's medians map was cut mid-key).
    bench.py now persists the FULL result JSON to
    BENCH_latest.full.json — this gate proves the artifact parses
    end-to-end and carries every map the round-over-round comparison
    needs, including the multi-core calibration probes."""
    path = os.path.join(ROOT, "BENCH_latest.full.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_latest.full.json yet (runs with bench.py)")
    d = json.load(open(path))
    for key in (
        "queries",
        "queries_min",
        "spread",
        "calibration_sec",
        "calibration_mt_sec",
        "calibration_end_sec",
        "calibration_mt_end_sec",
    ):
        assert key in d, key
    assert set(d["queries"]) == set(d["queries_min"]) == set(d["spread"])
    assert all(v > 0 for v in d["queries"].values())
