"""Round-15 operators vs brute-force / pure-Python references:
Cliff's delta (X-A50), Anderson-Darling k-sample (X-A51), Pettitt
changepoint (X-A52), Cohen's d / Hedges' g (X-A53), adjusted Rand
index (X-S22), Jensen-Shannon source divergence (X-T31). Each
reference recomputes the statistic the DEFINITIONAL way (row-level
pairs / direct formula), not the operator's decomposed way, so the
decompositions themselves are what is under test."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.evaluate import (
    adjusted_rand_index,
)
from rootstock_collective_state_sync_spark.operators.profile import (
    anderson_darling_k,
    cliffs_delta,
    effect_size,
)

HSET = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@settings(**HSET)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.booleans(),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_cliffs_delta_matches_brute_force_pairs(spark, rows):
    df = spark.createDataFrame(
        [(v, a) for v, a in rows] or [(None, True)],
        "v long, a boolean",
    )
    got = cliffs_delta(df, "v", "a").collect()[0]
    a_vals = [v for v, a in rows if a and v is not None]
    b_vals = [v for v, a in rows if not a and v is not None]
    n_gt = sum(1 for x in a_vals for y in b_vals if x > y)
    n_lt = sum(1 for x in a_vals for y in b_vals if x < y)
    n_tie = sum(1 for x in a_vals for y in b_vals if x == y)
    assert got["n_gt"] == (n_gt if rows else None) or got["n_gt"] == n_gt
    assert got["n_lt"] == n_lt or not rows
    assert got["n_tie"] == n_tie or not rows
    if a_vals and b_vals:
        nanb = len(a_vals) * len(b_vals)
        assert got["delta_e6"] == round((n_gt - n_lt) / nanb * 1e6)
        assert got["cles_e6"] == round((2 * n_gt + n_tie) / (2 * nanb) * 1e6)
    else:
        assert got["delta_e6"] is None and got["cles_e6"] is None


def _ad_reference(samples: "dict[str, list[int]]") -> float | None:
    """Scholz-Stephens A²akN (midrank/ties form), computed directly
    from the definitional cumulative sums — including the operator's
    per-term e9 snap so the comparison is exact."""
    groups = sorted(samples)
    k = len(groups)
    all_vals = sorted({v for vs in samples.values() for v in vs})
    n = sum(len(vs) for vs in samples.values())
    if k < 2 or len(all_vals) < 2 or n == 0:
        return None
    s_e9 = 0
    cumtot = 0
    cums = {g: 0 for g in groups}
    for v in all_vals:
        l_j = sum(1 for g in groups for x in samples[g] if x == v)
        b2 = 2 * cumtot + l_j
        den = 2 * n * b2 - b2 * b2 - n * l_j
        for g in groups:
            f = sum(1 for x in samples[g] if x == v)
            ni = len(samples[g])
            m2 = 2 * cums[g] + f
            num = n * m2 - ni * b2
            if den > 0 and ni > 0:
                s_e9 += round(
                    float(l_j)
                    * (float(num) * float(num))
                    / (float(den) * (float(ni) * float(n)))
                    * 1e9
                )
            cums[g] += f
        cumtot += l_j
    return round((n - 1) / n * (s_e9 / 1e9) * 1e6)


@settings(**HSET)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_anderson_darling_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(v, f"g{g}") for v, g in rows], "v long, g string"
    )
    got = anderson_darling_k(df, "v", "g").collect()[0]
    by_g: dict[str, list[int]] = {}
    for v, g in rows:
        by_g.setdefault(f"g{g}", []).append(v)
    want = _ad_reference(by_g)
    assert got["n"] == len(rows)
    assert got["k"] == len(by_g)
    if want is None:
        assert got["a2_e6"] is None
    else:
        # the python ref reduces in value order; the operator sums
        # snapped longs (order-free) — only the final double combine
        # can differ by one ulp at the e6 boundary
        assert abs(got["a2_e6"] - want) <= 1


def test_anderson_darling_rejects_fractional(spark):
    import pytest

    df = spark.createDataFrame([(1.5, "a")], "v double, g string")
    with pytest.raises(ValueError, match="integer-typed"):
        anderson_darling_k(df, "v", "g")


def test_anderson_darling_zero_on_identical_samples(spark):
    """Identical per-group distributions give A² very close to its
    minimum (the statistic is negative-biased under H0; exact zero
    is not expected, but symmetry across groups is)."""
    rows = [(v, g) for g in ("a", "b") for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = anderson_darling_k(df, "v", "g").collect()[0]
    assert got["k"] == 2 and got["n"] == 10
    # symmetric two-group layout: the statistic must be finite and
    # small in magnitude (< 2 in A² units here)
    assert got["a2_e6"] is not None and abs(got["a2_e6"]) < 2_000_000


@settings(**HSET)
@given(
    series=st.lists(
        st.integers(min_value=0, max_value=30), min_size=2, max_size=25
    )
)
def test_pettitt_matches_brute_force(spark, series):
    """U_t from the per-day sign-sum identity == the definitional
    double sum over (i<=t, j>t) pairs, argmax and p included."""
    from rootstock_collective_state_sync_spark.plans.analytics import (
        q_pettitt_daily_volume,  # noqa: F401  (import check only)
    )

    # replicate the plan's core on a synthetic one-type series via the
    # same SQL shape: build a df with event_type/t/v and inline the
    # plan's logic through a temp view is overkill — instead check the
    # identity itself in python, then the plan end-to-end is covered
    # by the oracle conformance test.
    n = len(series)

    def sign(x):
        return (x > 0) - (x < 0)

    u_direct = {
        t: sum(
            sign(series[i] - series[j])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        for t in range(n - 1)
    }
    sgn = [
        sum(1 for y in series if y < x) - sum(1 for y in series if y > x)
        for x in series
    ]
    u_ident = {}
    acc = 0
    for t in range(n - 1):
        acc += sgn[t]
        u_ident[t] = acc
    assert u_direct == u_ident


def test_adjusted_rand_index_known_values(spark):
    # identical partitions -> ARI = 1
    rows = [(i, i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    got = adjusted_rand_index(df, "a", "b").collect()[0]
    assert got["ari_e6"] == 1_000_000
    assert (got["n"], got["n_a"], got["n_b"]) == (30, 3, 3)
    # one side constant, other informative -> expected == observed
    # index -> ARI exactly 0 (chance-level agreement)
    df2 = spark.createDataFrame(
        [(i, 0, i % 3) for i in range(9)], "id long, a int, b int"
    )
    assert adjusted_rand_index(df2, "a", "b").collect()[0]["ari_e6"] == 0
    # BOTH partitions trivial (all singletons): denominator 0 -> NULL
    # (agreement is undefined, not 1)
    df3 = spark.createDataFrame(
        [(i, i, i + 100) for i in range(6)], "id long, a int, b int"
    )
    assert adjusted_rand_index(df3, "a", "b").collect()[0]["ari_e6"] is None


@settings(**HSET)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_adjusted_rand_index_matches_pair_counting(spark, rows):
    df = spark.createDataFrame(
        [(a, b) for a, b in rows], "a int, b int"
    )
    got = adjusted_rand_index(df, "a", "b").collect()[0]
    n = len(rows)
    s2 = a2 = b2 = 0
    from collections import Counter

    cells = Counter(rows)
    ca = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    s2 = sum(c * (c - 1) for c in cells.values())
    a2 = sum(c * (c - 1) for c in ca.values())
    b2 = sum(c * (c - 1) for c in cb.values())
    t2 = n * (n - 1)
    den = t2 * (a2 + b2) - 2 * a2 * b2
    if den == 0:
        assert got["ari_e6"] is None
    else:
        want = round((2 * t2 * s2 - 2 * a2 * b2) / den * 1e6)
        assert abs(got["ari_e6"] - want) <= 1


def test_effect_size_matches_python_reference(spark):
    rows = [(10, "a"), (12, "a"), (14, "a"), (20, "b"), (22, "b"),
            (30, "b"), (8, "c")]
    df = spark.createDataFrame(rows, "v long, g string")
    got = effect_size(df, "v", "g", ["a"]).collect()[0]
    a = [v for v, g in rows if g == "a"]
    b = [v for v, g in rows if g != "a"]
    ssw = lambda xs: sum(x * x for x in xs) - sum(xs) ** 2 / len(xs)
    sp2 = (ssw(a) + ssw(b)) / (len(a) + len(b) - 2)
    d = (sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(sp2)
    corr = 1.0 - 3.0 / (4.0 * (len(a) + len(b)) - 9.0)
    assert abs(got["d_e6"] - round(d * 1e6)) <= 1
    assert abs(got["g_e6"] - round(d * corr * 1e6)) <= 1
    assert (got["n_a"], got["n_b"]) == (3, 4)


def test_source_js_divergence_bounds_and_symmetry(spark):
    """JSD is bounded by ln 2 and zero only when source == corpus;
    two textually identical sources must score identically."""
    from rootstock_collective_state_sync_spark.operators.text import (
        source_js_divergence,
    )

    rows = [
        ("s1", "alpha beta gamma delta"),
        ("s2", "alpha beta gamma delta"),
        ("s3", "zeta zeta zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        r["source"]: r
        for r in source_js_divergence(df, vocab_size=16).collect()
    }
    ln2_e9 = int(math.log(2) * 1e9)
    for r in out.values():
        assert 0 <= r["jsd_e9"] <= ln2_e9 + 1
    assert out["s1"]["jsd_e9"] == out["s2"]["jsd_e9"]
    assert out["s3"]["jsd_e9"] > out["s1"]["jsd_e9"]


def test_hilbert_lut_matches_textbook_xy2d(spark):
    """The derived automaton LUT == the classic rotate/flip loop
    (independent implementations), exhaustively at 4 bits and on the
    Hilbert adjacency property (consecutive indexes are always grid
    neighbors — the locality claim zorder cannot make)."""
    from rootstock_collective_state_sync_spark.operators.layout import (
        HILBERT_LUT,
    )

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def lut_d(bits, x, y):
        st = d = 0
        for i in range(bits - 1, -1, -1):
            val = HILBERT_LUT[st * 4 + ((x >> i) & 1) * 2 + ((y >> i) & 1)]
            d = d * 4 + (val >> 3)
            st = val & 7
        return d

    assert all(
        xy2d(16, x, y) == lut_d(4, x, y)
        for x in range(16)
        for y in range(16)
    )
    pts = {xy2d(16, x, y): (x, y) for x in range(16) for y in range(16)}
    assert all(
        abs(pts[i][0] - pts[i + 1][0]) + abs(pts[i][1] - pts[i + 1][1]) == 1
        for i in range(255)
    )


def test_hilbert_key_expression_matches_lut_walk(spark):
    from rootstock_collective_state_sync_spark.operators import layout as L

    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 300)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["h"]
        for r in df.select(
            "a", "b", L.hilbert_key(F.col("a"), F.col("b")).alias("h")
        ).collect()
    }

    def lut_d(bits, x, y):
        from rootstock_collective_state_sync_spark.operators.layout import (
            HILBERT_LUT,
        )

        st = d = 0
        for i in range(bits - 1, -1, -1):
            val = HILBERT_LUT[st * 4 + ((x >> i) & 1) * 2 + ((y >> i) & 1)]
            d = d * 4 + (val >> 3)
            st = val & 7
        return d

    assert got == {(x, y): lut_d(16, x, y) for x, y in rows}


def test_hilbert_clustering_bounds_both_dimensions(spark, tmp_path):
    """The layout claim, asserted on the artifact itself: after a
    Hilbert-clustered write, each file's (min, max) bounding box —
    what parquet footer stats expose to any pruning reader — overlaps
    a one-eighth slice of EITHER dimension for well under half the
    files. (A single-column sort gives this on one dimension and
    nothing on the other; Hilbert gives it on both.) Results also
    equal a full scan — layout never changes semantics."""
    from rootstock_collective_state_sync_spark.operators import layout as L

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "hc")
    L.write_hilbert_clustered(df, path, "x", "y", num_files=16, bits=6)
    back = spark.read.parquet(path)
    boxes = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("mnx"),
            F.max("x").alias("mxx"),
            F.min("y").alias("mny"),
            F.max("y").alias("mxy"),
        )
        .collect()
    )
    total = len(boxes)
    assert total >= 8
    x_hits = sum(1 for b in boxes if b["mnx"] < 8)
    y_hits = sum(1 for b in boxes if b["mny"] < 8)
    assert 0 < x_hits < total / 2, (x_hits, total)
    assert 0 < y_hits < total / 2, (y_hits, total)
    for cond in ("x < 8", "y < 8"):
        got = sorted(tuple(r) for r in back.filter(cond).collect())
        want = sorted(tuple(r) for r in df.filter(cond).collect())
        assert got == want, cond


def test_hellinger_zero_on_identical_and_bounded(spark):
    """H = 0 exactly when both sides share one distribution (every
    bucket's p == q makes BC = 1), and 0 <= H <= 1 always — the
    boundedness PSI's log lacks on empty buckets."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        hellinger_distance,
    )

    same = spark.createDataFrame(
        [(v, a) for v in range(1, 101) for a in (True, False)],
        "v long, a boolean",
    )
    got = hellinger_distance(same, "v", "a").collect()[0]
    assert got["h_e6"] == 0 and got["bc_e9"] == 1_000_000_000
    # disjoint supports, B above the reference max: the decile
    # binning CLAMPS overflow into the LAST reference bucket (the
    # documented PSI edge rule), so exactly one bucket is shared —
    # p = 1/10 of A meets q = 1 of B there: BC = sqrt(0.1)
    disj = spark.createDataFrame(
        [(v, True) for v in range(100)]
        + [(v + 1000, False) for v in range(100)],
        "v long, a boolean",
    )
    got = hellinger_distance(disj, "v", "a").collect()[0]
    want_bc = round(math.sqrt(0.1 * 1.0) * 1e9)
    assert got["bc_e9"] == want_bc
    assert got["h_e6"] == round(math.sqrt(1.0 - want_bc / 1e9) * 1e6)
    # fully interleaved disjointness inside the reference range DOES
    # drive H to 1: B occupies only values the reference never hits
    # within the same buckets? — no: any B value lands in SOME
    # reference bucket, so bucket-level H < 1 by construction unless
    # a bucket has zero A mass, impossible for reference deciles.
    # The binned H is a lower bound of the continuous H — expected.
    # one side empty -> undefined, NULL (not 1)
    one = spark.createDataFrame([(v, True) for v in range(50)], "v long, a boolean")
    got = hellinger_distance(one, "v", "a").collect()[0]
    assert got["h_e6"] is None and got["bc_e9"] is None
