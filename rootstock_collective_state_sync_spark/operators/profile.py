"""Generic table profiling: per-column null / distinct / min / max.

The data-quality report every warehouse ships (`ANALYZE`, dbt source
freshness, Deequ): one row per column with row count, null count,
exact distinct count, and canonicalized min/max. Profiling is how a
100 TB ingest decides partition keys, spots schema drift, and catches
silently-null columns before a backfill bakes them in.

Design:

- one aggregation JOB per column, all sharing the single cached scan;
  each is a global aggregate (partial map-side reduction, a 1-row
  exchange) plus an exact ``count_distinct`` (one hash shuffle of the
  column's values — at 100 TB swap in ``approx_count_distinct`` via
  ``exact=False`` and the report notes it).
- min/max are CANONICALIZED to strings so the report schema is stable
  across column types AND engines: fractional numerics via
  ``decimal(38,6)`` (fixed scale — Java's ``Double.toString``
  scientific notation never leaks), integers/dates/timestamps/strings
  via plain casts. This exact canonicalization is what the DuckDB
  oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, FloatType, NumericType

from rootstock_collective_state_sync_spark.localrel import local_df


def _canon(df: DataFrame, c, col):
    """Canonicalize an already-aggregated native-typed value. Order of
    operations matters: min/max MUST run on the native type first —
    aggregating canonicalized strings would compare lexicographically
    ('2.5' > '10')."""
    if isinstance(df.schema[c].dataType, (DoubleType, FloatType)):
        return col.cast("decimal(38,6)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per profiled column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)``."""
    cols = columns or df.columns
    parts = []
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c))
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
                nd.cast("bigint").alias("n_distinct"),
                _canon(df, c, F.min(F.col(c))).alias("min_val"),
                _canon(df, c, F.max(F.col(c))).alias("max_val"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bin, lo, hi, n,
    n_null)`` with every bin emitted (empty bins -> n = 0) so
    downstream plotting/drift comparison never mis-aligns axes.
    ``n_null`` (constant across rows) counts the NULL cells excluded
    from every bin — without it, dropped rows were invisible.

    Determinism: bounds are the exact stored min/max; bin assignment
    is ``floor((x - min) / width)`` on doubles — identical
    correctly-rounded IEEE ops on any engine — clamped so ``x = max``
    lands in the last bin.

    Plan shape: one global min/max aggregate (2-value control-plane
    read), then a single map-side-combined count shuffle of bin ids —
    the column is scanned twice but never re-shuffled raw.

    An empty or all-NULL column yields the zeroed spine with NULL
    ``lo``/``hi`` bounds instead of crashing on ``float(None)``.
    """
    lo_hi = df.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        (F.count(F.lit(1)) - F.count(F.col(col))).alias("n_null"),
    ).first()
    n_null = int(lo_hi["n_null"])
    spark = df.sparkSession
    if lo_hi["lo"] is None:  # empty or all-NULL column
        return (
            spark.range(bins)
            .select(
                F.col("id").cast("int").alias("bin"),
                F.lit(None).cast("double").alias("lo"),
                F.lit(None).cast("double").alias("hi"),
                F.lit(0).cast("bigint").alias("n"),
                F.lit(n_null).cast("bigint").alias("n_null"),
            )
            .orderBy("bin")
        )
    lo, hi = float(lo_hi["lo"]), float(lo_hi["hi"])
    width = (hi - lo) / bins if hi > lo else 1.0
    bin_ = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(bins - 1),
    )
    # NULLs must be excluded BEFORE binning: least(NULL, bins-1)
    # returns bins-1 (least/greatest skip NULLs), which would silently
    # drop every NULL cell into the last bin.
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.lit(n_null).cast("bigint").alias("n_null"),
        )
        .orderBy("bin")
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information between two categorical columns, reported
    per contingency cell: ``mi_term_e9 = round(p_xy·ln(p_xy/(p_x·p_y))
    ·1e9)`` so ``Σ mi_term_e9 / 1e9`` is the exact-integer-summed MI
    in nats. The dependence audit behind "does source predict
    language/quality bucket?" — redundancy a stratified sampler must
    know about (chi-square says *whether* dependent; MI says *how
    many bits*).

    Each term is computed from EXACT integer counts (``p_xy =
    c_xy/n`` etc. — the log argument is the exact rational
    ``c_xy·n/(c_x·c_y)``) and snapped to integer 1e-9 units before
    any summation, the package-wide fixed-point policy.

    Plan shape / 100 TB: one (x,y) count shuffle (map-side combined,
    |x|·|y| keys), marginals re-aggregated FROM the joint (no second
    scan), broadcast back onto the cells. The raw table is scanned
    once.
    """
    joint = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("c_xy"))
    mx = joint.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = joint.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = joint.agg(F.sum("c_xy")).first()[0]  # control-plane scalar
    if n is None:  # empty input: empty report, not float(None)
        return df.sparkSession.createDataFrame(
            [],
            f"{x_col} string, {y_col} string, n_joint bigint, "
            "n_x bigint, n_y bigint, mi_term_e9 bigint",
        )
    cells = joint.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
    p_xy = F.col("c_xy").cast("double") / F.lit(float(n))
    lg = F.log(
        F.col("c_xy").cast("double")
        * F.lit(float(n))
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    return cells.select(
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
        F.col("c_xy").cast("long").alias("n_joint"),
        F.col("c_x").cast("long").alias("n_x"),
        F.col("c_y").cast("long").alias("n_y"),
        F.round(p_xy * lg * 1e9, 0).cast("long").alias("mi_term_e9"),
    )


def k_anonymity_census(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k_risk: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity census over a quasi-identifier tuple
    (Sweeney 2002; Machanavajjhala et al. 2007): group rows by the QI
    columns, measure each equivalence class's size ``k`` and distinct
    sensitive values ``l``, and reduce to ONE governance row — the
    re-identification risk report a privacy review asks for before a
    table is shared or a training export ships.

    Columns: ``n_rows``/``n_groups``; ``min_k``/``max_k``;
    ``mean_k`` (integer div); ``n_singletons`` (classes with k=1 —
    unique, directly re-identifiable); ``rows_below_k`` (rows in
    classes with k < ``k_risk`` — the suppression candidate volume);
    ``min_l`` and ``n_l1_groups`` (classes where every row shares ONE
    sensitive value — attribute disclosure even without
    re-identification).

    Scale shape (100 TB): one shuffle keyed on the QI tuple (the
    count + count_distinct aggregate, map-side combined), then a
    single-row global reduction — control-plane. No row ever leaves
    with its sensitive value attached; only class-level counts move
    past the first exchange.
    """
    grp = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct(F.col(sensitive_col)).cast("long").alias("l"),
    )
    return grp.agg(
        F.sum("k").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.expr("sum(k) div count(1)").cast("long").alias("mean_k"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.sum(F.when(F.col("k") < k_risk, F.col("k")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_l1_groups"),
    )


#: round(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law expected
#: first-digit shares, pinned as integers so both engines compare the
#: same constants (no float log in either plan).
BENFORD_E6 = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(
    df: DataFrame, value_col: str, cents: bool = True
) -> DataFrame:
    """First-significant-digit census vs Benford's law (Newcomb 1881 /
    Benford 1938) — the classic fabricated-numbers screen for financial
    columns, and for training data a synthetic-vs-organic numeral
    signal. The digit is extracted from the INTEGER cent string
    (``substr(cast(round(v*100) as string), 1, 1)``), never via float
    ``log10`` — exact at every power-of-ten boundary on both engines.

    Returns one row per digit 1-9: ``(digit, n, freq_e6,
    benford_e6, dev_e6)``, freq over the positive values only.

    Scale shape: one projection + one 9-group aggregation (map-side
    combined) + a broadcast 9-row expected-value spine — no
    corpus-sized shuffle at any size.
    """
    per = benford_digit_counts(df, value_col, cents)
    return benford_from_counts(per)


def benford_digit_counts(
    df: DataFrame, value_col: str, cents: bool = True
) -> DataFrame:
    """(digit, n) first-significant-digit counts over the positive
    values — the MERGEABLE half of the Benford audit (counts over
    disjoint row sets add exactly), shared with the streaming twin."""
    vc = (
        F.round(F.col(value_col) * 100).cast("long")
        if cents
        else F.col(value_col).cast("long")
    )
    digits = (
        df.select(vc.alias("vc"))
        .filter(F.col("vc") > 0)
        .select(F.substring(F.col("vc").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    return digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def benford_from_counts(per: DataFrame) -> DataFrame:
    """(digit, n) counts -> the full audit report (the render half,
    shared by the at-rest scan and the streaming store)."""
    spark = per.sparkSession
    spine = local_df(
        spark,
        [(d + 1, BENFORD_E6[d]) for d in range(9)],
        "digit int, benford_e6 long",
    )
    tot = per.agg(F.sum("n").cast("long").alias("_t"))
    return (
        spine
        # per/tot are 9-row and 1-row aggregates — broadcast the BUILD
        # side (right of the left-outer; the stream side can't build)
        .join(F.broadcast(per), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("coalesce(n, 0) * 1000000 div _t").cast("long").alias("freq_e6"),
            "benford_e6",
            F.abs(
                F.expr("coalesce(n, 0) * 1000000 div _t") - F.col("benford_e6")
            )
            .cast("long")
            .alias("dev_e6"),
        )
    )


def gini_index(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Exact per-group Gini concentration index (e6 integer) over
    nonnegative integer values — inequality of order totals per
    segment, or (training-data governance) how concentrated a
    source's token budget is over its documents. Rank formulation:
    ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)`` over values sorted
    ascending — tie-invariant (equal values commute under the rank
    weights), so the ``id_col`` tiebreak affects nothing and the
    statistic is value-checkable bit-for-bit. DECIMAL(38,0)
    accumulation; one final integer div to e6.

    Scale shape: ONE shuffle on the group key; the rank window and
    the aggregate reuse that partitioning; output is one row per
    group.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("v").asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        *group_cols, F.col(id_col), F.col(value_col).alias("v")
    ).withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("decimal(38,0)").alias("s"),
            F.sum(F.col("rn").cast("decimal(38,0)") * F.col("v")).alias("ws"),
        )
        .select(
            *group_cols,
            "n",
            F.col("s").cast("long").alias("total"),
            F.expr(
                "CAST((2 * ws - (n + 1) * s) * 1000000 div (n * s) AS BIGINT)"
            ).alias("gini_e6"),
        )
    )


NUM_RANGE_BUCKETS = 64
"""Range buckets for the distributed prefix sum — sized to the
cluster (shuffle parallelism), NOT the data: the per-bucket base
offsets form the only ordered single-partition window and it holds
exactly this many rows at any data scale."""


def _prefix_boundaries(
    per_v: DataFrame, v_col: str
) -> "tuple[list, bool]":
    """Bucket boundaries for :func:`_distributed_prefix_sum` as a
    reusable ``(uniq, cast_double)`` pair. Chained towers whose
    ``v_col`` domains coincide (e.g. Kaplan–Meier's at-risk tower and
    its survival tower, both over the same distinct-lifetime rows)
    compute this ONCE and pass it to both calls via ``boundaries`` —
    any monotone boundary set yields exact values (base + local holds
    for every monotone bucketing), so sharing is always correct; only
    bucket balance could differ, and with an identical row domain it
    does not."""
    if not isinstance(per_v.schema[v_col].dataType, NumericType):
        sample = [
            r[0]
            for r in per_v.select(v_col)
            .orderBy(F.md5(F.col(v_col).cast("string")))
            .limit(4096)
            .collect()
            if r[0] is not None
        ]
        vals = sorted(set(sample))
        uniq = []
        if len(vals) > 1:
            step = len(vals) / NUM_RANGE_BUCKETS
            idxs = sorted(
                {int(i * step) for i in range(1, NUM_RANGE_BUCKETS)}
            )
            uniq = [vals[i] for i in idxs if 0 < i < len(vals)]
            # strictly-increasing dedupe mirrors the numeric path
            uniq = [
                b
                for k, b in enumerate(uniq)
                if k == 0 or b > uniq[k - 1]
            ]
        return uniq, False
    bnds = (
        per_v.agg(
            F.percentile_approx(
                F.col(v_col).cast("double"),
                [i / NUM_RANGE_BUCKETS for i in range(1, NUM_RANGE_BUCKETS)],
                1000,
            ).alias("b")
        ).head()
    )["b"]
    uniq: list[float] = []
    for b in bnds or []:
        if b is not None and (not uniq or b > uniq[-1]):
            uniq.append(float(b))
    return uniq, True


def _distributed_prefix_sum(
    per_v: DataFrame,
    v_col: str,
    c_col: "str | list[str]",
    out_col: "str | list[str]",
    group_cols: "list[str] | None" = None,
    boundaries: "tuple[list, bool] | None" = None,
) -> DataFrame:
    """Exclusive prefix sum of ``c_col`` over ``per_v`` in ``v_col``
    order — per ``group_cols`` group when given — WITHOUT a global
    (or per-group-global: a handful of groups each holding a corpus
    share is the same pathology) single-partition window.

    Two-level decomposition: (1) bucket values by driver-collected
    ``approx_percentile`` boundaries (monotone in ``v_col``; the
    collect is a bounded NUM_RANGE_BUCKETS-1-element control-plane
    read); (2) exclusive cumsum within each bucket (distributed
    window, partitioned by bucket); (3) per-bucket totals → exclusive
    cumsum over the NUM_RANGE_BUCKETS-row table (bounded window) →
    broadcast back as base offsets. ``base + local`` equals the
    global exclusive prefix sum for ANY monotone bucketing, so the
    approx quantile sketch (whose output can depend on partition
    order) affects only balance, never values.

    With groups, every window simply gains the group key in its
    PARTITION BY (value boundaries stay GLOBAL — monotone bucketing
    per group holds for any shared boundary set) and the base-offset
    table grows to #groups x NUM_RANGE_BUCKETS rows — still
    cluster-sized, still broadcast.

    Input contract: ``per_v`` must hold AT MOST ONE row per
    (``group_cols``, ``v_col``) pair — callers pre-aggregate to the
    per-value grain. With duplicate ``v_col`` rows in a group the
    in-bucket ROWS-frame window ties-breaks nondeterministically and
    the result is partition-order-dependent (r12 advisor note; the
    contract was previously stated only in a test comment).

    ``c_col``/``out_col`` may be LISTS of equal length: every column's
    exclusive prefix sum is computed in the SAME pass — one boundary
    probe, one in-bucket window operator (shared frame, N sum
    expressions), one base-offset table, one join — instead of N
    chained single-column passes each paying its own
    ``approx_percentile`` driver action and window tower (guide §2.4:
    operations keyed the same way share one exchange).

    ``boundaries`` (an ``(uniq, cast_double)`` pair from
    :func:`_prefix_boundaries`) skips the probe action entirely —
    chained towers over the same value domain share one probe.

    Non-numeric but orderable ``v_col`` (string, date, timestamp — no
    ``approx_percentile`` support) takes the same two-level shape with
    boundaries drawn from a bounded DETERMINISTIC sample: the 4096
    rows smallest by ``md5(v)`` (uniform in hash space, stable across
    partitionings) are collected and their empirical quantiles become
    the bucket boundaries — monotone in the native ordering, so the
    base+local identity holds unchanged. This replaces the r12
    single-per-group-window fallback, which silently reintroduced the
    global-sort pathology for near-unique string keys (r12 verdict
    item 2).
    """
    g = list(group_cols or [])
    uniq, cast_double = (
        boundaries
        if boundaries is not None
        else _prefix_boundaries(per_v, v_col)
    )
    return _prefix_sum_with_boundaries(
        per_v, v_col, c_col, out_col, g, uniq, cast_double=cast_double
    )


def _prefix_sum_with_boundaries(
    per_v: DataFrame,
    v_col: str,
    c_col: "str | list[str]",
    out_col: "str | list[str]",
    g: list,
    uniq: list,
    cast_double: bool,
) -> DataFrame:
    """Shared tail of the two-level prefix sum: bucket by the monotone
    ``uniq`` boundaries, in-bucket exclusive cumsum, broadcast base
    offsets. ``cast_double`` matches the boundary domain (numeric
    boundaries are doubles; string/date boundaries compare natively).
    Lists of ``c_col``/``out_col`` share every stage (one window
    operator carries N sum expressions over the same spec).
    """
    c_cols = [c_col] if isinstance(c_col, str) else list(c_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(c_cols) == len(out_cols), (c_cols, out_cols)
    # bucket = #boundaries strictly below v, as a plain sum of
    # comparisons (whole-stage codegen). NOT a higher-order-function
    # lambda: `size(filter(array(...), b -> b < v))` intermittently
    # threw INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when the optimizer
    # rewrote the lambda under the downstream aggregate+window
    # (caught by tests/test_properties.py's prefix-sum property).
    v_cmp = F.col(v_col).cast("double") if cast_double else F.col(v_col)
    bkt = F.lit(0)
    for b in uniq:
        bkt = bkt + F.when(v_cmp > F.lit(b), 1).otherwise(0)
    bucketed = per_v.withColumn("_rb", bkt)
    w_local = (
        Window.partitionBy(*g, "_rb")
        .orderBy(v_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w_local), F.lit(0)).alias(f"_loc{i}")
            for i, c in enumerate(c_cols)
        ],
    )
    w_base = (
        Window.partitionBy(*g)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = (
        bucketed.groupBy(*g, "_rb")
        .agg(*[F.sum(c).alias(f"_bc{i}") for i, c in enumerate(c_cols)])
        .select(
            *g,
            "_rb",
            *[
                F.coalesce(F.sum(f"_bc{i}").over(w_base), F.lit(0)).alias(
                    f"_base{i}"
                )
                for i in range(len(c_cols))
            ],
        )
    )
    out = local.join(F.broadcast(base), [*g, "_rb"])
    for i, o in enumerate(out_cols):
        out = out.withColumn(
            o, (F.col(f"_base{i}") + F.col(f"_loc{i}")).cast("long")
        )
    return out.drop(
        "_rb",
        *[f"_loc{i}" for i in range(len(c_cols))],
        *[f"_base{i}" for i in range(len(c_cols))],
    )


def ntile_assign(
    df: DataFrame,
    value_col: str,
    id_col: str,
    buckets: int,
    group_cols: "list[str] | None" = None,
    extra_cols: "list[str] | None" = None,
) -> DataFrame:
    """Row-level SQL-standard ``ntile(buckets)`` over the
    deterministic ``(value, id)`` total order (per ``group_cols``
    group when given) WITHOUT a single-partition global window: the
    global rank decomposes into per-value counts, the distributed
    two-level prefix sum (:func:`_distributed_prefix_sum`), and a
    per-value row_number tie split; the bucket is then pure integer
    arithmetic (the first ``n mod B`` buckets take the extra row —
    exactly DuckDB's ntile). Returns ``(*group_cols, _id, v,
    bucket)``. Shared by the equi-depth histogram and the WOE/IV
    feature binning. ``extra_cols`` ride along unchanged (row-level
    payload like the WOE target flag — they enter no window key)."""
    g = list(group_cols or [])
    x = list(extra_cols or [])
    t = df.select(
        *g, *x, F.col(id_col).alias("_id"), F.col(value_col).alias("v")
    )
    per_v = t.groupBy(*g, "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    off = _distributed_prefix_sum(per_v, "v", "c", "off", group_cols=g)
    w_in = Window.partitionBy(*g, "v").orderBy(F.col("_id").asc())
    ranked = t.withColumn("rn_in", F.row_number().over(w_in)).join(
        off.select(*g, "v", "off"), [*g, "v"]
    )
    if g:
        tot = per_v.groupBy(*g).agg(F.sum("c").cast("long").alias("_n"))
        ranked = ranked.join(F.broadcast(tot), g)
    else:
        tot = per_v.agg(F.sum("c").cast("long").alias("_n"))
        ranked = ranked.crossJoin(F.broadcast(tot))
    ranked = ranked.withColumn(
        "r", (F.col("off") + F.col("rn_in")).cast("long")
    )
    # SQL-standard ntile: the first (n % B) buckets take ceil(n/B)
    # rows, the rest floor(n/B) — all-integer `div`, no float rounding
    B = int(buckets)
    return ranked.withColumn(
        "bucket",
        F.expr(
            f"CAST(CASE WHEN r <= (_n % {B}) * (_n div {B} + 1) "
            f"THEN (r - 1) div (_n div {B} + 1) + 1 "
            f"ELSE (_n % {B}) + "
            f"(r - (_n % {B}) * (_n div {B} + 1) - 1) div (_n div {B}) + 1 "
            f"END AS INT)"
        ),
    ).drop("rn_in", "off", "_n", "r")


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    id_col: str,
    buckets: int = 8,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Equi-DEPTH histogram (optimizer-stats shape: equal row counts
    per bucket, data-driven boundaries) — the companion to the
    fixed-grid equi-width histogram. ``ntile`` over the deterministic
    ``(value, id)`` total order is SQL-standard on both engines
    (first ``n mod B`` buckets take the extra row), so boundaries are
    value-checkable exactly.

    Returns ``(bucket, n, lo, hi)`` — monotone, contiguous coverage —
    prefixed by ``group_cols`` when given (one independent histogram
    per group: the per-group-stats shape ANALYZE keeps per partition;
    a handful of corpus-share groups would make naive per-group
    windows exactly as pathological as the global one, so every stage
    below simply gains the group key — see
    :func:`_distributed_prefix_sum`).

    Scale shape: a naive ``ntile() OVER (ORDER BY ...)`` would move
    EVERY row through one partition (Spark warns exactly that), so
    the global rank is decomposed instead: per-value counts (one
    map-side-combined shuffle), then a DISTRIBUTED two-level prefix
    sum over the value table — the value column here is often
    near-unique (prices, totals), so |distinct values| ~ |rows| and a
    single ``Window.orderBy(v)`` over it would itself be the
    corpus-sized one-partition stage it was meant to avoid. Instead:
    range-bucket the values by driver-collected approx-quantile
    boundaries (a bounded, NUM_RANGE_BUCKETS-1-element control-plane
    read), cumsum WITHIN each bucket (distributed window keyed on the
    bucket), and add the per-bucket base offsets (a
    NUM_RANGE_BUCKETS-row — cluster-, not data-sized — window,
    broadcast back). The global offset is boundary-INVARIANT: any
    monotone bucketing yields the same ``base + local`` sum, so the
    approx (partition-order-dependent) quantile sketch only affects
    balance, never values. Finally a per-VALUE row_number splits ties
    (distributed window keyed on v) and the SQL-standard ntile bucket
    is computed arithmetically from ``offset + rn``. Bit-identical to
    ntile over the (value, id) total order — the DuckDB oracle
    replays plain ntile.
    """
    g = list(group_cols or [])
    t2 = ntile_assign(df, value_col, id_col, buckets, group_cols=g)
    return (
        t2.groupBy(*g, "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy(*g, "bucket")
    )


def equidepth_from_counts(
    per_v: DataFrame, buckets: int = 8
) -> DataFrame:
    """Render the equi-depth histogram from a per-VALUE count table
    ``(v, c)`` — the mergeable-summary form that makes the histogram
    incrementally maintainable (``streaming/equidepth.py``): counts
    over disjoint row sets add exactly, and the ``(bucket, n, lo,
    hi)`` report is a pure function of the merged counts. The report
    equals :func:`equidepth_histogram` over the raw rows bit-for-bit:
    the id tie-split only decides WHICH equal-valued rows land in a
    straddling bucket, never the bucket's value extent or size
    (pinned by ``tests/test_streaming_equidepth.py``).

    Mechanics: the distributed prefix sum gives each value its
    exclusive global offset; the value's rows occupy ranks
    ``off+1..off+c``, so it touches every ntile bucket between
    ``bucket(off+1)`` and ``bucket(off+c)`` — an explode bounded by
    ``buckets`` per value. Bucket sizes are the SQL-standard ntile
    arithmetic (first ``n mod B`` buckets take the extra row), so
    ``n`` needs no second scan.
    """
    B = int(buckets)
    off = _distributed_prefix_sum(per_v, "v", "c", "off")
    tot = per_v.agg(F.sum("c").cast("long").alias("_n"))

    def bucket_of(r: str) -> str:
        return (
            f"CAST(CASE WHEN {r} <= (_n % {B}) * (_n div {B} + 1) "
            f"THEN ({r} - 1) div (_n div {B} + 1) + 1 "
            f"ELSE (_n % {B}) + "
            f"({r} - (_n % {B}) * (_n div {B} + 1) - 1) div (_n div {B}) + 1 "
            f"END AS INT)"
        )

    spans = (
        off.crossJoin(F.broadcast(tot))
        .withColumn("_b1", F.expr(bucket_of("(off + 1)")))
        .withColumn("_b2", F.expr(bucket_of("(off + c)")))
        .select("v", F.explode(F.sequence("_b1", "_b2")).alias("bucket"))
    )
    return (
        spans.groupBy("bucket")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"CAST(CASE WHEN bucket <= _n % {B} THEN _n div {B} + 1 "
                f"ELSE _n div {B} END AS BIGINT)"
            ).alias("n"),
            "lo",
            "hi",
        )
        .select("bucket", "n", "lo", "hi")
        .orderBy("bucket")
    )


def k_anonymity_generalize_census(
    df: DataFrame,
    qi_cols: list[str],
    fine_col: str,
    coarse_col: str,
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """One-level generalization ladder before suppression — Sweeney's
    standard k-anonymity mechanism (Sweeney 2002 §"generalization"):
    rows whose full-precision quasi-identifier class is below ``k``
    are not dropped outright; first their ``fine_col`` dimension is
    GENERALIZED to ``coarse_col`` (e.g. month -> quarter — both must
    already be materialized on ``df``), the failing rows re-group at
    the coarser key, and only classes still below ``k`` are
    suppressed. Local recoding: rows already safe at full precision
    keep it (maximal utility), only at-risk rows lose precision.

    Returns ONE governance row proving the ladder: ``n_rows``,
    ``n_level0`` (kept at full precision), ``n_generalized`` (kept at
    the coarser level), ``n_suppressed`` (dropped after the ladder),
    ``n_suppressed_suppression_only`` (what suppression-only would
    have dropped — always >= n_suppressed; the difference is the
    rows the ladder SAVED. The inequality is not strict in general:
    when no failing rows consolidate at the coarse key the ladder
    saves nothing — the registered query's driver data does exhibit
    a strict saving, asserted in its test), ``n_groups`` (kept
    classes across both levels), ``min_k`` over kept classes (>= k
    by construction — the proof obligation), and ``min_l`` (distinct
    sensitive values in the weakest kept class). When NO class
    survives at either level, min_k/min_l report 0 (not NULL).

    Scale shape (100 TB): two QI-keyed shuffles (full-precision class
    sizes; coarse re-grouping of the FAILING rows only — typically a
    small residue) + one single-row reduction. Class keys move, rows
    do not leave with sensitive values attached past the first
    aggregate.
    """
    qi1 = [c for c in qi_cols if c != fine_col]

    lvl0 = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("k0"),
        F.countDistinct(F.col(sensitive_col)).cast("long").alias("l0"),
    )
    # class-level routing: safe classes keep full precision
    keep0 = lvl0.filter(F.col("k0") >= k)
    fail0_rows = df.join(
        lvl0.filter(F.col("k0") < k).select(*qi_cols), qi_cols, "left_semi"
    )
    lvl1 = fail0_rows.groupBy(*qi1, coarse_col).agg(
        F.count(F.lit(1)).cast("long").alias("k1"),
        F.countDistinct(F.col(sensitive_col)).cast("long").alias("l1"),
    )
    keep1 = lvl1.filter(F.col("k1") >= k)

    s0 = keep0.agg(
        F.coalesce(F.sum("k0"), F.lit(0)).cast("long").alias("n_level0"),
        F.count(F.lit(1)).cast("long").alias("g0"),
        F.min("k0").cast("long").alias("mk0"),
        F.min("l0").cast("long").alias("ml0"),
    )
    s1 = keep1.agg(
        F.coalesce(F.sum("k1"), F.lit(0)).cast("long").alias("n_generalized"),
        F.count(F.lit(1)).cast("long").alias("g1"),
        F.min("k1").cast("long").alias("mk1"),
        F.min("l1").cast("long").alias("ml1"),
    )
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    fail = fail0_rows.agg(
        F.count(F.lit(1))
        .cast("long")
        .alias("n_suppressed_suppression_only")
    )
    return (
        tot.crossJoin(s0)
        .crossJoin(s1)
        .crossJoin(fail)
        .select(
            "n_rows",
            "n_level0",
            "n_generalized",
            (
                F.col("n_suppressed_suppression_only")
                - F.col("n_generalized")
            )
            .cast("long")
            .alias("n_suppressed"),
            "n_suppressed_suppression_only",
            (F.col("g0") + F.col("g1")).cast("long").alias("n_groups"),
            # explicit empty-level cases: least() null-handling differs
            # across engines, CASE does not
            F.coalesce(
                F.when(F.col("g0") == 0, F.col("mk1"))
                .when(F.col("g1") == 0, F.col("mk0"))
                .otherwise(F.least("mk0", "mk1")),
                F.lit(0),
            )
            .cast("long")
            .alias("min_k"),
            F.coalesce(
                F.when(F.col("g0") == 0, F.col("ml1"))
                .when(F.col("g1") == 0, F.col("ml0"))
                .otherwise(F.least("ml0", "ml1")),
                F.lit(0),
            )
            .cast("long")
            .alias("min_l"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group: the smallest value whose
    cumulative weight (over values ``<= v``, RANGE frame — so ties
    are order-invariant) reaches half the group total. All decimal /
    integer arithmetic — exact on both engines, no interpolation.

    Scale shape: ONE shuffle on the group key; the RANGE-frame cumsum
    is a per-partition sort within that exchange (no global sort), and
    the argmin reduction reuses the same partitioning. At 100 TB this
    is the cost of one wide aggregation — never a collect.
    """
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("v").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).alias("v"),
        F.col(weight_col).alias("w"),
    ).select(
        *group_cols,
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        ranked.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy(*group_cols)
        .agg(
            F.min("v").alias("wmedian"),
            F.max("tw").alias("total_weight"),
        )
    )


def woe_iv(
    df: DataFrame,
    value_col: str,
    id_col: str,
    target_col: str,
    bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value feature binning (the
    credit-scoring standard; Siddiqi 2006): equi-depth-bin a numeric
    feature (:func:`ntile_assign` — exact SQL ntile, no
    single-partition window) and report, per bin, the event/non-event
    counts, ``woe_e9 = round(ln((pos_i·neg_tot)/(neg_i·pos_tot))·1e9)``
    (the log argument is an exact integer rational — no float division
    before the one ln), and the bin's IV contribution ``iv_e9 =
    round((pos_i/pos_tot − neg_i/neg_tot)·ln(...)·1e9)``. ``Σ iv_e9``
    is the feature's predictive-power screen (rule of thumb: < 0.02
    useless, > 0.5 suspicious). A bin with zero events or zero
    non-events reports NULL woe/iv (standard practice is merging such
    bins; the NULL keeps the report honest instead of clamping).

    ``target_col`` must be 0/1-valued. Scale shape: the ntile
    assignment's decomposed rank (group-keyed windows + one bounded
    base-offset table), then ONE bins-sized aggregate and a broadcast
    totals row.
    """
    assigned = ntile_assign(
        df, value_col, id_col, bins, extra_cols=[target_col]
    )
    per_bin = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(target_col).cast("long")).cast("long").alias("n_pos"),
    )
    per_bin = per_bin.withColumn(
        "n_neg", (F.col("n") - F.col("n_pos")).cast("long")
    )
    tot = per_bin.agg(
        F.sum("n_pos").cast("long").alias("tot_pos"),
        F.sum("n_neg").cast("long").alias("tot_neg"),
    )
    lg = F.log(
        (F.col("n_pos").cast("double") * F.col("tot_neg").cast("double"))
        / (F.col("n_neg").cast("double") * F.col("tot_pos").cast("double"))
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n",
            "n_pos",
            "n_neg",
            F.when(ok, F.round(lg * 1e9, 0).cast("long")).alias("woe_e9"),
            F.when(
                ok,
                F.round(
                    (
                        F.col("n_pos").cast("double")
                        / F.col("tot_pos").cast("double")
                        - F.col("n_neg").cast("double")
                        / F.col("tot_neg").cast("double")
                    )
                    * lg
                    * 1e9,
                    0,
                ).cast("long"),
            ).alias("iv_e9"),
        )
        .orderBy("bucket")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_expr: str,
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney U rank-sum test (Mann &
    Whitney 1947): does the ``group_expr`` slice (SQL boolean — group
    A) draw from a stochastically larger ``value_col`` distribution
    than its complement? The nonparametric A/B screen — no normality
    assumption, the right default for heavy-tailed pipeline metrics.

    Everything before the one z-score division is exact integer
    arithmetic on DOUBLED ranks: a tie group with exclusive prefix
    count ``off`` and size ``c`` has average rank ``off + (c+1)/2``,
    so ``2·rank = 2·off + c + 1`` is integral. ``r2_a = Σ a_v·(2
    off_v + c_v + 1)``, ``u2_a = r2_a − n_a(n_a+1)`` (both doubled),
    tie term ``T = Σ (c³ − c)``, and the normal-approximation z is
    the single double computation, e6-snapped.

    One row: ``(n_a, n_b, r2_a, u2_a, tie_t, z_e6)``. ``value_col``
    must be integer-typed (snap to cents first — fixed-point policy).
    NULL ``value_col`` rows are dropped (a NULL is not a rank), the
    SAME policy as the streaming twin (``streaming/ranktests.py``) so
    the documented bit-for-bit stream/at-rest equivalence holds on
    nullable inputs too.

    Scale shape: per-value counts (one map-side-combined shuffle),
    the distributed prefix sum for ``off`` (never a global ordered
    window), two bounded aggregates. The n²-scale doubled-rank sum
    and the n³-scale tie term accumulate in DECIMAL(38,0) (the
    Spearman/Kruskal policy) so ``z_e6`` stays exact-in-double at any
    row count; only the final display casts of ``r2_a``/``u2_a``/
    ``tie_t`` are long (NULL, not wraparound, past ~9.2e18).
    """
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return mann_whitney_u_from_counts(per_v)


def mann_whitney_u_from_counts(per_v: DataFrame) -> DataFrame:
    """:func:`mann_whitney_u` from a per-VALUE count table ``(v, c,
    ca)`` — the mergeable-summary form (counts over disjoint row sets
    add exactly) that makes the test incrementally maintainable
    (``streaming/ranktests.py``, same split as
    ``equidepth_from_counts``)."""
    dec = "decimal(38,0)"
    off = _distributed_prefix_sum(per_v, "v", "c", "off")
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        (F.sum("c") - F.sum("ca")).cast("long").alias("n_b"),
        F.sum("c").cast("long").alias("n"),
        # c³ overflows long per-ROW at c > ~2.1e6 duplicates of one
        # value — promote before the first multiply, not just the sum
        F.sum(
            F.col("c").cast(dec) * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_t_d"),
    )
    r = off.agg(
        F.sum(
            F.col("ca").cast(dec)
            * (F.lit(2) * F.col("off") + F.col("c") + F.lit(1))
        ).alias("r2_a_d")
    )
    # degenerate splits (one group empty, n<=1, or every value tied)
    # have no defined z — report NULL instead of dividing by zero
    # (found by tests/test_properties.py's from-counts property)
    var = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / 12.0
        * (
            (F.col("n") + 1).cast("double")
            - F.col("tie_t_d").cast("double")
            / F.nullif(
                F.col("n").cast("double") * (F.col("n") - 1).cast("double"),
                F.lit(0.0),
            )
        )
    )
    # z is computed from the DECIMAL sums (pre-cast), so it stays
    # exact-in-double even where the long display casts below
    # would overflow
    z = F.when(
        var > 0,
        (
            (
                F.col("r2_a_d")
                - F.col("n_a").cast(dec) * (F.col("n_a") + 1)
                - F.col("n_a").cast(dec) * F.col("n_b")
            ).cast("double")
            / F.lit(2.0)
        )
        / F.sqrt(var),
    )
    # try_cast: past ~9.2e18 the DISPLAY columns go NULL (never
    # wraparound, never a crash) while z_e6 — computed above from the
    # decimals — stays exact-in-double
    return r.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.col("r2_a_d").try_cast("long").alias("r2_a"),
        (
            F.col("r2_a_d")
            - F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1)
        )
        .try_cast("long")
        .alias("u2_a"),
        F.col("tie_t_d").try_cast("long").alias("tie_t"),
        F.round(z * 1e6, 0).cast("long").alias("z_e6"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_expr: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D statistic: the maximum
    gap between the ``group_expr`` slice's empirical CDF and its
    complement's, over the JOINT value set — the distribution-drift
    screen that sees shape changes a mean/median comparison misses.

    The gap is compared in exact integers: at value ``v`` with
    inclusive cumulative counts ``cumA``/``cumB``, ``|cumA·n_b −
    cumB·n_a|`` avoids any division until the one e9-snap of the
    maximum. Reports the SMALLEST value attaining the max so the
    result is deterministic under ties. One row: ``(n_a, n_b, d_e9,
    at_v)``. NULL ``value_col`` rows are dropped (no place on the
    ECDF) — the same policy as the streaming twin
    (``streaming/ranktests.py``) so stream/at-rest stay bit-equal on
    nullable inputs.

    Scale shape: per-value counts, ONE distributed prefix sum for the
    joint cumulative (A's rides along as a second measure), a
    max-by aggregate. The cumA·n_b cross products accumulate in
    DECIMAL(38,0) (they grow as n² — past long at ~3e9 rows per
    side), matching the Spearman/Kruskal promotion policy.
    """
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return ks_two_sample_from_counts(per_v)


def ks_two_sample_from_counts(per_v: DataFrame) -> DataFrame:
    """:func:`ks_two_sample` from the same per-VALUE count table
    ``(v, c, ca)`` as :func:`mann_whitney_u_from_counts` — one
    mergeable store serves both rank tests incrementally."""
    per_v = per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
    # both cumulatives in ONE prefix pass (shared boundary probe +
    # window tower; the columns co-exist on the input rows)
    both = _distributed_prefix_sum(per_v, "v", ["ca", "cb"], ["offa", "offb"])
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    # cumA·n_b grows as n² — promote to decimal BEFORE the multiply
    # (the Spearman/Kruskal policy); decimal ordering keeps the
    # max-by exact
    dec = "decimal(38,0)"
    gaps = both.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            (F.col("offa") + F.col("ca")).cast(dec) * F.col("n_b")
            - (F.col("offb") + F.col("cb")).cast(dec) * F.col("n_a")
        ).alias("gap"),
    )
    return (
        gaps.orderBy(F.col("gap").desc(), F.col("v").asc())
        .limit(1)
        .select(
            "n_a",
            "n_b",
            # one empty group has no defined ECDF gap — NULL, not a
            # divide-by-zero (found by the from-counts property test)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(
                    F.col("gap").cast("double")
                    * 1e9
                    / (
                        F.col("n_a").cast("double")
                        * F.col("n_b").cast("double")
                    ),
                    0,
                ).cast("long"),
            ).alias("d_e9"),
            F.col("v").cast("long").alias("at_v"),
        )
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    group_expr: str,
) -> DataFrame:
    """Exact Cliff's delta effect size (Cliff 1993) between the
    ``group_expr`` slice (group A) and its complement — the ordinal
    dominance companion to :func:`mann_whitney_u`: the test says
    WHETHER the distributions differ, delta says by HOW MUCH
    (``δ = P(a > b) − P(a < b)``, identical to the rank-biserial
    correlation of the U test), robust to any monotone transform.
    Also reports the common-language effect size
    ``CLES = P(a > b) + P(a = b)/2`` (Vargha-Delaney A).

    Exact integers end-to-end: the dominance counts decompose over
    the per-value count table — ``n_gt = Σ_v ca_v·offb_v`` (B-mass
    strictly below each A value, via the distributed prefix sum) and
    symmetrically for ``n_lt``/``n_tie`` — so no row-level pair ever
    forms; the two final divisions are fixed-operand-order doubles,
    e6-snapped. One row: ``(n_a, n_b, n_gt, n_lt, n_tie, delta_e6,
    cles_e6)`` — NULL statistics when either side is empty.
    ``value_col`` must be integer-typed (fixed-point policy); NULL
    values are dropped (the shared rank-test policy, matching the
    streaming twin so stream/at-rest stay bit-equal).

    Scale shape: identical to `mann_whitney_u` — per-value counts,
    one distributed prefix sum, bounded aggregates; the n²-scale
    dominance products accumulate in DECIMAL(38,0).
    """
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return cliffs_delta_from_counts(per_v)


def cliffs_delta_from_counts(per_v: DataFrame) -> DataFrame:
    """:func:`cliffs_delta` from the same per-VALUE count table
    ``(v, c, ca)`` as :func:`mann_whitney_u_from_counts` — the sixth
    report of the shared mergeable rank-test store
    (``streaming/ranktests.py``)."""
    dec = "decimal(38,0)"
    per_v = per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
    offb = _distributed_prefix_sum(per_v, "v", "cb", "offb")
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    s = offb.agg(
        F.sum(F.col("ca").cast(dec) * F.col("offb")).alias("n_gt_d"),
        F.sum(F.col("ca").cast(dec) * F.col("cb")).alias("n_tie_d"),
    ).crossJoin(F.broadcast(tot))
    # n_lt needs no per-row n_b: every (a, b) pair is >, < or tied,
    # so n_lt = n_a·n_b − n_gt − n_tie exactly
    s = s.withColumn(
        "n_lt_d",
        F.col("n_a").cast(dec) * F.col("n_b")
        - F.col("n_gt_d")
        - F.col("n_tie_d"),
    )
    nanb = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    delta = (F.col("n_gt_d") - F.col("n_lt_d")).cast("double") / nanb
    cles = (
        F.lit(2) * F.col("n_gt_d") + F.col("n_tie_d")
    ).cast("double") / (F.lit(2.0) * nanb)
    return s.select(
        "n_a",
        "n_b",
        F.col("n_gt_d").try_cast("long").alias("n_gt"),
        F.col("n_lt_d").try_cast("long").alias("n_lt"),
        F.col("n_tie_d").try_cast("long").alias("n_tie"),
        F.when(ok, F.round(delta * 1e6, 0).cast("long")).alias("delta_e6"),
        F.when(ok, F.round(cles * 1e6, 0).cast("long")).alias("cles_e6"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Exact tie-corrected Kruskal-Wallis H (1952) — the K-group
    generalization of :func:`mann_whitney_u`: do the ``group_col``
    groups draw from the same ``value_col`` distribution? Same
    doubled-rank machinery: joint per-value ranks from the
    distributed prefix sum (``2·rank = 2·off + c + 1``, integral),
    per-group doubled rank sums ``R2_g = Σ n_gv·r2_v`` decompose over
    the (group, value) count table, and

        ``H = 3·Σ_g R2_g²/n_g / (n(n+1)) − 3(n+1)``

    (the doubled-rank form of the textbook statistic), tie-corrected
    by ``1 − ΣT/(n³−n)`` with ``T = Σ(c³−c)`` over joint tie groups.
    ``R2_g`` (n²-scale) and ``T`` (n³-scale) accumulate in
    DECIMAL(38,0); the ``Σ R2_g²/n_g`` reduction is DOUBLE (each
    term is n⁴-scale and carries a non-integral per-group division —
    the e6 snap absorbs the ~1-ulp rounding), as are the two H
    divisions. One row: ``(n, n_groups, tie_t, h_e6, h_tied_e6)``.
    NULL ``value_col`` rows are dropped (a NULL is not a rank — the
    shared rank-test null policy).

    Scale shape: one (group, value) count shuffle, one joint prefix
    sum, a broadcast join of the value-rank table, two bounded
    aggregates. ``value_col`` must be integer-typed (fixed-point
    policy).
    """
    gv = (
        df.select(
            F.col(group_col).alias("g"), F.col(value_col).alias("v")
        )
        .filter(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("ngv"))
    )
    per_v = gv.groupBy("v").agg(F.sum("ngv").cast("long").alias("c"))
    r2 = _distributed_prefix_sum(per_v, "v", "c", "off").select(
        "v",
        (F.lit(2) * F.col("off") + F.col("c") + 1).cast("long").alias("r2"),
    )
    per_g = (
        gv.join(r2, "v")
        .groupBy("g")
        .agg(
            F.sum("ngv").cast("long").alias("ng"),
            F.sum(F.col("ngv").cast("decimal(38,0)") * F.col("r2")).alias(
                "r2g"
            ),
        )
    )
    tot = per_v.agg(
        F.sum("c").cast("long").alias("n"),
        # c³ overflows long per-ROW at c > ~2.1e6 duplicates — promote
        # before the first multiply (shared rank-test policy)
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("tie_t_d"),
    )
    sums = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(
            F.col("r2g").cast("double")
            * F.col("r2g").cast("double")
            / F.col("ng").cast("double")
        ).alias("s"),
    )
    h = (
        F.lit(3.0)
        * F.col("s")
        / (F.col("n").cast("double") * (F.col("n") + 1).cast("double"))
        - 3.0 * (F.col("n") + 1).cast("double")
    )
    corr = F.lit(1.0) - F.col("tie_t_d").cast("double") / (
        F.pow(F.col("n").cast("double"), 3) - F.col("n").cast("double")
    )
    return sums.crossJoin(F.broadcast(tot)).select(
        "n",
        "n_groups",
        # display column goes NULL past long range, never wraps/crashes
        F.col("tie_t_d").try_cast("long").alias("tie_t"),
        F.round(h * 1e6, 0).cast("long").alias("h_e6"),
        F.when(corr > 0, F.round(h / corr * 1e6, 0).cast("long")).alias(
            "h_tied_e6"
        ),
    )


def anderson_darling_k(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Exact tie-adjusted k-sample Anderson-Darling test (Scholz &
    Stephens 1987, the midrank/ties form): do the ``group_col``
    samples share one distribution? The TAIL-SENSITIVE companion to
    `kruskal_wallis` (location) and `ks_two_sample` (max gap): the
    A² weight ``1/(B(N−B))`` blows up at the distribution edges, so
    tail divergence that KS's single max misses moves this statistic.

    DOUBLED-count arithmetic keeps every cumulative integral under
    midrank ties: with per-(group, value) counts ``f_ij``, per-value
    totals ``l_j``, ``M2_ij = 2·cum_i(<j) + f_ij`` and ``B2_j =
    2·cumtot(<j) + l_j`` (twice the midrank cumulatives), the
    Scholz-Stephens term becomes the exact integer ratio

        ``l_j · (N·M2_ij − n_i·B2_j)² / ((2N·B2_j − B2_j² − N·l_j)
        · n_i · N)``

    — numerator and denominator both integral, so each (i, j) term
    is ONE fixed-operand-order double expression, e9-snapped, and the
    reduction is an exact long sum (order-free; the kaplan_meier /
    cramers_v per-term discipline). The n²-scale products accumulate
    in DECIMAL(38,0). One row: ``(n, k, n_vals, a2_e6)`` — NULL
    ``a2_e6`` when degenerate (k < 2 or fewer than 2 distinct
    values). ``value_col`` must be integer-typed (fixed-point
    policy); NULLs are dropped (the shared rank-test policy).

    Scale shape (r18): ONE corpus-sized aggregation per run — the
    long-form per-(value, group) count table, pinned — feeds (a) one
    bounded control-plane collect (k rows) carrying the group list,
    per-group totals, AND the prefix-sum boundaries (per-group
    quantiles merged client-side; any monotone boundary set yields
    exact prefix sums), and (b) the vocabulary-sized pivot to the
    wide L-row grid with a count column per group (k is bounded, the
    Kruskal contract). Every per-group cumulative and the joint
    cumulative come out of ONE multi-column distributed prefix-sum
    pass; all k per-value terms are evaluated in-row and partially
    summed before the final scalar aggregate, which also carries
    ``n_vals`` — two driver actions per run in total (the r17 shape
    paid three, and aggregated the corpus twice). Zero-count (g, v)
    cells still carry their ``N·M2`` term — the wide row evaluates
    every group at every value by construction.
    """
    from functools import reduce

    from pyspark.sql.types import FractionalType

    from rootstock_collective_state_sync_spark.caching import (
        tracked_persist,
    )

    dec = "decimal(38,0)"
    if isinstance(df.schema[value_col].dataType, FractionalType):
        raise ValueError(
            f"anderson_darling_k requires an integer-typed value "
            f"column (snap to cents first); got "
            f"{df.schema[value_col].dataType.simpleString()} for "
            f"{value_col!r}"
        )
    x = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull())
    # ONE corpus-sized aggregation per run (r18, guide §2.3/§5.2):
    # the long-form per-(value, group) count table — buildable WITHOUT
    # knowing the group list, unlike the wide grid — is pinned
    # (lazily: the stats collect below is its single first consumer
    # and fills the cache in that pass), and everything downstream
    # derives from it at vocabulary scale. The r17 shape aggregated
    # the corpus TWICE (the group-stats collect, then the wide-grid
    # fill) and ran a THIRD driver action for the boundary probe.
    # repartition("v") BEFORE the aggregate: HashPartitioning(v)
    # satisfies clustering on (v, g) — the aggregate runs in-partition
    # with no second exchange — AND the cached table keeps the v
    # partitioning, so the wide pivot below (groupBy(v), consumed
    # twice by the prefix-sum tower) runs exchange-free on the cache.
    # One corpus-sized exchange per run, total.
    pv = tracked_persist(
        x.repartition("v")
        .groupBy("v", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("_f")),
        eager=False,
    )
    # bounded control-plane pull (k rows) carrying EVERYTHING the
    # driver needs in one action: group list, per-group row totals,
    # per-group distinct-value counts, and per-group value quantiles
    # (the prefix-sum boundaries fused in — any monotone boundary set
    # yields exact prefix sums, the module invariant, so a client-side
    # merge of per-group quantiles is as correct as the old global
    # probe; only bucket balance could differ). Sorted for a
    # deterministic column order; None sorts first.
    stats = (
        pv.groupBy("g")
        .agg(
            F.sum("_f").cast("long").alias("c"),
            F.count(F.lit(1)).cast("long").alias("nv"),
            F.percentile_approx(
                F.col("v").cast("double"),
                [i / NUM_RANGE_BUCKETS for i in range(1, NUM_RANGE_BUCKETS)],
                1000,
            ).alias("bs"),
        )
        .collect()
    )
    gstats = {r["g"]: int(r["c"]) for r in stats}
    groups = sorted(gstats, key=lambda gv: (gv is not None, gv))
    kk = len(groups)
    spark = df.sparkSession
    if kk == 0:  # empty input: one degenerate row, as before
        return spark.createDataFrame(
            [(None, 0, 0, None)],
            "n long, k long, n_vals long, a2_e6 long",
        )
    # weighted merge of the per-group quantile points into one global
    # monotone boundary list: each group's points carry its
    # distinct-value count as weight, so the merged boundaries
    # approximate the quantiles of the distinct-value domain — the
    # row domain the prefix-sum windows actually partition.
    pts: list[tuple[float, float]] = []
    for r in stats:
        bs = [b for b in (r["bs"] or []) if b is not None]
        if bs:
            w = max(int(r["nv"]), 1) / len(bs)
            pts.extend((float(b), w) for b in bs)
    pts.sort()
    tot = sum(w for _, w in pts)
    uniq: list[float] = []
    if pts and tot > 0:
        acc, ti = 0.0, 1
        targets = [
            i * tot / NUM_RANGE_BUCKETS
            for i in range(1, NUM_RANGE_BUCKETS)
        ]
        for val, w in pts:
            acc += w
            while ti <= len(targets) and acc >= targets[ti - 1]:
                if not uniq or val > uniq[-1]:
                    uniq.append(val)
                ti += 1
    # the wide k-column grid now pivots from the CACHED per-(v,g)
    # table (vocabulary-sized), not from the corpus. It is pinned too
    # (lazily — no extra action; the prefix-sum tower consumes it
    # from two subtrees of ONE action and the cache's per-partition
    # locking makes the first action compute each partition once):
    # unpinned, both subtrees re-ran the L-row pivot, which the sf1
    # leg measured as a ~0.8 s regression at 10x vocabulary.
    wide = tracked_persist(
        pv.groupBy("v").agg(
            *[
                F.sum(
                    F.when(
                        F.col("g").isNull()
                        if gi is None
                        else (F.col("g") == F.lit(gi)),
                        F.col("_f"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"_f{i}")
                for i, gi in enumerate(groups)
            ],
            F.sum("_f").cast("long").alias("l"),
        ),
        eager=False,
    )
    ni = [gstats[gi] for gi in groups]
    n = sum(ni)
    cums = _prefix_sum_with_boundaries(
        wide,
        "v",
        [*(f"_f{i}" for i in range(kk)), "l"],
        [*(f"_o{i}" for i in range(kk)), "offl"],
        [],
        uniq,
        cast_double=True,
    )
    b2 = (F.lit(2) * F.col("offl") + F.col("l")).alias("b2")
    den = (
        F.lit(2).cast(dec) * F.lit(n) * F.col("b2")
        - F.col("b2").cast(dec) * F.col("b2")
        - F.lit(n).cast(dec) * F.col("l")
    ).alias("den")
    row = cums.select("*", b2).select("*", den)

    def _term(i: int):
        m2 = F.lit(2) * F.col(f"_o{i}") + F.col(f"_f{i}")
        num = F.lit(n).cast(dec) * m2 - F.lit(ni[i]).cast(dec) * F.col("b2")
        num_d = num.cast("double")
        return F.when(
            F.col("den") > 0,
            F.round(
                F.col("l").cast("double")
                * (num_d * num_d)
                / (
                    F.col("den").cast("double")
                    * (
                        F.lit(ni[i]).cast("double")
                        * F.lit(n).cast("double")
                    )
                )
                * 1e9,
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    # n_vals (the distinct-value count) rides the final aggregate —
    # `row` holds exactly one row per distinct value — instead of the
    # removed probe action
    s = row.select(
        reduce(lambda a, b: a + b, [_term(i) for i in range(kk)]).alias(
            "t_e9"
        )
    ).agg(
        F.sum("t_e9").cast("long").alias("s_e9"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    a2 = (
        F.lit(n - 1).cast("double")
        / F.lit(n).cast("double")
        * (F.col("s_e9").cast("double") / 1e9)
    )
    return s.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(kk).cast("long").alias("k"),
        F.col("nv").alias("n_vals"),
        (
            F.when(
                (F.lit(kk) > 1) & (F.col("nv") > 1),
                F.round(a2 * 1e6, 0).cast("long"),
            )
            if kk > 1
            else F.lit(None).cast("long")  # degenerate: k < 2
        ).alias("a2_e6"),
    )  # when() without otherwise yields NULL long for n_vals <= 1


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Exact tie-aware Spearman rank correlation (per group): Pearson
    over average-tie ranks, with the ranks DOUBLED so every rank is
    integral (``2·rank = 2·off + c + 1`` per tie group, as in
    :func:`mann_whitney_u`). The monotone-association screen — is
    quantity monotonically related to price? — robust to any
    monotone transform of either column.

    Each column's doubled rank depends only on its own value, so the
    per-row product sum decomposes over the (x, y) PAIR-count table:
    ``Σ_rows r2x·r2y = Σ_pairs n_xy·r2x(x)·r2y(y)`` — two independent
    rank tables (each one prefix sum), one pair-count aggregate, two
    broadcast-joins. Sums of rank products are kept in DECIMAL(38,0)
    (they grow as n³ — past long at ~1.3 M rows per group) and the
    one double division is e6-snapped. Returns ``(*group_cols,
    n_rows, rho_e6)``. NULL x or y rows are dropped (the shared
    rank-test NULL policy; r14 — no behavior change on non-null
    inputs, and the streaming pair store filters identically).
    """
    g = list(group_cols or [])
    base = df.select(
        *g, F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    pairs = base.groupBy(*g, "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    return spearman_rho_from_pairs(pairs, group_cols=g)


def spearman_rho_from_pairs(
    pairs: DataFrame,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Render Spearman from a ``(x, y, n_xy)`` PAIR-count table — the
    mergeable-summary form (pair counts over disjoint row sets add
    exactly) that makes rank correlation incrementally maintainable
    (``streaming/rankcorr.py``, X-ST23): both marginal rank tables
    derive from the pair table by summation, so the store IS the
    sufficient statistic for Spearman AND Kendall — one store, two
    reports, the X-ST21/22 pattern."""
    g = list(group_cols or [])
    per_x = pairs.groupBy(*g, F.col("x").alias("v")).agg(
        F.sum("n_xy").cast("long").alias("c")
    )
    per_y = pairs.groupBy(*g, F.col("y").alias("v")).agg(
        F.sum("n_xy").cast("long").alias("c")
    )
    rx = _distributed_prefix_sum(per_x, "v", "c", "off", group_cols=g).select(
        *g,
        F.col("v").alias("x"),
        (F.lit(2) * F.col("off") + F.col("c") + 1).cast("long").alias("r2x"),
    )
    ry = _distributed_prefix_sum(per_y, "v", "c", "off", group_cols=g).select(
        *g,
        F.col("v").alias("y"),
        (F.lit(2) * F.col("off") + F.col("c") + 1).cast("long").alias("r2y"),
    )
    j = pairs.join(rx, [*g, "x"]).join(ry, [*g, "y"])
    dec = "decimal(38,0)"
    sums = j.groupBy(*g).agg(
        F.sum("n_xy").cast("long").alias("n_rows"),
        F.sum(F.col("n_xy").cast(dec) * F.col("r2x")).alias("sx"),
        F.sum(F.col("n_xy").cast(dec) * F.col("r2y")).alias("sy"),
        F.sum(
            F.col("n_xy").cast(dec) * F.col("r2x") * F.col("r2x")
        ).alias("sxx"),
        F.sum(
            F.col("n_xy").cast(dec) * F.col("r2y") * F.col("r2y")
        ).alias("syy"),
        F.sum(
            F.col("n_xy").cast(dec) * F.col("r2x") * F.col("r2y")
        ).alias("sxy"),
    )
    n = F.col("n_rows").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        (n * F.col("sxx").cast("double") - F.pow(F.col("sx").cast("double"), 2))
        * (n * F.col("syy").cast("double") - F.pow(F.col("sy").cast("double"), 2))
    )
    out = sums.select(
        *g,
        "n_rows",
        F.when(den > 0, F.round(num / den * 1e6, 0).cast("long")).alias(
            "rho_e6"
        ),
    )
    return out.orderBy(*g) if g else out


def theil_decomposition(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil T inequality index with its exact between/within GROUP
    decomposition (Theil 1967; the GE(1) member of the generalized
    entropy family — the one inequality measure that decomposes
    additively, which Gini does not): per group ``g``,

    - ``theil_g_e9``  — the within-group index
      ``(1/n_g) Σ (x_i·n_g/S_g)·ln(x_i·n_g/S_g)`` (each row term has
      an exact integer rational inside and outside the one ``ln``,
      e9-snapped before summation — the package fixed-point policy);
    - ``between_term_e9`` — the group's contribution
      ``(S_g/S)·ln(S_g·n/(S·n_g))`` to the between-group index;
    - ``within_term_e9`` — its weighted within contribution
      ``(S_g/S)·theil_g``.

    ``Σ between_term + Σ within_term = T_total`` up to the snapping.

    Input contract (r12 advisor): ``value_col`` must be strictly
    positive AND integer-typed — callers snap monetary values to an
    integer grain first (cents, as ``theil_by_priority`` does), so the
    exact ``S_g``/``S`` sums carry no float error. A fractional column
    raises rather than silently truncating through the long cast.
    ``share_e6`` is computed in DECIMAL(38,0) so group sums above
    ~9.2e12 (plausible at 100 TB with cent-scaled values) cannot
    overflow long arithmetic.

    Scale shape: one group-keyed map-side-combined aggregate for the
    (S_g, n_g) table (broadcast back), per-row terms computed in the
    scan projection, one more group aggregate — the corpus is scanned
    once and only group keys shuffle.
    """
    from pyspark.sql.types import FractionalType

    if isinstance(df.schema[value_col].dataType, FractionalType):
        raise ValueError(
            f"theil_decomposition requires an integer-typed value "
            f"column (snap to cents first); got "
            f"{df.schema[value_col].dataType.simpleString()} for "
            f"{value_col!r}"
        )
    x = F.col(value_col).cast("double")
    per_g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.sum(value_col).cast("long").alias("sg"),
        F.count(F.lit(1)).cast("long").alias("ng"),
    )
    tot = per_g.agg(
        F.sum("sg").cast("long").alias("s"),
        F.sum("ng").cast("long").alias("n"),
    )
    rows = df.select(F.col(group_col).alias("g"), x.alias("x")).join(
        F.broadcast(per_g), "g"
    )
    ratio = F.col("x") * F.col("ng").cast("double") / F.col("sg").cast("double")
    terms = rows.select(
        "g",
        F.round(ratio * F.log(ratio) * 1e9, 0).cast("long").alias("t_e9"),
    )
    within = terms.groupBy("g").agg(
        F.expr("sum(t_e9) div count(1)").cast("long").alias("theil_g_e9")
    )
    share = F.col("sg").cast("double") / F.col("s").cast("double")
    lg_btw = F.log(
        F.col("sg").cast("double")
        * F.col("n").cast("double")
        / (F.col("s").cast("double") * F.col("ng").cast("double"))
    )
    return (
        per_g.join(within, "g")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            F.col("ng").alias("n_rows"),
            # decimal(38,0) keeps sg*1e6 exact past the long range
            # (sg > ~9.2e12 cents overflows bigint); floor == div for
            # the strictly-positive contract
            F.floor(
                F.col("sg").cast("decimal(38,0)") * 1000000 / F.col("s")
            )
            .cast("long")
            .alias("share_e6"),
            "theil_g_e9",
            F.round(share * lg_btw * 1e9, 0).cast("long").alias(
                "between_term_e9"
            ),
            F.round(share * F.col("theil_g_e9").cast("double"), 0)
            .cast("long")
            .alias("within_term_e9"),
        )
        .orderBy(group_col)
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Exact tie-corrected Kendall tau-b per group (X-A43; Kendall
    1945 tau-b) — Spearman's companion ordinal-association screen,
    reading CONCORDANCE of pairs rather than rank covariance:

        tau_b = (nc - nd) / sqrt((n0 - n1) (n0 - n2))

    with ``n0 = n(n-1)/2``, ``n1 = Σ_x c_x(c_x-1)/2`` (x-tie pairs),
    ``n2`` likewise for y, ``nc``/``nd`` the concordant/discordant
    pair counts. Everything except the final sqrt is exact integer:
    the concordance sums decompose over the (x, y) CELL-count table —
    ``nc = Σ_{x1<x2, y1<y2} c1·c2`` — so no row-level pair is ever
    formed; sums accumulate in DECIMAL(38,0) (they grow as n², the
    shared rank-test overflow policy) and the long display columns
    ``try_cast`` (NULL past long range, never wraparound). The one
    double sqrt + e6 round at the end is the `spearman_rho` /
    `kaplan_meier` determinism class (IEEE-correctly-rounded on both
    engines). NULL x or y rows are dropped — the shared rank-test
    NULL policy (streaming twins filter the same way).

    Input contract / scale shape: the cell self-join is bounded by
    |distinct (x,y) cells|² PER GROUP — the Theil-Sen calendar-bound
    pattern — so callers feed BOUNDED-cardinality ordinal columns
    (quantities, discount ticks, quality deciles; quantile-bucket a
    near-unique measure first, which leaves tau of the bucketed
    variable exact). The corpus itself is scanned once into the cell
    table (one map-side-combined shuffle); the cell join broadcasts
    the smaller side; output is one row per group.
    """
    g = list(group_cols or [])
    base = df.select(
        *g, F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    pairs = base.groupBy(*g, "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    return kendall_tau_from_pairs(pairs, group_cols=g)


def kendall_tau_from_pairs(
    pairs: DataFrame,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Render tau-b from the same ``(x, y, n_xy)`` PAIR-count table
    :func:`spearman_rho_from_pairs` consumes — the X-ST23 store's
    second report (concordance and rank covariance share one exactly-
    additive sufficient statistic)."""
    g = list(group_cols or [])
    cells = pairs.select(*g, "x", "y", F.col("n_xy").alias("c"))
    dec = "decimal(38,0)"
    # doubled tie-pair sums: t1 = Σ c_x(c_x-1) = 2·n1 (kept doubled so
    # every intermediate stays integral; halves cancel in the ratio)
    t1 = (
        cells.groupBy(*g, "x")
        .agg(F.sum("c").cast("long").alias("cx"))
        .groupBy(*g)
        .agg(
            F.sum(F.col("cx").cast(dec) * (F.col("cx") - 1)).alias("t1")
        )
    )
    t2 = (
        cells.groupBy(*g, "y")
        .agg(F.sum("c").cast("long").alias("cy"))
        .groupBy(*g)
        .agg(
            F.sum(F.col("cy").cast(dec) * (F.col("cy") - 1)).alias("t2")
        )
    )
    tot = cells.groupBy(*g).agg(F.sum("c").cast("long").alias("n_rows"))
    a = cells.select(
        *g,
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        F.col("c").alias("c1"),
    )
    b = cells.select(
        *g,
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.col("c").alias("c2"),
    )
    joined = (
        a.join(F.broadcast(b), g) if g else a.crossJoin(F.broadcast(b))
    ).filter(F.col("x1") < F.col("x2"))
    prod = F.col("c1").cast(dec) * F.col("c2")
    zero = F.lit(0).cast(dec)
    pairsum = joined.groupBy(*g).agg(
        F.sum(F.when(F.col("y1") < F.col("y2"), prod).otherwise(zero)).alias(
            "nc"
        ),
        F.sum(F.when(F.col("y1") > F.col("y2"), prod).otherwise(zero)).alias(
            "nd"
        ),
    )
    out = (
        tot.join(t1, g) if g else tot.crossJoin(t1)
    )
    out = out.join(t2, g) if g else out.crossJoin(t2)
    out = out.join(pairsum, g, "left") if g else out.crossJoin(pairsum)
    nc = F.coalesce(F.col("nc"), zero)
    nd = F.coalesce(F.col("nd"), zero)
    n = F.col("n_rows").cast(dec)
    d1 = (n * (n - 1) - F.col("t1")).cast("double")
    d2 = (n * (n - 1) - F.col("t2")).cast("double")
    out = out.select(
        *g,
        "n_rows",
        nc.try_cast("long").alias("n_concordant"),
        nd.try_cast("long").alias("n_discordant"),
        F.when(
            (d1 > 0) & (d2 > 0),
            F.round(
                (nc - nd).cast("double") * 2e6 / F.sqrt(d1 * d2), 0
            ).cast("long"),
        ).alias("tau_b_e6"),
    )
    return out.orderBy(*g) if g else out


def gini_from_counts(
    per_v: DataFrame,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Render the exact Gini index from a per-VALUE count table
    ``(v, c)`` (per group when ``group_cols`` given) — the
    mergeable-summary form that makes X-A26 incrementally
    maintainable (``streaming/gini.py``, X-ST22): counts over
    disjoint row sets add exactly, and the index is a pure function
    of the merged counts. Bit-equal to :func:`gini_index` over the
    raw rows: the rank formulation is tie-invariant, and a value's
    rows occupy ranks ``off+1..off+c``, so ``Σ rn·v`` contributes
    ``v·(c·off + c(c+1)/2)`` per value — kept DOUBLED
    (``2Σrn·v = Σ v·(2·c·off + c(c+1))``) so every intermediate is
    integral, in DECIMAL(38,0) like the raw operator. The prefix
    offsets come from the shared distributed two-level prefix sum —
    no global ordered window."""
    g = list(group_cols or [])
    off = _distributed_prefix_sum(per_v, "v", "c", "off", group_cols=g)
    dec = "decimal(38,0)"
    term = F.col("v").cast(dec) * (
        F.lit(2).cast(dec) * F.col("c").cast(dec) * F.col("off").cast(dec)
        + F.col("c").cast(dec) * (F.col("c").cast(dec) + 1)
    )
    agg = off.groupBy(*g).agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(dec) * F.col("v")).alias("s"),
        F.sum(term).alias("ws2"),
    )
    return agg.select(
        *g,
        "n",
        F.col("s").cast("long").alias("total"),
        F.expr(
            "CAST((ws2 - (n + 1) * s) * 1000000 div (n * s) AS BIGINT)"
        ).alias("gini_e6"),
    ).orderBy(*g) if g else agg.select(
        "n",
        F.col("s").cast("long").alias("total"),
        F.expr(
            "CAST((ws2 - (n + 1) * s) * 1000000 div (n * s) AS BIGINT)"
        ).alias("gini_e6"),
    )


def lorenz_from_counts(per_v: DataFrame, buckets: int = 10) -> DataFrame:
    """Render the Lorenz-curve decile table from the same per-VALUE
    count store (X-ST22's second report — one store, two reports,
    like the X-ST21 rank-test pair). Bit-equal to the raw-row
    renderer (`plans/analytics.py::q_lorenz_curve`'s ntile path): the
    id tie-split only decides WHICH equal-valued rows straddle a
    decile boundary, never how many or their value sum, so per-decile
    ``n`` and ``Σv`` are pure functions of the counts. A value with
    exclusive offset ``off`` and count ``c`` spans ntile buckets
    ``bucket(off+1)..bucket(off+c)`` (an explode bounded by
    ``buckets``) and contributes its rank-range overlap with each —
    exact integer arithmetic end-to-end; the cumulative shares run
    over the ``buckets``-row table (bounded window, like the
    equi-depth base offsets)."""
    B = int(buckets)
    off = _distributed_prefix_sum(per_v, "v", "c", "off")
    tot = per_v.agg(
        F.sum("c").cast("long").alias("_n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("v")).alias("_s"),
    )

    def bucket_of(r: str) -> str:
        return (
            f"CAST(CASE WHEN {r} <= (_n % {B}) * (_n div {B} + 1) "
            f"THEN ({r} - 1) div (_n div {B} + 1) + 1 "
            f"ELSE (_n % {B}) + "
            f"({r} - (_n % {B}) * (_n div {B} + 1) - 1) div (_n div {B}) + 1 "
            f"END AS INT)"
        )

    # ntile bucket b's global rank range: lo = (b-1)·q + min(b-1, r) + 1,
    # hi = b·q + min(b, r), with q = n div B, r = n mod B
    lo_b = f"((bucket - 1) * (_n div {B}) + least(bucket - 1, _n % {B}) + 1)"
    hi_b = f"(bucket * (_n div {B}) + least(bucket, _n % {B}))"
    spans = (
        off.crossJoin(F.broadcast(tot))
        .withColumn("_b1", F.expr(bucket_of("(off + 1)")))
        .withColumn("_b2", F.expr(bucket_of("(off + c)")))
        .select(
            "v",
            "c",
            "off",
            "_n",
            F.explode(F.sequence("_b1", "_b2")).alias("bucket"),
        )
        .withColumn(
            "rows_in_b",
            F.expr(
                f"least(off + c, {hi_b}) - greatest(off + 1, {lo_b}) + 1"
            ).cast("long"),
        )
    )
    per_b = spans.groupBy("bucket").agg(
        F.sum("rows_in_b").cast("long").alias("n"),
        F.sum(F.col("rows_in_b").cast("decimal(38,0)") * F.col("v")).alias(
            "sv"
        ),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_b.crossJoin(F.broadcast(tot))
        .withColumn("cn", F.sum("n").over(w))
        .withColumn("cs", F.sum("sv").over(w))
        .select(
            "bucket",
            "n",
            F.expr("CAST(sv * 1000000 div _s AS BIGINT)").alias("share_e6"),
            F.expr("CAST(cn * 1000000 div _n AS BIGINT)").alias("cum_pop_e6"),
            F.expr("CAST(cs * 1000000 div _s AS BIGINT)").alias(
                "cum_value_e6"
            ),
        )
        .orderBy("bucket")
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_expr: str,
) -> DataFrame:
    """Exact two-sample 1-D Wasserstein-1 (earth mover's) distance
    (X-A44): ``W1 = ∫ |F_A − F_B|`` over the value domain — the
    drift MAGNITUDE companion to KS's max gap (X-A39): KS sees the
    worst point, W1 integrates total transport, so a wide small gap
    and a narrow tall one are distinguished. Same inputs, same
    ``(v, c, ca)`` sufficient statistic, same NULL policy.

    EXACT INTEGER end-to-end — no sqrt, no log: over sorted distinct
    values, ``W1·n_a·n_b = Σ_i |cumA_i·n_b − cumB_i·n_a|·(v_{i+1} −
    v_i)``; summation by parts turns the next-value difference into
    per-row terms (``D_m = 0`` since full cumulatives agree):

        ``W1·n_a·n_b = Σ_v (D_excl(v) − D_incl(v)) · v``

    where ``D_excl``/``D_incl`` are the scaled ECDF gaps just before
    and at ``v`` — BOTH already on the KS cumulative row (the
    exclusive prefix and prefix+count), so no ``lead()`` window and
    no value self-join exists anywhere in the plan. The sum
    accumulates in DECIMAL(38,0) (n²·value-range growth); one final
    floor division to e6 of the value unit.

    Scale shape: identical to :func:`ks_two_sample` — per-value
    counts, one distributed prefix sum (A rides along), one scalar
    aggregate. Returns ``(n_a, n_b, w1_e6)``; ``w1_e6`` is in
    e6-scaled VALUE units (cents in → e6-cents out), NULL when either
    group is empty."""
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return wasserstein_from_counts(per_v)


def wasserstein_from_counts(per_v: DataFrame) -> DataFrame:
    """:func:`wasserstein_1d` from the same per-VALUE count table
    ``(v, c, ca)`` as the MWU/KS renderers — the X-ST21 store's THIRD
    report (one store, three reports)."""
    per_v = per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
    # both cumulatives in ONE prefix pass (shared boundary probe +
    # window tower; the columns co-exist on the input rows)
    both = _distributed_prefix_sum(per_v, "v", ["ca", "cb"], ["offa", "offb"])
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    dec = "decimal(38,0)"
    d_excl = F.abs(
        F.col("offa").cast(dec) * F.col("n_b")
        - F.col("offb").cast(dec) * F.col("n_a")
    )
    d_incl = F.abs(
        (F.col("offa") + F.col("ca")).cast(dec) * F.col("n_b")
        - (F.col("offb") + F.col("cb")).cast(dec) * F.col("n_a")
    )
    sums = (
        both.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            ((d_excl - d_incl) * F.col("v").cast(dec)).alias("term"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.sum("term").alias("num"))
    )
    return sums.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr("CAST(num * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"),
        ).alias("w1_e6"),
    )


def group_moments(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group moment table ``(g, n, s, q)`` — count, sum, sum of
    squares, the EXACTLY-ADDITIVE sufficient statistic for the whole
    mean/variance test family (one-way ANOVA, Welch t, effect sizes):
    moments over disjoint row sets add exactly, so the same table the
    at-rest operators reduce to is also the incremental store
    (``streaming/moments.py``, X-ST24 — the X-ST21/22/23 split).
    ``s``/``q`` accumulate in DECIMAL(38,0) (q grows value²·n — past
    long at cents-scale corpora); ``value_col`` must be integer-typed
    (snap to cents first — fixed-point policy; fractional input
    raises like `theil_decomposition`). NULL values are dropped (the
    shared NULL policy)."""
    from pyspark.sql.types import FractionalType

    if isinstance(df.schema[value_col].dataType, FractionalType):
        raise ValueError(
            f"group_moments requires an integer-typed value column "
            f"(snap to cents first); got "
            f"{df.schema[value_col].dataType.simpleString()} for "
            f"{value_col!r}"
        )
    dec = "decimal(38,0)"
    return (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast(dec)).alias("s"),
            F.sum(F.col("v").cast(dec) * F.col("v")).alias("q"),
        )
    )


def anova_from_moments(m: DataFrame) -> DataFrame:
    """One-way ANOVA F + eta² from the ``(g, n, s, q)`` moment table
    (X-A45): ``SSB = Σ s_g²/n_g − S²/N``, ``SSW = Q − Σ s_g²/n_g``,
    ``F = (SSB/(k−1)) / (SSW/(N−k))``. All moment sums are exact
    decimals; the per-group ``s_g²/n_g`` terms carry a non-integral
    division, so they are doubles — but their reduction is a
    FIXED-ORDER left fold (``F.aggregate`` over the g-sorted
    collected term array), NOT a partition-order-dependent
    ``F.sum``: the previous float sum could flip ``f_e6``/``eta2_e6``
    by 1 between runs or vs the DuckDB oracle near an e6 rounding
    boundary (r14 advisor item). The oracle mirrors the identical
    IEEE addition order with ``sum(... ORDER BY g)``, so the
    statistic is bit-determined on both engines. The g-sorted
    collect is bounded by the group cardinality k — the same
    control-plane contract as `kruskal_wallis` (an ANOVA across
    unbounded k is degenerate). One row: ``(n, k, f_e6, eta2_e6)`` —
    NULL when degenerate (k < 2, N ≤ k, or zero within/total
    variance)."""
    per_g = m.select(
        "g",
        "n",
        "s",
        "q",
        (
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("s2n"),
    )
    agg = per_g.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").alias("_s"),
        F.sum("q").alias("_q"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("g"), F.col("s2n")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["s2n"],
        ).alias("_s2n"),
    )
    grand = (
        F.col("_s").cast("double")
        * F.col("_s").cast("double")
        / F.col("n").cast("double")
    )
    ssb = F.col("_s2n") - grand
    sst = F.col("_q").cast("double") - grand
    ssw = sst - ssb
    f = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return agg.select(
        "n",
        "k",
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0),
            F.round(f * 1e6, 0).cast("long"),
        ).alias("f_e6"),
        F.when(sst > 0, F.round(ssb / sst * 1e6, 0).cast("long")).alias(
            "eta2_e6"
        ),
    )


def anova_oneway(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """:func:`anova_from_moments` over the raw rows — do the
    ``group_col`` groups share a mean? The parametric companion to
    `kruskal_wallis` (same question, variance-based instead of
    rank-based, so the two disagreeing flags heavy tails)."""
    return anova_from_moments(group_moments(df, value_col, group_col))


def welch_from_moments(
    m: DataFrame, a_groups: "list[str]"
) -> DataFrame:
    """Welch's unequal-variance t between the union of ``a_groups``
    and the remaining groups, from the same moment table (the
    X-ST24 store's second report): ``t = (m_A − m_B)/√(v_A/n_A +
    v_B/n_B)`` with the Welch–Satterthwaite df. Two-row reduction —
    every double expression has a FIXED operand order, so the result
    is bit-determined (no multi-group float summation). One row:
    ``(n_a, n_b, t_e6, df_e6)`` — NULL when either side has < 2 rows
    or both variances are 0."""
    tagged = m.select(F.col("g").isin([*a_groups]).alias("_a"), "n", "s", "q")
    zero = F.lit(0).cast("decimal(38,0)")
    j = tagged.agg(
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("s"))), zero).alias("s_a"),
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("q"))), zero).alias("q_a"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_b"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("s"))), zero).alias("s_b"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("q"))), zero).alias("q_b"),
    )

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n).cast("double")

    def var(q, s, n):
        return (
            F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s).cast("double")
            / F.col(n).cast("double")
        ) / (F.col(n) - 1).cast("double")

    va_n = var("q_a", "s_a", "n_a") / F.col("n_a").cast("double")
    vb_n = var("q_b", "s_b", "n_b") / F.col("n_b").cast("double")
    se2 = va_n + vb_n
    t = (mean("s_a", "n_a") - mean("s_b", "n_b")) / F.sqrt(se2)
    df_w = (se2 * se2) / (
        va_n * va_n / (F.col("n_a") - 1).cast("double")
        + vb_n * vb_n / (F.col("n_b") - 1).cast("double")
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0)
    return j.select(
        "n_a",
        "n_b",
        F.when(ok, F.round(t * 1e6, 0).cast("long")).alias("t_e6"),
        F.when(ok, F.round(df_w * 1e6, 0).cast("long")).alias("df_e6"),
    )


def welch_t(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a_groups: "list[str]",
) -> DataFrame:
    """:func:`welch_from_moments` over the raw rows — the parametric
    two-sample companion to `mann_whitney_u` on the same slice."""
    return welch_from_moments(
        group_moments(df, value_col, group_col), a_groups
    )


def effect_size_from_moments(
    m: DataFrame, a_groups: "list[str]"
) -> DataFrame:
    """Cohen's d and Hedges' g between the union of ``a_groups`` and
    the remaining groups, from the same ``(g, n, s, q)`` moment table
    (X-A53; the X-ST24 store's THIRD report): `welch_t` says whether
    the means differ, this says by how many pooled standard
    deviations — the magnitude number a significance test cannot
    give, and (unlike the z/t statistics) one that does NOT grow with
    n. ``d = (m_A − m_B)/s_p`` with the pooled variance
    ``s_p² = (SSW_A + SSW_B)/(n_A+n_B−2)``; Hedges' g applies the
    small-sample correction ``J = 1 − 3/(4(n_A+n_B) − 9)``.

    Same determinism class as `welch_from_moments`: the moment sums
    are exact decimals and every double expression has a FIXED
    operand order, so the result is bit-determined. One row:
    ``(n_a, n_b, d_e6, g_e6)`` — NULL when either side has < 2 rows
    or the pooled variance is 0."""
    tagged = m.select(F.col("g").isin([*a_groups]).alias("_a"), "n", "s", "q")
    zero = F.lit(0).cast("decimal(38,0)")
    j = tagged.agg(
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("s"))), zero).alias("s_a"),
        F.coalesce(F.sum(F.when(F.col("_a"), F.col("q"))), zero).alias("q_a"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_b"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("s"))), zero).alias("s_b"),
        F.coalesce(F.sum(F.when(~F.col("_a"), F.col("q"))), zero).alias("q_b"),
    )

    def ssw(q, s, n):
        return F.col(q).cast("double") - F.col(s).cast("double") * F.col(
            s
        ).cast("double") / F.col(n).cast("double")

    sp2 = (ssw("q_a", "s_a", "n_a") + ssw("q_b", "s_b", "n_b")) / (
        F.col("n_a") + F.col("n_b") - 2
    ).cast("double")
    d = (
        F.col("s_a").cast("double") / F.col("n_a").cast("double")
        - F.col("s_b").cast("double") / F.col("n_b").cast("double")
    ) / F.sqrt(sp2)
    corr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("n_a") + F.col("n_b")).cast("double")
        - F.lit(9.0)
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (sp2 > 0)
    return j.select(
        "n_a",
        "n_b",
        F.when(ok, F.round(d * 1e6, 0).cast("long")).alias("d_e6"),
        F.when(ok, F.round(d * corr * 1e6, 0).cast("long")).alias("g_e6"),
    )


def effect_size(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a_groups: "list[str]",
) -> DataFrame:
    """:func:`effect_size_from_moments` over the raw rows — the
    standardized-magnitude companion to `welch_t`/`cliffs_delta` on
    the same slice."""
    return effect_size_from_moments(
        group_moments(df, value_col, group_col), a_groups
    )


def energy_distance(
    df: DataFrame,
    value_col: str,
    group_expr: str,
) -> DataFrame:
    """Exact two-sample energy distance (X-A47; Székely & Rizzo 2004):
    ``E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|`` — the rotation/shape-
    sensitive drift statistic beside KS (max gap, X-A39) and W1
    (transport mass, X-A44); E ≥ 0 with equality iff the
    distributions coincide. Same input slice, same ``(v, c, ca)``
    sufficient statistic — the X-ST21 store's FOURTH report.

    EXACT INTEGERS throughout: for sorted distinct values, every
    pairwise-|difference| sum decomposes over prefix sums —
    ``Σ_{pairs} |v_i−v_j|·w_i·u_j = Σ_i w_i·(v_i·CU_<(i) − SU_<(i)) +
    (symmetric term)`` with ``CU_<``/``SU_<`` the strictly-below
    cumulative count and value-sum of the other measure — so no pair
    is ever formed and no float is summed; the three expectation
    divisions floor-snap to e9 separately (the `kaplan_meier`
    per-term discipline) and combine as integers. Returns ``(n_a,
    n_b, e_e9)`` in e9-scaled value units; NULL when either group is
    empty.

    Scale shape: per-value counts, one distributed prefix-sum tower
    per cumulative measure (4: counts and value-sums per side — same
    machinery, same shuffle keys), one scalar aggregate. The
    value-sum cumulatives live in the helper's long output — at
    corpora where Σ|v| approaches 2⁶³ pre-scale the values first
    (the fixed-point policy's documented ceiling)."""
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return energy_from_counts(per_v)


def energy_from_counts(per_v: DataFrame) -> DataFrame:
    """:func:`energy_distance` from the shared ``(v, c, ca)``
    per-value count table (the MWU/KS/W1 store)."""
    per_v = (
        per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
        .withColumn("sa", (F.col("ca") * F.col("v")).cast("long"))
        .withColumn("sb", (F.col("cb") * F.col("v")).cast("long"))
    )
    # all four cumulatives in ONE prefix pass (previously four chained
    # passes, each with its own boundary probe and window tower)
    t = _distributed_prefix_sum(
        per_v,
        "v",
        ["ca", "cb", "sa", "sb"],
        ["cum_ca", "cum_cb", "cum_sa", "cum_sb"],
    )
    dec = "decimal(38,0)"
    v_d = F.col("v").cast(dec)

    def below(w, cu, su):
        # Σ w(v)·(v·CU_<(v) − SU_<(v)) — this value's rows against
        # every OTHER-measure row strictly below it
        return F.col(w).cast(dec) * (
            v_d * F.col(cu) - F.col(su).cast(dec)
        )

    sums = t.agg(
        F.sum(F.col("ca")).cast("long").alias("n_a"),
        F.sum(F.col("cb")).cast("long").alias("n_b"),
        F.sum(below("ca", "cum_ca", "cum_sa")).alias("m_aa"),
        F.sum(below("cb", "cum_cb", "cum_sb")).alias("m_bb"),
        F.sum(
            below("ca", "cum_cb", "cum_sb") + below("cb", "cum_ca", "cum_sa")
        ).alias("m_ab"),
    )
    # integral `div` (floor for these nonnegative numerators), never
    # decimal `/`: Spark's decimal division HALF-UP-rounds at the
    # result scale, which the DuckDB `//` replay could not match
    e = (
        "2 * (m_ab * 1000000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b))"
        " - 2 * (m_aa * 1000000000 div (CAST(n_a AS DECIMAL(38,0)) * n_a))"
        " - 2 * (m_bb * 1000000000 div (CAST(n_b AS DECIMAL(38,0)) * n_b))"
    )
    return sums.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(e).try_cast("long"),
        ).alias("e_e9"),
    )


def population_stability(
    df: DataFrame,
    value_col: str,
    group_expr: str,
    buckets: int = 10,
) -> DataFrame:
    """Population Stability Index per reference-decile bucket (X-A48)
    — the ML-ops drift standard beside KS/W1/energy, and the FIFTH
    report of the shared ``(v, c, ca)`` store: bucket edges are the
    REFERENCE side's (``group_expr`` = true) equi-depth value
    boundaries, both sides are counted per value-interval, and each
    bucket contributes ``(p_i − q_i)·ln(p_i/q_i)``. The expression
    inside and outside the one ``ln`` is an exact integer rational,
    e9-snapped per bucket (the `kaplan_meier` discipline); with B
    buckets the report is B rows plus exact counts, so the
    PSI > 0.1 / 0.25 review thresholds are auditable per bucket.
    Buckets where either side is empty report a NULL term (the
    standard epsilon fudge hides exactly the signal — a bucket the
    comparison population vacated — so it is surfaced, not smoothed).

    Returns ``(bucket, lo, hi, n_a, n_b, term_e9)`` — ``lo``/``hi``
    the bucket's OBSERVED value extent over both sides (comparison
    values beyond the reference extremes clamp into the edge buckets,
    standard PSI practice, so the edge buckets' extents can exceed
    the reference deciles').

    Scale shape: per-value counts (one shuffle), the reference
    equi-depth via the distributed prefix sum, a ≤ ``buckets``-row
    driver-collected edge list broadcast back as comparisons — the
    same control-plane pattern as the prefix-sum boundaries."""
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return psi_from_counts(per_v, buckets)


def psi_from_counts(per_v: DataFrame, buckets: int = 10) -> DataFrame:
    """:func:`population_stability` from the shared ``(v, c, ca)``
    per-value count table (the MWU/KS/W1/energy store)."""
    B = int(buckets)
    ref = per_v.filter(F.col("ca") > 0).select(
        "v", F.col("ca").alias("c")
    )
    edges_rows = (
        equidepth_from_counts(ref, B).select("bucket", "hi").collect()
    )
    hi_by_bucket = {int(r["bucket"]): r["hi"] for r in edges_rows}
    # interior edges only: values above the reference max clamp into
    # the last OCCUPIED reference bucket
    n_found = len(hi_by_bucket)
    edges = [hi_by_bucket[b] for b in sorted(hi_by_bucket)][: max(0, n_found - 1)]
    bkt = F.lit(1)
    for e in edges:
        bkt = bkt + (F.col("v") > F.lit(e)).cast("int")
    per_b = (
        per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
        .withColumn("bucket", bkt.cast("int"))
        .groupBy("bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
        )
    )
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum((F.col("c") - F.col("ca"))).cast("long").alias("tb"),
    )
    dec = "decimal(38,0)"
    diff = (
        F.col("n_a").cast(dec) * F.col("tb")
        - F.col("n_b").cast(dec) * F.col("ta")
    ).cast("double") / (
        F.col("ta").cast("double") * F.col("tb").cast("double")
    )
    ratio = (
        F.col("n_a").cast("double") * F.col("tb").cast("double")
    ) / (F.col("n_b").cast("double") * F.col("ta").cast("double"))
    return (
        per_b.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "lo",
            "hi",
            "n_a",
            "n_b",
            F.when(
                (F.col("n_a") > 0)
                & (F.col("n_b") > 0)
                & (F.col("ta") > 0)
                & (F.col("tb") > 0),
                F.round(diff * F.log(ratio) * 1e9, 0).cast("long"),
            ).alias("term_e9"),
        )
        .orderBy("bucket")
    )


def hellinger_distance(
    df: DataFrame,
    value_col: str,
    group_expr: str,
    buckets: int = 10,
) -> DataFrame:
    """Exact Hellinger distance between the ``group_expr`` slice and
    its complement over the reference side's equi-depth decile
    buckets (X-A54) — the BOUNDED drift number beside PSI's
    per-bucket attribution: ``H = √(1 − Σ√(p_i·q_i))`` is a metric in
    [0, 1] (1 = disjoint supports), finite where PSI's log explodes
    on empty buckets, so drift magnitudes are comparable across
    features on one scale. Same bucket construction as
    `population_stability` (reference-side deciles, tie-split
    invariant), same ``(v, c, ca)`` sufficient statistic — the
    X-ST21 store's SEVENTH report.

    Each bucket's ``√(p_i·q_i)`` (the Bhattacharyya coefficient term)
    is one fixed-operand-order double, e9-snapped before the exact
    long sum (the per-term discipline); the final ``√(1 − BC)`` is
    one more fixed expression e6-snapped. One row: ``(n_a, n_b,
    n_buckets, bc_e9, h_e6)`` — NULL statistics when either side is
    empty. ``value_col`` must be integer-typed; NULLs drop (the
    shared rank-test policy)."""
    per_v = (
        df.select(
            F.col(value_col).alias("v"),
            F.expr(group_expr).cast("long").alias("a"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ca"),
        )
    )
    return hellinger_from_counts(per_v, buckets)


def hellinger_from_counts(per_v: DataFrame, buckets: int = 10) -> DataFrame:
    """:func:`hellinger_distance` from the shared ``(v, c, ca)``
    per-value count table (the MWU/KS/W1/energy/PSI/Cliff store)."""
    B = int(buckets)
    ref = per_v.filter(F.col("ca") > 0).select("v", F.col("ca").alias("c"))
    edges_rows = (
        equidepth_from_counts(ref, B).select("bucket", "hi").collect()
    )
    hi_by_bucket = {int(r["bucket"]): r["hi"] for r in edges_rows}
    n_found = len(hi_by_bucket)
    edges = [hi_by_bucket[b] for b in sorted(hi_by_bucket)][
        : max(0, n_found - 1)
    ]
    bkt = F.lit(1)
    for e in edges:
        bkt = bkt + (F.col("v") > F.lit(e)).cast("int")
    per_b = (
        per_v.withColumn("cb", (F.col("c") - F.col("ca")).cast("long"))
        .withColumn("bucket", bkt.cast("int"))
        .groupBy("bucket")
        .agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
        )
    )
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum((F.col("c") - F.col("ca"))).cast("long").alias("tb"),
    )
    t_e9 = F.round(
        F.sqrt(
            (F.col("n_a").cast("double") / F.col("ta").cast("double"))
            * (F.col("n_b").cast("double") / F.col("tb").cast("double"))
        )
        * 1e9,
        0,
    ).cast("long")
    agg = (
        per_b.crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            F.when((F.col("ta") > 0) & (F.col("tb") > 0), t_e9)
            .otherwise(F.lit(None))
            .alias("t9"),
        )
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("t9").cast("long").alias("bc_e9"),
        )
    )
    ok = (F.col("ta") > 0) & (F.col("tb") > 0)
    h = F.sqrt(
        F.greatest(
            F.lit(0.0), F.lit(1.0) - F.col("bc_e9").cast("double") / 1e9
        )
    )
    return agg.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        "n_buckets",
        F.when(ok, F.col("bc_e9")).alias("bc_e9"),
        F.when(ok, F.round(h * 1e6, 0).cast("long")).alias("h_e6"),
    )


def pearson_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix over integer-typed columns
    (X-A49) — the linear-association screen beside Spearman/Kendall's
    monotone ones; disagreement between r and rho flags nonlinearity
    or outlier leverage. ONE pass computes every sum (n, Σx_i, Σx_i²,
    Σx_i·x_j for all pairs) in DECIMAL(38,0) — exact and order-free —
    and each pair's ``r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²))``
    is a fixed-operand-order double expression e6-snapped (the Welch
    determinism class; no float summation anywhere). Rows with a NULL
    in ANY of ``cols`` are dropped (complete-case, the standard matrix
    contract — pairwise-deletion would make the matrix non-PSD).

    Returns one row per unordered pair ``(col_a, col_b, n_rows,
    r_e6)`` (r NULL when either column is constant), ordered by
    (col_a, col_b).

    Scale shape: one map-side-combined scalar aggregate over the scan
    — k(k+1)/2 + k + 1 sums for k columns; the pair table is built
    from the single result row (control-plane explode)."""
    from pyspark.sql.types import FractionalType

    for c in cols:
        if isinstance(df.schema[c].dataType, FractionalType):
            raise ValueError(
                f"pearson_matrix requires integer-typed columns (snap "
                f"to a fixed grain first); got "
                f"{df.schema[c].dataType.simpleString()} for {c!r}"
            )
    if len(cols) < 2:
        raise ValueError("pearson_matrix needs at least two columns")
    dec = "decimal(38,0)"
    base = df.select(*cols)
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c).cast(dec) * F.col(c)).alias(f"q_{c}_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"q_{a}_{b}")
            )
    m = base.agg(*aggs)

    def r_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        qaa = F.col(f"q_{a}_{a}").cast("double")
        qbb = F.col(f"q_{b}_{b}").cast("double")
        qab = F.col(f"q_{a}_{b}").cast("double")
        num = n * qab - sa * sb
        da = n * qaa - sa * sa
        db = n * qbb - sb * sb
        return F.when(
            (da > 0) & (db > 0),
            F.round(num / F.sqrt(da * db) * 1e6, 0).cast("long"),
        )

    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    r_expr(a, b).alias("r_e6"),
                )
            )
    return (
        m.select("n", F.explode(F.array(*pairs)).alias("p"))
        .select(
            F.col("p.col_a").alias("col_a"),
            F.col("p.col_b").alias("col_b"),
            F.col("n").alias("n_rows"),
            F.col("p.r_e6").alias("r_e6"),
        )
        .orderBy("col_a", "col_b")
    )
