"""Deterministic corpus sampling and sequence packing.

Training-data pipeline operators the reference lacks (scope extension
like :mod:`.dedup` / :mod:`.text`): reproducible stratified sampling
for dataset mixing, and capacity packing of documents into
fixed-size training sequences. Both are pure built-in-function plans
— no UDFs, no RNG state: every decision derives from md5/content, so
a 1000-executor re-run (or a different engine) selects the identical
sample.

Scale shape:
- ``stratified_sample`` is a scan + filter — embarrassingly parallel,
  no shuffle at all; the sampling decision is per-row.
- ``pack_sequences`` shuffles once on the shard key and runs one
  window cumsum per shard — shards bound both skew and the window
  state, so capacity stays per-shard-linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def strat_threshold_hex(rate: float) -> str:
    """Keep-rate -> 4-hex-digit threshold: a row is kept when the
    first 16 bits of md5(key) — as a *string*, compared
    lexicographically, which for fixed-width lowercase hex equals
    numeric order — are below it. 'g' > 'f' sorts above every hex
    digit, so rate >= 1.0 keeps everything."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0000"
    return format(max(0, min(0xFFFF, round(rate * 0x10000))), "04x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (dataset mixing): keep each
    row iff ``substr(md5(key), 1, 4) < threshold(stratum)``. The draw
    is a pure function of the key — stable under retries, partition
    count, and engine — which is what training-data reproducibility
    requires (no ``rand()`` seeds to persist)."""
    draw = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 4)
    thr: Column = F.lit(strat_threshold_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(strat_threshold_hex(rate))
        ).otherwise(thr)
    return df.filter(draw < thr)


def pack_sequences(
    df: DataFrame,
    size_col: str,
    capacity: int,
    num_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences
    (sequence packing): within each shard (``key % num_shards``),
    documents are laid end-to-end in key order and a new bin starts
    every ``capacity`` units — ``bin = exclusive_cumsum DIV capacity``.
    Integer-exact, one shuffle, no UDF. Oversized documents (>
    capacity) still get a bin; callers split or drop them upstream.

    Returns ``(key, shard, bin_id, bin_offset, size)``.
    """
    w = Window.partitionBy("shard").orderBy(F.col(key_col).asc())
    excl = F.coalesce(
        F.sum(F.col(size_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        df.withColumn("shard", F.pmod(F.col(key_col), F.lit(num_shards)))
        .select(
            key_col,
            "shard",
            excl.alias("_excl"),
            F.col(size_col).alias("size"),
        )
        .select(
            key_col,
            "shard",
            # integer division, not float-floor: prefix sums can pass
            # 2^53 at corpus scale and doubles would drop bits there
            F.expr(f"_excl DIV {capacity}").alias("bin_id"),
            (F.col("_excl") % capacity).alias("bin_offset"),
            "size",
        )
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    num_shards: int = 16,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle: a reproducible pseudo-random
    reading order per training epoch, derived purely from
    ``md5(epoch || ':' || key)`` — no RNG state, identical on any
    engine or cluster size.

    Shard = first hex digit of the draw (``num_shards`` must divide
    16 or be 16); position = rank of the draw *within* the shard. The
    window never sees more than one shard, so ordering parallelizes
    across shards instead of the single-partition global-row_number
    trap; readers stream shards in (shard, pos) order.

    Returns ``(key, shard, pos)``.
    """
    if not (1 <= num_shards <= 16 and 16 % num_shards == 0):
        raise ValueError("num_shards must divide 16 (hex-digit sharding)")
    draw = F.md5(
        F.concat_ws(":", F.lit(str(epoch)), F.col(key_col).cast("string")).cast(
            "binary"
        )
    )
    shard = (F.conv(F.substring(F.col("_draw"), 1, 1), 16, 10).cast("int")) % num_shards
    w = Window.partitionBy("shard").orderBy(F.col("_draw").asc(), F.col(key_col).asc())
    return (
        df.select(F.col(key_col), draw.alias("_draw"))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(key_col, "shard", "pos")
    )


def budget_select(
    df: DataFrame,
    score_col: str,
    size_col: str,
    budget: int,
    key_col: str = "doc_id",
    bucket_width: int = 10_000,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Select the best-scoring documents whose total size fits a
    global budget (training-data curation: 'the highest-quality N
    tokens'). Exact greedy semantics: take score buckets from the top;
    inside the single boundary bucket that overflows, take docs in
    ``key_col`` order until the remainder is spent. All arithmetic is
    integer (``score_col`` must be an integral score, e.g. quality in
    1e-7 units; bucket = score DIV bucket_width).

    Scale shape: pass 1 aggregates a (bucket, total_size) histogram —
    at most ``max_buckets`` rows to the driver (guarded), which picks
    the threshold as a control-plane decision; pass 2 is a scan +
    filter for the full buckets plus ONE single-bucket window cumsum
    for the boundary — the global-sort-with-running-total trap never
    materializes. A doc with size > remaining budget is skipped only
    at the boundary (greedy, not knapsack) — documented, determinate.

    Returns ``(key, score, size)`` of the selected docs.
    """
    base = df.select(
        F.col(key_col),
        F.col(score_col).cast("long").alias("score"),
        F.col(size_col).cast("long").alias("size"),
        F.expr(f"CAST({score_col} AS BIGINT) DIV {bucket_width}").alias("bkt"),
    ).persist()  # scanned by histogram + both selection passes
    hist = base.groupBy("bkt").agg(F.sum("size").alias("s")).orderBy(F.col("bkt").desc())
    rows = hist.collect()
    if len(rows) > max_buckets:
        raise ValueError(
            f"budget_select histogram has {len(rows)} buckets > "
            f"max_buckets={max_buckets}; raise bucket_width"
        )
    spent = 0
    full: list[int] = []
    boundary = None
    remaining = 0
    for r in rows:  # descending score buckets
        if spent + r.s <= budget:
            full.append(r.bkt)
            spent += r.s
        else:
            boundary, remaining = r.bkt, budget - spent
            break
    sel_full = base.filter(F.col("bkt").isin(full)) if full else base.limit(0)
    if boundary is None or remaining <= 0:
        out = sel_full
    else:
        w = Window.partitionBy("bkt").orderBy(F.col(key_col).asc())
        sel_bound = (
            base.filter(F.col("bkt") == boundary)
            .withColumn("c", F.sum("size").over(w))
            .filter(F.col("c") <= remaining)
            .drop("c")
        )
        out = sel_full.unionByName(sel_bound)
    return out.select(key_col, "score", "size")


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    target_total: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened dataset mixing (the sqrt-weighting used
    to up-sample small sources when composing training corpora):
    stratum weight w_s = isqrt(n_s), keep-rate r_s = min(1,
    target_total * w_s / (W * n_s)) so the expected kept total is
    ``target_total`` with small strata over-represented vs their raw
    share.

    Exactness: weights use INTEGER sqrt (floor(sqrt(n)) is exact for
    integer n in IEEE double, so any engine agrees), and the 16-bit
    md5 keep-threshold is computed with integer floor division — no
    float appears anywhere, so the selected set is bit-reproducible
    across engines. The per-stratum counts are a bounded groupBy
    (#sources rows) collected as a control-plane read; the selection
    itself is the same shuffle-free scan+filter as
    :func:`stratified_sample`.
    """
    import math

    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weights = {s: math.isqrt(n) for s, n in counts.items()}
    W = sum(weights.values()) or 1
    draw = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 4)
    thr: Column = F.lit("0000")
    for s in sorted(counts):
        t = min(0x10000, (target_total * weights[s] * 0x10000) // (W * counts[s]))
        hex_thr = "g" if t >= 0x10000 else format(t, "04x")
        thr = F.when(F.col(strata_col) == s, F.lit(hex_thr)).otherwise(thr)
    return df.filter(draw < thr)


def split_oversized(
    df: DataFrame,
    size_col: str,
    capacity: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Split documents larger than ``capacity`` into contiguous
    segments (the pre-pass that makes :func:`pack_sequences` lossless:
    packing alone must drop or overflow oversized docs; splitting
    first means every segment fits a bin). Pure sequence+explode —
    per-row, shuffle-free, no UDF.

    Returns ``(key, seg_no, seg_size)`` where ``seg_no`` counts from 0
    and the last segment carries the remainder.
    """
    n_segs = F.expr(
        f"CAST(({size_col} + {capacity} - 1) DIV {capacity} AS INT)"
    )
    seg = F.explode(F.sequence(F.lit(0), F.greatest(n_segs, F.lit(1)) - 1))
    return (
        df.select(F.col(key_col), F.col(size_col).alias("_sz"), seg.alias("seg_no"))
        .select(
            key_col,
            "seg_no",
            F.least(
                F.lit(capacity).cast("long"),
                F.col("_sz").cast("long") - F.col("seg_no") * capacity,
            ).alias("seg_size"),
        )
    )


def group_percent_rank(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Per-group percent_rank normalization (quality-score calibration
    across languages/sources: rank-normalize so a 0.9 means "top decile
    *within its group*", comparable across groups with different score
    distributions).

    Semantics match SQL ``percent_rank() OVER (PARTITION BY group
    ORDER BY value)`` exactly — ``(rows strictly below) / (n - 1)``,
    ties share a rank — but the plan is the scalable two-pass
    histogram shape, NOT a per-row window: a naive window puts an
    entire group in one task, and groups here (languages) are few and
    planetary at 100 TB. Instead: (1) groupBy (group, value) builds a
    histogram whose size is bounded by distinct values (the value
    should be a bounded-precision integral score, e.g. quality in 1e-7
    units); (2) one window cumsum over that *histogram* (tiny); (3)
    equi-join the per-(group, value) rank back onto the rows — row
    volume shuffles once, on the join key.

    ``value_col`` must be exactly joinable (integral / non-float).
    """
    hist = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(group_col)
    ranks = (
        hist.withColumn(
            "_below", F.coalesce(F.sum("_cnt").over(wcum), F.lit(0))
        )
        .withColumn("_n", F.sum("_cnt").over(wall))
        .select(
            group_col,
            value_col,
            F.round(
                F.col("_below").cast("double")
                / F.greatest(F.col("_n") - 1, F.lit(1)),
                6,
            ).alias(out_col),
        )
    )
    return df.join(ranks, [group_col, value_col])


def importance_sample(
    df: DataFrame,
    weight_e7_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic importance (weighted Bernoulli) sampling: keep a
    row with probability ``weight / 1e7`` (weight in integer 1e-7
    units, e.g. :func:`..text.quality_score_e7` — quality-weighted
    corpus thinning). The draw is the first 16 bits of ``md5(key)``
    as a uniform in [0, 1): keep iff ``draw16 / 65536 < weight/1e7``,
    cross-multiplied so the comparison is pure int64 — no float, no
    RNG state; the identical sample falls out on any engine, retry, or
    partition layout (same reproducibility contract as
    :func:`stratified_sample`, which is the constant-rate special
    case of this operator).

    Plan shape: scan + per-row filter — zero shuffles, zero UDFs.
    """
    draw16 = F.conv(
        F.substring(
            F.md5(F.col(key_col).cast("string").cast("binary")), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return df.filter(
        draw16 * F.lit(10_000_000).cast("long")
        < F.col(weight_e7_col).cast("long") * F.lit(65536).cast("long")
    )


def cluster_hash_split(
    components: DataFrame,
    holdout_pct: int = 10,
    id_col: str = "id",
    comp_col: str = "component",
) -> DataFrame:
    """Leakage-safe train/holdout split: the split coin is flipped on
    the near-dup CLUSTER label (see
    :func:`..operators.dedup.connected_components`), not the document
    id, so every member of a near-duplicate cluster lands on the same
    side — paraphrase duplicates can never leak training text into
    the evaluation set.

    The draw is the first 16 bits of ``md5(component)`` compared
    NUMERICALLY against ``floor(65536 * holdout_pct / 100)`` — the same
    deterministic no-RNG contract as :func:`stratified_sample`, and
    identical on any engine or partition layout. (Numeric, not
    lexicographic: at ``holdout_pct=100`` the threshold is 65536 whose
    hex form '10000' is 5 chars and would compare wrongly as a string.)

    Plan shape: per-row projection over the component labels — zero
    shuffles beyond what produced the components.
    """
    if not 0 <= holdout_pct <= 100:
        raise ValueError(f"holdout_pct must be in [0, 100]: {holdout_pct}")
    thresh = 65536 * holdout_pct // 100
    draw = F.conv(
        F.substring(F.md5(F.col(comp_col).cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("long")
    return components.select(
        F.col(id_col),
        F.col(comp_col),
        F.when(draw < F.lit(thresh), F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorization (outlier clamping) at exact nearest-rank
    percentiles: values below the group's p{lo}/above p{hi} are clamped
    to those bounds — the robust-scaling step run before value-weighted
    sampling or reward modeling so a single pathological row can't
    dominate a mixture weight.

    Percentiles are CONCRETE ORDER STATISTICS (rank = ceil(p·n/100),
    computed with integer arithmetic — no float interpolation), picked
    by (value, id) ordering, so bounds are raw stored doubles and the
    whole result is bit-identical across engines — the same
    no-interpolation trick as the exact-median query.

    Plan shape / 100 TB: one window pass over (group, value) to rank,
    a group-count-sized bounds table broadcast back, and a row-local
    clamp. The window sort is the only data-volume shuffle.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        n.alias("_n"),
    )
    r_lo = F.floor((F.col("_n") * lo_pct + 99) / 100)
    r_hi = F.floor((F.col("_n") * hi_pct + 99) / 100)
    bounds = (
        ranked.filter((F.col("_rn") == r_lo) | (F.col("_rn") == r_hi))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias("_lo"),
            F.max(value_col).alias("_hi"),
        )
    )
    clamped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            clamped.alias(f"{value_col}_wins"),
            (F.col(value_col) < F.col("_lo")).cast("int").alias("clipped_lo"),
            (F.col(value_col) > F.col("_hi")).cast("int").alias("clipped_hi"),
        )
    )


def mad_normalize(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group robust (median/MAD) normalization: ``robust_z_e6 =
    round((x - median) / MAD · 1e6)`` with median and MAD as exact
    nearest-rank order statistics (rank = ceil(n/2), integer
    arithmetic, no float interpolation — the :func:`winsorize`
    policy), so the whole result is bit-identical across engines.
    The outlier-resistant sibling of z-scoring: a single pathological
    value shifts mean/std arbitrarily but moves median/MAD not at all
    — the scaling used before mixing heterogeneous quality signals.

    ``MAD = median(|x - median|)``; groups with MAD = 0 (constant or
    majority-constant values) yield NULL robust_z rather than a
    divide-by-zero infinity.

    Plan shape / 100 TB: two window passes over (group, value) — one
    for the median rank, one for the |x-med| rank — each a single
    keyed sort shuffle; bounds tables are group-count-sized and
    broadcast back. Same scale contract as :func:`winsorize`.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        n.alias("_n"),
    )
    r_med = F.floor((F.col("_n") + 1) / 2)  # ceil(n/2) for integers
    medians = (
        ranked.filter(F.col("_rn") == r_med)
        .groupBy(group_col)
        .agg(F.min(value_col).alias("_med"))
    )
    with_med = df.join(F.broadcast(medians), group_col)
    dev = F.abs(F.col(value_col) - F.col("_med"))
    wd = Window.partitionBy(group_col).orderBy(
        dev.asc(), F.col(id_col).asc()
    )
    ranked_dev = with_med.select(
        F.col(group_col),
        dev.alias("_dev"),
        F.row_number().over(wd).alias("_rn"),
        n.alias("_n"),
    )
    mads = (
        ranked_dev.filter(F.col("_rn") == r_med)
        .groupBy(group_col)
        .agg(F.min("_dev").alias("_mad"))
    )
    z = F.when(
        F.col("_mad") > 0,
        F.round((F.col(value_col) - F.col("_med")) / F.col("_mad") * 1e6, 0)
        .cast("long"),
    )
    return (
        with_med.join(F.broadcast(mads), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            F.col("_med").alias("group_median"),
            F.col("_mad").alias("group_mad"),
            z.alias("robust_z_e6"),
        )
    )


def source_interleave(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic round-robin interleaving across sources — the
    curriculum-ordering primitive: consuming rows by ascending
    ``interleave_key`` visits sources in strict rotation (one from
    each source, repeat), so a training run never sees a long
    single-source block regardless of how the corpus was written.

    ``interleave_key = (per-source rank − 1) · n_sources +
    source_index`` with sources indexed by dense rank of their name —
    a closed-form key, NOT a global sort: consumers that need the
    physical order sort/range-partition by the key themselves (at
    100 TB that is a range-partitioned write, never a single-partition
    window).

    Plan shape: one window per (source) for the rank — a keyed sort
    shuffle — plus a broadcast of the source→index map; no global
    ordering stage exists in this plan.
    """
    src_idx = (
        df.select(F.col(source_col))
        .distinct()
        .select(
            F.col(source_col),
            (
                F.row_number().over(
                    Window.orderBy(F.col(source_col).asc())
                )
                - 1
            ).alias("_sidx"),
        )
    )
    w = Window.partitionBy(source_col).orderBy(F.col(id_col).asc())
    ranked = df.join(F.broadcast(src_idx), source_col).select(
        F.col(id_col),
        F.col(source_col),
        F.col("_sidx"),
        (F.row_number().over(w) - 1).alias("_rank0"),
    )
    total_sources = src_idx.count()  # control-plane scalar (|sources|)
    return ranked.select(
        F.col(id_col),
        F.col(source_col),
        (F.col("_rank0") + 1).cast("long").alias("source_rank"),
        (F.col("_rank0") * F.lit(total_sources) + F.col("_sidx"))
        .cast("long")
        .alias("interleave_key"),
    )


def quantile_align(
    df: DataFrame,
    score_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantile normalization across sources: each row's score is
    replaced by the GLOBAL score at the same rank fraction, so
    per-source score distributions become comparable (a quality model
    that drifts stricter on one crawl no longer starves that source in
    a global-threshold selection).

    All integer, nearest-rank: within its source a row has rank ``r``
    of ``n_s`` (score, id ordered); its global target rank is
    ``ceil(r·N / n_s)`` by exact integer arithmetic, and the aligned
    value is the global order statistic at that rank, located via the
    cumulative counts of DISTINCT scores — no interpolation, no
    floats, bit-identical anywhere.

    Plan shape / 100 TB: per-source ranks are a source-partitioned
    window (scalable); the global side never sorts the corpus — it
    aggregates to DISTINCT score counts (bounded by the score domain,
    here e7-integer quality scores) and takes one small single-
    partition cumsum window over that; the lookup is a broadcast
    range join of rows against that cumulative table.
    """
    n_total = df.count()
    w_src = Window.partitionBy(source_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col),
        F.col(source_col),
        F.col(score_col),
        F.row_number().over(w_src).alias("_r"),
        F.count(F.lit(1))
        .over(Window.partitionBy(source_col))
        .alias("_ns"),
    ).withColumn(
        # exact integer ceil-division (SQL `div`, never a float)
        "_g",
        F.expr(f"(_r * {n_total}L + _ns - 1) div _ns").cast("bigint"),
    )
    dist = (
        df.groupBy(F.col(score_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_cum",
            F.sum("_c").over(
                Window.orderBy("_s").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .select("_s", (F.col("_cum") - F.col("_c")).alias("_lo"), "_cum")
    )
    return (
        ranked.join(
            F.broadcast(dist),
            (F.col("_g") > F.col("_lo")) & (F.col("_g") <= F.col("_cum")),
        )
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col(score_col),
            F.col("_s").alias(f"{score_col}_aligned"),
        )
    )


def largest_remainder_alloc(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
) -> DataFrame:
    """Exact integer budget allocation across groups (Hamilton /
    largest-remainder method): each group gets
    ``floor(budget·n_g/N)`` seats, and the leftover
    ``budget − Σ floors`` seats go to the largest fractional
    remainders (ties → larger group first, then name). The allocation
    a curation run uses to turn 'sample exactly B documents overall,
    proportionally by source' into per-source exact quotas —
    quotas always sum to EXACTLY ``budget`` (no rounding drift), a
    guarantee independent per-group rounding cannot give.

    All integer arithmetic on exact counts: remainders are compared
    as integers (``budget·n_g mod N``), never floats — bit-identical
    on any engine.

    Plan shape: one group-count shuffle (|groups| keys), a broadcast
    total, and a |groups|-sized remainder rank — control-plane scale
    after the first aggregation.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").alias("_N"))
    c = counts.crossJoin(F.broadcast(total))
    base = F.floor(F.lit(budget) * F.col("n") / F.col("_N")).cast("long")
    rem = (F.lit(budget) * F.col("n")) % F.col("_N")
    w = Window.orderBy(
        rem.desc(), F.col("n").desc(), F.col("grp").asc()
    )
    leftover = F.lit(budget) - F.sum(base).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = c.select(
        "grp",
        "n",
        base.alias("_base"),
        rem.alias("_rem"),
        F.row_number().over(w).alias("_rk"),
        leftover.alias("_left"),
    )
    return ranked.select(
        F.col("grp").alias(group_col),
        "n",
        (
            F.col("_base")
            + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    ).orderBy(group_col)


def gumbel_topk(
    df: DataFrame,
    log_weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Gumbel-top-k
    trick (equivalent to Efraimidis-Spirakis 2006): add an independent
    Gumbel(0,1) draw to each row's LOG-weight and keep the k largest
    keys — the selected set is distributed exactly as sequential
    weighted sampling without replacement, in one vectorized pass.
    This is DSIR's resampling step (Xie et al. 2023 add Gumbel noise
    to the log importance weights and truncate).

    Deterministic no-RNG contract (:func:`stratified_sample`):
    ``u = (first 16 bits of md5(id) + 0.5) / 65536`` (the +0.5 centers
    the lattice so u is never 0 or 1), ``g = -ln(-ln u)``, key =
    ``round(log_weight + g, 6)``; ties break on id ascending. Same
    selection on any engine or partition layout.

    Plan shape: per-row key projection, then ``orderBy().limit(k)`` —
    Catalyst's TakeOrderedAndProject (per-partition top-k, merge of
    k-row shortlists), never a full corpus sort; the rank window runs
    on the k-row shortlist only (control-plane). Returns the selected
    rows with ``gumbel_key`` and ``rank`` (1 = largest key).
    """
    from pyspark.sql import Window

    draw16 = F.conv(
        F.substring(
            F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4
        ),
        16,
        10,
    ).cast("long")
    u = (draw16.cast("double") + 0.5) / 65536.0
    key = F.round(
        F.col(log_weight_col).cast("double") - F.log(-F.log(u)), 6
    )
    shortlist = (
        df.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
    return shortlist.withColumn("rank", F.row_number().over(w).cast("int"))


def unimax_alloc(
    df: DataFrame,
    budget_frac_e6: int = 500000,
    epoch_cap: int = 2,
    group_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining", arXiv:2304.09151): split a token budget across
    groups (languages / sources) as UNIFORMLY as possible subject to
    a per-group repetition cap — no group may be sampled for more
    than ``epoch_cap`` epochs of its own corpus. Low-resource groups
    contribute their full capped supply; the rest of the budget is
    divided evenly among the high-resource groups (waterfilling).
    The fairness-aware alternative to temperature sampling
    (:func:`..plans.training.q_temperature_mix`'s operator), which
    over-samples the head and has no repetition bound.

    Closed form instead of the paper's sequential loop: with supplies
    ``s_g = epoch_cap * n_g`` sorted ascending, group i is fully
    allocated iff ``s_i * (k - i + 1) <= B - cum_i`` (``cum_i`` = sum
    of the i-1 smaller supplies) — once violated it stays violated,
    so the full set is a prefix and every remaining group gets the
    common water level ``(B - sum_full) / n_notfull``. The boundary
    test is EXACT integer arithmetic (no float water level decides
    membership); only the final level is a double, rounded to 6 dp.

    ``B = total_size * budget_frac_e6 // 1e6`` — the budget scales
    with the corpus so the allocation is meaningful at any SF.

    Plan shape (100 TB): one group-count shuffle (map-side combined,
    |groups| rows out), then windows over the |groups|-row aggregate
    — control-plane scale, same as :func:`largest_remainder_alloc`.

    Returns ``(group, n, supply, alloc, epochs)`` where ``epochs =
    alloc / n`` (how many passes over its corpus the group runs).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(size_col).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").alias("_N"))
    c = counts.crossJoin(F.broadcast(total)).select(
        "grp",
        "n",
        (F.col("n") * F.lit(int(epoch_cap))).cast("long").alias("s"),
        F.floor(
            F.col("_N").cast("decimal(38,0)")
            * F.lit(int(budget_frac_e6))
            / F.lit(1000000)
        )
        .cast("long")
        .alias("B"),
    )
    w = Window.orderBy(F.col("s").asc(), F.col("grp").asc())
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.coalesce(
        F.sum("s").over(
            Window.orderBy(F.col("s").asc(), F.col("grp").asc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0),
    )
    k = F.count(F.lit(1)).over(whole)
    i = F.row_number().over(w)
    marked = c.select(
        "grp",
        "n",
        "s",
        "B",
        (F.col("s") * (k - i + 1) <= F.col("B") - cum).alias("_full"),
    )
    s_full = F.sum(F.when(F.col("_full"), F.col("s")).otherwise(0)).over(whole)
    n_not = (
        F.count(F.lit(1)).over(whole)
        - F.sum(F.when(F.col("_full"), 1).otherwise(0)).over(whole)
    )
    level = F.round(
        (F.col("B") - s_full).cast("double")
        / F.greatest(n_not, F.lit(1)).cast("double"),
        6,
    )
    alloc = F.when(F.col("_full"), F.col("s").cast("double")).otherwise(level)
    return marked.select(
        F.col("grp").alias(group_col),
        "n",
        F.col("s").alias("supply"),
        alloc.alias("alloc"),
        F.round(alloc / F.col("n").cast("double"), 6).alias("epochs"),
    ).orderBy(group_col)


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic fixed-size sample: exactly ``min(k, |group|)``
    rows per group, chosen by md5(key) rank — the fixed-COUNT
    counterpart of :func:`stratified_sample`'s fixed-RATE draw
    (exemplar picks, per-source eval slices, capped debugging dumps).
    The draw is a pure function of the key: stable under retries,
    partition layout, and engine, and adding rows to OTHER groups
    never changes a group's sample.

    Scale shape: one group-keyed window (rank over the 32-hex draw);
    with k << group size the shuffle carries only (group, key, draw)
    — project the payload back in afterwards via the keys. Ties are
    impossible in practice (md5 collisions) but the (draw, key)
    compound order makes even those deterministic.
    """
    draw = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(draw.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "sample_rank")
    )
