"""Graph centrality over similarity graphs: kNN edges + fixed-point
PageRank.

Companion to the connected-components resolver in
:mod:`.dedup` — where CC answers "which documents are the same",
PageRank over the kNN graph answers "which are the most central /
representative", the signal used to pick cluster exemplars and to
diversity-rank retrieval shortlists.

Arithmetic is integer fixed-point (1e-9 units, floor division) end to
end: float PageRank sums in partition order, so two engines (or two
partitionings of the same engine) disagree in the last ulps; with
integer ranks every engine computes bit-identical scores, which is
what lets the DuckDB oracle replay all iterations exactly — the same
determinism contract as the md5-based samplers. Floor division leaks
a bounded amount of rank mass per iteration (documented trade; ranks
are ordinal signals, not probabilities).

Scale design: one shuffle per iteration (the contribution groupBy);
each iteration's result is persisted and the previous unpersisted, so
lineage stays O(1) like the CC loop. Iteration count is fixed (a
control-plane constant) — no data-dependent driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PR_SCALE = 1_000_000_000


def knn_edges(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetrized k-nearest-neighbor edges (src, dst) by cosine:
    each vector points at its top-``k`` neighbors (deterministic
    tie-break on neighbor id), then edges are mirrored and deduped —
    an undirected similarity graph where every node has out-degree
    >= k (no dangling nodes, which keeps PageRank teleport-simple).

    Built on :func:`..similarity.brute_force_topk` — swap in the LSH
    or IVF retriever for the 100 TB corpus; the edge contract is
    identical."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        brute_force_topk,
    )

    top = brute_force_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    fwd = top.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-point PageRank: ``iters`` rounds of

        r'(v) = (100 - damping_pct) * scale // (100 * N)
              + damping_pct * SUM_{u->v}(r(u) // out_deg(u)) // 100

    over integer ranks in ``scale`` units. Returns (id, pr) — the
    iteration-``iters`` rank per node, bit-identical on any engine.

    N (node count) is a control-plane scalar; degrees are a
    broadcastable aggregate; each iteration is one groupBy shuffle.
    """
    nodes = edges.select(F.col("src").alias("id")).distinct().persist()
    n = nodes.count()  # control-plane scalar
    if n == 0:
        return nodes.withColumn("pr", F.lit(0).cast("bigint"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    teleport = (100 - damping_pct) * scale // (100 * n)
    r = nodes.withColumn("pr", F.lit(scale // n).cast("bigint")).persist()
    for _ in range(iters):
        contrib = (
            edges.join(r.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                # integer DIV, never float `/`: a double quotient can
                # round up across an integer boundary before the cast
                F.expr("pr DIV deg").alias("c"),
            )
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        nxt = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                F.expr(
                    f"CAST({teleport} + ({damping_pct} * coalesce(s, 0))"
                    " DIV 100 AS BIGINT)"
                ).alias("pr"),
            )
            .persist()
        )
        nxt.count()  # materialize before dropping the parent
        r.unpersist()
        r = nxt
    nodes.unpersist()
    return r


def label_propagation(
    emb: DataFrame,
    k: int = 3,
    iters: int = 3,
    seed_mod: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    _edges: DataFrame | None = None,
) -> DataFrame:
    """Semi-supervised label propagation over the kNN similarity
    graph (Zhu & Ghahramani 2002, hard-label variant): nodes with
    ``id % seed_mod == 0`` are masked "unlabeled"; each round every
    masked node takes the MAJORITY label among its neighbors' current
    labels (ties -> smallest label; no labeled neighbor -> keep
    previous). Seeded nodes never change. Evaluating the propagated
    labels against the held-out truth measures how much labeling
    effort the similarity graph can replace.

    Determinism: integer vote counts, ``min(struct(-votes, label))``
    argmax, synchronous rounds — bit-identical anywhere; the oracle
    unrolls every round.

    Scale shape: each round is ONE edge-keyed join (edges carry two
    8-byte ids) + a votes aggregate, with O(1) lineage via
    persist/unpersist — the same loop discipline as
    :func:`pagerank_fixed` and the CC resolver.

    Returns ``(id, label_true, seeded, label_prop, correct)`` —
    ``label_prop`` may be null if a masked node never saw a labeled
    neighbor; ``correct`` is null there too.
    """
    from rootstock_collective_state_sync_spark.caching import tracked_persist

    # eager=False (r17 site audit, SCALING.md): consumers here are
    # SEQUENTIAL actions (cur.count(), then one nxt.count() per
    # round), not subtrees of one action — the first action fills the
    # cache, so there is no multi-consumer race for eager to prevent
    base = tracked_persist(
        emb.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label_true"),
            (F.col(id_col) % seed_mod != 0).alias("seeded"),
        ),
        eager=False,
    )
    # `_edges` lets scale callers inject the cell-confined build
    # (:func:`knn_edges_celled`) without duplicating the round loop;
    # eager: the tracked_persist count IS the materialization barrier
    # (the explicit edges.count() it replaces)
    edges = tracked_persist(
        knn_edges(emb, k=k, id_col=id_col, vec_col=vec_col)
        if _edges is None
        else _edges
    )
    cur = base.select(
        "id", F.when(F.col("seeded"), F.col("label_true")).alias("cur")
    ).persist()
    cur.count()
    for _ in range(iters):
        votes = (
            edges.join(
                cur.select(F.col("id").alias("dst"), F.col("cur").alias("lbl")),
                "dst",
            )
            .filter(F.col("lbl").isNotNull())
            .groupBy(F.col("src").alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = votes.groupBy("id").agg(
            F.min(F.struct((-F.col("n")).alias("negn"), F.col("lbl"))).alias(
                "m"
            )
        )
        nxt = (
            base.join(best, "id", "left")
            .join(cur, "id")
            .select(
                "id",
                F.when(F.col("seeded"), F.col("label_true"))
                .otherwise(F.coalesce(F.col("m.lbl"), F.col("cur")))
                .alias("cur"),
            )
            .persist()
        )
        nxt.count()
        cur.unpersist()
        cur = nxt
    out = base.join(cur, "id").select(
        "id",
        "label_true",
        F.col("seeded").cast("int").alias("seeded"),
        F.col("cur").alias("label_prop"),
        F.when(
            F.col("cur").isNotNull(),
            (F.col("cur") == F.col("label_true")).cast("int"),
        ).alias("correct"),
    )
    base.unpersist()
    edges.unpersist()
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected edge list (``edges`` holds BOTH directions, as
    :func:`knn_edges` emits): orient each edge by id (src < dst), join
    oriented wedges on the shared middle vertex, close them against
    the oriented edge set, then credit each triangle to its three
    corners. ``cc_e6 = 2 * triangles * 1e6 div (deg * (deg - 1))`` —
    the Watts-Strogatz local coefficient in e6 fixed-point (0 when
    deg < 2). High clustering marks boilerplate/template neighborhoods
    in a similarity graph; low clustering marks bridge documents.

    Scale shape: all joins key on a vertex id and the kNN graph is
    degree-bounded (<= 2k), so wedge candidates are O(n * (2k)^2) —
    never quadratic in n. Three hash joins + one explode-groupBy; no
    collect, no iteration.
    """
    und = edges.filter(F.col("src") < F.col("dst"))
    ab = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])  # close the wedge a-b-c with edge a-c
        .select("a", "b", "c")
    )
    per = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return (
        deg.join(per, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
        )
        .select(
            "id",
            "degree",
            "n_triangles",
            F.when(F.col("degree") < 2, F.lit(0))
            .otherwise(
                F.expr(
                    "2 * n_triangles * 1000000 div (degree * (degree - 1))"
                )
            )
            .cast("long")
            .alias("cc_e6"),
        )
    )


def kcore_bounded(
    edges: DataFrame, k: int = 4, rounds: int = 6
) -> DataFrame:
    """Bounded-round k-core peel (Seidman 1983 coreness, the standard
    iterative degree-peel): each round removes every node whose
    degree in the SURVIVING subgraph is below ``k`` together with its
    incident edges. ``rounds`` is a FIXED unroll — not a driver-side
    convergence loop — so the whole computation is one lazy plan and
    an external replayer (the DuckDB oracle) can run the identical
    rounds CTE-for-CTE. The result is the true k-core only when the
    peel has converged within ``rounds`` (worst case needs O(|V|)
    rounds); the bounded result is well-defined either way — a
    superset of the k-core that shrinks monotonically in ``rounds``
    — and is what the registered `kcore_celled` query value-checks
    round-for-round against DuckDB
    (tests/test_graph.py::test_kcore_bounded_matches_reference pins
    the per-round semantics against a pure-Python peel). Returns
    ``(id, in_core, core_degree)`` over every node of the input edge
    set — ``in_core`` = survived all rounds, ``core_degree`` = degree
    within the surviving subgraph (0 for peeled nodes).

    Scale shape: per round one map-side-combined degree count + two
    semi-joins on the edge keys — all shuffles share the src/dst
    hash keys; edges only ever SHRINK, so later rounds are cheaper;
    nothing is collected. Each round is cut by an eager
    ``localCheckpoint`` (the `connected_components` pattern,
    ``operators/dedup.py``): round r's plan references round r−1's
    edges THREE times (degree + semi-join source + next round), so a
    pure lazy unroll grows the LOGICAL plan ~3^rounds — at 6 rounds
    Catalyst analysis alone took ~15 s at sf0.1 (r13 measured; the
    executed work was 2 s). The checkpoint truncates the plan at O(1)
    depth per round; values are identical and the DuckDB oracle still
    replays the rounds CTE-for-CTE. (On a real cluster with executor
    churn, swap in a reliable ``checkpoint()`` dir — same contract.)
    At 100 TB pair this with the celled edge build
    (`knn_edges_celled`) like the triangle/assortativity censuses."""
    all_nodes = edges.select(F.col("src").alias("id")).distinct()
    e = edges
    for r in range(rounds):
        # cut every THIRD round (r18, guide §5): one lazy segment
        # spans 3 rounds (plan grows 27x per segment — still O(1)
        # depth), so 6 rounds pay 2 checkpoint materializations
        # instead of 3. Cadences {0,2,4} / {0,3} / {0} / {2,4} / {2}
        # were A/B'd value-identical at sf0.1: every-3rd won both
        # interleaved rounds (0.63/0.82 vs the old cadence's
        # 0.78/0.94 s); a single start-only checkpoint loses 2x —
        # Catalyst time on the 3^6 tail segment dominates — so the
        # cadence stays bounded, just one notch coarser.
        if r % 3 == 0:
            e = e.localCheckpoint(eager=True)
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("d")
        )
        keep = deg.filter(F.col("d") >= k).select("id")
        e = e.join(
            keep.select(F.col("id").alias("src")), "src", "left_semi"
        ).join(keep.select(F.col("id").alias("dst")), "dst", "left_semi")
    fin = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
    return (
        all_nodes.join(fin, "id", "left")
        .select(
            "id",
            F.col("core_degree").isNotNull().cast("int").alias("in_core"),
            F.coalesce("core_degree", F.lit(0)).cast("long").alias(
                "core_degree"
            ),
        )
    )


def knn_edges_celled(
    emb: DataFrame,
    k: int = 3,
    num_cells: "int | str" = "auto",
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The scale path for :func:`knn_edges`: cell-confined kNN via the
    deterministic IVF coarse quantizer with standard multi-probe —
    each vector searches its ``nprobe`` nearest cells for its top-k
    neighbors (a candidate lives only in its home cell, so no pair is
    generated twice), then edges symmetrize and dedupe as in the
    exact build. Neighbors outside all probed cells are missed — the
    usual IVF recall/nprobe dial (``nprobe = num_cells`` degenerates
    to exact brute force). The whole chain (k-means training, probe
    selection, in-cell ranking) is deterministic, so it stays
    SQL-oracle-checkable — unlike most ANN graph builds.

    Scale shape: ONE corpus shuffle on `cell`; candidate pairs are
    O(n * nprobe * cell_size), never n² — the DEFAULT ``"auto"``
    geometry derives ``num_cells`` from the corpus size (standard IVF
    sizing: hold cell_size ~constant), which is what keeps the build
    linear per decade; a FIXED cell count makes cell_size ∝ n and
    in-cell pairs ∝ n² (the 18×/decade shape SCALING.md measured at
    sf1 with 16 pinned cells). Pin an integer only where an external
    replayer (the DuckDB unrolled-k-means oracle) needs a fixed
    geometry — and consider the `semantic_dedup` subcell guard
    pattern if one embedding cluster dominates a cell.
    """
    from rootstock_collective_state_sync_spark.operators.similarity import (
        ivf_probe_assignments,
    )

    # vector rides along with the assignment (one Arrow pass), so no
    # corpus-sized id self-join re-attaches it afterwards
    tagged = ivf_probe_assignments(
        emb,
        num_cells=num_cells,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        carry_cols=(vec_col,),
    ).select(
        F.col(id_col).alias("id_"),
        F.col(vec_col).alias("v"),
        "cell",
        "probes",
    )
    # Per-cell BLOCK scoring instead of materialized candidate pairs:
    # the old shape joined the probe side with the home side on `cell`
    # and shipped every candidate PAIR (two full vectors per row)
    # through an Arrow cosine UDF, then ranked all O(n·nprobe·cell)
    # pair rows in one corpus-sized window. Here both sides shuffle
    # ONCE on `cell` (each vector crosses the Python boundary nprobe+1
    # times, never per pair), one grouped-map kernel per cell computes
    # the query×candidate cosine block as a single float64 matmul and
    # emits only each query's in-cell top-k; the global window then
    # ranks n·nprobe·k survivor rows instead of every candidate pair.
    # Exactness: the overall top-k under (s desc, dst asc) is a subset
    # of the union of per-cell top-k's under the same order (a dst
    # lives in exactly one home cell, so per-cell winners partition
    # the candidate set); values keep the _cos_kernel semantics —
    # float64 dot / (norm·norm), 6-dp snap — with knife-edge entries
    # (within 1e-6 of a rounding boundary in e6 units) recomputed via
    # the einsum reduction so the matmul's last-ulp accumulation
    # difference cannot flip a rounded value vs the pairwise kernel.
    a = tagged.select(
        F.explode("probes").alias("cell"),
        F.col("id_").alias("id"),
        "v",
        F.lit(1).alias("q"),
    )
    b = tagged.select(
        "cell", F.col("id_").alias("id"), "v", F.lit(0).alias("q")
    )
    both = a.unionByName(b)
    scored = both.groupBy("cell").applyInPandas(
        _cell_topk_kernel(k), "src long, dst long, s double"
    )
    w = Window.partitionBy("src").orderBy(
        F.col("s").desc(), F.col("dst").asc()
    )
    fwd = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "dst")
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def _cell_topk_kernel(k: int):
    """Grouped-map kernel for one cell of :func:`knn_edges_celled`:
    rows carry (cell, id, v, q) with q=1 marking the probe (query)
    side and q=0 the home (candidate) side. Computes the full
    query×candidate cosine block with one BLAS matmul and emits each
    query's top-``k`` candidates under (cos desc, dst asc) — the same
    composite order the downstream global window uses, which is what
    makes per-cell pre-ranking lossless."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "src": pd.Series(dtype="int64"),
            "dst": pd.Series(dtype="int64"),
            "s": pd.Series(dtype="float64"),
        }
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cand = pdf[pdf["q"] == 0]
        qry = pdf[pdf["q"] == 1]
        if not len(cand) or not len(qry):
            return empty
        # candidates sorted by id so a STABLE argsort on the rounded
        # score yields (s desc, dst asc) exactly
        cand = cand.sort_values("id", kind="stable")
        C = np.stack(cand["v"].to_numpy()).astype(np.float64)
        Q = np.stack(qry["v"].to_numpy()).astype(np.float64)
        cid = cand["id"].to_numpy(dtype=np.int64)
        qid = qry["id"].to_numpy(dtype=np.int64)
        dots = Q @ C.T
        nq = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        nc = np.sqrt(np.einsum("ij,ij->i", C, C))
        raw = dots / (nq[:, None] * nc[None, :])
        # knife-edge refinement: where the unrounded value sits within
        # 1e-6 of a 6-dp rounding boundary, recompute the dot with the
        # einsum reduction (the pairwise _cos_kernel's operand order)
        # so BLAS blocking cannot flip the rounded value
        frac = np.abs(np.abs(raw) * 1e6 % 1.0 - 0.5)
        edge = np.argwhere(frac < 1e-6)
        for i, j in edge:
            d = np.einsum("ij,ij->i", Q[i : i + 1], C[j : j + 1])[0]
            raw[i, j] = d / (nq[i] * nc[j])
        S = np.round(raw, 6)
        S[qid[:, None] == cid[None, :]] = -np.inf
        kk = min(k, S.shape[1])
        idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(len(qid)), kk)
        cols = idx.ravel()
        s = S[rows, cols]
        keep = s != -np.inf
        return pd.DataFrame(
            {
                "src": qid[rows[keep]],
                "dst": cid[cols[keep]],
                "s": s[keep],
            }
        )

    return fn
