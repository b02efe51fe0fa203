"""Unit tests for kNN-graph PageRank: planted star graph (hub must
out-rank leaves), rank determinism across partitionings, and edge
symmetry."""

from __future__ import annotations

from rootstock_collective_state_sync_spark.operators import graph as G

EDGE_SCHEMA = "src long, dst long"


def _star_edges(spark, leaves=5):
    # hub 0 <-> leaves 1..n (symmetrized)
    rows = []
    for i in range(1, leaves + 1):
        rows.append((0, i))
        rows.append((i, 0))
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def test_star_hub_dominates(spark):
    pr = {
        r["id"]: r["pr"]
        for r in G.pagerank_fixed(_star_edges(spark), iters=5).collect()
    }
    hub, leaf = pr[0], pr[1]
    assert hub > leaf
    assert all(pr[i] == leaf for i in range(2, 6))  # leaves symmetric
    # hub absorbs all damped mass each round: leaves only ever hold
    # teleport + their share of the hub
    assert hub > 2 * leaf


def test_rank_deterministic_across_partitionings(spark):
    e = _star_edges(spark, leaves=8)
    a = {r["id"]: r["pr"] for r in G.pagerank_fixed(e, iters=4).collect()}
    b = {
        r["id"]: r["pr"]
        for r in G.pagerank_fixed(e.repartition(7), iters=4).collect()
    }
    assert a == b


def test_knn_edges_symmetric_no_self(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.1, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    edges = {(r["src"], r["dst"]) for r in G.knn_edges(emb, k=1).collect()}
    assert all(s != d for s, d in edges)
    assert edges == {(s, d) for d, s in edges}  # symmetric
    assert (0, 1) in edges and (2, 3) in edges


def test_label_propagation_recovers_held_out_labels(spark):
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators.graph import (
        label_propagation,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = label_propagation(emb, k=3, iters=3, seed_mod=5)
    rows = out.collect()
    seeded = [r for r in rows if r["seeded"] == 1]
    masked = [r for r in rows if r["seeded"] == 0]
    # seeded nodes never change
    assert all(r["label_prop"] == r["label_true"] for r in seeded)
    assert masked, "mask must hold out some nodes"
    resolved = [r for r in masked if r["label_prop"] is not None]
    # with k=3 over near-random embeddings most masked nodes still
    # reach a labeled neighbor within 3 rounds
    assert len(resolved) >= 0.9 * len(masked)
    # determinism: a second run is identical
    again = label_propagation(emb, k=3, iters=3, seed_mod=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kcore_bounded_matches_reference(spark):
    """Pin the per-round peel semantics against a pure-Python
    reference on a graph engineered to peel over several rounds: a
    5-clique (true 4-core) with a tail of degree-boosting hangers-on
    that unravel one round at a time. The registered `kcore_celled`
    query value-checks the same bounded semantics against DuckDB."""

    def ref_kcore(edge_set, k, rounds):
        nodes = {s for s, _ in edge_set}
        e = set(edge_set)
        for _ in range(rounds):
            deg = {}
            for s, _ in e:
                deg[s] = deg.get(s, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            e = {(s, d) for s, d in e if s in keep and d in keep}
        core_deg = {}
        for s, _ in e:
            core_deg[s] = core_deg.get(s, 0) + 1
        return sorted(
            (n, 1 if n in core_deg else 0, core_deg.get(n, 0))
            for n in nodes
        )

    # 5-clique 0..4; chain 5-6-7 hanging off the clique, each chain
    # node padded with leaf neighbors so its degree starts >= 4 and
    # only drops below k after its outer neighbor peels: leaves peel
    # in round 1, node 7 in round 2, node 6 in round 3, node 5 in
    # round 4 -- a genuinely multi-round unravel.
    und = set()
    for a in range(5):
        for b in range(a + 1, 5):
            und.add((a, b))
    und |= {(4, 5), (5, 6), (6, 7)}
    leaf = 100
    for chain_node, n_leaves in ((5, 2), (6, 2), (7, 3)):
        for _ in range(n_leaves):
            und.add((chain_node, leaf))
            leaf += 1
    sym = und | {(b, a) for a, b in und}
    df = spark.createDataFrame(sorted(sym), EDGE_SCHEMA)
    for rounds in (1, 2, 3, 4, 5):
        got = sorted(
            map(tuple, G.kcore_bounded(df, k=4, rounds=rounds).collect())
        )
        assert got == ref_kcore(sym, 4, rounds), f"rounds={rounds}"
    # by round 4 the chain has fully unraveled: exactly the clique
    # survives, and round 5 confirms the fixpoint on this graph
    final = {r[0] for r in got if r[1] == 1}
    assert final == {0, 1, 2, 3, 4}


def test_oracle_cell_geometry_pinned_at_driver_scales(spark):
    """The celled oracle-checked queries pass num_cells='auto' while
    their DuckDB oracles replay a PINNED 16-cell unrolled k-means —
    the equivalence holds only while every driver corpus resolves
    auto -> 16. If the testdata embeddings ever outgrow
    floor * AUTO_CELL_TARGET vectors, this fails HERE with a pointer,
    not as four silent celled-oracle hash mismatches."""
    import os

    from rootstock_collective_state_sync_spark.operators.similarity import (
        AUTO_CELL_TARGET,
        resolve_num_cells,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        got = resolve_num_cells(emb, "auto")
        assert got == 16, (
            f"{sf}: auto cell geometry resolved to {got}, not the 16 the "
            f"celled DuckDB oracles unroll — either re-pin the oracles or "
            f"bump AUTO_CELL_TARGET (={AUTO_CELL_TARGET}) consciously"
        )
