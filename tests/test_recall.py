"""Recall-floor pins for the approximate-similarity stack.

Per-path recall floors vs :func:`brute_force_topk` live in
tests/test_operators.py (LSH/IVF/PQ/IVFPQ, smoke + correctness
scale); this module pins what those can't: the DEFAULT parameter
values the recall derivations assume (an accidental plane/probe/
codebook default edit would silently tank production recall while
explicit-config tests stay green), and the docstring-derived 0.8
near-dup recall claim at the 8x4 default itself.
"""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators import similarity as S
from rootstock_collective_state_sync_spark.plans.tables import load_table

from tests.conftest import SF_SMOKE


def _defaults(fn) -> dict:
    return {
        k: p.default
        for k, p in inspect.signature(fn).parameters.items()
        if p.default is not inspect.Parameter.empty
    }


def test_recall_critical_defaults_are_pinned():
    """The documented recall derivations hold at THESE defaults
    (operators/similarity.py): 8 tables x 4 planes keeps near-dup
    recall ~0.8 at cos 0.4 (4x8 drops to ~0.2); nprobe=4 of 16 cells
    holds IVF recall >= 0.55; 8x32 codebooks + shortlist 100 hold
    PQ/IVFPQ floors. Changing a default means re-deriving and
    re-measuring — update the floors AND this pin together."""
    nd = _defaults(S.lsh_near_dup_pairs)
    assert (nd["num_tables"], nd["num_planes"], nd["threshold"]) == (8, 4, 0.4)
    ivf = _defaults(S.ivf_topk)
    assert (ivf["num_cells"], ivf["nprobe"], ivf["k"]) == (16, 4, 5)
    pq = _defaults(S.pq_adc_topk)
    assert (pq["num_subspaces"], pq["ksub"], pq["shortlist"]) == (8, 32, 100)
    ipq = _defaults(S.ivfpq_topk)
    assert (
        ipq["num_cells"], ipq["nprobe"], ipq["num_subspaces"],
        ipq["ksub"], ipq["shortlist"],
    ) == (16, 4, 8, 32, 100)
    lsh = _defaults(S.lsh_bucket_topk)
    assert (lsh["num_planes"], lsh["num_tables"]) == (8, 1)


def test_lsh_near_dup_default_recall_floor(spark):
    """The 8x4 DEFAULT (not an explicit config) recovers >= 0.8 of
    true cos>=0.4 near-dup pairs on the sf0.001 embeddings — the
    derivation in lsh_near_dup_pairs' docstring, measured: per-table
    collision P = (1 - theta/pi)^4, 1-(1-P)^8 ~ 0.83 at cos 0.4."""
    emb = load_table(spark, SF_SMOKE, "embeddings").cache()
    try:
        exact = {
            (r.id_a, r.id_b)
            for r in S.near_dup_pairs(emb, threshold=0.4).collect()
        }
        assert exact, "fixture should contain cos>=0.4 pairs"
        lsh = {
            (r.id_a, r.id_b) for r in S.lsh_near_dup_pairs(emb).collect()
        }
        assert lsh <= exact  # exact verify => no false positives
        recall = len(lsh) / len(exact)
        assert recall >= 0.8, (
            f"default 8x4 near-dup recall {recall:.2f} below the 0.8 "
            "docstring derivation — a default or bucketing regression"
        )
    finally:
        emb.unpersist()


def test_multiprobe_recall_dominates_single_probe(spark):
    """Hamming-1 multi-probe must never lose candidates vs the plain
    bucket join (its probe set is a superset), and at the registry
    config it must lift recall@5 measurably on the sf0.001 fixture."""
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators import (
        similarity as S,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(
            emb, queries, k=5, num_planes=3, num_tables=4
        ).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(
            emb, queries, k=5, num_planes=3, num_tables=4, multi_probe=True
        ).collect()
    }
    r_plain = len(plain & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_plain, (r_multi, r_plain)
    assert r_multi >= 0.8, f"multi-probe recall {r_multi:.2f} below 0.8"
    emb.unpersist()


def test_celled_graph_twins_approximate_brute(spark):
    """Drift pins for the cell-confined edge builds at sf0.001, so a
    quantizer regression (bad seeding, wrong cell count) can't
    silently gut the celled twins while their oracles stay
    self-consistently green.

    Context for the floors: the synthetic embeddings are near-UNIFORM
    on the sphere — the worst case for cell confinement, since true
    nearest neighbors carry no cluster structure to exploit (that is
    the standard IVF recall/structure dependence, same as the
    `ann_ivf_topk` floors). Single-cell confinement measured ~0.25
    edge recall here; the nprobe=4 multi-probe build lifts it to
    ~0.62 (clustered real corpora sit higher still), with downstream
    label propagation agreeing with the brute graph on ~90% of
    nodes. PageRank top-k overlap is NOT pinned: on a structureless
    graph the rank distribution is nearly flat and top-50 membership
    is tie-noise, not signal."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, SF_SMOKE, "embeddings")
    brute = {tuple(r) for r in G.knn_edges(emb, k=3).collect()}
    celled = {
        tuple(r) for r in G.knn_edges_celled(emb, k=3, num_cells=16).collect()
    }
    edge_recall = len(brute & celled) / len(celled)
    assert edge_recall >= 0.50, edge_recall

    lp_b = {r["id"]: r["label_prop"] for r in G.label_propagation(emb).collect()}
    lp_c = {
        r["id"]: r["label_prop"]
        for r in G.label_propagation(
            emb, _edges=G.knn_edges_celled(emb, k=3, num_cells=16)
        ).collect()
    }
    agree = sum(1 for i in lp_b if lp_b[i] == lp_c[i]) / len(lp_b)
    assert agree >= 0.85, agree
