"""Unit tests for reciprocal-rank fusion (planted rankings with known
fused order) and the squared-L2 retriever."""

from __future__ import annotations

from rootstock_collective_state_sync_spark.operators import similarity as S

RANK_SCHEMA = "query_id long, neighbor_id long, rk long"


def test_rrf_consensus_beats_single_list_winner(spark):
    # doc 101 is rank 1 in list A only; doc 202 is rank 2 in BOTH
    # lists -> 202 fuses higher (2/62 > 1/61 + 0).
    a = spark.createDataFrame(
        [(1, 101, 1), (1, 202, 2), (1, 303, 3)], RANK_SCHEMA
    )
    b = spark.createDataFrame(
        [(1, 404, 1), (1, 202, 2), (1, 303, 3)], RANK_SCHEMA
    )
    out = S.rrf_fuse([a, b], k_const=60, topk=4).collect()
    by_rank = {r["rrf_rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 202
    assert by_rank[1]["n_lists"] == 2
    expected = 2 * (S.RRF_SCALE // 62)
    assert by_rank[1]["rrf_pts"] == expected
    # 303 is rank 3 in both lists: 2/63 still beats a lone rank-1
    # (1/61) — consensus dominates under RRF
    assert by_rank[2]["neighbor_id"] == 303
    # 101 and 404 tie exactly (rank 1 in one list each) -> id asc
    assert by_rank[3]["neighbor_id"] == 101
    assert by_rank[4]["neighbor_id"] == 404
    assert by_rank[3]["rrf_pts"] == by_rank[4]["rrf_pts"]


def test_rrf_requires_input():
    import pytest

    with pytest.raises(ValueError):
        S.rrf_fuse([])


def test_l2_topk_is_norm_sensitive(spark):
    # query [1,1]; cosine would tie [2,2] with [1,1]-copy; L2 prefers
    # the exact copy.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 1.0]),
            (1, [2.0, 2.0]),
            (2, [1.0, 1.0]),
            (3, [-1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = S.brute_force_topk_l2(emb, emb.filter("vec_id = 0"), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])]
    assert order == [2, 1, 3]
    dists = {r["neighbor_id"]: r["sq_l2"] for r in out}
    assert dists[2] == 0.0 and dists[1] == 2.0 and dists[3] == 8.0
