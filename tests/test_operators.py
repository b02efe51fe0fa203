"""Operator-level property tests for dedup / similarity / text —
things the SQL-oracle conformance can't express (recall bounds,
synthetic duplicates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators import dedup as D
from rootstock_collective_state_sync_spark.operators import similarity as S
from rootstock_collective_state_sync_spark.operators import text as X
from rootstock_collective_state_sync_spark.plans.tables import load_table

from tests.conftest import SF_CORRECTNESS, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_exact_dedup_finds_planted_copies(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "THE  Quick   Brown FOX"),  # same after normalization
            (3, "something else entirely"),
        ],
        ["doc_id", "text"],
    )
    groups = {r.keeper_id: r.n_copies for r in D.exact_groups(df).collect()}
    assert groups == {1: 2, 3: 1}


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH must recover a large fraction of true near-dup pairs
    (16 hashes / 4 bands: P(candidate) = 1-(1-j^4)^4 ≈ 0.93 at j=0.8;
    the planted dups in the corpus sit at jaccard ≥ 0.8)."""
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    assert lsh <= exact  # verification step guarantees no false positives
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below 0.8"


def test_simhash_identical_for_same_token_set(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha alpha")],
        ["doc_id", "text"],
    )
    hashes = [r.simhash for r in D.simhash(df).orderBy("id").collect()]
    assert hashes[0] == hashes[1]  # simhash over distinct tokens
    assert len(hashes[0]) == 64 and set(hashes[0]) <= {"0", "1"}


def test_ann_lsh_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(
            emb, queries, k=5, num_planes=3, num_tables=1
        ).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(
            emb, queries, k=5, num_planes=3, num_tables=8
        ).collect()
    }
    r1 = len(exact & single) / len(exact)
    r8 = len(exact & multi) / len(exact)
    # these embeddings are near-random (max cos ~0.5): single-probe
    # recall is low by construction; multiple tables must recover it.
    assert r8 >= r1, f"multi-table recall {r8:.2f} < single-table {r1:.2f}"
    assert r8 >= 0.5, f"8-table ANN recall {r8:.2f} below 0.5"


def test_brute_force_topk_self_excluded(emb):
    queries = emb.filter(F.col("vec_id") < 3)
    rows = S.brute_force_topk(emb, queries, k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in rows)
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r.cos_sim)
    for sims in per_query.values():
        assert sims == sorted(sims, reverse=True)
        assert len(sims) == 5


def test_lang_id_on_clear_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and it is that for"),
            (2, "der hund und die katze ist ein tier mit von"),
            (3, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang for r in df.select("doc_id", X.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")],
        ["doc_id", "text"],
    )
    fps = [r.fp for r in df.select(X.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_ivf_topk_recall_and_determinism(emb):
    """IVF recall rises with nprobe and hits exact at full probe;
    centroid training is sample-deterministic so two runs agree."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    few = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, k=5, num_cells=8, nprobe=4).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, k=5, num_cells=8, nprobe=8).collect()
    }
    assert full == exact  # probing every cell degenerates to exact
    r_few = len(few & exact) / len(exact)
    assert r_few >= 0.6, f"IVF nprobe=4/8 recall {r_few:.2f} below 0.6"
    again = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, k=5, num_cells=8, nprobe=4).collect()
    }
    assert again == few  # deterministic end to end


def test_ann_recall_floors_at_correctness_scale(spark):
    """Recall-regression gate for BOTH approximate-ANN paths at sf0.01
    (2000 vectors), pinned to the registry configs: recall@5 vs brute
    force must not drop below fixed floors (measured 0.62 IVF / 0.59
    LSH — both paths are deterministic, so a dip means a real plan or
    parameter regression, not noise)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 25)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, k=5, num_cells=16, nprobe=4).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(
            emb, queries, k=5, num_planes=3, num_tables=4
        ).collect()
    }
    r_ivf = len(ivf & exact) / len(exact)
    r_lsh = len(lsh & exact) / len(exact)
    assert r_ivf >= 0.55, f"IVF recall@5 {r_ivf:.2f} below 0.55 floor"
    assert r_lsh >= 0.50, f"LSH recall@5 {r_lsh:.2f} below 0.50 floor"
    emb.unpersist()


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io now"),
            (2, "host 192.168.0.1 and 10.0.0.255"),
            (3, "call +44-201-555-0199 today"),
            (4, "clean text, nothing to scrub"),
        ],
        ["doc_id", "text"],
    )
    counts = X.pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            X.redact_pii(F.col("text")).alias("red"),
            *[v.alias(k) for k, v in counts.items()],
        ).collect()
    }
    assert out[1].red == "mail <EMAIL> now" and out[1].n_email == 1
    assert out[2].red == "host <IP> and <IP>" and out[2].n_ipv4 == 2
    assert out[3].red == "call <PHONE> today" and out[3].n_phone == 1
    assert out[4].red == "clean text, nothing to scrub"
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)


def test_benchmark_contamination_planted(spark):
    """A train doc sharing a 3-gram run with the benchmark is flagged
    with the exact shared-shingle count; disjoint docs are not."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),  # shares 'the quick brown'...
            (2, "completely disjoint words here nine ten"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in D.benchmark_contamination(train, bench).collect()}
    # shared shingles: 'the quick brown', 'quick brown fox' -> 2 of 4
    assert got[1].n_shared == 2 and got[1].n_shingles == 4
    assert got[1].share_pct == 50.0
    assert 2 not in got


def test_epoch_shuffle_determinism_and_epoch_variation(docs):
    from rootstock_collective_state_sync_spark.operators import sampling as SA

    a = SA.epoch_shuffle(docs, epoch=1).collect()
    b = SA.epoch_shuffle(docs, epoch=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    c = SA.epoch_shuffle(docs, epoch=2).collect()
    order1 = [x[0] for x in sorted(map(tuple, a), key=lambda r: (r[1], r[2]))]
    order2 = [x[0] for x in sorted(map(tuple, c), key=lambda r: (r[1], r[2]))]
    assert order1 != order2          # different epoch -> different order
    assert sorted(order1) == sorted(order2)  # ...same membership
    # every doc exactly once, positions contiguous per shard
    by_shard = {}
    for doc_id, shard, pos in map(tuple, a):
        by_shard.setdefault(shard, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_near_dup_pairs_guard_refuses_unbounded(emb):
    with pytest.raises(ValueError, match="O\\(n\\^2\\) baseline"):
        S.near_dup_pairs(emb, max_rows=10)
    # explicit override still works
    assert S.near_dup_pairs(emb.limit(20), max_rows=None).count() >= 0


def test_lsh_near_dup_recall_vs_baseline(emb):
    """The bucketed scale path recovers most true near-dup pairs and
    never invents one: candidates are verified with the same exact
    cosine, so precision is 1.0 by construction."""
    exact = {
        (r.id_a, r.id_b)
        for r in S.near_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in S.lsh_near_dup_pairs(
            emb, threshold=0.4, num_tables=8, num_planes=4
        ).collect()
    }
    assert lsh <= exact  # no false positives, ever
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.7, f"LSH near-dup recall {recall:.2f} below 0.7"


def test_connected_components_transitive_chains(spark):
    """Multi-hop chains converge (label propagates one hop per round):
    a 5-node path collapses to one component, disjoint pairs and
    singletons stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (13, 14)],
        ["id_a", "id_b"],
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 14]], ["doc_id"]
    )
    got = {r.id: r.component for r in D.connected_components(pairs, nodes).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,          # path 1-2-3
        4: 4, 7: 7,                # singletons
        5: 5, 6: 5,                # pair
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,  # 5-node chain, 4 hops
    }


def test_connected_components_long_path_graph(spark):
    """Adversarial diameter: a 100-node path (diameter 99) must resolve
    to ONE component labeled 0 — pointer jumping makes label distance
    double per round, so this needs ~log2(100) rounds, far inside
    max_iters=25 (plain one-hop propagation would silently exit at 25
    with wrong labels)."""
    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = {
        r.id: r.component
        for r in D.connected_components(pairs, nodes).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_raises_on_non_convergence(spark):
    """max_iters too small for the diameter -> loud RuntimeError, never
    silently wrong labels."""
    n = 40  # diameter 39 > 2^3 doublings
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, nodes, max_iters=3)


def test_budget_select_greedy_semantics(spark):
    """Exact greedy contract: full high-score buckets first, boundary
    bucket in key order until the remainder is spent, total never
    exceeds the budget."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        budget_select,
    )

    rows = [  # (doc_id, score, size); bucket_width=10 -> buckets 9, 8, 7
        (1, 95, 40),
        (2, 92, 30),   # bucket 9: 70 total
        (3, 85, 50),   # bucket 8: 50 total
        (4, 71, 20),
        (5, 79, 25),   # bucket 7: 45 total, taken in doc_id order
        (6, 60, 10),   # bucket 6: below the boundary, never reached
    ]
    df = spark.createDataFrame(rows, ["doc_id", "score", "size"])

    got = {
        r.doc_id
        for r in budget_select(
            df, "score", "size", budget=150, bucket_width=10
        ).collect()
    }
    # buckets 9 (70) + 8 (50) fit = 120; boundary bucket 7 has 30 left:
    # doc 4 (20) fits, doc 5 (25) would overflow -> stop. doc 6 excluded.
    assert got == {1, 2, 3, 4}

    sel = budget_select(df, "score", "size", budget=100, bucket_width=10).collect()
    # bucket 9 fits (70), bucket 8 overflows (120 > 100): boundary rem=30,
    # doc 3 (50) > 30 -> excluded
    assert {r.doc_id for r in sel} == {1, 2}

    assert sum(r.size for r in sel) <= 100


def test_budget_select_guard_and_total(docs):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        budget_select,
    )

    scored = docs.select(
        "doc_id",
        X.quality_score_e7(F.col("text")).alias("q"),
        "n_chars",
    )
    sel = budget_select(scored, "q", "n_chars", budget=60_000).collect()
    assert 0 < sum(r.size for r in sel) <= 60_000
    with pytest.raises(ValueError, match="max_buckets"):
        budget_select(scored, "q", "n_chars", budget=60_000, bucket_width=1,
                      max_buckets=3)


def test_temperature_mix_flattens_shares(spark):
    """sqrt weighting: a 900-doc source and a 100-doc source end up
    with a 3:1 kept ratio (sqrt(900):sqrt(100)), not the raw 9:1 —
    small sources over-represented, expected total near target."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = temperature_mix(df, "source", target_total=200).collect()
    by_src = {}
    for r in kept:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # expected: big 150, small 50 (3:1); md5 draws give binomial noise
    assert 100 <= by_src["big"] <= 200
    assert 25 <= by_src["small"] <= 75
    assert by_src["big"] / by_src["small"] < 6  # raw ratio would be ~9
    # determinism
    again = temperature_mix(df, "source", target_total=200).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in kept)


def test_split_oversized_segments(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        split_oversized,
    )

    df = spark.createDataFrame(
        [(1, 100), (2, 256), (3, 300), (4, 577)], ["doc_id", "n_chars"]
    )
    got = {}
    for r in split_oversized(df, "n_chars", capacity=256).collect():
        got.setdefault(r.doc_id, []).append((r.seg_no, r.seg_size))
    assert got[1] == [(0, 100)]            # under capacity: 1 segment
    assert got[2] == [(0, 256)]            # exactly capacity: 1 segment
    assert sorted(got[3]) == [(0, 256), (1, 44)]
    assert sorted(got[4]) == [(0, 256), (1, 256), (2, 65)]
    # losslessness: segment sizes sum back to the original
    for doc_id, segs in got.items():
        total = {1: 100, 2: 256, 3: 300, 4: 577}[doc_id]
        assert sum(s for _, s in segs) == total
        assert all(s <= 256 for _, s in segs)


def test_dup_ngram_stats_planted_repeat(spark):
    """A doc sharing a 5-gram with another doc (and a repeated 5-gram
    inside one doc) must show dup positions; unique text shows none."""
    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (1, shared + " zeta eta theta iota kappa"),
            (2, shared + " one two three four five"),
            (3, "unique words only here nothing repeats ever at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in D.dup_ngram_stats(df, n=5).collect()}
    assert out[1].n_grams == 6 and out[2].n_grams == 6
    # only the fully-shared first 5-gram collides between docs 1 and 2
    assert out[1].n_dup_grams == 1 and out[2].n_dup_grams == 1
    assert out[3].n_dup_grams == 0
    # short doc: fewer than n tokens -> zero grams, fraction 0
    short = spark.createDataFrame([(9, "just four tiny words")], ["doc_id", "text"])
    r = D.dup_ngram_stats(short, n=5).collect()[0]
    assert (r.n_grams, r.n_dup_grams, r.dup_fraction) == (0, 0, 0.0)


def test_unigram_lm_scores_orders_outliers(spark):
    """Docs made of corpus-frequent words must score lower NLL than a
    doc of hapaxes; n_tokens must match the tokenizer."""
    df = spark.createDataFrame(
        [
            (1, "common common common words words"),
            (2, "common words common words common"),
            (3, "zyx qwv jkl pqr stu"),  # all rare
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in X.unigram_lm_scores(df).collect()}
    assert out[1].n_tokens == 5 and out[3].n_tokens == 5
    assert out[1].mean_nll < out[3].mean_nll
    assert out[2].mean_nll < out[3].mean_nll


def test_group_percent_rank_matches_window_semantics(spark):
    """The scalable histogram plan must equal SQL percent_rank row for
    row, including ties."""
    from rootstock_collective_state_sync_spark.operators import sampling as SA

    rows = [(i, "a" if i % 2 else "b", (i * 7) % 5) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "grp", "val"])
    got = {
        (r.id): r.pct_rank
        for r in SA.group_percent_rank(df, "val", "grp").collect()
    }
    df.createOrReplaceTempView("gpr_in")
    want = {
        r.id: round(r.pr, 6)
        for r in spark.sql(
            "SELECT id, percent_rank() OVER (PARTITION BY grp ORDER BY val) pr"
            " FROM gpr_in"
        ).collect()
    }
    assert got == want


def test_importance_sample_rate_tracks_weight(spark):
    """Keep-rate must track the weight: weight 0 keeps nothing,
    weight 1e7 keeps everything, and a 50 % weight keeps roughly half
    (md5 uniformity); the sample must be a deterministic subset."""
    from rootstock_collective_state_sync_spark.operators import sampling as SA

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(5_000_000).alias("w")
    )
    kept = SA.importance_sample(df, "w").count()
    assert 800 < kept < 1200
    zero = df.withColumn("w", F.lit(0))
    assert SA.importance_sample(zero, "w").count() == 0
    full = df.withColumn("w", F.lit(10_000_000))
    assert SA.importance_sample(full, "w").count() == 2000
    # determinism + monotonicity: the 50% sample is a subset of a 75% one
    half = {r.doc_id for r in SA.importance_sample(df, "w").collect()}
    most = {
        r.doc_id
        for r in SA.importance_sample(
            df.withColumn("w", F.lit(7_500_000)), "w"
        ).collect()
    }
    assert half <= most


def test_zorder_key_bit_interleave(spark):
    from rootstock_collective_state_sync_spark.operators import layout as L

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (5, 6), (65535, 65535)], ["a", "b"]
    )
    out = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", L.zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert out[(3, 0)] == 0b0101  # a-bits land on even positions
    assert out[(0, 3)] == 0b1010  # b-bits land on odd positions
    def morton(a, b):
        return sum(((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
                   for i in range(16))
    assert out[(5, 6)] == morton(5, 6)
    assert out[(65535, 65535)] == 2**32 - 1


def test_write_zordered_files_are_range_clustered(spark, tmp_path):
    """The clustered write must produce files with DISJOINT Morton-key
    ranges — the property parquet footer pruning depends on."""
    import glob

    from rootstock_collective_state_sync_spark.operators import layout as L

    orders = load_table(spark, SF_SMOKE, "orders")
    df = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("c1"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("c2"),
    )
    path = str(tmp_path / "zo")
    L.write_zordered(df, path, "c1", "c2", num_files=8)
    ranges = []
    for fp in glob.glob(path + "/part-*.parquet"):
        part = spark.read.parquet(fp)
        r = part.select(
            L.zorder_key(F.col("c1"), F.col("c2")).alias("z")
        ).agg(F.min("z").alias("lo"), F.max("z").alias("hi")).first()
        if r.lo is not None:
            ranges.append((r.lo, r.hi))
    assert len(ranges) >= 2, "expected multiple non-empty files"
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"
    # round-trip: no rows lost or duplicated by the re-layout
    assert spark.read.parquet(path).count() == df.count()



def test_export_shards_roundtrip_and_validate(spark, tmp_path):
    """Export writes data + manifest; validation passes on the intact
    export and fails after tampering (a deleted shard)."""
    import shutil

    from rootstock_collective_state_sync_spark.sinks.export import (
        export_training_shards,
        validate_export,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    path = str(tmp_path / "export")
    export_training_shards(docs, path, num_shards=4)
    back = spark.read.parquet(path + "/data")
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 4
    assert validate_export(spark, path).count() == 0
    # tamper: drop one shard directory -> validation must flag it
    shutil.rmtree(path + "/data/shard=2")
    diffs = validate_export(spark, path)
    assert diffs.count() > 0
    assert {r.shard for r in diffs.collect()} == {2}


def test_export_manifest_self_describing_modulus(spark, tmp_path):
    """The manifest records its own shard modulus (r16 item 6): an
    export whose TOP shard is empty validates clean without the
    caller passing num_shards; a contradicting explicit modulus
    raises instead of silently re-sharding."""
    import pytest as _pytest

    from rootstock_collective_state_sync_spark.sinks.export import (
        export_training_shards,
        validate_export,
    )

    # keys 0..2 mod 4 -> shard 3 (the TOP shard) is EMPTY, so the
    # legacy max(shard)+1 inference would read 3, not 4
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(3)], "doc_id long, text string"
    )
    path = str(tmp_path / "export_empty_top")
    export_training_shards(docs, path, num_shards=4)
    stored = spark.read.parquet(path + "/manifest")
    assert stored.select("num_shards").distinct().collect()[0][0] == 4
    assert validate_export(spark, path).count() == 0  # no param needed
    assert validate_export(spark, path, num_shards=4).count() == 0
    with _pytest.raises(ValueError, match="contradicts"):
        validate_export(spark, path, num_shards=8)


def test_pq_adc_recall_vs_brute_force(emb):
    """PQ-ADC top-k must recover most true neighbors (4 subspaces x 16
    centroids over 64 dims is a coarse 64x compression; recall@5 well
    above chance) and be fully deterministic across runs."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    got1 = S.pq_adc_topk(emb, queries, k=5).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got1}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, f"PQ-ADC recall@5 {recall:.2f} below 0.7 floor"
    got2 = {(r.query_id, r.rk): r.neighbor_id
            for r in S.pq_adc_topk(emb, queries, k=5).collect()}
    assert {(r.query_id, r.rk): r.neighbor_id for r in got1} == got2


def test_pq_codes_compress_and_cover(emb):
    """Every vector gets exactly one code per subspace, codes use the
    codebook range, and multiple codebook entries are actually used
    (k-means didn't collapse)."""
    codes = S.pq_code_assignments(emb, num_subspaces=8, ksub=32)
    n_vecs = emb.count()
    assert codes.count() == n_vecs * 8
    per = codes.groupBy("vec_id").count().select(F.min("count"), F.max("count")).first()
    assert (per[0], per[1]) == (8, 8)
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] <= 31
    assert codes.select("subspace", "code").distinct().count() >= 32


def test_ivfpq_recall_and_probe_monotonicity(emb):
    """IVFPQ must recover most true neighbors at moderate nprobe, and
    recall must not fall as nprobe grows (more probed cells = strictly
    more candidates)."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    def rec(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.ivfpq_topk(emb, queries, k=5, nprobe=nprobe).collect()
        }
        return len(got & exact) / len(exact)
    r4 = rec(4)
    r16 = rec(16)
    assert r4 >= 0.5, f"IVFPQ recall@5 nprobe=4 {r4:.2f} below 0.5"
    assert r16 >= r4 - 0.05, f"recall fell with nprobe: {r4:.2f} -> {r16:.2f}"
    assert r16 >= 0.7, f"IVFPQ full-probe recall {r16:.2f} below 0.7"


# ---------------------------------------------------------------------------
# round 6: semantic dedup / chunking / leakage-safe split
# ---------------------------------------------------------------------------


def test_semantic_dedup_matches_in_cell_brute_force(spark, emb):
    """keep=0 iff SOME earlier same-cell vector reaches the threshold
    — verified against an independent pandas recomputation."""
    import numpy as np

    out = S.semantic_dedup(emb, num_cells=8, threshold=0.4).collect()
    cells = {r.vec_id: r.cell for r in out}
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    assert len(out) == len(vecs)  # total: one verdict per vector
    for r in out:
        earlier = [
            i for i in vecs
            if i < r.vec_id and cells[i] == r.cell
            and round(
                float(vecs[i] @ vecs[r.vec_id])
                / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[r.vec_id])),
                6,
            ) >= 0.4
        ]
        assert (r.keep == 0) == bool(earlier), r
        assert r.n_earlier_dups == len(earlier), r


def test_semantic_dedup_keeper_is_lowest_id(spark):
    """A planted trio of identical vectors keeps exactly the lowest id."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in (7, 3, 11)]
    rows += [(1, [0.0, 1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.vec_id: r for r in S.semantic_dedup(
        df, num_cells=2, threshold=0.95).collect()}
    trio = [out[7], out[3], out[11]]
    assert sorted(r.vec_id for r in trio if r.keep == 1) == [3]
    assert out[11].n_earlier_dups == 2 and out[7].n_earlier_dups == 1


def test_chunk_documents_covers_every_token(spark, docs):
    """Chunks tile the token stream: concatenating each chunk's first
    `stride` tokens in chunk order reproduces the full token list."""
    sample = docs.limit(20)
    toks = {
        r.doc_id: r.t
        for r in sample.select(
            "doc_id", X.tokens(F.col("text")).alias("t")
        ).collect()
    }
    chunks = X.chunk_documents(sample, window=32, stride=24).collect()
    by_doc: dict = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_id)
        rebuilt: list = []
        for c in cs[:-1]:
            rebuilt.extend(c.chunk_text.split()[:24])
        # the final chunk may carry up to `window` tokens (it is only
        # emitted when it extends past the previous window's coverage,
        # and it starts exactly where the first-24s left off)
        assert len(rebuilt) == cs[-1].chunk_id * 24, doc_id
        rebuilt.extend(cs[-1].chunk_text.split())
        assert rebuilt == toks[doc_id], doc_id
        # overlap: chunk i repeats the last window-stride tokens of i-1
        for prev, cur in zip(cs, cs[1:]):
            p, q = prev.chunk_text.split(), cur.chunk_text.split()
            k = min(len(p) - 24, len(q), 8)
            if k > 0:
                assert p[24:24 + k] == q[:k], doc_id


def test_chunk_documents_empty_doc_yields_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")], ["doc_id", "text"])
    out = X.chunk_documents(df).collect()
    assert {(r.doc_id, r.chunk_id, r.n_chunk_tokens) for r in out} == {
        (1, 0, 0), (2, 0, 2)
    }


def test_cluster_hash_split_is_cluster_atomic(spark, docs):
    """No near-dup cluster straddles the split, and the holdout rate
    lands near the requested percentage."""
    from rootstock_collective_state_sync_spark.operators import sampling as SA

    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    comp = D.connected_components(pairs, docs.select("doc_id"))
    out = SA.cluster_hash_split(comp, holdout_pct=20)
    sides = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert sides == 1  # every cluster entirely on one side
    frac = out.filter(F.col("split") == "holdout").count() / out.count()
    assert 0.05 < frac < 0.40


def test_logistic_head_learns_separable_labels(spark):
    """The driver-trained head must actually LEARN: on a vocabulary-
    separable synthetic corpus the mean in-domain score must exceed
    the out-of-domain mean by a wide margin; scores live in (0,1);
    train+score is deterministic end to end."""
    rows = []
    for i in range(60):
        rows.append((i, f"alpha beta gamma delta w{i % 7} epsilon", 1))
    for i in range(60, 120):
        rows.append((i, f"zeta eta theta iota w{i % 7} kappa", 0))
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    label = F.col("y")
    w1, b1 = X.train_logistic_head(df, label_col=label, sample_size=120)
    w2, b2 = X.train_logistic_head(df, label_col=label, sample_size=120)
    assert w1 == w2 and b1 == b2  # deterministic sample + GD
    scored = (
        df.select("doc_id", "y")
        .join(X.score_logistic_head(df, w1, b1), "doc_id")
        .collect()
    )
    assert all(0.0 <= r.score <= 1.0 for r in scored)
    pos = [r.score for r in scored if r.y == 1]
    neg = [r.score for r in scored if r.y == 0]
    margin = sum(pos) / len(pos) - sum(neg) / len(neg)
    assert margin > 0.3, f"classifier failed to separate: margin {margin:.3f}"


def test_quantize_int8_fidelity_and_bounds(spark, emb):
    """int8 quantization: codes stay in [-127, 127], the max-magnitude
    element hits ±127 exactly, cosine fidelity vs the original stays
    ≥ 0.999 on real embeddings, and the all-zero vector quantizes to
    zero codes with scale 0 and NULL fidelity."""
    out = S.quantize_int8(emb).collect()
    assert out
    for r in out:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert max(abs(c) for c in r.codes) == 127
        assert r.cos_fidelity is not None and r.cos_fidelity >= 0.999
    zero = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id bigint, embedding array<float>"
    )
    z = S.quantize_int8(zero).first()
    assert z.scale == 0.0 and z.codes == [0] * 8 and z.cos_fidelity is None


def test_drop_duplicate_spans_planted(spark):
    """A 5-token span repeated across (and within) documents survives
    only at its first (doc_id, start) occurrence; untouched text is
    reassembled verbatim; fully-duplicated docs come back empty but
    present."""
    boiler = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta"),       # first occurrence: kept whole
            (2, f"gamma {boiler} delta"),       # loses the 5 boiler tokens
            (3, boiler),                         # fully duplicated -> empty
            (4, "unique words only here"),      # < 5 tokens of overlap: kept
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in D.drop_duplicate_spans(df, n=5).collect()}
    assert out[1].clean_text == f"{boiler} alpha beta"
    assert out[1].n_kept == 7
    assert out[2].clean_text == "gamma delta"
    assert (out[2].n_tokens, out[2].n_kept) == (7, 2)
    assert out[3].clean_text == "" and out[3].n_kept == 0
    assert out[4].clean_text == "unique words only here"
    assert len(out) == 4  # every input doc present


def test_bpe_token_count_shapes(spark):
    """BPE-ish pre-tokenizer: contractions split off, digit runs chunk
    in threes, punctuation runs are one token, leading spaces fold
    into the following token — so the estimate tracks subword
    tokenizers, not whitespace words."""
    df = spark.createDataFrame(
        [
            (1, "it's fine"),          # it + 's + fine
            (2, "price 123456"),        # price + 123 + 456
            (3, "wait... what?!"),      # wait + ... + what + ?!
            (4, ""),                    # empty -> 0
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n, r.toks)
        for r in df.select(
            "doc_id",
            X.bpe_token_count(F.col("text")).alias("n"),
            X.bpe_tokens(F.col("text")).alias("toks"),
        ).collect()
    }
    assert out[1] == (3, ["it", "'s", " fine"])
    assert out[2] == (3, ["price", " 123", "456"])
    assert out[3] == (4, ["wait", "...", " what", "?!"])
    assert out[4] == (0, [])


def test_chunk_documents_no_redundant_tail(spark):
    """A document whose tail is fully covered by the previous window
    must not emit an extra chunk (n=56, window=32, stride=24: chunk 1
    covers [24, 56) so there is no chunk 2)."""
    text = " ".join(f"t{i}" for i in range(56))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = sorted(
        X.chunk_documents(df, window=32, stride=24).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in out] == [0, 1]
    assert [r.n_chunk_tokens for r in out] == [32, 32]
    assert out[1].chunk_text.split()[-1] == "t55"


def test_cluster_hash_split_boundary_pcts(spark):
    """holdout_pct=100 -> every row holdout; 0 -> every row train
    (regression: the old lexicographic hex compare broke at 100 where
    the threshold '10000' is 5 chars)."""
    from rootstock_collective_state_sync_spark.operators import sampling as SA

    comp = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], ["id", "component"]
    )
    all_hold = SA.cluster_hash_split(comp, holdout_pct=100)
    assert all_hold.filter(F.col("split") != "holdout").count() == 0
    all_train = SA.cluster_hash_split(comp, holdout_pct=0)
    assert all_train.filter(F.col("split") != "train").count() == 0


def test_hashed_doc_vectors_properties(spark):
    """Unit norm, dimension, duplicate-text identity, and composition
    with semantic_dedup: hashing-trick vectors make planted text
    duplicates semantically identical in-engine."""
    import math

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different subject entirely unrelated"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.doc_vec for r in X.hashed_doc_vectors(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(len(v) == 64 for v in out.values())
    for i in (1, 2, 3):
        assert abs(math.sqrt(sum(x * x for x in out[i])) - 1.0) < 1e-4
    assert out[1] == out[2]  # identical text -> identical vector
    assert out[1] != out[3]
    assert all(x == 0.0 for x in out[4])  # empty doc -> zero vector

    # composition: vectors feed semantic_dedup; the planted duplicate
    # pair is detected (cos=1.0 >= threshold), the distinct doc kept
    vecs = X.hashed_doc_vectors(df.filter(F.col("doc_id") < 4)).select(
        F.col("doc_id").alias("vec_id"),
        F.col("doc_vec").cast("array<float>").alias("embedding"),
    )
    verdicts = {
        r.vec_id: r.keep
        for r in S.semantic_dedup(vecs, num_cells=2, threshold=0.99).collect()
    }
    assert verdicts[1] == 1 and verdicts[2] == 0 and verdicts[3] == 1


def test_strip_boilerplate_lines_planted(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        strip_boilerplate_lines,
    )

    footer = "c 2020 example corp all rights reserved"
    rows = [
        (1, f"unique alpha\n{footer}\nunique beta"),
        (2, f"{footer}\nsomething else entirely"),
        (3, f"third doc body\n\n  {footer}  "),
        (4, footer),  # pure boilerplate -> empty text, row kept
        (5, "no boilerplate here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(df, min_docs=3).collect()
    }
    assert len(out) == 5
    assert out[1]["text"] == "unique alpha\nunique beta"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 3
    assert out[2]["text"] == "something else entirely"
    assert out[3]["text"] == "third doc body"  # trim + blank-drop contract
    assert out[4]["text"] == "" and out[4]["frac_removed"] == 1.0
    assert out[5]["n_removed"] == 0


def test_strip_boilerplate_counts_distinct_docs_not_occurrences(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        strip_boilerplate_lines,
    )

    # the repeated line occurs 3 times but in only 2 distinct docs
    rows = [(1, "dup line\ndup line\nbody"), (2, "dup line\nother")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_bloom_no_false_negatives_and_prunes(spark):
    from rootstock_collective_state_sync_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom,
        bloom_pruned_join,
    )
    from pyspark.sql import functions as F

    dim = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    words = build_bloom(dim, "k", m_bits=1 << 12, k=5)
    probe = fact.select(
        "k", bloom_might_contain(words, F.col("k"), 1 << 12).alias("hit")
    )
    hits = {r["k"] for r in probe.filter("hit").collect()}
    true_keys = {i * 7 for i in range(100)}
    assert true_keys <= hits  # no false negative, ever
    # 4096 bits / 100 keys -> FPR well under 50%; prune must bite
    assert len(hits) < 20000 * 0.5
    # composed join is result-exact vs the plain join
    got = sorted(
        r["k"] for r in bloom_pruned_join(fact, dim, "k", m_bits=1 << 12).collect()
    )
    assert got == sorted(true_keys)


def test_bloom_rejects_unsafe_join_types(spark):
    import pytest as _pytest
    from rootstock_collective_state_sync_spark.operators.bloom import (
        bloom_pruned_join,
        build_bloom,
    )

    df = spark.range(1).selectExpr("id as k")
    with _pytest.raises(ValueError):
        bloom_pruned_join(df, df, "k", how="left")
    with _pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=100)


def test_containment_catches_subset_doc(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha bravo charlie delta echo foxtrot golf hotel"
    padding = " ".join(f"word{i} next{i} more{i}" for i in range(30))
    rows = [(1, quote), (2, f"{padding} {quote} {padding}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = containment_pairs(df, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_small"], r["id_big"]) == (1, 2)
    assert r["containment"] == 1.0  # every shingle of doc1 is in doc2
    # symmetric Jaccard misses the same pair at the same threshold
    assert ngram_jaccard_pairs(df, threshold=0.8).count() == 0


def test_source_kl_divergence_orders_drift(spark):
    from rootstock_collective_state_sync_spark.operators.text import (
        source_kl_divergence,
    )

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = (
        [(i, common, "typical") for i in range(10)]
        # drifted source: disjoint vocabulary
        + [(100 + i, "zzz qqq xxx vvv kkk jjj www yyy", "drifted") for i in range(3)]
        # mild source: mostly common + a little novelty
        + [(200 + i, common + " novelty", "mild") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r.asDict()
        for r in source_kl_divergence(df, vocab_size=16).collect()
    }
    assert set(out) == {"typical", "drifted", "mild"}
    # the disjoint-vocabulary source separates by an order of magnitude;
    # the mild/typical ordering is smoothing-sensitive and not asserted
    assert out["drifted"]["kl"] > 5 * max(out["mild"]["kl"], out["typical"]["kl"])
    assert all(r["kl_e9"] >= 0 for r in out.values())  # KL non-negativity

    # maximal drift: a source sharing ZERO top-V tokens must still get
    # a report row (n_tokens = 0, uniform-vs-corpus KL), not vanish
    out8 = {
        r["source"]: r.asDict()
        for r in source_kl_divergence(df, vocab_size=8).collect()
    }
    assert "drifted" in out8
    assert out8["drifted"]["n_tokens"] == 0
    assert out8["drifted"]["kl"] > 0


def test_bpe_learns_expected_merges(spark):
    from rootstock_collective_state_sync_spark.operators.bpe import (
        learn_bpe_merges,
    )

    # "lowlow lower newest" style classic: 'lo' dominates
    rows = [(1, "low low low lowest"), (2, "low lower")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe_merges(df, num_merges=3)
    assert [(m["left"], m["right"]) for m in merges][:2] == [
        ("l", "o"),   # all 6 word occurrences contain 'lo'
        ("lo", "w"),  # then 'low' fuses
    ]
    assert merges[0]["n"] == 6
    # left-to-right non-overlap: 'aaaa' yields (a,a) count 3 first round
    df2 = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    m2 = learn_bpe_merges(df2, num_merges=2)
    assert (m2[0]["left"], m2[0]["right"], m2[0]["n"]) == ("a", "a", 3)
    # after merging: [aa][aa] -> round 2 merges (aa, aa)
    assert (m2[1]["left"], m2[1]["right"]) == ("aa", "aa")


def test_bpe_encode_fertility_drops_with_merges(spark):
    from rootstock_collective_state_sync_spark.operators.bpe import (
        bpe_encode,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low low lowest"), (2, "low lower")],
        "doc_id long, text string",
    )
    base = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
    assert base[1]["n_tokens"] == 3 + 3 + 3 + 6  # chars, no merges
    assert base[1]["fertility"] == round(15 / 4, 6)
    merges = learn_bpe_merges(df, num_merges=3)
    enc = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    # merges only ever reduce token counts, never change word counts
    for d in (1, 2):
        assert enc[d]["n_words"] == base[d]["n_words"]
        assert enc[d]["n_tokens"] < base[d]["n_tokens"]
    # 'low' fused to a single symbol by merges 1-2 => 3 words x 1 token
    # plus lowest (l..t): 'low'+'est'-ish segmentation, still >= 1
    assert enc[2]["n_tokens"] >= 2


def test_winsorize_is_idempotent_and_clamps(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        winsorize,
    )

    rows = [(i, "t", float(i)) for i in range(1, 101)]  # values 1..100
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    w1 = winsorize(df, lo_pct=5, hi_pct=95)
    out = {r["event_id"]: r for r in w1.collect()}
    # nearest-rank p5 of 1..100 = 5th value = 5.0; p95 = 95.0
    assert out[1]["value_wins"] == 5.0 and out[1]["clipped_lo"] == 1
    assert out[100]["value_wins"] == 95.0 and out[100]["clipped_hi"] == 1
    assert out[50]["value_wins"] == 50.0
    assert sum(r["clipped_lo"] for r in out.values()) == 4
    assert sum(r["clipped_hi"] for r in out.values()) == 5
    # idempotence: winsorizing the winsorized values changes nothing
    again = winsorize(
        w1.select("event_id", "event_type", F.col("value_wins").alias("value")),
        lo_pct=5,
        hi_pct=95,
    )
    assert all(
        r["value"] == r["value_wins"] and not r["clipped_lo"] and not r["clipped_hi"]
        for r in again.collect()
    )


def test_skew_report_flags_heavy_key(spark):
    from rootstock_collective_state_sync_spark.operators.skew import skew_report

    rows = [(1, "hot")] * 90 + [(1, f"k{i}") for i in range(10)]
    df = spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "id long, k string"
    )
    out = skew_report(df, "k", top_k=3).collect()
    assert out[0]["key"] == "hot" and out[0]["n_rows"] == 90
    assert out[0]["row_share"] == 0.9
    # 11 distinct keys, mean ~9.09 rows -> skew factor 90*11/100
    assert out[0]["skew_factor"] == round(90 * 11 / 100, 6)
    assert [r["rk"] for r in out] == [1, 2, 3]


def test_profile_table_counts_nulls_and_distincts(spark):
    from rootstock_collective_state_sync_spark.operators.profile import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 10.0)],
        "id long, s string, v double",
    )
    out = {r["col_name"]: r.asDict() for r in profile_table(df).collect()}
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 3
    assert out["v"]["min_val"] == "1.500000"  # decimal(38,6) canon
    assert out["v"]["max_val"] == "10.000000"
    assert out["id"]["min_val"] == "1" and out["id"]["max_val"] == "4"
    assert all(r["n_rows"] == 4 for r in out.values())


def test_vocab_edit_pairs_finds_planted_typos(spark):
    from rootstock_collective_state_sync_spark.operators.text import (
        vocab_edit_pairs,
    )

    text = " ".join(
        ["hello"] * 10 + ["helo"] * 2      # deletion
        + ["world"] * 8 + ["worlds"] * 1   # insertion
        + ["spark"] * 5 + ["spork"] * 1    # substitution
        + ["unrelated"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    pairs = {
        (r["canonical"], r["variant"]): (r["n_canonical"], r["n_variant"])
        for r in vocab_edit_pairs(df).collect()
    }
    assert pairs[("hello", "helo")] == (10, 2)
    assert pairs[("world", "worlds")] == (8, 1)
    assert pairs[("spark", "spork")] == (5, 1)
    assert all(c != v for c, v in pairs)
    # no ED-2 pair leaks through ('hello' vs 'helos' etc. absent)
    assert ("hello", "world") not in pairs


def test_histogram_covers_all_bins_and_counts(spark):
    from rootstock_collective_state_sync_spark.operators.profile import (
        histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "x double"
    )
    out = histogram(df, "x", bins=10).collect()
    assert len(out) == 10
    assert [r["n"] for r in out] == [10] * 10
    assert out[0]["lo"] == 0.0 and out[-1]["hi"] == 99.0
    # max value lands in the last bin (clamped), empty bins emitted
    df2 = spark.createDataFrame([(0.0,), (100.0,)], "x double")
    out2 = histogram(df2, "x", bins=4).collect()
    assert [r["n"] for r in out2] == [1, 0, 0, 1]


def test_histogram_null_and_empty_columns(spark):
    """Empty / all-NULL columns yield the zeroed spine with NULL
    bounds (not a float(None) crash), and NULL cells are counted in
    n_null instead of vanishing from every bin."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        histogram,
    )

    all_null = spark.createDataFrame([(None,), (None,)], "x double")
    out = histogram(all_null, "x", bins=4).collect()
    assert len(out) == 4
    assert all(r["n"] == 0 and r["lo"] is None and r["hi"] is None for r in out)
    assert all(r["n_null"] == 2 for r in out)

    empty = spark.createDataFrame([], "x double")
    out = histogram(empty, "x", bins=3).collect()
    assert len(out) == 3 and all(r["n"] == 0 and r["n_null"] == 0 for r in out)

    mixed = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    out = histogram(mixed, "x", bins=2).collect()
    assert sum(r["n"] for r in out) == 2
    assert all(r["n_null"] == 1 for r in out)


def test_kcenter_coreset_degenerate_inputs(spark):
    """Empty corpus -> empty coreset; k > n -> all n points, no
    IndexError from the greedy argmax collect."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        kcenter_coreset,
    )

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    assert kcenter_coreset(empty, k=4).count() == 0

    three = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 5.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = kcenter_coreset(three, k=10).collect()
    assert len(out) == 3  # stops when nothing is left to select
    assert [r["vec_id"] for r in out] == [1, 3, 2]  # seed, farthest, rest
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        binary_auc,
    )

    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "s long, y int"
    )
    assert binary_auc(perfect, "s", "y").first()["auc"] == 1.0
    reversed_ = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 0), (10, 0)], "s long, y int"
    )
    assert binary_auc(reversed_, "s", "y").first()["auc"] == 0.0
    # all scores tied -> 0.5 exactly (ties count half)
    tied = spark.createDataFrame(
        [(5, 1), (5, 1), (5, 0), (5, 0)], "s long, y int"
    )
    assert binary_auc(tied, "s", "y").first()["auc"] == 0.5
    # degenerate: single class -> 0.5 by convention
    onecls = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
    assert binary_auc(onecls, "s", "y").first()["auc"] == 0.5
    # hand-computed mixed case: pos={3,2}, neg={2,1}
    # pairs: (3>2),(3>1),(2=2 half),(2>1) -> (1+1+0.5+1)/4 = 0.875
    mixed = spark.createDataFrame(
        [(3, 1), (2, 1), (2, 0), (1, 0)], "s long, y int"
    )
    assert binary_auc(mixed, "s", "y").first()["auc"] == 0.875


def test_contamination_spans_distinguish_quotes_from_noise(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        contamination_spans,
    )

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    quoted = f"intro words here {bench_text} closing words here"
    scattered = (
        "alpha bravo charlie xx yy zz delta echo foxtrot qq ww ee "
        "golf hotel india rr tt uu"
    )
    train = spark.createDataFrame(
        [(1, quoted), (2, scattered), (3, "totally unrelated body text")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in contamination_spans(train, bench, n=3).collect()
    }
    assert 3 not in out  # clean doc absent
    # quoted: the 9 benchmark tokens form 7 consecutive 3-gram hits
    assert out[1]["n_runs"] == 1 and out[1]["longest_run"] == 7
    # scattered: three separate 1-gram islands
    assert out[2]["n_runs"] == 3 and out[2]["longest_run"] == 1


def test_incremental_line_store_matches_batch(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        line_store,
        merge_line_stores,
        strip_boilerplate_incremental,
        strip_boilerplate_lines,
    )

    footer = "c 2020 example corp"
    chunk1 = spark.createDataFrame(
        [(1, f"one body\n{footer}"), (2, f"{footer}\ntwo body")],
        "doc_id long, text string",
    )
    chunk2 = spark.createDataFrame(
        [(3, f"three body\n{footer}"), (4, "fresh text only")],
        "doc_id long, text string",
    )
    both = chunk1.unionByName(chunk2)

    # (a) store at-rest equivalence: incremental merge == batch build
    inc_store = merge_line_stores(line_store(chunk1), line_store(chunk2))
    batch_store = line_store(both)
    assert sorted(map(tuple, inc_store.collect())) == sorted(
        map(tuple, batch_store.collect())
    )

    # (b) the new batch is cleaned exactly as the batch op would clean
    # it over the full corpus (footer hits min_docs=3 only when the
    # chunk2 occurrence is counted — combined-count semantics)
    store1 = line_store(chunk1)
    _, cleaned2 = strip_boilerplate_incremental(chunk2, store1, min_docs=3)
    batch_all = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(both, min_docs=3).collect()
    }
    got = {r["doc_id"]: r.asDict() for r in cleaned2.collect()}
    assert got.keys() == {3, 4}
    for d in (3, 4):
        assert got[d] == batch_all[d]
    assert got[3]["n_removed"] == 1 and got[4]["n_removed"] == 0


def test_luhn_audit_checksum_separates_real_from_random(spark):
    from rootstock_collective_state_sync_spark.operators.text import luhn_audit

    df = spark.createDataFrame(
        [
            (1, "pay with 4539 1488 0343 6467 thanks"),  # valid (test number)
            (2, "pay with 4539 1488 0343 6468 thanks"),  # same digits, bad check
            (3, "order 1234567 qty 5"),                  # run too short
            (4, "cards 4111111111111111 and 5500-0000-0000-0004"),  # both valid
            (5, "clean text, no digits"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in luhn_audit(df).collect()}
    assert len(out) == 5  # one row per doc, including clean ones
    assert (out[1]["n_candidates"], out[1]["n_luhn_valid"]) == (1, 1)
    assert (out[2]["n_candidates"], out[2]["n_luhn_valid"]) == (1, 0)
    assert (out[3]["n_candidates"], out[3]["n_luhn_valid"]) == (0, 0)
    assert (out[4]["n_candidates"], out[4]["n_luhn_valid"]) == (2, 2)
    assert (out[5]["n_candidates"], out[5]["n_luhn_valid"]) == (0, 0)


def test_embedding_gram_exact_small_matrix(spark):
    from rootstock_collective_state_sync_spark.operators.similarity import (
        embedding_gram,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    out = {(r["i"], r["j"]): r for r in embedding_gram(df, dim=2).collect()}
    # G = [[1+9, 2+12], [., 4+16]] in e6 units
    assert out[(0, 0)]["g_e6"] == 10_000_000
    assert out[(0, 1)]["g_e6"] == 14_000_000
    assert out[(1, 1)]["g_e6"] == 20_000_000
    assert all(r["n_rows"] == 2 for r in out.values())
    assert set(out) == {(0, 0), (0, 1), (1, 1)}  # upper triangle only


def test_mad_normalize_resists_outlier(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        mad_normalize,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 1000])]
    rows += [(10 + i, "b", 7.0) for i in range(3)]  # constant group
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {
        (r["event_type"], r["event_id"]): r
        for r in mad_normalize(df).collect()
    }
    # group a: n=6, median rank ceil(6/2)=3 -> value 3; MAD over
    # |x-3| = [2,1,0,1,2,997] -> rank-3 element of sorted [0,1,1,2,2,997] = 1
    a0 = out[("a", 0)]
    assert a0["group_median"] == 3.0 and a0["group_mad"] == 1.0
    assert a0["robust_z_e6"] == -2_000_000  # (1-3)/1
    # the outlier is huge in z but didn't corrupt median/MAD
    assert out[("a", 5)]["robust_z_e6"] == 997_000_000
    # constant group: MAD 0 -> NULL z, no division blowup
    assert out[("b", 10)]["group_mad"] == 0.0
    assert out[("b", 10)]["robust_z_e6"] is None


def test_source_interleave_strict_rotation(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        source_interleave,
    )

    rows = [(i, "s1") for i in range(4)] + [(10 + i, "s2") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(source_interleave(df).collect(), key=lambda r: r["interleave_key"])
    # consuming by key visits sources in strict rotation
    assert [r["source"] for r in out] == ["s1", "s2"] * 4
    assert [r["doc_id"] for r in out] == [0, 10, 1, 11, 2, 12, 3, 13]
    assert len({r["interleave_key"] for r in out}) == 8  # keys unique


def test_ngram_novelty_flags_duplicate_content(spark):
    from rootstock_collective_state_sync_spark.operators.dedup import (
        ngram_novelty,
    )

    base = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, base),                        # first occurrence: all novel
            (2, base),                        # exact dup: zero novelty
            (3, base + " and runs far away"), # suffix adds new grams
            (4, "completely different words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty_e6"] == 1_000_000
    assert out[2]["novelty_e6"] == 0
    assert 0 < out[3]["novelty_e6"] < 1_000_000
    assert out[4]["novelty_e6"] == 1_000_000


def test_effective_rank_isotropic_vs_collapsed(spark):
    from rootstock_collective_state_sync_spark.operators.similarity import (
        embedding_effective_rank,
    )

    # perfectly isotropic 2-D corpus: PR = 2
    iso = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]), (4, [0.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    r = embedding_effective_rank(iso, dim=2).first()
    assert r["effective_rank"] == 2.0 and r["n_rows"] == 4
    # rank-1 collapse: every vector on one axis -> PR = 1
    flat = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    r = embedding_effective_rank(flat, dim=2).first()
    assert r["effective_rank"] == 1.0


def test_mutual_information_exact_cases(spark):
    from rootstock_collective_state_sync_spark.operators.profile import (
        mutual_information,
    )
    import math

    # independent: MI = 0 (every cell term 0 by symmetry)
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(5)],
        "x string, y string",
    )
    terms = [r["mi_term_e9"] for r in mutual_information(ind, "x", "y").collect()]
    assert sum(terms) == 0
    # perfectly dependent 2x2: MI = ln 2
    dep = spark.createDataFrame(
        [("a", "c")] * 5 + [("b", "d")] * 5, "x string, y string"
    )
    total = sum(
        r["mi_term_e9"] for r in mutual_information(dep, "x", "y").collect()
    )
    assert abs(total / 1e9 - math.log(2)) < 1e-8
    # empty input: empty report
    empty = spark.createDataFrame([], "x string, y string")
    assert mutual_information(empty, "x", "y").count() == 0


def test_semantic_dedup_cell_size_cap(spark):
    """The max_cell_size skew guard: subdivided cells still find
    in-subcell dups, keepers stay keepers, and the pair stage is
    bounded. Unbounded run = superset of the capped run's dups."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        semantic_dedup,
    )

    # 40 near-identical vectors (one dense cluster) + 4 spread ones
    rows = [(i, [1.0, 0.001 * i]) for i in range(40)]
    rows += [(100, [-1.0, 0.0]), (101, [0.0, 1.0]),
             (102, [0.0, -1.0]), (103, [-1.0, -0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    full = {r["vec_id"]: r for r in
            semantic_dedup(df, num_cells=4, threshold=0.99).collect()}
    capped = {r["vec_id"]: r for r in
              semantic_dedup(df, num_cells=4, threshold=0.99,
                             max_cell_size=10).collect()}
    assert set(full) == set(capped)  # one row per vector either way
    # capped run finds a subset of the full run's dup marks (recall
    # haircut confined to cross-subcell pairs), never false positives
    for vid, r in capped.items():
        assert r["n_earlier_dups"] <= full[vid]["n_earlier_dups"]
        if r["keep"] == 0:
            assert full[vid]["keep"] == 0
    # the dense cluster still collapses: most of it is marked dup
    dense_killed = sum(1 for i in range(40) if capped[i]["keep"] == 0)
    assert dense_killed >= 30


def test_incremental_novelty_matches_batch(spark):
    """novelty_store min-merge == batch build; incremental batch-2
    scores == the at-rest scores of those docs over the full corpus
    (ids monotone across batches — the append-log contract)."""
    from rootstock_collective_state_sync_spark.operators.dedup import (
        merge_novelty_stores,
        ngram_novelty,
        ngram_novelty_incremental,
        novelty_store,
    )

    base = "the quick brown fox jumps over the lazy dog"
    c1 = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here today")],
        "doc_id long, text string",
    )
    c2 = spark.createDataFrame(
        [(3, base), (4, base + " and runs far away")],
        "doc_id long, text string",
    )
    both = c1.unionByName(c2)

    inc_store = merge_novelty_stores(novelty_store(c1), novelty_store(c2))
    batch_store = novelty_store(both)
    assert sorted(map(tuple, inc_store.collect())) == sorted(
        map(tuple, batch_store.collect())
    )

    store1 = novelty_store(c1)
    _, scores2 = ngram_novelty_incremental(c2, store1)
    at_rest = {r["doc_id"]: r for r in ngram_novelty(both).collect()}
    for r in scores2.collect():
        ref = at_rest[r["doc_id"]]
        assert (r["n_grams"], r["n_first"], r["novelty_e6"]) == (
            ref["n_grams"], ref["n_first"], ref["novelty_e6"]
        )
    assert at_rest[3]["novelty_e6"] == 0  # exact dup of doc 1


def test_bpe_local_matches_distributed(spark):
    """The driver-side merge loop and the distributed per-round loop
    are result-identical (same winners, same counts, same order)."""
    from rootstock_collective_state_sync_spark.operators.bpe import (
        _learn_merges_distributed,
        _word_freqs,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low lower lowest new newer newest wide wider")],
        "doc_id long, text string",
    )
    local = learn_bpe_merges(df, num_merges=5)
    dist = _learn_merges_distributed(_word_freqs(df, "text"), 5)
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]


def test_hard_negatives_mining(spark):
    from rootstock_collective_state_sync_spark.operators.similarity import (
        hard_negatives,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.99, 0.1], 0),     # near 1, same label -> 1's positive
            (3, [0.9, 0.2], 1),      # near both, other label -> hard negative
            (4, [-1.0, 0.0], 1),     # far
            (5, [0.0, 1.0], 2),      # singleton label: no positive exists
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r for r in hard_negatives(df).collect()}
    assert len(out) == 5
    assert out[1]["positive_id"] == 2
    assert out[1]["hard_negative_id"] == 3
    assert out[1]["margin"] > 0          # positive closer than negative
    assert out[5]["positive_id"] is None  # singleton label surfaces, not drops
    assert out[5]["hard_negative_id"] is not None
    # boundary case census: anchor 3's same-label mate (4) points the
    # opposite way while different-label 2 sits next to it -> its hard
    # negative beats its positive and the margin goes negative
    assert out[3]["hard_negative_id"] == 2 and out[3]["margin"] < 0

    with _pytest.raises(ValueError, match="max_rows"):
        hard_negatives(df, max_rows=3)


def test_class_weights_normalization(spark):
    from rootstock_collective_state_sync_spark.operators.similarity import (
        class_weights,
    )

    df = spark.createDataFrame(
        [(i, 0) for i in range(90)] + [(100 + i, 1) for i in range(10)],
        "vec_id long, label int",
    )
    out = {r["label"]: r for r in class_weights(df).collect()}
    # rare class upweighted, common downweighted, corpus size preserved
    assert out[1]["w_inverse"] > 1.0 > out[0]["w_inverse"]
    assert out[1]["w_effective"] > 1.0 > out[0]["w_effective"]
    for scheme in ("w_inverse", "w_effective"):
        total = sum(out[l]["n"] * out[l][scheme] for l in out)
        assert abs(total - 100) < 1e-3
    # effective-number damps the inverse-frequency overcorrection
    assert out[1]["w_effective"] < out[1]["w_inverse"]


def test_curriculum_export_preserves_global_order(spark, tmp_path):
    """source_interleave key -> range-sharded export: shards carry
    disjoint contiguous key spans, and reading shard 0..N-1 in order
    (each sorted by file order) replays the exact global rotation —
    no global sort anywhere."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        source_interleave,
    )
    from rootstock_collective_state_sync_spark.sinks.export import (
        export_curriculum_shards,
    )

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    keyed = source_interleave(df)
    path = str(tmp_path / "curriculum")
    manifest = export_curriculum_shards(keyed, path, num_shards=4).collect()

    spans = sorted((r["min_key"], r["max_key"]) for r in manifest)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))  # disjoint
    assert sum(r["n_rows"] for r in manifest) == 60

    got = []
    for s in sorted(r["shard"] for r in manifest):
        part = (
            spark.read.parquet(f"{path}/data/shard={s}")
            .orderBy("interleave_key")
            .collect()
        )
        got.extend(r["source"] for r in part)
    want = [
        r["source"]
        for r in keyed.orderBy("interleave_key").collect()
    ]
    assert got == want
    assert got[:6] == ["s0", "s1", "s2", "s0", "s1", "s2"]  # strict rotation


def test_largest_remainder_quotas_sum_exactly(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        largest_remainder_alloc,
    )

    rows = (
        [(i, "a") for i in range(7)]
        + [(100 + i, "b") for i in range(7)]
        + [(200 + i, "c") for i in range(6)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r["quota"] for r in
           largest_remainder_alloc(df, budget=10).collect()}
    # floors: a=3 (3.5), b=3 (3.5), c=3 (3.0); 1 leftover goes to the
    # largest remainder (a and b tie at .5 -> bigger n ties too ->
    # name 'a' wins)
    assert out == {"a": 4, "b": 3, "c": 3}
    assert sum(out.values()) == 10
    # degenerate budgets
    out0 = {r["source"]: r["quota"] for r in
            largest_remainder_alloc(df, budget=0).collect()}
    assert sum(out0.values()) == 0
    big = {r["source"]: r["quota"] for r in
           largest_remainder_alloc(df, budget=20).collect()}
    assert sum(big.values()) == 20


def test_mad_normalize_even_count_group(spark):
    """Even-count group: rank = ceil(n/2) picks the LOWER middle
    element for both median and MAD — pinned so the nearest-rank
    convention can't drift."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        mad_normalize,
    )

    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "event_id long, event_type string, value double",
    )
    r = {x["event_id"]: x for x in mad_normalize(df).collect()}
    assert r[0]["group_median"] == 20.0  # lower middle of 4
    # deviations from 20: [10, 0, 10, 20] -> sorted [0,10,10,20], rank 2 -> 10
    assert r[0]["group_mad"] == 10.0
    assert r[3]["robust_z_e6"] == 2_000_000  # (40-20)/10


def test_attribution_no_touch_conversion(spark):
    """A conversion with NO preceding touch surfaces with NULL touch
    ids (never dropped); a touch AFTER the conversion doesn't count."""
    import datetime

    from rootstock_collective_state_sync_spark.operators.temporal import (
        attribution_touch,
    )

    t0 = datetime.datetime(2026, 1, 1, 10, 0)

    def t(m):
        return t0 + datetime.timedelta(minutes=m)

    df = spark.createDataFrame(
        [
            (1, t(0), 7, "purchase"),   # no touch before
            (2, t(5), 7, "click"),      # later touch: must not count for 1
            (3, t(10), 7, "purchase"),  # first/last touch = 2
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r["conversion_id"]: r for r in attribution_touch(df).collect()}
    assert out[1]["first_touch_id"] is None
    assert out[1]["last_touch_id"] is None
    assert out[3]["first_touch_id"] == 2 and out[3]["last_touch_id"] == 2
    assert out[3]["last_touch_lag_us"] == 5 * 60 * 1_000_000


def test_source_interleave_empty_and_single_source(spark):
    from rootstock_collective_state_sync_spark.operators.sampling import (
        source_interleave,
    )

    empty = spark.createDataFrame([], "doc_id long, source string")
    assert source_interleave(empty).count() == 0
    one = spark.createDataFrame(
        [(3, "s"), (1, "s"), (2, "s")], "doc_id long, source string"
    )
    out = sorted(
        source_interleave(one).collect(), key=lambda r: r["interleave_key"]
    )
    assert [r["doc_id"] for r in out] == [1, 2, 3]  # id order, keys dense
    assert [r["interleave_key"] for r in out] == [0, 1, 2]


def test_luhn_audit_separator_variants(spark):
    """Space- and dash-separated runs are candidates; runs with double
    separators or letters inside are not glued together."""
    from rootstock_collective_state_sync_spark.operators.text import luhn_audit

    df = spark.createDataFrame(
        [
            (1, "a 4111-1111 1111-1111 b"),   # mixed separators, valid
            (2, "a 4111--1111-1111-1111 b"),  # double dash: run breaks
            (3, "a 4111x1111111111111 b"),    # letter splits the run
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in luhn_audit(df).collect()}
    assert (out[1]["n_candidates"], out[1]["n_luhn_valid"]) == (1, 1)
    assert out[2]["n_candidates"] == 0
    assert out[3]["n_candidates"] == 0


def test_video_scene_scores_quarantines_corrupt_payload(spark):
    from rootstock_collective_state_sync_spark.operators import multimodal as M
    from pyspark.sql import functions as F

    good = M.attach_video_payload(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog " * 3)],
            "doc_id long, text string",
        )
    )
    bad = spark.createDataFrame(
        [(2, bytearray(b"NOT A PPM STREAM"))], "doc_id long, payload binary"
    )
    out = M.video_scene_scores(good.unionByName(bad)).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert all(r["decode_error"] is None for r in by_id[1])
    [err_row] = by_id[2]
    assert err_row["pair_no"] == -1 and err_row["decode_error"]


def test_dsir_log_ratio_ranks_target_like_docs_higher(spark):
    """DSIR semantics: a raw doc written in the target subcorpus's
    vocabulary must out-score a raw doc with disjoint vocabulary
    (absolute sign is smoothing-dependent at toy corpus size — with
    B >> corpus grams the add-one terms dominate — so the contract is
    the ORDERING, which is all resampling consumes). Gram-less docs
    surface with zeros."""
    from rootstock_collective_state_sync_spark.operators.text import (
        dsir_log_ratio,
    )

    tgt_text = "clean prose about science and careful reasoning " * 4
    rows = [
        (1, tgt_text, True),
        (2, "clean prose about science and careful reasoning", False),
        (3, "zzz qqq spam spam zzz qqq buy now zzz qqq", False),
        (4, "", False),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    out = {r["doc_id"]: r for r in dsir_log_ratio(df).collect()}
    assert out[2]["mean_lr"] > out[3]["mean_lr"]
    assert out[1]["mean_lr"] > out[3]["mean_lr"]
    assert out[4]["n_grams"] == 0 and out[4]["lr_e6"] == 0
    assert out[4]["mean_lr"] == 0.0
    # occurrences counted, not distinct: doc 1 = 4x doc 2's grams
    # (plus the 3 join bigrams between repetitions)
    assert out[1]["n_grams"] == 4 * out[2]["n_grams"] + 3


def test_entropy_scores_orders_and_edge_cases(spark):
    """Entropy semantics: a uniform-vocabulary doc maxes token entropy
    (ln k), an all-same-token doc scores 0, the empty doc scores 0
    with zero counts, and char entropy of 'aaaa' is 0."""
    import math

    from rootstock_collective_state_sync_spark.operators.text import (
        entropy_scores,
    )

    rows = [
        (1, "alpha beta gamma delta"),   # 4 distinct tokens -> ln 4
        (2, "spam spam spam spam"),      # one token type -> 0
        (3, ""),                          # empty
        (4, "aaaa"),                      # one char type -> char H = 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in entropy_scores(df).collect()}
    assert abs(out[1]["token_entropy"] - math.log(4)) < 1e-5
    assert out[2]["token_entropy"] == 0.0 and out[2]["n_types"] == 1
    assert out[3]["n_tokens"] == 0 and out[3]["n_chars"] == 0
    assert out[3]["token_entropy"] == 0.0 and out[3]["char_entropy"] == 0.0
    assert out[4]["char_entropy"] == 0.0 and out[4]["n_chars"] == 4
    # mixed doc: 0 < H < ln(n_types)
    assert 0.0 < out[1]["char_entropy"] < math.log(out[1]["n_chars"])


def test_gumbel_topk_contract(spark):
    """Gumbel-top-k: |result| = min(k, n); ranks are 1..k in key
    order; the draw is deterministic (same selection twice); and
    weight monotonicity holds — boosting one excluded row's log-weight
    far enough pulls it into the selection under the SAME draws."""
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators.sampling import (
        gumbel_topk,
    )

    df = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("lw")
    )
    sel1 = gumbel_topk(df, "lw", 10).collect()
    sel2 = gumbel_topk(df, "lw", 10).collect()
    assert [r["doc_id"] for r in sel1] == [r["doc_id"] for r in sel2]
    assert [r["rank"] for r in sel1] == list(range(1, 11))
    keys = [r["gumbel_key"] for r in sel1]
    assert keys == sorted(keys, reverse=True)
    assert len(gumbel_topk(df, "lw", 100).collect()) == 40

    chosen = {r["doc_id"] for r in sel1}
    out = next(i for i in range(40) if i not in chosen)
    boosted = df.withColumn(
        "lw", F.when(F.col("doc_id") == out, F.lit(50.0)).otherwise(F.lit(0.0))
    )
    sel3 = {r["doc_id"]: r["rank"] for r in gumbel_topk(boosted, "lw", 10).collect()}
    assert sel3[out] == 1  # +50 log-weight dominates any Gumbel draw


def test_entropy_scores_bounds_property(spark):
    """Property over generated corpora: 0 <= H <= ln(n_types) (token)
    and 0 <= H <= ln(n_chars) (char) for every doc, with equality at
    the lower bound exactly when one symbol type exists. Seeded
    generation — deterministic."""
    import math
    import random

    from rootstock_collective_state_sync_spark.operators.text import (
        entropy_scores,
    )

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "y22"]
    rows = []
    for i in range(30):
        n = rng.randint(1, 40)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in entropy_scores(df).collect():
        assert 0.0 <= r["token_entropy"] <= math.log(max(r["n_types"], 1)) + 1e-6
        assert 0.0 <= r["char_entropy"] <= math.log(max(r["n_chars"], 1)) + 1e-6
        if r["n_types"] == 1:
            assert r["token_entropy"] == 0.0


def test_unimax_alloc_contract(spark):
    """Known-size groups, budget 0.5x corpus, cap 2 epochs: both small
    groups fit under the cap (full supply, exactly 2.0 epochs), the
    big group absorbs the remaining budget at the water level; the
    allocations sum to the budget exactly."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        unimax_alloc,
    )

    rows = (
        [("a", 10)] * 1 + [("b", 20)] * 1 + [("c", 1000)] * 1
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in unimax_alloc(
        df, budget_frac_e6=500000, epoch_cap=2
    ).collect()}
    # B = floor(0.5 * 1030) = 515; supplies 20 / 40 / 2000
    assert out["a"]["alloc"] == 20.0 and out["a"]["epochs"] == 2.0
    assert out["b"]["alloc"] == 40.0 and out["b"]["epochs"] == 2.0
    assert out["c"]["alloc"] == 455.0  # 515 - 20 - 40
    assert abs(sum(r["alloc"] for r in out.values()) - 515.0) < 1e-9
    # budget >= total supply -> everyone runs their full cap
    full = {r["source"]: r for r in unimax_alloc(
        df, budget_frac_e6=3000000, epoch_cap=2
    ).collect()}
    assert all(r["alloc"] == r["supply"] for r in full.values())
    assert all(r["epochs"] == 2.0 for r in full.values())


def test_doremi_weights_contract(spark):
    """A domain of rare diverse tokens must earn positive excess loss
    and a weight ABOVE its baseline share; a domain of corpus-common
    repeated tokens must not. Both columns sum to 1."""
    from rootstock_collective_state_sync_spark.operators.text import (
        doremi_weights,
    )

    common = [("head", "the cat sat on the mat " * 5)] * 20
    rare = [
        ("tail", f"zyx{i}q wvu{i}t rqp{i}m onm{i}k") for i in range(20)
    ]
    df = spark.createDataFrame(common + rare, "source string, text string")
    out = {r["source"]: r for r in doremi_weights(df).collect()}
    assert out["tail"]["excess_e6"] > 0
    assert out["head"]["excess_e6"] == 0
    assert out["tail"]["weight"] > out["tail"]["share"]
    assert out["head"]["weight"] < out["head"]["share"]
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5


def test_cdc_chunks_contract(spark):
    """Chunks tile each document exactly (contiguous starts, lengths
    summing to the doc length, all positive), and boundaries are
    content-defined: prepending one char to a doc changes at most the
    chunks up to the first surviving boundary — later chunk hashes
    re-align (the property offset chunking lacks)."""
    import hashlib

    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators.text import (
        cdc_chunks,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50)
    )
    rows = cdc_chunks(docs).orderBy("doc_id", "chunk_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(by_doc) == set(texts)
    for did, chunks in by_doc.items():
        assert all(c["chunk_len"] > 0 for c in chunks)
        pos = 0
        for c in chunks:
            assert c["start"] == pos
            pos += c["chunk_len"]
        assert pos == len(texts[did])
        # hash really is md5 of the chunk text
        c0 = chunks[0]
        seg = texts[did][: c0["chunk_len"]]
        assert c0["chunk_hash"] == hashlib.md5(seg.encode()).hexdigest()

    one = docs.limit(1).select("doc_id", "text")
    shifted = one.select(
        "doc_id", F.concat(F.lit("Z"), F.col("text")).alias("text")
    )
    h1 = [r["chunk_hash"] for r in cdc_chunks(one).collect()]
    h2 = {r["chunk_hash"] for r in cdc_chunks(shifted).collect()}
    # every chunk after the first boundary re-aligns
    assert all(h in h2 for h in h1[1:])


def test_cdc_dup_stats_contract(spark):
    """A near-copy of an earlier doc (one edit at the head) shows a
    high duplicated-char fraction; the owner doc and an unrelated doc
    show zero. The property exact-doc dedup misses entirely."""
    from rootstock_collective_state_sync_spark.operators.text import (
        cdc_dup_stats,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the river runs through the quiet valley toward "
        "the distant sea carrying leaves and small boats alike"
    )
    other = (
        "entirely different content about spacecraft telemetry and "
        "orbital mechanics with no shared phrases whatsoever in any "
        "window of the hash function used for boundary detection"
    )
    df = spark.createDataFrame(
        [(0, base), (1, "EDITED " + base), (2, other)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cdc_dup_stats(df).collect()}
    assert out[0]["dup_char_ratio"] == 0.0  # owner keeps its content
    assert out[1]["dup_char_ratio"] > 0.5  # re-aligned chunks detected
    assert out[2]["dup_char_ratio"] == 0.0
    assert out[1]["n_dup_chunks"] > 0
    # chars add up
    for did, r in out.items():
        assert r["dup_chars"] <= r["total_chars"]


def test_semantic_contamination_contract(spark):
    """Corpus vectors near a benchmark vector are flagged (clean=0,
    at least one hit, max_bench_sim at/above the threshold); vectors
    orthogonal to every benchmark vector stay clean."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        semantic_contamination,
    )

    dim = 8
    def vec(axis, eps, j):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 1) % dim] = eps * (1 + j % 3)
        return v

    corpus = [(i, vec(0, 0.05, i)) for i in range(10)] + [
        (100 + i, vec(4, 0.05, i)) for i in range(10)
    ]
    bench = [(1000, vec(0, 0.02, 0))]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    bdf = spark.createDataFrame(bench, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(
            cdf, bdf, num_cells=2, threshold=0.9
        ).collect()
    }
    assert len(out) == 20
    for i in range(10):  # axis-0 cluster: contaminated
        assert out[i]["clean"] == 0 and out[i]["n_bench_hits"] >= 1
        assert out[i]["max_bench_sim"] >= 0.9
    for i in range(10):  # axis-4 cluster: orthogonal to the benchmark
        assert out[100 + i]["clean"] == 1
        assert out[100 + i]["n_bench_hits"] == 0
        assert out[100 + i]["max_bench_sim"] is None


def test_bm25_topk_contract(spark):
    """BM25 ranking properties on a constructed corpus: the doc
    containing ALL query terms outranks partial matches; a rare term
    outweighs a common one at equal tf; absent-term docs never
    appear; ranks are 1..k dense per query."""
    from rootstock_collective_state_sync_spark.operators.text import (
        bm25_topk,
    )

    docs = [
        (1, "alpha beta gamma"),          # all three query terms
        (2, "alpha beta filler filler"),  # two of three, longer
        (3, "alpha filler filler filler filler filler"),  # one, longest
        (4, "zeta eta theta"),            # none
    ] + [(10 + i, "alpha common common") for i in range(6)]  # alpha common
    queries = [(1, "alpha beta gamma"), (2, "gamma")]
    out = bm25_topk(
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(queries, "query_id long, query_text string"),
        k=5,
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    q1 = sorted(per_q[1], key=lambda r: r["rk"])
    assert [r["rk"] for r in q1] == list(range(1, len(q1) + 1))
    assert q1[0]["doc_id"] == 1 and q1[0]["n_hit_terms"] == 3
    assert all(r["doc_id"] != 4 for r in out)
    # gamma is rare (only doc 1 has it): q2's single hit is doc 1
    assert [r["doc_id"] for r in per_q[2]] == [1]
    assert all(r["score"] > 0 for r in out)


def test_corpus_datasheet_contract(spark):
    """Known micro-corpus: exact volumes, integer means, and the
    deterministic modal-language tie-break (count desc, lang asc)."""
    from rootstock_collective_state_sync_spark.operators.text import (
        corpus_datasheet,
    )

    docs = [
        (1, "one two three", "en", "s1"),
        (2, "four five", "de", "s1"),
        (3, "six", "de", "s1"),
        (4, "seven eight nine ten", "fr", "s2"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    )
    out = {r["source"]: r for r in corpus_datasheet(df).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["total_tokens"] == 6
    assert s1["mean_tokens"] == 2  # 6 div 3
    assert s1["n_langs"] == 2 and s1["top_lang"] == "de"  # 2 de vs 1 en
    assert s1["min_chars"] == len("six") and s1["max_chars"] == len("one two three")
    s2 = out["s2"]
    assert s2["n_docs"] == 1 and s2["top_lang"] == "fr"
