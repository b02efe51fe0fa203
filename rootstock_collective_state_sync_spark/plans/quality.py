"""Heuristic-quality / fusion / audio conformance queries (round-7
scope extension): Gopher-style rule filtering, reciprocal-rank fusion
of ANN retrievers, and frame-level audio energy over real PCM WAV
payloads.

Same contract as :mod:`.training`: every Spark plan composes
:mod:`..operators` built-ins; every oracle replays the exact
computation in DuckDB SQL (same integer arithmetic, same rounding),
so the driver's hash-compare verifies the operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rootstock_collective_state_sync_spark.operators import rules as RL
from rootstock_collective_state_sync_spark.operators.text import STOPWORDS
from rootstock_collective_state_sync_spark.plans.tables import load_table
from rootstock_collective_state_sync_spark.plans.training import _COS_SQL


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality rules
# ---------------------------------------------------------------------------


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule audit (Rae et al. 2021 §A1.1): every
    feature, every per-rule flag, and the aggregate keep flag — the
    kill-rate audit a curation pipeline runs before deleting anything.
    Pure JVM projection over the scan; the oracle replays every
    feature and threshold in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    out = RL.gopher_quality(docs)
    rule_cols = [c for c in out.columns if c.startswith(("rule_", "gopher_"))]
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "frac_alpha_words",
        "n_stop_hits",
        *[F.col(c).cast("int").alias(c) for c in rule_cols],
    ).orderBy("doc_id")


_STOP_EN_SQL = ", ".join(f"'{s}'" for s in STOPWORDS["en"])

Q_GOPHER_QUALITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r]+'),
                     x -> x <> '') AS words,
         string_split(text, chr(10)) AS lns,
         length(regexp_replace(text, '[^#]', '', 'g'))::BIGINT AS n_hash,
         len(regexp_extract_all(text, '\\.\\.\\.'))::BIGINT AS n_ellipsis,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         round(coalesce(list_sum(list_transform(words,
                   x -> length(x)::DOUBLE)), 0.0)
               / greatest(len(words), 1), 6) AS mean_word_len,
         round((n_hash + n_ellipsis)::DOUBLE
               / greatest(len(words), 1), 6) AS symbol_word_ratio,
         round(len(list_filter(lns,
                   l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE
               / greatest(len(lns), 1), 6) AS frac_bullet_lines,
         round(len(list_filter(lns,
                   l -> regexp_matches(trim(l), '\\.\\.\\.$')))::DOUBLE
               / greatest(len(lns), 1), 6) AS frac_ellipsis_lines,
         round(len(list_filter(words,
                   x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
               / greatest(len(words), 1), 6) AS frac_alpha_words,
         len(list_intersect(list_distinct(toks),
             [{_STOP_EN_SQL}]))::BIGINT AS n_stop_hits
  FROM w
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
       n_stop_hits,
       (n_words >= 50 AND n_words <= 100000)::INTEGER AS rule_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)::INTEGER
         AS rule_mean_word_len,
       (symbol_word_ratio <= 0.1)::INTEGER AS rule_symbol_ratio,
       (frac_bullet_lines <= 0.9)::INTEGER AS rule_bullet_lines,
       (frac_ellipsis_lines <= 0.3)::INTEGER AS rule_ellipsis_lines,
       (frac_alpha_words >= 0.8)::INTEGER AS rule_alpha_words,
       (n_stop_hits >= 2)::INTEGER AS rule_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1
        AND frac_bullet_lines <= 0.9
        AND frac_ellipsis_lines <= 0.3
        AND frac_alpha_words >= 0.8
        AND n_stop_hits >= 2)::INTEGER AS gopher_keep
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of two exact retrievers
# ---------------------------------------------------------------------------


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion end-to-end: the cosine ranking and the
    (norm-sensitive) squared-L2 ranking of the same query set, fused
    with fixed-point reciprocal-rank scoring. The oracle replays both
    retrievers AND the integer fusion in SQL — rank-exact."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cos = S.brute_force_topk(emb, queries, k=10)
    l2 = S.brute_force_topk_l2(emb, queries, k=10)
    return S.rrf_fuse([cos, l2], k_const=60, topk=5).orderBy(
        "query_id", "rrf_rank"
    )


_SQL2_SQL = """
round(
  list_sum(list_transform(range(1, len({a}) + 1),
           i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)
              * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), 6)
"""

Q_RRF_FUSION_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
cos_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.qv", b="c.embedding")} AS s
  FROM embeddings c, q WHERE c.vec_id <> q.query_id
),
cos_rk AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id ASC) AS rk
  FROM cos_scored
),
l2_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_SQL2_SQL.format(a="q.qv", b="c.embedding")} AS s
  FROM embeddings c, q WHERE c.vec_id <> q.query_id
),
l2_rk AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s ASC, neighbor_id ASC) AS rk
  FROM l2_scored
),
pts AS (
  SELECT query_id, neighbor_id, 1000000000 // (60 + rk) AS pts
  FROM cos_rk WHERE rk <= 10
  UNION ALL
  SELECT query_id, neighbor_id, 1000000000 // (60 + rk) AS pts
  FROM l2_rk WHERE rk <= 10
),
fused AS (
  SELECT query_id, neighbor_id,
         sum(pts)::BIGINT AS rrf_pts, count(*)::BIGINT AS n_lists
  FROM pts GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_pts DESC, neighbor_id ASC)::BIGINT
              AS rrf_rank
  FROM fused
)
SELECT query_id, rrf_rank, neighbor_id, rrf_pts, n_lists
FROM ranked WHERE rrf_rank <= 5 ORDER BY query_id, rrf_rank
"""


# ---------------------------------------------------------------------------
# audio: frame-level energy over real PCM WAV payloads
# ---------------------------------------------------------------------------


def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio curation plumbing end-to-end, value-checked to the
    sample: documents -> real RIFF/WAVE payloads -> RIFF walk ->
    int16 samples -> per-frame integer energy / peak / silence flag.
    The oracle rebuilds the identical waveform from the text bytes and
    replays the exact integer frame arithmetic in SQL."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    return (
        M.audio_frame_energy(M.attach_wav_payload(docs), frame=16)
        .select("doc_id", "frame_no", "energy", "peak", "is_silence")
        .orderBy("doc_id", "frame_no")
    )


Q_AUDIO_FRAME_ENERGY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         (64 + doc_id % 64)::BIGINT AS ns,
         rpad(text, (64 + doc_id % 64)::INT, text) AS raw
  FROM documents
),
s AS (
  SELECT doc_id, (ns // 16)::BIGINT AS nf,
         list_transform(range(ns),
             i -> ((ord(substr(raw, (i + 1)::INT, 1)) - 128) * 256)::BIGINT)
           AS samples
  FROM base
),
fr AS (
  SELECT doc_id, r.i::BIGINT AS frame_no,
         list_sum(list_transform(range(16),
             j -> samples[(r.i * 16 + j + 1)::INT]
                * samples[(r.i * 16 + j + 1)::INT]))::BIGINT AS energy,
         list_max(list_transform(range(16),
             j -> abs(samples[(r.i * 16 + j + 1)::INT])))::BIGINT AS peak
  FROM s, range(8) r(i) WHERE r.i < nf
)
SELECT doc_id, frame_no, energy, peak,
       (energy < 268435456)::INTEGER AS is_silence
FROM fr ORDER BY doc_id, frame_no
"""


def q_audio_trim_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence trimming census — the pre-transcription audio curation
    step: per clip, the first/last VOICED frame on the X-M5 energy
    grid, leading/trailing silent-frame trims, the kept span, and an
    all-silent flag (such clips are dropped, not trimmed). Composed
    ENTIRELY from `audio_frame_energy`'s frame table by DataFrame
    aggregation — decode runs once, no second Arrow pass; the oracle
    replays the waveform rebuild plus the trim aggregation."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    frames = M.audio_frame_energy(M.attach_wav_payload(docs), frame=16)
    per = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.min(F.when(F.col("is_silence") == 0, F.col("frame_no"))).alias(
            "_first"
        ),
        F.max(F.when(F.col("is_silence") == 0, F.col("frame_no"))).alias(
            "_last"
        ),
        F.sum((F.col("is_silence") == 0).cast("long"))
        .cast("long")
        .alias("n_voiced"),
    )
    all_silent = F.col("_first").isNull()
    return per.select(
        "doc_id",
        "n_frames",
        "n_voiced",
        F.coalesce(F.col("_first"), F.lit(-1)).cast("long").alias(
            "first_voiced"
        ),
        F.coalesce(F.col("_last"), F.lit(-1)).cast("long").alias(
            "last_voiced"
        ),
        F.when(all_silent, F.col("n_frames"))
        .otherwise(F.col("_first"))
        .cast("long")
        .alias("lead_trim"),
        F.when(all_silent, F.lit(0))
        .otherwise(F.col("n_frames") - 1 - F.col("_last"))
        .cast("long")
        .alias("tail_trim"),
        F.when(all_silent, F.lit(0))
        .otherwise(F.col("_last") - F.col("_first") + 1)
        .cast("long")
        .alias("kept_frames"),
        all_silent.cast("int").alias("all_silent"),
    ).orderBy("doc_id")


Q_AUDIO_TRIM_SILENCE_ORACLE = f"""
WITH fr AS ({Q_AUDIO_FRAME_ENERGY_ORACLE.strip().rstrip()}),
per AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_frames,
         min(CASE WHEN is_silence = 0 THEN frame_no END) AS f,
         max(CASE WHEN is_silence = 0 THEN frame_no END) AS l,
         sum((is_silence = 0)::BIGINT)::BIGINT AS n_voiced
  FROM fr GROUP BY 1
)
SELECT doc_id, n_frames, n_voiced,
       coalesce(f, -1)::BIGINT AS first_voiced,
       coalesce(l, -1)::BIGINT AS last_voiced,
       (CASE WHEN f IS NULL THEN n_frames ELSE f END)::BIGINT AS lead_trim,
       (CASE WHEN f IS NULL THEN 0 ELSE n_frames - 1 - l END)::BIGINT
         AS tail_trim,
       (CASE WHEN f IS NULL THEN 0 ELSE l - f + 1 END)::BIGINT
         AS kept_frames,
       (f IS NULL)::INTEGER AS all_silent
FROM per ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# graph centrality: fixed-point PageRank over the kNN similarity graph
# ---------------------------------------------------------------------------

_PR_K = 3
_CELL_NPROBE = 4  # multi-probe width of the celled edge builds
_PR_ITERS = 5
_PR_DAMPING = 85


def q_similarity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative distributed algorithm end-to-end: kNN cosine edges
    (symmetrized) -> 5 rounds of integer fixed-point PageRank. Every
    stage is deterministic (rounded cosine ranking, integer rank
    arithmetic), so the oracle replays the edge build AND all five
    iterations as materialized CTEs — bit-exact."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges(emb, k=_PR_K)
    return (
        G.pagerank_fixed(edges, iters=_PR_ITERS, damping_pct=_PR_DAMPING)
        .select(F.col("id").alias("vec_id"), "pr")
        .orderBy("vec_id")
    )


def _pagerank_oracle(
    k: int = _PR_K, iters: int = _PR_ITERS, damping: int = _PR_DAMPING
) -> str:
    from rootstock_collective_state_sync_spark.operators.graph import PR_SCALE

    parts = [f"""
WITH scored AS (
  SELECT q.vec_id AS src, c.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS s
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
deg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
r0 AS MATERIALIZED (SELECT id, ({PR_SCALE} // n)::BIGINT AS pr FROM nodes, nn)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
s{t} AS (
  SELECT e.dst AS id, sum(r.pr // d.deg)::BIGINT AS s
  FROM e JOIN r{t - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY 1
),
r{t} AS MATERIALIZED (
  SELECT nodes.id,
         (((100 - {damping})::BIGINT * {PR_SCALE}) // (100 * nn.n)
          + ({damping} * coalesce(s{t}.s, 0)) // 100)::BIGINT AS pr
  FROM nodes LEFT JOIN s{t} ON nodes.id = s{t}.id, nn
)""")
    parts.append(f"""
SELECT id AS vec_id, pr FROM r{iters} ORDER BY vec_id""")
    return "".join(parts)


Q_SIMILARITY_PAGERANK_ORACLE = _pagerank_oracle()


# ---------------------------------------------------------------------------
# dedup keeper selection: highest-quality exemplar per near-dup cluster
# ---------------------------------------------------------------------------


def q_cluster_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup keeper pipeline composed end-to-end: MinHash-LSH
    pairs -> connected components -> per-cluster exemplar by quality
    score (tie-break doc_id) with cluster size. This is the row a
    curation job actually keeps; the oracle replays pair generation,
    the transitive closure, the quality score, and the keeper window
    in one SQL statement."""
    from pyspark.sql import Window

    from rootstock_collective_state_sync_spark.operators import dedup as D
    from rootstock_collective_state_sync_spark.operators.text import quality_score_e7

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    comp = D.connected_components(pairs, docs.select("doc_id"))
    scored = docs.select(
        F.col("doc_id").alias("id"), quality_score_e7(F.col("text")).alias("q_e7")
    )
    j = comp.join(scored, "id")
    w = Window.partitionBy("component").orderBy(
        F.col("q_e7").desc(), F.col("id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("id").alias("exemplar_id"),
            F.col("q_e7").cast("bigint").alias("q_e7"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
        .orderBy("component")
    )


def _cluster_exemplars_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _QUALITY_E7_CTES,
        Q_DEDUP_CLUSTERS_ORACLE,
    )

    return f"""
WITH comp AS (
  SELECT * FROM ({Q_DEDUP_CLUSTERS_ORACLE})
),
q AS (
  SELECT qe7.doc_id AS id, qe7.score::BIGINT AS q_e7
  FROM (WITH {_QUALITY_E7_CTES.strip()} SELECT * FROM qe7) qe7
),
j AS (
  SELECT c.id, c.component, q.q_e7,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.q_e7 DESC, c.id ASC) AS rn,
         count(*) OVER (PARTITION BY c.component)::BIGINT AS cluster_size
  FROM comp c JOIN q ON c.id = q.id
)
SELECT component, id AS exemplar_id, q_e7, cluster_size
FROM j WHERE rn = 1 ORDER BY component
"""


Q_CLUSTER_EXEMPLARS_ORACLE = _cluster_exemplars_oracle()


# ---------------------------------------------------------------------------
# class centroids: per-label mean embedding as one wide aggregation
# ---------------------------------------------------------------------------

_EMB_DIM = 64


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the nearest-centroid classifier's
    model table), computed as a single 64-column wide aggregation —
    no per-dimension explode. Element-rounded, so the oracle replays
    every average exactly."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        label_centroids,
    )

    from rootstock_collective_state_sync_spark.plans.tables import (
        array_as_string,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb, dim=_EMB_DIM)
    # Final schema must be scalar-only (driver canonicalizer contract):
    # render the centroid array as a fixed-scale CSV string.
    return cents.select(
        "label",
        "n_members",
        array_as_string("centroid").alias("centroid_csv"),
    ).orderBy("label")


def _label_centroids_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.tables import (
        oracle_array_as_string,
    )

    cent_list = (
        "["
        + ", ".join(
            f"round(avg(embedding[{i + 1}]::DOUBLE), 6)" for i in range(64)
        )
        + "]"
    )
    return f"""
SELECT label, count(*)::BIGINT AS n_members,
       {oracle_array_as_string(cent_list)} AS centroid_csv
FROM embeddings GROUP BY label ORDER BY label
"""


Q_LABEL_CENTROIDS_ORACLE = _label_centroids_oracle()


def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification end-to-end: train (centroids =
    one wide agg) + infer (broadcast centroids, JVM zip_with scoring,
    argmin window) + evaluate (label x assigned confusion counts).
    The oracle replays training, scoring, argmin, and the confusion
    aggregation in one SQL statement."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb, dim=_EMB_DIM)
    assigned = nearest_centroid_assign(emb, cents)
    truth = emb.select(F.col("vec_id").alias("id"), F.col("label").alias("true_label"))
    return (
        assigned.join(truth, "id")
        .groupBy("true_label", "assigned")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "assigned")
    )


Q_NEAREST_CENTROID_CONFUSION_ORACLE = f"""
WITH cents AS (
  SELECT label AS assigned,
         [{", ".join(f"round(avg(embedding[{i + 1}]::DOUBLE), 6)" for i in range(64))}]
           AS cv
  FROM embeddings GROUP BY label
),
scored AS (
  SELECT e.vec_id AS id, e.label AS true_label, c.assigned,
         round(list_sum(list_transform(range(1, 65),
             i -> (e.embedding[i]::DOUBLE - c.cv[i])
                * (e.embedding[i]::DOUBLE - c.cv[i]))), 6) AS sq_l2
  FROM embeddings e, cents c
),
arg AS (
  SELECT id, true_label, assigned,
         row_number() OVER (PARTITION BY id
                            ORDER BY sq_l2 ASC, assigned ASC) AS rn
  FROM scored
)
SELECT true_label, assigned, count(*)::BIGINT AS n
FROM arg WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# funnel conversion: the batch twin of the stream-stream interval join
# ---------------------------------------------------------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase-within-1h funnel over the event log — the
    BATCH form of :func:`..streaming.joins.followup_events` (tested
    batch==stream in tests/test_streaming_joins.py), rolled up to
    per-hour-of-day conversion counts. Driver-checking this query
    value-checks the interval-join semantics the streaming path
    shares."""
    from rootstock_collective_state_sync_spark.streaming.joins import (
        followup_events,
    )

    ev = load_table(spark, sf_dir, "events")
    joined = followup_events(ev)
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.hour("ts").alias("hr"), F.col("event_id").alias("l_event_id")
    )
    conv = (
        joined.select("l_event_id").distinct()
    )
    return (
        signups.join(conv, "l_event_id", "left")
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count(conv["l_event_id"]).alias("n_converted"),
        )
        .orderBy("hr")
    )


Q_FUNNEL_CONVERSION_ORACLE = """
WITH s AS (
  SELECT event_id AS l_event_id, user_id, ts, hour(ts) AS hr
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT DISTINCT s.l_event_id
  FROM s JOIN p ON p.user_id = s.user_id
   AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
)
SELECT s.hr, count(*)::BIGINT AS n_signups,
       count(conv.l_event_id)::BIGINT AS n_converted
FROM s LEFT JOIN conv ON s.l_event_id = conv.l_event_id
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Gopher repetition signals (the other half of the §A1.1 table)
# ---------------------------------------------------------------------------


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition audit: duplicate-line fractions,
    top-2-gram coverage, duplicated-3-gram coverage, per-rule flags and
    the ``rep_keep`` conjunction. One tagged gram explode, one counted
    shuffle, one per-doc rollup — linear at any corpus size; the
    oracle replays every count, the struct-max tie-break, and every
    threshold in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    out = RL.repetition_signals(docs)
    rule_cols = [c for c in out.columns if c.startswith(("rule_", "rep_"))]
    return out.select(
        "doc_id",
        "n_lines",
        "token_chars",
        "frac_dup_lines",
        "frac_dup_line_chars",
        "top_bigram_char_frac",
        "dup_trigram_char_frac",
        *[F.col(c).cast("int").alias(c) for c in rule_cols],
    ).orderBy("doc_id")


Q_REPETITION_SIGNALS_ORACLE = """
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                     x -> trim(x)), x -> x <> '') AS lns,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
meta AS (
  SELECT doc_id, len(lns)::BIGINT AS n_lines,
         coalesce(list_sum(list_transform(toks,
                  t -> length(t)::BIGINT)), 0)::BIGINT AS token_chars
  FROM base
),
occ AS (
  SELECT doc_id, 'L' AS kind, unnest(lns) AS g FROM base
  UNION ALL
  SELECT doc_id, 'B', unnest(list_transform(range(len(toks) - 1),
           i -> toks[i + 1] || ' ' || toks[i + 2]))
  FROM base WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id, 'T', unnest(list_transform(range(len(toks) - 2),
           i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))
  FROM base WHERE len(toks) >= 3
),
cnt AS (
  SELECT doc_id, kind, g, count(*)::BIGINT AS c
  FROM occ GROUP BY doc_id, kind, g
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN kind = 'L' THEN c END) AS line_occ,
         sum(CASE WHEN kind = 'L' THEN c - 1 END) AS dup_line_occ,
         sum(CASE WHEN kind = 'L' THEN c * length(g) END) AS line_chars,
         sum(CASE WHEN kind = 'L' THEN (c - 1) * length(g) END)
           AS dup_line_chars,
         max(CASE WHEN kind = 'B' AND c > 1 THEN
             {'c': c, 'l': length(g)::BIGINT - 1, 'v': g} END) AS topb,
         sum(CASE WHEN kind = 'T' THEN c * (length(g) - 2) END) AS tri_chars,
         sum(CASE WHEN kind = 'T' AND c > 1 THEN c * (length(g) - 2) END)
           AS dup_tri_chars
  FROM cnt GROUP BY doc_id
),
f AS (
  SELECT m.doc_id, m.n_lines, m.token_chars,
         round(coalesce(dup_line_occ, 0)::DOUBLE
               / greatest(coalesce(line_occ, 0), 1), 6) AS frac_dup_lines,
         round(coalesce(dup_line_chars, 0)::DOUBLE
               / greatest(coalesce(line_chars, 0), 1), 6)
           AS frac_dup_line_chars,
         round(coalesce(topb.c * topb.l, 0)::DOUBLE
               / greatest(m.token_chars, 1), 6) AS top_bigram_char_frac,
         round(coalesce(dup_tri_chars, 0)::DOUBLE
               / greatest(coalesce(tri_chars, 0), 1), 6)
           AS dup_trigram_char_frac
  FROM meta m LEFT JOIN sig s ON m.doc_id = s.doc_id
)
SELECT doc_id, n_lines, token_chars, frac_dup_lines, frac_dup_line_chars,
       top_bigram_char_frac, dup_trigram_char_frac,
       (frac_dup_lines <= 0.30)::INTEGER AS rule_dup_lines,
       (frac_dup_line_chars <= 0.20)::INTEGER AS rule_dup_line_chars,
       (top_bigram_char_frac <= 0.20)::INTEGER AS rule_top_bigram,
       (dup_trigram_char_frac <= 0.18)::INTEGER AS rule_dup_trigram,
       (frac_dup_lines <= 0.30 AND frac_dup_line_chars <= 0.20
        AND top_bigram_char_frac <= 0.20
        AND dup_trigram_char_frac <= 0.18)::INTEGER AS rep_keep
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# CCNet-style cross-document line dedup (boilerplate strip)
# ---------------------------------------------------------------------------


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip lines shared by >= 3 distinct documents and return every
    cleaned document (full text hash-compared), plus removal audit
    counts. The Spark plan joins on 8-byte xxhash64 line keys; the
    oracle replays the same semantics keyed on the line strings
    themselves — a value-hash match proves the hashed join loses
    nothing on this corpus."""
    from rootstock_collective_state_sync_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    return (
        DD.strip_boilerplate_lines(docs, min_docs=3)
        .select("doc_id", "text", "n_lines", "n_removed", "frac_removed")
        .orderBy("doc_id")
    )


Q_LINE_DEDUP_ORACLE = """
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                     x -> trim(x)), x -> x <> '') AS lns
  FROM documents
),
ph AS (SELECT doc_id, unnest(lns) AS g FROM base),
boiler AS (
  SELECT g FROM ph GROUP BY g HAVING count(DISTINCT doc_id) >= 3
),
bset AS (SELECT coalesce(list(g), []) AS bs FROM boiler)
SELECT b.doc_id,
       array_to_string(list_filter(b.lns, l -> NOT list_contains(bs, l)),
                       chr(10)) AS text,
       len(b.lns)::BIGINT AS n_lines,
       (len(b.lns) - len(list_filter(b.lns,
            l -> NOT list_contains(bs, l))))::BIGINT AS n_removed,
       round((len(b.lns) - len(list_filter(b.lns,
            l -> NOT list_contains(bs, l))))::DOUBLE
            / greatest(len(b.lns), 1), 6) AS frac_removed
FROM base b CROSS JOIN bset
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Bloom-pruned selective join
# ---------------------------------------------------------------------------


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer for ONE market segment's customers, with
    the orders fact Bloom-pruned at scan time before any exchange.
    Bloom false positives are removed by the join itself, so the
    oracle is the plain SQL join — a value match proves the pruning
    is lossless end-to-end."""
    from rootstock_collective_state_sync_spark.operators.bloom import (
        bloom_pruned_join,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        bloom_pruned_join(orders, cust, on="o_custkey", m_bits=1 << 16)
        .groupBy("o_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .orderBy("o_custkey")
    )


Q_BLOOM_PRUNED_JOIN_ORACLE = """
SELECT o.o_custkey, c.c_name,
       count(*)::BIGINT AS n_orders,
       round(sum(o.o_totalprice), 2) AS sum_total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_custkey, c.c_name
ORDER BY o.o_custkey
"""


# ---------------------------------------------------------------------------
# semi-supervised label propagation over the kNN graph
# ---------------------------------------------------------------------------


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold out every 5th vector's label, propagate hard labels over
    the kNN cosine graph for 3 synchronous rounds, report per-node
    outcome. Edge build + every round unrolled in the oracle."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    return G.label_propagation(emb, k=3, iters=3, seed_mod=5).orderBy("id")


def _label_prop_oracle(k: int = 3, iters: int = 3, mod: int = 5) -> str:
    parts = [f"""
WITH scored AS (
  SELECT q.vec_id AS src, c.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS s
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
base AS (
  SELECT vec_id AS id, label AS label_true,
         (vec_id % {mod} <> 0) AS seeded
  FROM embeddings
),
l0 AS (SELECT id, CASE WHEN seeded THEN label_true END AS cur FROM base)"""]
    for r in range(1, iters + 1):
        parts.append(f""",
v{r} AS (
  SELECT e.src AS id, l.cur AS lbl, count(*)::BIGINT AS n
  FROM e JOIN l{r - 1} l ON l.id = e.dst
  WHERE l.cur IS NOT NULL GROUP BY 1, 2
),
b{r} AS (
  SELECT id, min({{'negn': -n, 'lbl': lbl}}) AS m FROM v{r} GROUP BY id
),
l{r} AS (
  SELECT base.id,
         CASE WHEN base.seeded THEN base.label_true
              ELSE coalesce(b.m.lbl, p.cur) END AS cur
  FROM base
  LEFT JOIN b{r} b USING (id)
  JOIN l{r - 1} p USING (id)
)""")
    parts.append(f"""
SELECT base.id, base.label_true, base.seeded::INTEGER AS seeded,
       l.cur AS label_prop,
       CASE WHEN l.cur IS NOT NULL
            THEN (l.cur = base.label_true)::INTEGER END AS correct
FROM base JOIN l{iters} l USING (id)
ORDER BY base.id""")
    return "".join(parts)


Q_LABEL_PROPAGATION_ORACLE = _label_prop_oracle()


# ---------------------------------------------------------------------------
# k-center coreset (greedy farthest-point)
# ---------------------------------------------------------------------------


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-point diversity coreset by greedy farthest-point traversal —
    every greedy round (argmax with ties -> smallest id, running min
    of rounded squared distances) unrolled in the oracle."""
    from rootstock_collective_state_sync_spark.operators.similarity import (
        kcenter_coreset,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=8).orderBy("round")


def _kcenter_oracle(k: int = 8) -> str:
    d2 = _SQL2_SQL.format(a="e.embedding", b="s.v")
    parts = [f"""
WITH c1 AS (SELECT min(vec_id) AS id FROM embeddings),
s1 AS (
  SELECT e.embedding AS v FROM embeddings e JOIN c1 ON e.vec_id = c1.id
),
d1 AS MATERIALIZED (
  SELECT e.vec_id AS id, e.embedding AS v, {d2} AS d
  FROM embeddings e CROSS JOIN s1 s
),
ch1 AS (SELECT id FROM c1)"""]
    for r in range(2, k + 1):
        d2r = _SQL2_SQL.format(a="e.v", b="s.v")
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT id, d FROM d{r - 1}
  WHERE id NOT IN (SELECT id FROM ch{r - 1})
  ORDER BY d DESC, id ASC LIMIT 1
),
ch{r} AS MATERIALIZED (
  SELECT id FROM ch{r - 1} UNION SELECT id FROM p{r}
),
s{r} AS (SELECT d.v FROM d{r - 1} d JOIN p{r} USING (id)),
d{r} AS MATERIALIZED (
  SELECT e.id, e.v, least(e.d, {d2r}) AS d
  FROM d{r - 1} e CROSS JOIN s{r} s
)""")
    rounds = ["SELECT 1 AS \"round\", id AS vec_id, 0.0 AS dist_sq FROM c1"]
    rounds += [
        f'SELECT {r} AS "round", id AS vec_id, d AS dist_sq FROM p{r}'
        for r in range(2, k + 1)
    ]
    parts.append(
        '\nSELECT * FROM (' + "\nUNION ALL\n".join(rounds)
        + ') ORDER BY "round"'
    )
    return "".join(parts)


Q_KCENTER_CORESET_ORACLE = _kcenter_oracle()


# ---------------------------------------------------------------------------
# payment-card PII audit (Luhn-verified candidate runs)
# ---------------------------------------------------------------------------


def q_credit_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-verified card-number audit over a deterministic corpus
    derived from orders (the synthetic documents table carries no
    digit runs at all, which would make the driver row trivially
    0 = 0): each order renders one line with a 16-digit run built
    from its keys, so candidate extraction fires on every row and
    Luhn validity varies row-by-row. The oracle replays the text
    construction, the candidate regex, and the checksum digit-for-
    digit."""
    from rootstock_collective_state_sync_spark.operators.text import (
        luhn_audit,
    )

    orders = load_table(spark, sf_dir, "orders")
    d16 = F.concat(
        F.lpad(F.pmod(F.col("o_orderkey"), F.lit(100000000)).cast("string"), 8, "0"),
        F.lpad(F.pmod(F.col("o_custkey"), F.lit(100000000)).cast("string"), 8, "0"),
    )
    corpus = orders.select(
        F.col("o_orderkey").alias("doc_id"),
        F.concat(
            F.lit("invoice "),
            F.col("o_orderkey").cast("string"),
            F.lit(" card "),
            d16,
            F.lit(" ok"),
        ).alias("text"),
    )
    return luhn_audit(corpus).orderBy("doc_id")


Q_CREDIT_CARD_AUDIT_ORACLE = r"""
WITH corpus AS (
  SELECT o_orderkey AS doc_id,
         'invoice ' || o_orderkey::VARCHAR || ' card '
           || lpad((o_orderkey % 100000000)::VARCHAR, 8, '0')
           || lpad((o_custkey % 100000000)::VARCHAR, 8, '0')
           || ' ok' AS text
  FROM orders
),
c AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\b\d(?:[- ]?\d){12,18}\b')) AS cand
  FROM corpus
),
d AS (SELECT doc_id, regexp_replace(cand, '[^0-9]', '', 'g') AS dg FROM c),
v AS (
  SELECT doc_id,
    CASE WHEN list_sum(list_transform(range(0, length(dg)), i ->
      CASE WHEN i % 2 = 1 THEN
        CASE WHEN 2 * (ascii(substr(reverse(dg), i + 1, 1)) - 48) > 9
             THEN 2 * (ascii(substr(reverse(dg), i + 1, 1)) - 48) - 9
             ELSE 2 * (ascii(substr(reverse(dg), i + 1, 1)) - 48) END
      ELSE ascii(substr(reverse(dg), i + 1, 1)) - 48 END)) % 10 = 0
    THEN 1 ELSE 0 END AS ok
  FROM d
)
SELECT t.doc_id,
       count(v.ok)::BIGINT AS n_candidates,
       coalesce(sum(v.ok), 0)::BIGINT AS n_luhn_valid
FROM corpus t LEFT JOIN v USING (doc_id)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Flesch readability screen
# ---------------------------------------------------------------------------


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch-reading-ease screen (Flesch 1948), e3-snapped
    integer arithmetic so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree bit-for-bit (all terms are clamped
    nonnegative). See :func:`..operators.text.readability_scores` —
    three JVM regex passes, zero shuffle."""
    from rootstock_collective_state_sync_spark.operators.text import (
        readability_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return readability_scores(docs).orderBy("id")


Q_READABILITY_ORACLE = """
WITH c AS (
  SELECT doc_id AS id,
         greatest(len(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x <> '')), 1)::BIGINT AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
           AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS n_syllables
  FROM documents
)
SELECT id, n_words, n_sentences, n_syllables,
       greatest(least(
         206835
         - 1015 * ((n_words * 1000) // n_sentences) // 1000
         - 84600 * ((n_syllables * 1000) // n_words) // 1000,
         206835), 0)::BIGINT AS flesch_e3
FROM c ORDER BY id
"""


# ---------------------------------------------------------------------------
# C4 cleaning-rule audit
# ---------------------------------------------------------------------------


def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document C4 rule audit (Raffel et al. 2020 §2.2): kept-line
    census (terminal punctuation + >=5 words), sentence floor, lorem /
    brace / javascript flags, aggregate keep. All-JVM HOF projection;
    the oracle replays every rule. See
    :func:`..operators.rules.c4_quality`."""
    from rootstock_collective_state_sync_spark.operators.rules import c4_quality

    docs = load_table(spark, sf_dir, "documents")
    return c4_quality(docs).orderBy("doc_id")


Q_C4_QUALITY_ORACLE = """
WITH l AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lns FROM documents
),
f AS (
  SELECT doc_id,
    len(lns)::BIGINT AS n_lines,
    len(list_filter(lns, x -> regexp_matches(rtrim(x), '[.!?"]$')
        AND len(list_filter(string_split_regex(x, '[ \t\r]+'),
                            w -> w <> '')) >= 5))::BIGINT AS n_kept_lines,
    len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
    len(list_filter(lns, x -> contains(lower(x), 'javascript')))::BIGINT
      AS n_js_lines,
    contains(lower(text), 'lorem ipsum')::INTEGER AS has_lorem,
    contains(text, '{')::INTEGER AS has_brace
  FROM l
)
SELECT doc_id, n_lines, n_kept_lines,
       (n_kept_lines * 1000000 // greatest(n_lines, 1))::BIGINT
         AS frac_kept_e6,
       n_sentences, n_js_lines, has_lorem, has_brace,
       (n_sentences >= 3)::INTEGER AS rule_min_sentences,
       (has_lorem = 0)::INTEGER AS rule_no_lorem,
       (has_brace = 0)::INTEGER AS rule_no_brace,
       (n_js_lines = 0)::INTEGER AS rule_no_javascript,
       (n_kept_lines >= 1)::INTEGER AS rule_any_kept_line,
       (n_sentences >= 3 AND has_lorem = 0 AND has_brace = 0
        AND n_js_lines = 0 AND n_kept_lines >= 1)::INTEGER AS c4_keep
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Unicode script census
# ---------------------------------------------------------------------------


def q_script_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class census + dominant script (pure JVM
    regex arithmetic, zero shuffle). See
    :func:`..operators.text.script_census`."""
    from rootstock_collective_state_sync_spark.operators.text import script_census

    docs = load_table(spark, sf_dir, "documents")
    return script_census(docs).orderBy("doc_id")


def _script_census_oracle() -> str:
    from rootstock_collective_state_sync_spark.operators.text import SCRIPT_RANGES

    cnt = "(length(text) - length(regexp_replace(text, '{p}', '', 'g')))::BIGINT"
    script_cols = ",\n         ".join(
        cnt.format(p=SCRIPT_RANGES[n][1]) + f" AS n_{n}"
        for n in sorted(SCRIPT_RANGES)
    )
    names = sorted(SCRIPT_RANGES)
    known = " + ".join([f"n_{n}" for n in names] + ["n_digit", "n_space", "n_punct_ascii"])
    # argmax with ascending-name tie-break: test names in ascending
    # order with >= max(rest) — the first (smallest) name among the
    # maxima wins, exactly the Spark loop's semantics
    branches = []
    for n in names:
        rest = ", ".join(f"n_{m}" for m in names if m != n)
        branches.append(f"WHEN n_{n} >= greatest({rest}) THEN '{n}'")
    case = (
        f"CASE WHEN greatest({', '.join('n_' + n for n in names)}) = 0 "
        f"THEN 'none' " + " ".join(branches) + " END"
    )
    digit_cnt = cnt.format(p="[0-9]")
    space_cnt = cnt.format(p="[ \t\n\r]")
    punct_cnt = cnt.format(p="[!-/:-@[-`{-~]")
    return f"""
WITH c AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         {script_cols},
         {digit_cnt} AS n_digit,
         {space_cnt} AS n_space,
         {punct_cnt} AS n_punct_ascii
  FROM documents
)
SELECT doc_id, n_chars,
       {', '.join('n_' + n for n in names)},
       n_digit, n_space, n_punct_ascii,
       (n_chars - ({known}))::BIGINT AS n_other,
       {case} AS main_script
FROM c ORDER BY doc_id
"""


Q_SCRIPT_CENSUS_ORACLE = _script_census_oracle()


# ---------------------------------------------------------------------------
# lang-id agreement (Cohen's kappa vs the declared lang column)
# ---------------------------------------------------------------------------


def q_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between the declared ``lang`` column
    and the heuristic :func:`..operators.text.lang_id` prediction —
    the label-QC row an annotation pipeline reports. Exact e6
    fixed-point; see :func:`..operators.evaluate.cohens_kappa`."""
    from rootstock_collective_state_sync_spark.operators.evaluate import cohens_kappa
    from rootstock_collective_state_sync_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("lang_true"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
    return cohens_kappa(pred, "lang_true", "lang_pred")


Q_LANG_ID_AGREEMENT_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, tok.lang AS t_lang, l.lang AS cand,
         round(len(list_intersect(list_distinct(toks), l.words))::DOUBLE
               / greatest(len(toks), 1), 6) AS score
  FROM tok, (VALUES ('en', ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for']), ('de', ['der', 'die', 'das', 'und', 'ist', 'ein', 'eine', 'zu', 'mit', 'von']), ('fr', ['le', 'la', 'les', 'et', 'est', 'un', 'une', 'de', 'du', 'pour']), ('es', ['el', 'la', 'los', 'las', 'es', 'un', 'una', 'de', 'que', 'para'])) l(lang, words)
),
ranked AS (
  SELECT doc_id, t_lang, cand, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand ASC) AS rn
  FROM scores
),
pred AS (
  SELECT doc_id, t_lang,
         CASE WHEN score > 0 THEN cand ELSE 'und' END AS p_lang
  FROM ranked WHERE rn = 1
),
base AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum((t_lang = p_lang)::INTEGER)::BIGINT AS n_agree
  FROM pred
),
rowm AS (SELECT t_lang AS lab, count(*)::BIGINT AS r FROM pred GROUP BY 1),
colm AS (SELECT p_lang AS lab, count(*)::BIGINT AS c FROM pred GROUP BY 1),
pe AS (
  SELECT coalesce(sum(r * c), 0)::BIGINT AS rc
  FROM rowm JOIN colm USING (lab)
),
m AS (
  SELECT n_docs, n_agree,
         (n_agree * 1000000 // n_docs)::BIGINT AS po_e6,
         (rc * 1000000 // (n_docs * n_docs))::BIGINT AS pe_e6
  FROM base, pe
)
SELECT n_docs, n_agree, po_e6, pe_e6,
       (CASE WHEN 1000000 - pe_e6 = 0 THEN 0
             ELSE (CASE WHEN po_e6 >= pe_e6 THEN 1 ELSE -1 END)
                  * (abs(po_e6 - pe_e6) * 1000000 // (1000000 - pe_e6))
        END)::BIGINT AS kappa_e6
FROM m
"""


# ---------------------------------------------------------------------------
# kNN-graph triangle census / clustering coefficients
# ---------------------------------------------------------------------------


def q_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per node of the
    kNN cosine graph (same deterministic edge build as
    `similarity_pagerank`): the template-neighborhood detector. The
    oracle replays the edge build, the oriented wedge closure, and
    the e6 coefficient exactly."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges(emb, k=_PR_K)
    return (
        G.triangle_counts(edges)
        .select(F.col("id").alias("vec_id"), "degree", "n_triangles", "cc_e6")
        .orderBy("vec_id")
    )


def _knn_triangles_oracle(k: int = _PR_K) -> str:
    return f"""
WITH scored AS (
  SELECT q.vec_id AS src, c.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS s
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
und AS MATERIALIZED (SELECT src, dst FROM e WHERE src < dst),
tri AS (
  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM und ab
  JOIN und bc ON ab.dst = bc.src
  JOIN und ac ON ac.src = ab.src AND ac.dst = bc.dst
),
pern AS (
  SELECT id, count(*)::BIGINT AS n_triangles FROM (
    SELECT a AS id FROM tri
    UNION ALL SELECT b AS id FROM tri
    UNION ALL SELECT c AS id FROM tri
  ) GROUP BY 1
),
deg AS (SELECT src AS id, count(*)::BIGINT AS degree FROM e GROUP BY 1)
SELECT d.id AS vec_id, d.degree,
       coalesce(p.n_triangles, 0)::BIGINT AS n_triangles,
       (CASE WHEN d.degree < 2 THEN 0
             ELSE (2 * coalesce(p.n_triangles, 0) * 1000000)
                  // (d.degree * (d.degree - 1)) END)::BIGINT AS cc_e6
FROM deg d LEFT JOIN pern p USING (id)
ORDER BY vec_id
"""


Q_KNN_TRIANGLES_ORACLE = _knn_triangles_oracle()


def q_knn_triangles_celled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `knn_triangles`: the kNN edges come from the
    cell-confined IVF build (one corpus shuffle on `cell`,
    O(n·cell_size) candidates — never n²), then the same oriented
    wedge closure. Both the quantizer and the in-cell ranking are
    deterministic, so the full chain is value-oracled — the brute
    twin stays as the exact baseline, like `ann_cosine_topk` vs
    `ann_ivf_topk`."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges_celled(emb, k=_PR_K, num_cells="auto", nprobe=_CELL_NPROBE)
    return (
        G.triangle_counts(edges)
        .select(F.col("id").alias("vec_id"), "degree", "n_triangles", "cc_e6")
        .orderBy("vec_id")
    )


def _knn_triangles_celled_oracle(k: int = _PR_K) -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _ivf_cells_oracle,
    )

    return _ivf_cells_oracle(tail=f""",
tagged AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
probes AS MATERIALIZED (
  SELECT vec_id, c AS pcell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS prn
    FROM fdot
  ) WHERE prn <= {_CELL_NPROBE}
),
scored AS (
  SELECT q.vec_id AS src, t.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="t.embedding")} AS s
  FROM tagged q
  JOIN probes p ON p.vec_id = q.vec_id
  JOIN tagged t ON t.cell = p.pcell AND t.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
und AS MATERIALIZED (SELECT src, dst FROM e WHERE src < dst),
tri AS (
  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM und ab
  JOIN und bc ON ab.dst = bc.src
  JOIN und ac ON ac.src = ab.src AND ac.dst = bc.dst
),
pern AS (
  SELECT id, count(*)::BIGINT AS n_triangles FROM (
    SELECT a AS id FROM tri
    UNION ALL SELECT b AS id FROM tri
    UNION ALL SELECT c AS id FROM tri
  ) GROUP BY 1
),
deg AS (SELECT src AS id, count(*)::BIGINT AS degree FROM e GROUP BY 1)
SELECT d.id AS vec_id, d.degree,
       coalesce(p.n_triangles, 0)::BIGINT AS n_triangles,
       (CASE WHEN d.degree < 2 THEN 0
             ELSE (2 * coalesce(p.n_triangles, 0) * 1000000)
                  // (d.degree * (d.degree - 1)) END)::BIGINT AS cc_e6
FROM deg d LEFT JOIN pern p USING (id)
ORDER BY vec_id""")


Q_KNN_TRIANGLES_CELLED_ORACLE = _knn_triangles_celled_oracle()


_KCORE_K = 4
_KCORE_ROUNDS = 6


def q_kcore_celled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peel (Seidman 1983) over the IVF
    cell-confined kNN graph — the community-density screen next to
    the triangle/assortativity censuses. The fixed 6-round unroll is
    one lazy plan the DuckDB oracle replays CTE-for-CTE, so the
    BOUNDED peel (a monotone-shrinking superset of the true k-core;
    see :func:`..operators.graph.kcore_bounded`) is value-checked
    round-for-round; per-round semantics are additionally pinned
    against a pure-Python reference peel in
    ``tests/test_graph.py::test_kcore_bounded_matches_reference``."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges_celled(
        emb, k=_PR_K, num_cells="auto", nprobe=_CELL_NPROBE
    )
    return (
        G.kcore_bounded(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
        .select(
            F.col("id").alias("vec_id"),
            "in_core",
            "core_degree",
        )
        .orderBy("vec_id")
    )


def _kcore_celled_oracle(
    k: int = _PR_K, kk: int = _KCORE_K, rounds: int = _KCORE_ROUNDS
) -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _ivf_cells_oracle,
    )

    peel = []
    for i in range(1, rounds + 1):
        prev = f"e{i - 1}"
        peel.append(
            f"""d{i} AS (SELECT src AS id, count(*) AS d FROM {prev} GROUP BY 1),
k{i} AS (SELECT id FROM d{i} WHERE d >= {kk}),
e{i} AS MATERIALIZED (
  SELECT t.src, t.dst FROM {prev} t
  JOIN k{i} a ON a.id = t.src JOIN k{i} b ON b.id = t.dst
)"""
        )
    peeled = ",\n".join(peel)
    return _ivf_cells_oracle(tail=f""",
tagged AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
probes AS MATERIALIZED (
  SELECT vec_id, c AS pcell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS prn
    FROM fdot
  ) WHERE prn <= {_CELL_NPROBE}
),
scored AS (
  SELECT q.vec_id AS src, t.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="t.embedding")} AS s
  FROM tagged q
  JOIN probes p ON p.vec_id = q.vec_id
  JOIN tagged t ON t.cell = p.pcell AND t.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e0 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
{peeled},
fin AS (
  SELECT src AS id, count(*)::BIGINT AS core_degree
  FROM e{rounds} GROUP BY 1
),
nodes AS (SELECT DISTINCT src AS id FROM e0)
SELECT n.id AS vec_id,
       (f.id IS NOT NULL)::INT AS in_core,
       coalesce(f.core_degree, 0)::BIGINT AS core_degree
FROM nodes n LEFT JOIN fin f ON f.id = n.id
ORDER BY vec_id""")


Q_KCORE_CELLED_ORACLE = _kcore_celled_oracle()


def q_similarity_pagerank_celled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `similarity_pagerank`: identical integer
    fixed-point iterations over the IVF cell-confined kNN edges (one
    corpus shuffle on `cell` instead of the n² brute edge build —
    same trade as `knn_triangles_celled`). Every stage remains
    deterministic and fully SQL-replayed."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges_celled(emb, k=_PR_K, num_cells="auto", nprobe=_CELL_NPROBE)
    return (
        G.pagerank_fixed(edges, iters=_PR_ITERS, damping_pct=_PR_DAMPING)
        .select(F.col("id").alias("vec_id"), "pr")
        .orderBy("vec_id")
    )


def _pagerank_celled_oracle(
    k: int = _PR_K, iters: int = _PR_ITERS, damping: int = _PR_DAMPING
) -> str:
    from rootstock_collective_state_sync_spark.operators.graph import PR_SCALE
    from rootstock_collective_state_sync_spark.plans.training import (
        _ivf_cells_oracle,
    )

    parts = [f""",
tagged AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
probes AS MATERIALIZED (
  SELECT vec_id, c AS pcell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS prn
    FROM fdot
  ) WHERE prn <= {_CELL_NPROBE}
),
scored AS (
  SELECT q.vec_id AS src, t.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="t.embedding")} AS s
  FROM tagged q
  JOIN probes p ON p.vec_id = q.vec_id
  JOIN tagged t ON t.cell = p.pcell AND t.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
deg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
r0 AS MATERIALIZED (SELECT id, ({PR_SCALE} // n)::BIGINT AS pr FROM nodes, nn)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
s{t} AS (
  SELECT e.dst AS id, sum(r.pr // d.deg)::BIGINT AS s
  FROM e JOIN r{t - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY 1
),
r{t} AS MATERIALIZED (
  SELECT nodes.id,
         (((100 - {damping})::BIGINT * {PR_SCALE}) // (100 * nn.n)
          + ({damping} * coalesce(s{t}.s, 0)) // 100)::BIGINT AS pr
  FROM nodes LEFT JOIN s{t} ON nodes.id = s{t}.id, nn
)""")
    parts.append(f"""
SELECT id AS vec_id, pr FROM r{iters} ORDER BY vec_id""")
    return _ivf_cells_oracle(tail="".join(parts))


Q_SIMILARITY_PAGERANK_CELLED_ORACLE = _pagerank_celled_oracle()


def q_label_propagation_celled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `label_propagation`: identical hard-label
    majority rounds over the IVF cell-confined kNN edges (the same
    edge-build swap as `similarity_pagerank_celled`); quantizer, edge
    build, and every round replayed in the composed oracle."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    edges = G.knn_edges_celled(emb, k=3, num_cells="auto", nprobe=_CELL_NPROBE)
    return G.label_propagation(
        emb, k=3, iters=3, seed_mod=5, _edges=edges
    ).orderBy("id")


def _label_prop_celled_oracle(k: int = 3, iters: int = 3, mod: int = 5) -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _ivf_cells_oracle,
    )

    parts = [f""",
tagged AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
probes AS MATERIALIZED (
  SELECT vec_id, c AS pcell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS prn
    FROM fdot
  ) WHERE prn <= {_CELL_NPROBE}
),
scored AS (
  SELECT q.vec_id AS src, t.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="t.embedding")} AS s
  FROM tagged q
  JOIN probes p ON p.vec_id = q.vec_id
  JOIN tagged t ON t.cell = p.pcell AND t.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
base AS (
  SELECT vec_id AS id, label AS label_true,
         (vec_id % {mod} <> 0) AS seeded
  FROM embeddings
),
l0 AS (SELECT id, CASE WHEN seeded THEN label_true END AS cur FROM base)"""]
    for r in range(1, iters + 1):
        parts.append(f""",
v{r} AS (
  SELECT e.src AS id, l.cur AS lbl, count(*)::BIGINT AS n
  FROM e JOIN l{r - 1} l ON l.id = e.dst
  WHERE l.cur IS NOT NULL GROUP BY 1, 2
),
b{r} AS (
  SELECT id, min({{'negn': -n, 'lbl': lbl}}) AS m FROM v{r} GROUP BY id
),
l{r} AS (
  SELECT base.id,
         CASE WHEN base.seeded THEN base.label_true
              ELSE coalesce(b.m.lbl, p.cur) END AS cur
  FROM base
  LEFT JOIN b{r} b USING (id)
  JOIN l{r - 1} p USING (id)
)""")
    parts.append(f"""
SELECT base.id, base.label_true, base.seeded::INTEGER AS seeded,
       l.cur AS label_prop,
       CASE WHEN l.cur IS NOT NULL
            THEN (l.cur = base.label_true)::INTEGER END AS correct
FROM base JOIN l{iters} l USING (id)
ORDER BY base.id""")
    return _ivf_cells_oracle(tail="".join(parts))


Q_LABEL_PROPAGATION_CELLED_ORACLE = _label_prop_celled_oracle()


# ---------------------------------------------------------------------------
# Degree-mixing census: assortativity of the celled kNN graph
# ---------------------------------------------------------------------------


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree summary + Pearson degree assortativity (Newman 2002) of
    the cell-confined kNN cosine graph — does the similarity graph
    wire hubs to hubs (r > 0, clique-prone corpora) or hubs to leaves
    (r < 0)? Over the symmetric directed edge set with endpoint
    degrees j, k: ``r = (4·M·Σjk − (Σ(j+k))²) / (2·M·Σ(j²+k²) −
    (Σ(j+k))²)`` — an EXACT integer rational (per-edge sums are
    integers; the one division happens at e6 at the very end with the
    kappa-style sign split), so the statistic is value-checked
    bit-for-bit.

    Scale shape: the celled edge build is the audited one-shuffle
    O(n·cell) path shared with `knn_triangles_celled`; degrees are one
    map-side-combined count; the moment sums are one edge-keyed join
    against the broadcast-joinable degree table + a single aggregation;
    the final combine is 1-row x 1-row (control-plane cross of two
    scalar aggregates). DECIMAL(38,0) holds the M-scaled products far
    past bigint range."""
    from rootstock_collective_state_sync_spark.operators import graph as G

    emb = load_table(spark, sf_dir, "embeddings")
    e = G.knn_edges_celled(emb, k=_PR_K, num_cells="auto", nprobe=_CELL_NPROBE)
    return _assortativity_over(e)


def _assortativity_over(e: DataFrame) -> DataFrame:
    """The degree-mixing census over an explicit symmetric edge set —
    shared by the rebuild query above and the edge-store twin
    (`q_assortativity_from_edges`).

    The edge set is pinned first (r18, guide §5/§2.4): the census
    references it FOUR ways (degree count, both endpoint joins, the
    node spine), so un-pinned the r17 physical plan held the entire
    celled-kNN build 4x (4 FlatMapGroupsInPandas / 38 Exchange / 525
    plan lines for a one-row output) and the optimizer chewed all
    four copies on every run — the dominant term of the rebuild
    canary was driver planning, not execution. With the
    InMemoryRelation substituted the consumers are leaf-sized; edges
    are two longs per row, the cheapest frame in the query to hold."""
    from rootstock_collective_state_sync_spark.caching import tracked_persist

    e = tracked_persist(e)
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ej = (
        e.join(deg.select(F.col("id").alias("src"), F.col("d").alias("dj")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dk")), "dst")
    )
    sums = ej.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("dj") * F.col("dk")).cast("long").alias("a"),
        F.sum(F.col("dj") + F.col("dk")).cast("long").alias("b"),
        F.sum(F.col("dj") * F.col("dj") + F.col("dk") * F.col("dk"))
        .cast("long")
        .alias("c"),
    )
    nodes = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum("d").cast("long").alias("_dsum"),
    )
    num = (
        "CAST(4 AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))"
        " * CAST(a AS DECIMAL(38,0))"
        " - CAST(b AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))"
    )
    den = (
        "CAST(2 AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))"
        " * CAST(c AS DECIMAL(38,0))"
        " - CAST(b AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))"
    )
    return nodes.crossJoin(sums).select(
        "n_nodes",
        F.expr("m div 2").cast("long").alias("n_edges"),
        "min_degree",
        "max_degree",
        F.expr("_dsum * 1000000 div n_nodes").cast("long").alias("mean_degree_e6"),
        F.expr(
            f"CASE WHEN ({den}) = 0 THEN 0"
            f" ELSE (CASE WHEN ({num}) >= 0 THEN 1 ELSE -1 END)"
            f" * CAST(abs({num}) * 1000000 div ({den}) AS BIGINT) END"
        )
        .cast("long")
        .alias("assortativity_e6"),
    )


def _graph_assortativity_oracle(k: int = _PR_K) -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _ivf_cells_oracle,
    )

    return _ivf_cells_oracle(tail=f""",
tagged AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
probes AS MATERIALIZED (
  SELECT vec_id, c AS pcell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS prn
    FROM fdot
  ) WHERE prn <= {_CELL_NPROBE}
),
scored AS (
  SELECT q.vec_id AS src, t.vec_id AS dst,
         {_COS_SQL.format(a="q.embedding", b="t.embedding")} AS s
  FROM tagged q
  JOIN probes p ON p.vec_id = q.vec_id
  JOIN tagged t ON t.cell = p.pcell AND t.vec_id <> q.vec_id
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY s DESC, dst ASC) AS rn
  FROM scored
),
fwd AS (SELECT src, dst FROM rk WHERE rn <= {k}),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
  )
),
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM e GROUP BY 1),
ej AS (
  SELECT dj.d AS dj, dk.d AS dk
  FROM e JOIN deg dj ON dj.id = e.src JOIN deg dk ON dk.id = e.dst
),
sums AS (
  SELECT count(*)::BIGINT AS m,
         sum(dj * dk)::BIGINT AS a,
         sum(dj + dk)::BIGINT AS b,
         sum(dj * dj + dk * dk)::BIGINT AS c
  FROM ej
),
nodes AS (
  SELECT count(*)::BIGINT AS n_nodes,
         min(d)::BIGINT AS min_degree,
         max(d)::BIGINT AS max_degree,
         sum(d)::BIGINT AS dsum
  FROM deg
)
SELECT n_nodes,
       (m // 2)::BIGINT AS n_edges,
       min_degree, max_degree,
       (dsum * 1000000 // n_nodes)::BIGINT AS mean_degree_e6,
       (CASE WHEN (2::HUGEINT * m * c - b::HUGEINT * b) = 0 THEN 0
             ELSE (CASE WHEN (4::HUGEINT * m * a - b::HUGEINT * b) >= 0
                        THEN 1 ELSE -1 END)
                  * (abs(4::HUGEINT * m * a - b::HUGEINT * b) * 1000000
                     // (2::HUGEINT * m * c - b::HUGEINT * b))
        END)::BIGINT AS assortativity_e6
FROM nodes, sums""")


Q_GRAPH_ASSORTATIVITY_ORACLE = _graph_assortativity_oracle()


def q_audio_dynamics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dynamics census (X-M9) — the loudness-screen companion
    to X-M8's trim census: per clip, total exact integer energy, peak
    amplitude, silent-frame share (e6-floored), and the crest factor
    (peak / RMS, the compressed-vs-dynamic discriminator an audio
    curation run thresholds: pure tones sit near sqrt(2), heavily
    limited content near 1, speech well above). Composed ENTIRELY
    from `audio_frame_energy`'s frame table by one aggregation —
    decode runs once, no second Arrow pass; all inputs to the one
    e6-snapped double (crest) are exact integers, so the oracle
    replays it bit-for-bit."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    frames = M.audio_frame_energy(M.attach_wav_payload(docs), frame=16)
    per = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("total_energy"),
        F.max("peak").cast("long").alias("peak"),
        F.sum(F.col("is_silence").cast("long"))
        .cast("long")
        .alias("n_silent"),
    )
    rms = F.sqrt(
        F.col("total_energy").cast("double")
        / (F.col("n_frames").cast("double") * 16.0)
    )
    return per.select(
        "doc_id",
        "n_frames",
        "total_energy",
        "peak",
        F.expr("n_silent * 1000000 div n_frames")
        .cast("long")
        .alias("silence_share_e6"),
        F.when(
            F.col("total_energy") > 0,
            F.round(F.col("peak").cast("double") * 1e6 / rms, 0).cast("long"),
        ).alias("crest_e6"),
    ).orderBy("doc_id")


Q_AUDIO_DYNAMICS_ORACLE = f"""
WITH fr AS ({Q_AUDIO_FRAME_ENERGY_ORACLE.strip().rstrip()}),
per AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_frames,
         sum(energy)::BIGINT AS total_energy,
         max(peak)::BIGINT AS peak,
         sum(is_silence::BIGINT)::BIGINT AS n_silent
  FROM fr GROUP BY 1
)
SELECT doc_id, n_frames, total_energy, peak,
       (n_silent * 1000000 // n_frames)::BIGINT AS silence_share_e6,
       CASE WHEN total_energy > 0
            THEN round(peak * 1e6
                       / sqrt(total_energy::DOUBLE / (n_frames * 16.0))
                 )::BIGINT
       END AS crest_e6
FROM per ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# X-G9: build-once graph censuses over the materialized edge store
# ---------------------------------------------------------------------------
#
# The five *_from_edges twins below are VALUE-IDENTICAL to their
# rebuild-per-query originals (`kcore_celled`, `knn_triangles_celled`,
# `similarity_pagerank_celled`, `label_propagation_celled`,
# `graph_assortativity`) — the stored edge set equals a fresh
# `knn_edges_celled` build row-for-row by determinism of the whole
# chain — so each twin reuses the original composed k-means DuckDB
# oracle UNCHANGED. What changes is the COST SHAPE: the ~4.7 s edge
# build (sf0.1) runs once per corpus and every census amortizes it,
# which is how a 100 TB similarity graph is actually operated.


def q_kcore_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`kcore_celled` over the materialized `graph_edges` store
    (X-G9): the bounded 6-round Seidman peel reads the committed edge
    snapshot instead of rebuilding the celled kNN graph — the
    dominant cost of the original seat. Oracle: the unchanged
    composed quantizer+peel replay (`Q_KCORE_CELLED_ORACLE`)."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans.graph_store import graph_edges

    e = graph_edges(spark, sf_dir, k=_PR_K, nprobe=_CELL_NPROBE)
    return (
        G.kcore_bounded(e, k=_KCORE_K, rounds=_KCORE_ROUNDS)
        .select(F.col("id").alias("vec_id"), "in_core", "core_degree")
        .orderBy("vec_id")
    )


Q_KCORE_FROM_EDGES_ORACLE = Q_KCORE_CELLED_ORACLE


def q_pagerank_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`similarity_pagerank_celled` over the materialized edge store
    (X-G9) — identical fixed-point iterations, stored edges."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans.graph_store import graph_edges

    e = graph_edges(spark, sf_dir, k=_PR_K, nprobe=_CELL_NPROBE)
    return (
        G.pagerank_fixed(e, iters=_PR_ITERS, damping_pct=_PR_DAMPING)
        .select(F.col("id").alias("vec_id"), "pr")
        .orderBy("vec_id")
    )


Q_PAGERANK_FROM_EDGES_ORACLE = Q_SIMILARITY_PAGERANK_CELLED_ORACLE


def q_triangles_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`knn_triangles_celled` over the materialized edge store
    (X-G9) — identical oriented wedge closure, stored edges."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans.graph_store import graph_edges

    e = graph_edges(spark, sf_dir, k=_PR_K, nprobe=_CELL_NPROBE)
    return (
        G.triangle_counts(e)
        .select(F.col("id").alias("vec_id"), "degree", "n_triangles", "cc_e6")
        .orderBy("vec_id")
    )


Q_TRIANGLES_FROM_EDGES_ORACLE = Q_KNN_TRIANGLES_CELLED_ORACLE


def q_label_prop_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`label_propagation_celled` over the materialized edge store
    (X-G9) — identical majority rounds; the store injects through the
    operator's existing `_edges` seam."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans.graph_store import graph_edges

    emb = load_table(spark, sf_dir, "embeddings")
    e = graph_edges(spark, sf_dir, k=3, nprobe=_CELL_NPROBE)
    return G.label_propagation(
        emb, k=3, iters=3, seed_mod=5, _edges=e
    ).orderBy("id")


Q_LABEL_PROP_FROM_EDGES_ORACLE = Q_LABEL_PROPAGATION_CELLED_ORACLE


def q_assortativity_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`graph_assortativity` over the materialized edge store (X-G9)
    — identical exact-rational degree-mixing statistic, stored
    edges."""
    from rootstock_collective_state_sync_spark.plans.graph_store import graph_edges

    e = graph_edges(spark, sf_dir, k=_PR_K, nprobe=_CELL_NPROBE)
    return _assortativity_over(e)


Q_ASSORTATIVITY_FROM_EDGES_ORACLE = Q_GRAPH_ASSORTATIVITY_ORACLE
