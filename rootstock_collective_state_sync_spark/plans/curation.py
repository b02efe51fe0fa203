"""Corpus-curation conformance queries (round-4 scope extension):
duplicated-n-gram analysis, unigram-LM quality scoring, per-group
rank normalization, weighted sampling, and storage-layout keys.

Same contract as :mod:`.training`: every Spark plan composes
:mod:`..operators` built-ins; every oracle replicates the exact
computation in DuckDB SQL (same md5 draws, same integer fixed-point
arithmetic, same rounding), so the driver's hash-compare verifies the
operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rootstock_collective_state_sync_spark.localrel import local_df

from rootstock_collective_state_sync_spark.operators import dedup as D
from rootstock_collective_state_sync_spark.operators import sampling as SA
from rootstock_collective_state_sync_spark.operators import text as X
from rootstock_collective_state_sync_spark.plans.tables import load_table
from rootstock_collective_state_sync_spark.plans.training import _TOK_CTE

# DuckDB mirror of operators.text.quality_score_e7 (integer 1e-7
# units; shared by the percentile / importance-sampling oracles).
_QUALITY_E7_CTE = f"""
{_TOK_CTE},
qf AS (
  SELECT doc_id,
         greatest(len(toks), 1)::BIGINT AS n_tok,
         len(list_distinct(toks))::BIGINT AS n_uniq,
         greatest(length(text), 1)::BIGINT AS n_chars,
         length(regexp_replace(text, '[^.!?,;]', '', 'g'))::BIGINT AS n_punct
  FROM tok
),
q AS (
  SELECT doc_id,
         (5 * least(n_tok * 15625, 1000000)
          + 4 * ((n_uniq * 1000000) // n_tok)
          + (1000000 - least(((n_punct * 1000000) // n_chars) * 10,
                             1000000)))::BIGINT AS q_e7
  FROM qf
)
"""


# ---------------------------------------------------------------------------
# duplicated n-gram fraction (exact-substring dedup signal)
# ---------------------------------------------------------------------------

_DUP_N = 5


def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.dup_ngram_stats(docs, n=_DUP_N).orderBy("doc_id")


Q_DUP_NGRAM_FRACTION_ORACLE = f"""
WITH {_TOK_CTE},
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {_DUP_N - 2}),
                i -> md5(array_to_string(toks[i:i+{_DUP_N - 1}], ' ')))) AS gh
  FROM tok WHERE len(toks) >= {_DUP_N}
),
counts AS (SELECT gh, count(*) AS n_occ FROM g GROUP BY gh),
per AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_grams,
         sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams
  FROM g JOIN counts USING (gh) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.n_grams, 0)::BIGINT AS n_grams,
       coalesce(per.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       round(coalesce(per.n_dup_grams, 0)::DOUBLE
             / greatest(coalesce(per.n_grams, 0), 1), 6) AS dup_fraction
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# unigram LM scoring
# ---------------------------------------------------------------------------


def q_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.unigram_lm_scores(docs).orderBy("doc_id")


Q_LM_UNIGRAM_SCORE_ORACLE = f"""
WITH {_TOK_CTE},
t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
c AS (SELECT term, count(*) AS c FROM t GROUP BY term),
tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM c),
scored AS (
  SELECT t.doc_id,
         round(-ln((c.c + 1)::DOUBLE / (tot.total + tot.vocab))
               * 1000000, 0)::BIGINT AS nll_e6
  FROM t JOIN c USING (term), tot
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(nll_e6)::BIGINT AS sum_nll_e6,
       round(sum(nll_e6)::DOUBLE / (count(*) * 1000000.0), 6) AS mean_nll
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# per-group percent-rank normalization
# ---------------------------------------------------------------------------


def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", X.quality_score_e7(F.col("text")).alias("q_e7")
    )
    return (
        SA.group_percent_rank(scored, value_col="q_e7", group_col="lang")
        .select(
            "doc_id",
            "lang",
            (F.col("q_e7").cast("double") / F.lit(10000000.0)).alias(
                "quality"
            ),
            "pct_rank",
        )
        .orderBy("doc_id")
    )


Q_QUALITY_PERCENTILES_ORACLE = f"""
WITH {_QUALITY_E7_CTE}
SELECT d.doc_id, d.lang,
       q.q_e7::DOUBLE / 10000000.0 AS quality,
       round(percent_rank() OVER (PARTITION BY d.lang ORDER BY q.q_e7),
             6) AS pct_rank
FROM documents d JOIN q ON d.doc_id = q.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# importance sampling
# ---------------------------------------------------------------------------


def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", X.quality_score_e7(F.col("text")).alias("q_e7")
    )
    return (
        SA.importance_sample(scored, weight_e7_col="q_e7")
        .select(
            "doc_id",
            "lang",
            (F.col("q_e7").cast("double") / F.lit(10000000.0)).alias(
                "quality"
            ),
        )
        .orderBy("doc_id")
    )


Q_IMPORTANCE_SAMPLE_ORACLE = f"""
WITH {_QUALITY_E7_CTE},
d16 AS (
  SELECT doc_id,
         list_sum(list_transform(range(4), k ->
             (strpos('0123456789abcdef',
                     substr(md5(doc_id::VARCHAR), k + 1, 1)) - 1)
             * (1 << (4 * (3 - k)))))::BIGINT AS draw16
  FROM documents
)
SELECT d.doc_id, d.lang, q.q_e7::DOUBLE / 10000000.0 AS quality
FROM documents d
JOIN q ON d.doc_id = q.doc_id
JOIN d16 ON d.doc_id = d16.doc_id
WHERE d16.draw16 * 10000000 < q.q_e7 * 65536
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Z-order layout key
# ---------------------------------------------------------------------------


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rootstock_collective_state_sync_spark.operators import layout as L

    orders = load_table(spark, sf_dir, "orders")
    cust_lo = (F.col("o_custkey") % 65536).alias("cust_lo")
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).alias("day_num")
    base = orders.select("o_orderkey", cust_lo, day_num)
    return base.select(
        "o_orderkey",
        "cust_lo",
        F.col("day_num").cast("long").alias("day_num"),
        L.zorder_key(F.col("cust_lo"), F.col("day_num")).alias("zkey"),
    ).orderBy("o_orderkey")


Q_ZORDER_KEY_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         (o_custkey % 65536)::BIGINT AS cust_lo,
         date_diff('day', DATE '1992-01-01', o_orderdate::DATE)::BIGINT AS day_num
  FROM orders
)
SELECT o_orderkey, cust_lo, day_num,
       list_sum(list_transform(range(16), i ->
           (((cust_lo >> i) & 1) << (2 * i))
           + (((day_num >> i) & 1) << (2 * i + 1))))::BIGINT AS zkey
FROM base ORDER BY o_orderkey
"""


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over the same (customer, day)
    plane as `zorder_key` — the locality-tighter layout alternative
    (adjacent indexes are always grid neighbors, so file ranges cover
    compact rectangles). The oracle walks the SAME derived automaton
    LUT bit-by-bit through 16 chained CTE steps, so the driver
    hash-checks the whole state machine."""
    from rootstock_collective_state_sync_spark.operators import layout as L

    orders = load_table(spark, sf_dir, "orders")
    cust_lo = (F.col("o_custkey") % 65536).alias("cust_lo")
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).alias("day_num")
    base = orders.select("o_orderkey", cust_lo, day_num)
    return base.select(
        "o_orderkey",
        "cust_lo",
        F.col("day_num").cast("long").alias("day_num"),
        L.hilbert_key(F.col("cust_lo"), F.col("day_num")).alias("hkey"),
    ).orderBy("o_orderkey")


def _hilbert_oracle(bits: int = 16) -> str:
    """Generate the chained-CTE DuckDB walk of the SAME automaton LUT
    the Spark operator uses (one CTE per bit, state/d threaded
    through — the `_ivf_cells_oracle` generated-oracle pattern)."""
    from rootstock_collective_state_sync_spark.operators.layout import (
        HILBERT_LUT,
    )

    lut = "[" + ", ".join(str(v) for v in HILBERT_LUT) + "]"
    parts = [f"""
WITH base AS (
  SELECT o_orderkey,
         (o_custkey % 65536)::BIGINT AS cust_lo,
         date_diff('day', DATE '1992-01-01',
                   o_orderdate::DATE)::BIGINT AS day_num
  FROM orders
),
h{bits} AS (SELECT *, 0::BIGINT AS st, 0::BIGINT AS d FROM base)"""]
    for i in range(bits - 1, -1, -1):
        # qualify st/d as h{i+1}.st / h{i+1}.d: the select list also
        # aliases new columns named st/d, and leaving the references
        # bare made correctness depend on DuckDB resolving the name to
        # the source column rather than the lateral alias (r15 advisor)
        parts.append(f""",
h{i} AS (
  SELECT o_orderkey, cust_lo, day_num,
         ({lut}[(h{i + 1}.st * 4 + ((cust_lo >> {i}) & 1) * 2
                 + ((day_num >> {i}) & 1) + 1)::INT] & 7)::BIGINT AS st,
         (h{i + 1}.d * 4 + ({lut}[(h{i + 1}.st * 4 + ((cust_lo >> {i}) & 1) * 2
                 + ((day_num >> {i}) & 1) + 1)::INT] >> 3))::BIGINT AS d
  FROM h{i + 1}
)""")
    parts.append("""
SELECT o_orderkey, cust_lo, day_num, d AS hkey
FROM h0 ORDER BY o_orderkey
""")
    return "".join(parts)


Q_HILBERT_KEY_ORACLE = _hilbert_oracle()



# ---------------------------------------------------------------------------
# multimodal: real image resize (PPM), full-value oracled
# ---------------------------------------------------------------------------


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build deterministic P6 images from the documents table, resize
    each to 4x3 with the real numpy nearest-neighbor codec, and emit
    dims + the md5 of the RESIZED image bytes — which the oracle
    recomputes pixel by pixel in SQL, so the check covers the actual
    pixel values, not just plumbing."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_ppm_payload(docs)
    return (
        M.resize_images(media, out_w=4, out_h=3)
        .select(
            "doc_id", "in_w", "in_h", "out_w", "out_h", "out_len",
            "resized_md5",
        )
        .orderBy("doc_id")
    )


Q_MULTIMODAL_RESIZE_ORACLE = """
WITH base AS (
  SELECT doc_id,
         (8 + doc_id % 8)::BIGINT AS w,
         (6 + doc_id % 5)::BIGINT AS h,
         rpad(text, ((8 + doc_id % 8) * (6 + doc_id % 5) * 3)::INT, text)
           AS raster
  FROM documents
)
SELECT doc_id,
       w AS in_w, h AS in_h,
       4::BIGINT AS out_w, 3::BIGINT AS out_h,
       47::BIGINT AS out_len,
       md5('P6' || chr(10) || '4 3' || chr(10) || '255' || chr(10) ||
           array_to_string(list_transform(range(36), j ->
             substr(raster,
                    ((((j // 12) * h) // 3) * w
                     + ((((j % 12) // 3) * w) // 4)) * 3 + (j % 3) + 1,
                    1)), '')) AS resized_md5
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# training-shard export manifest
# ---------------------------------------------------------------------------


def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rootstock_collective_state_sync_spark.sinks.export import shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(docs, num_shards=8).orderBy("shard")


Q_EXPORT_MANIFEST_ORACLE = """
SELECT (doc_id % 8)::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS total_chars,
       min(doc_id)::BIGINT AS min_id,
       max(doc_id)::BIGINT AS max_id,
       sum(list_sum(list_transform(range(8), k ->
           (strpos('0123456789abcdef',
                   substr(md5(doc_id::VARCHAR || ':' || text), k + 1, 1)) - 1)
           * (1::BIGINT << (4 * (7 - k))))))::BIGINT AS checksum
FROM documents GROUP BY 1 ORDER BY shard
"""


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code word for every embedding — the deterministic heart of
    the PQ-ADC path, value-checked end-to-end. The oracle replays the
    SAME algorithm in pure SQL (md5-ordered 1024-vector sample, 3
    unrolled per-subspace k-means iterations, euclidean argmin over
    the full table) with no shared code with the numpy path. 8
    subspaces x 32 centroids over 64 dims (the recall sweet spot for
    this corpus, see tests/test_operators.py recall floors)."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_code_assignments(emb, num_subspaces=8, ksub=32).orderBy(
        "vec_id", "subspace"
    )


def _pq_codes_oracle(
    num_subspaces: int = 8,
    ksub: int = 32,
    dim: int = 64,
    sample: int = 1024,
    iters: int = 3,
    tail: str | None = None,
) -> str:
    """Generate the unrolled per-subspace k-means DuckDB oracle for
    :func:`q_pq_codes` — mirrors
    :func:`operators.similarity._train_pq_codebooks` +
    :func:`.pq_code_assignments` exactly: subspace is just another
    grouping column, so all M codebooks train in one SQL pipeline.

    With ``tail`` set, the final per-vector code assignment is exposed
    as a ``codes(vec_id, m, c)`` CTE (plus the trained codebook
    ``c{iters}`` and normalized vectors ``alln`` still in scope) and
    ``tail`` (", more_ctes ... SELECT ...") finishes the statement —
    lets the ADC top-k oracle build on the replayed quantizer."""
    sub = dim // num_subspaces
    parts = [f"""
WITH samp AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS si, embedding
  FROM embeddings
  QUALIFY si < {sample}
),
sn AS (
  SELECT si, d.i // {sub} AS m, d.i % {sub} AS d,
         embedding[d.i + 1]::DOUBLE
           / greatest(sqrt(list_sum(list_transform(embedding,
                 x -> x::DOUBLE * x::DOUBLE))), 1e-12) AS x
  FROM samp, range({dim}) d(i)
),
c0 AS (SELECT m, si AS c, d, x AS w FROM sn WHERE si < {ksub})"""]
    for t in range(1, iters + 1):
        parts.append(f""",
dist{t} AS (
  SELECT sn.si, sn.m, c.c, sum((sn.x - c.w) * (sn.x - c.w)) AS d2
  FROM sn JOIN c{t - 1} c ON sn.m = c.m AND sn.d = c.d GROUP BY 1, 2, 3
),
a{t} AS (
  SELECT si, m, c FROM (
    SELECT si, m, c,
           row_number() OVER (PARTITION BY si, m ORDER BY d2 ASC, c ASC) AS rn
    FROM dist{t}
  ) WHERE rn = 1
),
mm{t} AS (
  SELECT a.m, a.c, sn.d, sum(sn.x) AS s, count(*) AS cnt
  FROM a{t} a JOIN sn ON a.si = sn.si AND a.m = sn.m GROUP BY 1, 2, 3
),
c{t} AS (
  SELECT m, c, d, s / cnt AS w FROM mm{t}
  UNION ALL
  SELECT c.m, c.c, c.d, c.w FROM c{t - 1} c
  WHERE NOT EXISTS (SELECT 1 FROM a{t} a WHERE a.m = c.m AND a.c = c.c)
)""")
    parts.append(f""",
alln AS (
  SELECT vec_id, d.i // {sub} AS m, d.i % {sub} AS d,
         embedding[d.i + 1]::DOUBLE
           / greatest(sqrt(list_sum(list_transform(embedding,
                 x -> x::DOUBLE * x::DOUBLE))), 1e-12) AS x
  FROM embeddings, range({dim}) d(i)
),
fdist AS (
  SELECT a.vec_id, a.m, c.c, sum((a.x - c.w) * (a.x - c.w)) AS d2
  FROM alln a JOIN c{iters} c ON a.m = c.m AND a.d = c.d GROUP BY 1, 2, 3
)""")
    if tail is None:
        parts.append(f"""
SELECT vec_id, m::BIGINT AS subspace, c::INTEGER AS code FROM (
  SELECT vec_id, m, c,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, c ASC) AS rn
  FROM fdist
) WHERE rn = 1 ORDER BY vec_id, subspace""")
    else:
        parts.append(f""",
codes AS MATERIALIZED (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, c ASC) AS rn
    FROM fdist
  ) WHERE rn = 1
){tail}""")
    return "".join(parts)


Q_PQ_CODES_ORACLE = _pq_codes_oracle()


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance approximate top-k, value-checked
    END-TO-END: codebook training, encoding, the per-query distance
    LUTs, ADC scoring, the shortlist cut, and the exact re-rank are
    all deterministic, so the oracle replays every stage in pure SQL
    on top of the ``pq_codes`` k-means unroll. Recall floors live in
    tests/test_recall.py."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return (
        S.pq_adc_topk(emb, queries, k=5)
        .withColumn("rk", F.col("rk").cast("bigint"))
        .orderBy("query_id", "rk")
    )


def _pq_topk_oracle(ksub: int = 32, shortlist: int = 100, k: int = 5) -> str:
    """SQL replay of :func:`q_pq_topk` on top of
    :func:`_pq_codes_oracle`'s ``codes``/``c3``/``alln``: the query
    LUT is the (subspace, centroid) squared-distance table, ADC is the
    codes-LUT join summed over subspaces, and the final order comes
    from the exact cosine re-rank of the shortlist."""
    from rootstock_collective_state_sync_spark.plans.training import _COS_SQL

    return _pq_codes_oracle(tail=f""",
lut AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.m, c.c, sum((a.x - c.w) * (a.x - c.w)) AS d2
  FROM alln a JOIN c3 c ON a.m = c.m AND a.d = c.d
  WHERE a.vec_id < {k}
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id, sum(l.d2) AS adc_dist
  FROM codes co JOIN lut l ON co.m = l.m AND co.c = l.c
  WHERE co.vec_id <> l.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist ASC, neighbor_id ASC) AS ark
    FROM adc
  ) WHERE ark <= {shortlist}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} AS cos_sim
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, rk, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM rer
) WHERE rk <= {k} ORDER BY query_id, rk""")


Q_PQ_TOPK_ORACLE = _pq_topk_oracle()


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + residual-PQ composite approximate top-k, value-checked
    END-TO-END: both quantizers train on deterministic md5-ordered
    samples with fixed tie-breaks, so the oracle replays the coarse
    k-means, the residual codebooks, corpus encoding, probe selection,
    residual ADC, and the exact re-rank in pure SQL. Recall floors
    live in tests/test_recall.py."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return (
        S.ivfpq_topk(emb, queries, k=5)
        .withColumn("rk", F.col("rk").cast("bigint"))
        .orderBy("query_id", "rk")
    )


def _ivfpq_topk_oracle(
    num_subspaces: int = 8,
    ksub: int = 32,
    dim: int = 64,
    pq_sample: int = 1024,
    pq_iters: int = 3,
    ivf_iters: int = 5,
    nprobe: int = 4,
    shortlist: int = 100,
    k: int = 5,
) -> str:
    """SQL replay of :func:`q_ivfpq_topk`, built on the coarse-
    quantizer unroll of :func:`_ivf_cells_oracle` (``sn``/``c5``/
    ``alln``/``fdot``/``cells`` in scope): train residual-PQ codebooks
    on the first ``pq_sample`` md5-ordered sample residuals, encode
    the corpus residuals, probe each query's nprobe nearest cells,
    score candidates by residual ADC, exact-rerank the shortlist."""
    from rootstock_collective_state_sync_spark.plans.training import (
        _COS_SQL,
        _ivf_cells_oracle,
    )

    sub = dim // num_subspaces
    cf = f"c{ivf_iters}"  # final coarse centroids CTE
    parts = [f""",
sdot AS (
  SELECT sn.si, c.c, sum(sn.x * c.w) AS dot
  FROM sn JOIN {cf} c ON sn.d = c.d
  WHERE sn.si < {pq_sample}
  GROUP BY 1, 2
),
scell AS (
  SELECT si, c AS cell FROM (
    SELECT si, c,
           row_number() OVER (PARTITION BY si ORDER BY dot DESC, c ASC) AS rn
    FROM sdot
  ) WHERE rn = 1
),
rsn AS MATERIALIZED (
  SELECT sn.si, sn.d // {sub} AS m, sn.d % {sub} AS dd, sn.x - c.w AS x
  FROM sn
  JOIN scell ON sn.si = scell.si
  JOIN {cf} c ON c.c = scell.cell AND c.d = sn.d
  WHERE sn.si < {pq_sample}
),
rc0 AS (SELECT m, si AS c, dd AS d, x AS w FROM rsn WHERE si < {ksub})"""]
    for t in range(1, pq_iters + 1):
        parts.append(f""",
rdist{t} AS (
  SELECT rsn.si, rsn.m, c.c, sum((rsn.x - c.w) * (rsn.x - c.w)) AS d2
  FROM rsn JOIN rc{t - 1} c ON rsn.m = c.m AND rsn.dd = c.d GROUP BY 1, 2, 3
),
ra{t} AS (
  SELECT si, m, c FROM (
    SELECT si, m, c,
           row_number() OVER (PARTITION BY si, m ORDER BY d2 ASC, c ASC) AS rn
    FROM rdist{t}
  ) WHERE rn = 1
),
rm{t} AS (
  SELECT a.m, a.c, rsn.dd AS d, sum(rsn.x) AS s, count(*) AS cnt
  FROM ra{t} a JOIN rsn ON a.si = rsn.si AND a.m = rsn.m GROUP BY 1, 2, 3
),
rc{t} AS MATERIALIZED (
  SELECT m, c, d, s / cnt AS w FROM rm{t}
  UNION ALL
  SELECT c.m, c.c, c.d, c.w FROM rc{t - 1} c
  WHERE NOT EXISTS (SELECT 1 FROM ra{t} a WHERE a.m = c.m AND a.c = c.c)
)""")
    parts.append(f""",
rall AS MATERIALIZED (
  SELECT a.vec_id, a.d // {sub} AS m, a.d % {sub} AS dd, a.x - c.w AS x
  FROM alln a
  JOIN cells t ON a.vec_id = t.vec_id
  JOIN {cf} c ON c.c = t.cell AND c.d = a.d
),
kdist AS (
  SELECT r.vec_id, r.m, c.c, sum((r.x - c.w) * (r.x - c.w)) AS d2
  FROM rall r JOIN rc{pq_iters} c ON r.m = c.m AND r.dd = c.d GROUP BY 1, 2, 3
),
kcodes AS MATERIALIZED (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d2 ASC, c ASC) AS rn
    FROM kdist
  ) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT vec_id AS query_id, c AS cell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c ASC) AS rn
    FROM fdot WHERE vec_id < {k}
  ) WHERE rn <= {nprobe}
),
qres AS MATERIALIZED (
  SELECT p.query_id, p.cell, a.d // {sub} AS m, a.d % {sub} AS dd,
         a.x - c.w AS x
  FROM probes p
  JOIN alln a ON a.vec_id = p.query_id
  JOIN {cf} c ON c.c = p.cell AND c.d = a.d
),
lut AS MATERIALIZED (
  SELECT q.query_id, q.cell, q.m, c.c, sum((q.x - c.w) * (q.x - c.w)) AS d2
  FROM qres q JOIN rc{pq_iters} c ON q.m = c.m AND q.dd = c.d
  GROUP BY 1, 2, 3, 4
),
adc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id, sum(l.d2) AS adc_dist
  FROM kcodes co
  JOIN cells t ON co.vec_id = t.vec_id
  JOIN lut l ON l.cell = t.cell AND l.m = co.m AND l.c = co.c
  WHERE co.vec_id <> l.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist ASC, neighbor_id ASC) AS ark
    FROM adc
  ) WHERE ark <= {shortlist}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} AS cos_sim
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, rk, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM rer
) WHERE rk <= {k} ORDER BY query_id, rk""")
    return _ivf_cells_oracle(iters=ivf_iters, tail="".join(parts))


Q_IVFPQ_TOPK_ORACLE = _ivfpq_topk_oracle()


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside IVF cells (round-6 scope extension)
# ---------------------------------------------------------------------------


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): cluster embeddings with the IVF
    coarse quantizer, mark vectors cosine-similar to an earlier
    in-cell vector as duplicates. The oracle replays the ENTIRE
    pipeline in SQL — the unrolled spherical k-means, the in-cell
    pairwise cosine, and the keeper rule — so cell assignment,
    scoring, and dedup policy are all value-checked end-to-end."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, num_cells=16, threshold=0.4).orderBy("vec_id")


def _semdedup_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _COS_SQL,
        _ivf_cells_oracle,
    )

    return _ivf_cells_oracle(tail=f""",
tag AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
),
pr AS (
  SELECT b.vec_id AS id_b,
         {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS cs
  FROM tag a JOIN tag b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
dup AS (
  SELECT id_b, count(*)::BIGINT AS n_earlier_dups,
         max(cs) AS max_earlier_sim
  FROM pr WHERE cs >= 0.4 GROUP BY id_b
)
SELECT t.vec_id, t.cell,
       coalesce(d.n_earlier_dups, 0)::BIGINT AS n_earlier_dups,
       d.max_earlier_sim,
       (CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END)::INTEGER AS keep
FROM tag t LEFT JOIN dup d ON t.vec_id = d.id_b
ORDER BY t.vec_id""")


Q_SEMANTIC_DEDUP_ORACLE = _semdedup_oracle()


# ---------------------------------------------------------------------------
# RAG chunking: overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK_WIN = 32
_CHUNK_STRIDE = 24


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for retrieval pipelines —
    shuffle-free posexplode + slice over the shared tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    return X.chunk_documents(
        docs, window=_CHUNK_WIN, stride=_CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_id")


Q_DOC_CHUNKS_ORACLE = f"""
WITH {_TOK_CTE},
c AS (
  SELECT doc_id, toks,
         1 + greatest(cast(ceil((len(toks) - {_CHUNK_WIN})
                              / {_CHUNK_STRIDE}.0) AS BIGINT), 0)
           AS n_chunks
  FROM tok
),
e AS (
  SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_id FROM c
)
SELECT doc_id, chunk_id::INTEGER AS chunk_id,
       len(toks[chunk_id * {_CHUNK_STRIDE} + 1
                : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WIN}])::BIGINT
         AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {_CHUNK_STRIDE} + 1
                            : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WIN}], ' ')
         AS chunk_text
FROM e ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# leakage-safe train/holdout split (cluster-granular coin flip)
# ---------------------------------------------------------------------------

_HOLDOUT_PCT = 10


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware dataset split: documents are split train/holdout
    by a hash of their MinHash-LSH connected-component label, so a
    near-duplicate cluster can never straddle the split (no eval
    contamination through paraphrases). Composes the dedup_clusters
    pipeline with the deterministic md5 draw."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    comp = D.connected_components(pairs, docs.select("doc_id"))
    return SA.cluster_hash_split(comp, holdout_pct=_HOLDOUT_PCT).orderBy("id")


def _leakage_split_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        Q_DEDUP_MINHASH_LSH_ORACLE,
        _components_oracle,
    )

    # numeric 16-bit draw (matches operators/sampling.py cluster_hash_split:
    # lexicographic hex compare breaks at holdout_pct=100 where the
    # threshold '10000' is 5 chars)
    thresh = 65536 * _HOLDOUT_PCT // 100
    return f"""
WITH comp AS ({_components_oracle(Q_DEDUP_MINHASH_LSH_ORACLE)})
SELECT id, component,
       CASE WHEN list_sum(list_transform(range(4), k ->
                 (strpos('0123456789abcdef',
                         substr(md5(component::VARCHAR), k + 1, 1)) - 1)
                 * (1 << (4 * (3 - k)))))::BIGINT < {thresh}
            THEN 'holdout' ELSE 'train' END AS split
FROM comp ORDER BY id
"""


Q_LEAKAGE_SAFE_SPLIT_ORACLE = _leakage_split_oracle()


# ---------------------------------------------------------------------------
# feature-hashing document vectors (text -> array<double> in-engine)
# ---------------------------------------------------------------------------

_HASH_DIM = 64


def q_hashed_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick doc vectors, l2-normalized — the in-engine
    text featurizer for the ANN/SemDeDup stack. The oracle replays
    the md5 bucketing, signed sums, and normalization in SQL."""
    from rootstock_collective_state_sync_spark.plans.tables import (
        array_as_string,
    )

    docs = load_table(spark, sf_dir, "documents")
    vecs = X.hashed_doc_vectors(docs, dim=_HASH_DIM)
    # Scalar-only final schema (driver canonicalizer contract).
    return vecs.select(
        "doc_id", array_as_string("doc_vec").alias("doc_vec_csv")
    ).orderBy("doc_id")


# CTE chain producing `dense(doc_id, bucket, x)` — the 6-dp-rounded
# l2-normalized hashed feature grid. Shared by the hashed-vector
# oracle and the logistic-head classifier oracle.
_HASH_DENSE_CTES = f"""{_TOK_CTE},
t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
h AS (
  SELECT doc_id,
         list_sum(list_transform(range(4), k ->
             (strpos('0123456789abcdef',
                     substr(md5(term), k + 1, 1)) - 1)
             * (1 << (4 * (3 - k)))))::BIGINT % {_HASH_DIM} AS bucket,
         CASE WHEN (strpos('0123456789abcdef', substr(md5(term), 5, 1)) - 1)
                   % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM t
),
b AS (SELECT doc_id, bucket, sum(s)::DOUBLE AS v FROM h GROUP BY 1, 2),
n AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM b GROUP BY 1),
grid AS (SELECT d.doc_id, r.i AS bucket FROM documents d, range({_HASH_DIM}) r(i)),
dense AS MATERIALIZED (
  SELECT g.doc_id, g.bucket,
         round(coalesce(b.v, 0) / greatest(coalesce(n.nrm, 0), 1e-12), 6) AS x
  FROM grid g
  LEFT JOIN b ON g.doc_id = b.doc_id AND g.bucket = b.bucket
  LEFT JOIN n ON g.doc_id = n.doc_id
)"""

Q_HASHED_DOC_VECTORS_ORACLE = f"""
WITH {_HASH_DENSE_CTES}
SELECT doc_id,
       string_agg((x::DECIMAL(28,6))::VARCHAR, ',' ORDER BY bucket)
         AS doc_vec_csv
FROM dense GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bigram LM scoring + CCNet-style perplexity buckets
# ---------------------------------------------------------------------------


def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.bigram_lm_scores(docs).orderBy("doc_id")


# shared bigram-NLL CTE chain (mirror of operators.text.bigram_lm_scores)
_BIGRAM_NLL_CTES = f"""
{_TOK_CTE},
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
  FROM tok WHERE len(toks) >= 2
),
b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
cb AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
c1 AS (SELECT term, count(*) AS c FROM t GROUP BY term),
v AS (SELECT count(*) AS vocab FROM c1),
scored AS (
  SELECT b.doc_id,
         round(-ln((cb.cb + 1)::DOUBLE / (c1.c + v.vocab))
               * 1000000, 0)::BIGINT AS nll_e6
  FROM b JOIN cb USING (w1, w2) JOIN c1 ON b.w1 = c1.term, v
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         sum(nll_e6)::BIGINT AS sum_nll_e6
  FROM scored GROUP BY doc_id
)
"""

Q_LM_BIGRAM_SCORE_ORACLE = f"""
WITH {_BIGRAM_NLL_CTES}
SELECT d.doc_id,
       coalesce(per.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(per.sum_nll_e6, 0)::BIGINT AS sum_nll_e6,
       CASE WHEN per.n_bigrams IS NULL THEN NULL
            ELSE round(per.sum_nll_e6::DOUBLE
                       / (per.n_bigrams * 1000000.0), 6) END AS mean_nll
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: rank documents by bigram-LM
    NLL *within their language* and cut head/middle/tail at the 1/3
    and 2/3 percent-rank boundaries — the standard corpus-quality
    tiering step before mixing. Rank value is the integer-floored
    mean NLL in 1e-6 units (exact cross-engine arithmetic); the rank
    itself uses the scalable histogram plan, not a per-row window."""
    docs = load_table(spark, sf_dir, "documents")
    lm = X.bigram_lm_scores(docs).filter(F.col("n_bigrams") > 0)
    scored = lm.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        F.expr("sum_nll_e6 div n_bigrams").alias("lm_e6"),
    )
    ranked = SA.group_percent_rank(scored, value_col="lm_e6", group_col="lang")
    bucket = (
        F.when(F.col("pct_rank") < 0.333333, F.lit("head"))
        .when(F.col("pct_rank") < 0.666667, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "lm_e6", "pct_rank", bucket.alias("bucket")
    ).orderBy("doc_id")


Q_CCNET_BUCKETS_ORACLE = f"""
WITH {_BIGRAM_NLL_CTES},
sc AS (
  SELECT d.doc_id, d.lang,
         (per.sum_nll_e6 // per.n_bigrams)::BIGINT AS lm_e6
  FROM documents d JOIN per ON d.doc_id = per.doc_id
  WHERE per.n_bigrams > 0
),
rk AS (
  SELECT doc_id, lang, lm_e6,
         round(percent_rank() OVER (PARTITION BY lang ORDER BY lm_e6),
               6) AS pct_rank
  FROM sc
)
SELECT doc_id, lang, lm_e6, pct_rank,
       CASE WHEN pct_rank < 0.333333 THEN 'head'
            WHEN pct_rank < 0.666667 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM rk ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# LLM token counting: whitespace + BPE-ish pre-tokenizer estimate
# ---------------------------------------------------------------------------


def q_llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts both ways a training pipeline needs
    them: cheap whitespace/alnum tokens (dedup/quality features) and
    the BPE-ish pre-tokenizer estimate (context-length budgeting,
    cost estimation). Both are pure JVM regex passes — codegen, no
    shuffle; the oracle replays the identical portable regex in RE2."""
    docs = load_table(spark, sf_dir, "documents")
    ws = X.token_count(F.col("text")).cast("bigint")
    bpe = X.bpe_token_count(F.col("text")).cast("bigint")
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(
            bpe.cast("double") / F.greatest(ws, F.lit(1)).cast("double"), 6
        ).alias("bpe_per_ws"),
    ).orderBy("doc_id")


Q_LLM_TOKEN_COUNT_ORACLE = f"""
WITH {_TOK_CTE},
b AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text),
             '{X.BPE_SPLIT_RE.replace("'", "''")}'))::BIGINT AS n_bpe
  FROM documents
)
SELECT t.doc_id,
       len(t.toks)::BIGINT AS n_ws_tokens,
       b.n_bpe AS n_bpe_tokens,
       round(b.n_bpe::DOUBLE / greatest(len(t.toks), 1), 6) AS bpe_per_ws
FROM tok t JOIN b USING (doc_id) ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# exact duplicate-span removal (Lee et al. 2022 token-window variant)
# ---------------------------------------------------------------------------

_SPAN_N = 5


def q_drop_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-span removal: every 5-token span occurring
    more than once keeps only its first (doc_id, start) occurrence;
    later occurrences lose their tokens. The oracle replays span
    hashing, the global first-occurrence window, position coverage,
    and text reassembly in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return D.drop_duplicate_spans(docs, n=_SPAN_N).orderBy("doc_id")


Q_DROP_DUP_SPANS_ORACLE = f"""
WITH {_TOK_CTE},
st AS (
  SELECT doc_id, toks,
         unnest(range(greatest(len(toks) - {_SPAN_N} + 1, 0)))::INTEGER AS start
  FROM tok
),
g AS (
  SELECT doc_id, start,
         md5(array_to_string(toks[start + 1 : start + {_SPAN_N}], ' ')) AS gh
  FROM st
),
rk AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, start) AS rk
  FROM g
),
rem AS (
  SELECT DISTINCT doc_id, start + r.i AS pos
  FROM rk, range({_SPAN_N}) r(i) WHERE rk > 1
),
tp AS (
  SELECT doc_id, toks, unnest(range(len(toks)))::INTEGER AS pos FROM tok
),
tt AS (
  SELECT doc_id, pos, toks[pos + 1] AS tok FROM tp
),
kept AS (
  SELECT tt.doc_id, tt.pos, tt.tok
  FROM tt LEFT JOIN rem ON tt.doc_id = rem.doc_id AND tt.pos = rem.pos
  WHERE rem.doc_id IS NULL
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
       coalesce(a.clean_text, '') AS clean_text
FROM tok t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization of the embedding corpus
# ---------------------------------------------------------------------------


def q_emb_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization with an in-row fidelity
    witness (cosine of original vs dequantized). The oracle replays
    the scale, the floor-based half-up codes, dequantization, and the
    cosine in SQL."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    from rootstock_collective_state_sync_spark.plans.tables import (
        array_as_string,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = S.quantize_int8(emb)
    # Scalar-only final schema (driver canonicalizer contract): codes
    # are ints, so a plain concat_ws is exact.
    return q.select(
        "vec_id",
        "scale",
        F.expr("concat_ws(',', codes)").alias("codes_csv"),
        "cos_fidelity",
    ).orderBy("vec_id")


def _int8_quant_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.training import _COS_SQL

    return f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, v -> abs(v::DOUBLE))) / 127.0
           AS scale
  FROM embeddings
),
c AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding,
             v -> floor(v::DOUBLE / greatest(scale, 1e-30) + 0.5)::INTEGER)
           AS codes
  FROM s
),
d AS (
  SELECT vec_id, embedding, scale, codes,
         list_transform(codes, x -> x::DOUBLE * scale) AS dq
  FROM c
)
SELECT vec_id, round(scale, 6) AS scale,
       array_to_string(codes, ',') AS codes_csv,
       CASE WHEN scale > 0
            THEN {_COS_SQL.format(a="embedding", b="dq")}
            END AS cos_fidelity
FROM d ORDER BY vec_id
"""


Q_EMB_INT8_QUANT_ORACLE = _int8_quant_oracle()


# ---------------------------------------------------------------------------
# model-based quality/domain filter (logistic head over hashed features)
# ---------------------------------------------------------------------------

_CLF_SAMPLE = 512
# 50 full-batch steps at lr 5.0: margin(in-domain vs out) ≈ 0.25 on
# the sf0.01 corpus (10 @ 0.5 leaves it at 0.02 — underfit); the
# oracle unrolls 4 CTEs per step, well within DuckDB's planner.
_CLF_ITERS = 50
_CLF_LR = 5.0


def q_domain_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier-filter pattern of the GPT-3/CCNet data pipelines,
    fully in-engine: train a logistic head driver-side on a bounded
    md5-ordered sample, then broadcast-score every document. The
    in-domain target is content-derived (documents mentioning 'spark'
    — a learnable stand-in for "looks like the reference corpus"; the
    synthetic table's lang column is deliberately uncorrelated with
    its text, so a lang target would only prove the model can fail).
    The oracle replays the hashed features, the 10 unrolled full-batch
    gradient steps, and the final sigmoid scoring in pure SQL —
    training AND inference are both value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    label = F.array_contains(X.tokens(F.col("text")), "spark").cast("int")
    w, b = X.train_logistic_head(
        docs,
        label_col=label,
        dim=_HASH_DIM,
        sample_size=_CLF_SAMPLE,
        iters=_CLF_ITERS,
        lr=_CLF_LR,
    )
    scores = X.score_logistic_head(docs, w, b, dim=_HASH_DIM)
    return (
        docs.select("doc_id", label.alias("label"))
        .join(scores, "doc_id")
        .orderBy("doc_id")
    )


def _domain_classifier_oracle(
    dim: int = _HASH_DIM,
    sample: int = _CLF_SAMPLE,
    iters: int = _CLF_ITERS,
    lr: float = _CLF_LR,
) -> str:
    """Unrolled full-batch logistic-regression replay: w0 = 0, each
    iteration computes per-sample sigmoid, the averaged gradient, and
    the updated (w, b) as materialized 64-row / 1-row CTEs — exactly
    :func:`operators.text.train_logistic_head`'s numpy loop."""
    parts = [f"""
WITH {_HASH_DENSE_CTES},
samp AS MATERIALIZED (
  SELECT doc_id, y FROM (
    SELECT t.doc_id,
           CASE WHEN list_contains(t.toks, 'spark') THEN 1.0 ELSE 0.0 END AS y,
           row_number() OVER (ORDER BY md5(t.doc_id::VARCHAR), t.doc_id) AS rn
    FROM tok t
  ) WHERE rn <= {sample}
),
scnt AS (SELECT count(*)::DOUBLE AS cnt FROM samp),
sdense AS MATERIALIZED (
  SELECT d.doc_id, d.bucket, d.x FROM dense d JOIN samp USING (doc_id)
),
w0 AS (SELECT r.i AS j, 0.0 AS w FROM range({dim}) r(i)),
b0 AS (SELECT 0.0 AS b)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
z{t} AS (
  SELECT d.doc_id, sum(d.x * w.w) AS dot
  FROM sdense d JOIN w{t - 1} w ON d.bucket = w.j GROUP BY 1
),
e{t} AS MATERIALIZED (
  SELECT s.doc_id, 1.0 / (1.0 + exp(-(z.dot + b.b))) - s.y AS e
  FROM samp s JOIN z{t} z USING (doc_id), b{t - 1} b
),
w{t} AS MATERIALIZED (
  SELECT w.j, w.w - {lr} * g.gs / sc.cnt AS w
  FROM w{t - 1} w
  JOIN (SELECT d.bucket AS j, sum(e.e * d.x) AS gs
        FROM e{t} e JOIN sdense d USING (doc_id) GROUP BY 1) g ON w.j = g.j,
       scnt sc
),
b{t} AS MATERIALIZED (
  SELECT b.b - {lr} * ge.gsum / sc.cnt AS b
  FROM b{t - 1} b, (SELECT sum(e) AS gsum FROM e{t}) ge, scnt sc
)""")
    parts.append(f""",
fz AS (
  SELECT d.doc_id, sum(d.x * w.w) AS dot
  FROM dense d JOIN w{iters} w ON d.bucket = w.j GROUP BY 1
)
SELECT t.doc_id,
       (CASE WHEN list_contains(t.toks, 'spark') THEN 1 ELSE 0 END)::INTEGER
         AS label,
       round(1.0 / (1.0 + exp(-(fz.dot + b.b))), 6) AS score
FROM tok t JOIN fz ON t.doc_id = fz.doc_id, b{iters} b
ORDER BY t.doc_id""")
    return "".join(parts)


Q_DOMAIN_CLASSIFIER_ORACLE = _domain_classifier_oracle()


# ---------------------------------------------------------------------------
# multimodal: perceptual average-hash over decoded images
# ---------------------------------------------------------------------------


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual aHash of every synthetic P6 image — the image leg of
    the dedup stack, value-checked down to the pixel: the oracle
    rebuilds the image, replays the 8x8 nearest-neighbor sampling,
    integer grayscale, and the strict bit rule in SQL."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_ppm_payload(docs)
    return (
        M.image_ahash(media, grid=8)
        .select("doc_id", "ahash", "gray_total")
        .orderBy("doc_id")
    )


# CTE chain producing `hsh(doc_id, ahash, gray_total)` — the pixel-
# exact aHash replay, shared by the hash oracle and the image
# near-dup-pairs oracle.
_AHASH_CTES = """base AS (
  SELECT doc_id,
         (8 + doc_id % 8)::BIGINT AS w,
         (6 + doc_id % 5)::BIGINT AS h,
         rpad(text, ((8 + doc_id % 8) * (6 + doc_id % 5) * 3)::INT, text)
           AS raster
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(64), i ->
             (ord(substr(raster,
                  (((((i // 8) * h) // 8) * w + (((i % 8) * w) // 8)) * 3 + 1)::INT, 1))
            + ord(substr(raster,
                  (((((i // 8) * h) // 8) * w + (((i % 8) * w) // 8)) * 3 + 2)::INT, 1))
            + ord(substr(raster,
                  (((((i // 8) * h) // 8) * w + (((i % 8) * w) // 8)) * 3 + 3)::INT, 1))
             ) // 3) AS grays
  FROM base
),
hsh AS MATERIALIZED (
  SELECT doc_id,
         array_to_string(list_transform(grays,
             x -> CASE WHEN x * 64 > list_sum(grays) THEN '1' ELSE '0' END), '')
           AS ahash,
         list_sum(grays)::BIGINT AS gray_total
  FROM g
)"""

Q_IMAGE_AHASH_ORACLE = f"""
WITH {_AHASH_CTES}
SELECT doc_id, ahash, gray_total FROM hsh ORDER BY doc_id
"""


def q_image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup mining end-to-end: banded aHash candidates +
    exact Hamming verify. With 8 bands a <=6-bit pair ALWAYS collides
    (pigeonhole), so the oracle is the brute-force all-pairs Hamming
    scan — a match proves the banded plan loses nothing."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_ppm_payload(docs)
    return M.image_near_dup_pairs(media, max_hamming=6, bands=8).orderBy(
        "id_a", "id_b"
    )


Q_IMAGE_NEAR_DUP_ORACLE = f"""
WITH {_AHASH_CTES},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         list_sum(list_transform(range(64), i ->
             CASE WHEN substr(a.ahash, (i + 1)::INT, 1)
                       <> substr(b.ahash, (i + 1)::INT, 1)
                  THEN 1 ELSE 0 END))::BIGINT AS hamming
  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs
WHERE hamming <= 6 ORDER BY id_a, id_b
"""


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image leg of dedup-cluster resolution: banded-aHash near-dup
    pairs resolved into connected components (component = min doc_id
    reachable). Composes two already-oracled stages; the oracle replays
    the aHash pipeline, the all-pairs Hamming ground truth, AND the
    transitive closure via recursive CTE — proving the banded plan +
    log-round CC composition end-to-end."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_ppm_payload(docs)
    pairs = M.image_near_dup_pairs(media, max_hamming=6, bands=8).select(
        "id_a", "id_b"
    )
    return D.connected_components(pairs, docs.select("doc_id")).orderBy("id")


from rootstock_collective_state_sync_spark.plans.training import (
    _components_oracle as _cc_oracle,
)

Q_IMAGE_DEDUP_CLUSTERS_ORACLE = _cc_oracle(Q_IMAGE_NEAR_DUP_ORACLE)


def q_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scores quantile-normalized across sources — each doc
    mapped to the global score at its source-local rank fraction.
    Exact integer ranks, nearest-rank lookup via distinct-score
    cumulative counts, fully SQL-replayed."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        quantile_align,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", X.quality_score_e7(F.col("text")).alias("q_e7")
    )
    return quantile_align(scored, "q_e7").orderBy("doc_id")


Q_QUANTILE_ALIGN_ORACLE = f"""
WITH {_QUALITY_E7_CTE},
scored AS (
  SELECT d.doc_id, d.source, q.q_e7
  FROM documents d JOIN q USING (doc_id)
),
tot AS (SELECT count(*)::BIGINT AS n FROM scored),
ranked AS (
  SELECT doc_id, source, q_e7,
         row_number() OVER (PARTITION BY source
                            ORDER BY q_e7 ASC, doc_id ASC) AS r,
         count(*) OVER (PARTITION BY source) AS ns
  FROM scored
),
g AS (
  SELECT ranked.*, (r * tot.n + ns - 1) // ns AS gk
  FROM ranked CROSS JOIN tot
),
dist AS (
  SELECT q_e7 AS s, count(*) AS c,
         sum(count(*)) OVER (ORDER BY q_e7
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored GROUP BY q_e7
)
SELECT g.doc_id, g.source, g.q_e7, d.s AS q_e7_aligned
FROM g JOIN dist d ON g.gk > d.cum - d.c AND g.gk <= d.cum
ORDER BY g.doc_id
"""


def q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by log-odds z
    ('Fightin' Words'), add-one prior, replayed term-for-term in
    SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return X.salient_terms(docs).orderBy("source", "rk")


Q_SALIENT_TERMS_ORACLE = """
WITH tk AS (
  SELECT source AS src,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
),
st AS (SELECT src, term, count(*)::BIGINT AS c_s FROM tk GROUP BY 1, 2),
term_tot AS (SELECT term, sum(c_s)::BIGINT AS c_all FROM st GROUP BY 1),
src_tot AS (SELECT src, sum(c_s)::BIGINT AS n_s FROM st GROUP BY 1),
tot AS (SELECT sum(c_all)::BIGINT AS n_all, count(*)::BIGINT AS v
        FROM term_tot),
scored AS (
  SELECT st.src, st.term, st.c_s AS n_term,
         round(
           (ln((st.c_s + 1.0)
               / ((src_tot.n_s + tot.v)::DOUBLE - (st.c_s + 1.0)))
            - ln((term_tot.c_all - st.c_s + 1.0)
                 / ((tot.n_all - src_tot.n_s + tot.v)::DOUBLE
                    - (term_tot.c_all - st.c_s + 1.0))))
           / sqrt(1.0 / (st.c_s + 1.0)
                  + 1.0 / (term_tot.c_all - st.c_s + 1.0)), 6) AS z
  FROM st
  JOIN term_tot USING (term)
  JOIN src_tot USING (src)
  CROSS JOIN tot
),
ranked AS (
  SELECT src AS source, term, n_term, z,
         row_number() OVER (PARTITION BY src
                            ORDER BY z DESC, term ASC)::INTEGER AS rk
  FROM scored
)
SELECT * FROM ranked WHERE rk <= 5 ORDER BY source, rk
"""


def q_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the cheap heuristic quality score predict the Gopher keep
    decision? Exact tie-aware ROC-AUC (integer Mann-Whitney) of
    q_e7 against gopher_keep — one hash-checked row."""
    from rootstock_collective_state_sync_spark.operators import rules as RL
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        binary_auc,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = RL.gopher_quality(docs).select(
        "doc_id", F.col("gopher_keep").cast("int").alias("keep")
    )
    q = docs.select(
        "doc_id", X.quality_score_e7(F.col("text")).alias("q_e7")
    )
    return binary_auc(q.join(flags, "doc_id"), "q_e7", "keep")


def _quality_auc_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.quality import (
        Q_GOPHER_QUALITY_ORACLE,
    )

    return f"""
WITH g AS (
  SELECT doc_id, gopher_keep AS keep FROM ({Q_GOPHER_QUALITY_ORACLE})
),
q2 AS (
  SELECT doc_id, q_e7 FROM (WITH {_QUALITY_E7_CTE} SELECT * FROM q)
),
j AS (SELECT q2.q_e7 AS s, g.keep FROM q2 JOIN g USING (doc_id)),
ps AS (
  SELECT s, sum(keep)::BIGINT AS pos, sum(1 - keep)::BIGINT AS neg
  FROM j GROUP BY s
),
sc AS (
  SELECT *, coalesce(sum(neg) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS neg_below
  FROM ps
)
SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
       sum(pos * (2 * neg_below + neg))::BIGINT AS u2,
       round(CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                  THEN sum(pos * (2 * neg_below + neg))::DOUBLE
                       / (2.0 * sum(pos) * sum(neg))
                  ELSE 0.5 END, 6) AS auc
FROM sc
"""


Q_QUALITY_AUC_ORACLE = _quality_auc_oracle()


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the in-engine domain classifier:
    decile bins of predicted probability vs empirical positive rate
    (+ calibration gap per bin). Composes the fully-replayed
    train+score pipeline with exact integer bin accounting — the
    eval every classifier-filter deployment needs before trusting a
    probability threshold."""
    docs = load_table(spark, sf_dir, "documents")
    label = F.array_contains(X.tokens(F.col("text")), "spark").cast("int")
    w, b = X.train_logistic_head(
        docs,
        label_col=label,
        dim=_HASH_DIM,
        sample_size=_CLF_SAMPLE,
        iters=_CLF_ITERS,
        lr=_CLF_LR,
    )
    scores = X.score_logistic_head(docs, w, b, dim=_HASH_DIM)
    joined = docs.select("doc_id", label.alias("y")).join(scores, "doc_id")
    bin_ = F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9))
    return (
        joined.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(F.avg("score"), 6).alias("mean_p"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "mean_p",
            F.round(F.col("n_pos") / F.col("n"), 6).alias("frac_pos"),
            F.round(
                F.abs(F.col("mean_p") - F.col("n_pos") / F.col("n")), 6
            ).alias("gap"),
        )
        .orderBy("bin")
    )


def _classifier_calibration_oracle() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, label AS y, score FROM ({_domain_classifier_oracle()})
),
binned AS (
  SELECT least(floor(score * 10)::INTEGER, 9) AS bin,
         count(*)::BIGINT AS n,
         sum(y)::BIGINT AS n_pos,
         round(avg(score), 6) AS mean_p
  FROM base GROUP BY 1
)
SELECT bin, n, n_pos, mean_p,
       round(n_pos::DOUBLE / n, 6) AS frac_pos,
       round(abs(mean_p - n_pos::DOUBLE / n), 6) AS gap
FROM binned ORDER BY bin
"""


Q_CLASSIFIER_CALIBRATION_ORACLE = _classifier_calibration_oracle()


def q_length_quality_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate drift heatmap: documents cross-binned into exact
    (length decile x quality decile) cells — deciles by integer
    rank arithmetic over (value, doc_id) order, so every engine draws
    identical cell borders. The 2-D sanity scan that catches 'short
    docs got higher quality scores this crawl' before a 1-D histogram
    would."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    scored = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("len_v"),
        X.quality_score_e7(F.col("text")).alias("q_e7"),
    )
    n = scored.count()

    def _decile(col, order_id):
        w = Window.orderBy(F.col(col).asc(), F.col(order_id).asc())
        rn = F.row_number().over(w)
        return ((rn - 1) * 10 / F.lit(n)).cast("int")

    binned = scored.select(
        "doc_id",
        _decile("len_v", "doc_id").alias("len_decile"),
        _decile("q_e7", "doc_id").alias("q_decile"),
    )
    return (
        binned.groupBy("len_decile", "q_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("len_decile", "q_decile")
    )


Q_LENGTH_QUALITY_GRID_ORACLE = f"""
WITH {_QUALITY_E7_CTE},
scored AS (
  SELECT d.doc_id, d.n_chars::BIGINT AS len_v, q.q_e7
  FROM documents d JOIN q USING (doc_id)
),
tot AS (SELECT count(*)::BIGINT AS n FROM scored),
binned AS (
  SELECT doc_id,
         (((row_number() OVER (ORDER BY len_v ASC, doc_id ASC)) - 1) * 10
          // tot.n)::INTEGER AS len_decile,
         (((row_number() OVER (ORDER BY q_e7 ASC, doc_id ASC)) - 1) * 10
          // tot.n)::INTEGER AS q_decile
  FROM scored CROSS JOIN tot
)
SELECT len_decile, q_decile, count(*)::BIGINT AS n_docs
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# deterministic round-robin source interleaving (curriculum ordering)
# ---------------------------------------------------------------------------


def q_source_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form round-robin interleave key per document — rank
    within source and the global rotation position, no global sort
    anywhere in the plan. The oracle replays the dense source index,
    the per-source rank, and the key arithmetic."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        source_interleave,
    )

    docs = load_table(spark, sf_dir, "documents")
    return source_interleave(docs).orderBy("doc_id")


Q_SOURCE_INTERLEAVE_ORACLE = """
WITH sidx AS (
  SELECT source, row_number() OVER (ORDER BY source ASC) - 1 AS s_idx
  FROM (SELECT DISTINCT source FROM documents)
),
n AS (SELECT count(*) AS total FROM sidx),
ranked AS (
  SELECT d.doc_id, d.source, s.s_idx,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY d.doc_id ASC) - 1 AS rank0
  FROM documents d JOIN sidx s USING (source)
)
SELECT doc_id, source,
       (rank0 + 1)::BIGINT AS source_rank,
       (rank0 * n.total + s_idx)::BIGINT AS interleave_key
FROM ranked CROSS JOIN n
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal: scene-change scoring over real decoded frame sequences
# ---------------------------------------------------------------------------


def q_video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per consecutive-frame-pair byte-exact difference energy over
    real multi-frame P6 streams — the video leg's cut-detection
    signal, value-checked to the byte: the oracle rebuilds every
    frame and replays every |a-b|."""
    from rootstock_collective_state_sync_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    out = M.video_scene_scores(M.attach_video_payload(docs))
    return (
        out.filter(F.col("decode_error").isNull() & (F.col("pair_no") >= 0))
        .select("doc_id", "pair_no", "diff_total", "n_bytes", "mean_diff_e6")
        .orderBy("doc_id", "pair_no")
    )


Q_VIDEO_SCENE_CHANGES_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         (8 + doc_id % 8)::BIGINT AS w,
         (6 + doc_id % 5)::BIGINT AS h,
         (2 + doc_id % 3)::BIGINT AS nf
  FROM documents
),
pairs AS (
  SELECT doc_id, r.k AS pair_no,
         rpad(substr(text, (r.k + 1)::INT), (w * h * 3)::INT, text) AS ra,
         rpad(substr(text, (r.k + 2)::INT), (w * h * 3)::INT, text) AS rb,
         (w * h * 3)::BIGINT AS n
  FROM base, range(3) r(k) WHERE r.k < nf - 1
),
d AS (
  SELECT doc_id, pair_no,
         list_sum(list_transform(range(n), i ->
             abs(ord(substr(ra, (i + 1)::INT, 1))
               - ord(substr(rb, (i + 1)::INT, 1)))))::BIGINT AS diff_total,
         n AS n_bytes
  FROM pairs
)
SELECT doc_id, pair_no::INTEGER AS pair_no, diff_total, n_bytes,
       (diff_total * 1000000 // n_bytes)::BIGINT AS mean_diff_e6
FROM d ORDER BY doc_id, pair_no
"""


# ---------------------------------------------------------------------------
# exact proportional budget allocation (largest remainder)
# ---------------------------------------------------------------------------


def q_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton-method per-source quotas for a 1000-document budget —
    integer remainders, quotas summing exactly to the budget. The
    oracle replays floors, remainder ranking, and the leftover
    distribution."""
    from rootstock_collective_state_sync_spark.operators.sampling import (
        largest_remainder_alloc,
    )

    docs = load_table(spark, sf_dir, "documents")
    return largest_remainder_alloc(docs, budget=1000)


Q_BUDGET_ALLOC_ORACLE = """
WITH c AS (
  SELECT source AS grp, count(*)::BIGINT AS n FROM documents GROUP BY source
),
t AS (SELECT sum(n)::BIGINT AS tot FROM c),
b AS (
  SELECT grp, n,
         (1000 * n) // t.tot AS base,
         (1000 * n) % t.tot AS rem
  FROM c CROSS JOIN t
),
r AS (
  SELECT grp, n, base, rem,
         row_number() OVER (ORDER BY rem DESC, n DESC, grp ASC) AS rk,
         1000 - sum(base) OVER () AS leftover
  FROM b
)
SELECT grp AS source, n,
       (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS quota
FROM r ORDER BY source
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_TARGET = ("src0", "src1")


def q_dsir_log_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log-likelihood-ratio scores against a target subcorpus
    (sources src0/src1 stand in for the curated high-quality slice).
    See :func:`..operators.text.dsir_log_ratio` for semantics and the
    100 TB shape; the oracle replays the identical hashed-bigram
    models, e6-snapped per-bucket weights, and integer sums."""
    docs = load_table(spark, sf_dir, "documents")
    scored = X.dsir_log_ratio(
        docs.withColumn(
            "is_target", F.col("source").isin(*_DSIR_TARGET)
        ),
        num_buckets=_DSIR_BUCKETS,
    )
    return (
        scored.join(
            docs.select("doc_id", "source"), "doc_id"
        )
        .select("doc_id", "source", "n_grams", "lr_e6", "mean_lr")
        .orderBy("doc_id")
    )


# shared CTE chain (tokenize -> gram stream -> bucket counts ->
# e6-snapped weights -> per-doc integer sums), used by the scoring AND
# the resampling oracle
_DSIR_CTES = f"""{_TOK_CTE},
uni AS (
  SELECT t.doc_id, d.source, unnest(t.toks) AS g
  FROM tok t JOIN documents d ON t.doc_id = d.doc_id
),
big AS (
  SELECT t.doc_id, d.source,
         unnest(list_transform(range(1, len(t.toks)),
                i -> t.toks[i] || ' ' || t.toks[i + 1])) AS g
  FROM tok t JOIN documents d ON t.doc_id = d.doc_id
  WHERE len(t.toks) >= 2
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
bkt AS (
  SELECT doc_id, source,
         (list_sum(list_transform(range(4), k ->
              (strpos('0123456789abcdef', substr(md5(g), k + 1, 1)) - 1)
              * (1 << (4 * (3 - k)))))::BIGINT % {_DSIR_BUCKETS}) AS bucket
  FROM grams
),
counts AS (
  SELECT bucket, count(*)::BIGINT AS c_raw,
         sum(CASE WHEN source IN {_DSIR_TARGET} THEN 1 ELSE 0 END)::BIGINT
           AS c_tgt
  FROM bkt GROUP BY bucket
),
tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM counts),
w AS (
  SELECT bucket,
         round((ln((c_tgt + 1)::DOUBLE / (t_tgt + {_DSIR_BUCKETS}))
              - ln((c_raw + 1)::DOUBLE / (t_raw + {_DSIR_BUCKETS})))
               * 1000000, 0)::BIGINT AS w_e6
  FROM counts, tot
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams, sum(w_e6)::BIGINT AS lr_e6
  FROM bkt JOIN w USING (bucket) GROUP BY doc_id
)
"""

Q_DSIR_LOG_RATIO_ORACLE = f"""
WITH {_DSIR_CTES}
SELECT d.doc_id, d.source,
       coalesce(per.n_grams, 0)::BIGINT AS n_grams,
       coalesce(per.lr_e6, 0)::BIGINT AS lr_e6,
       round(coalesce(per.lr_e6, 0)::DOUBLE
             / (greatest(coalesce(per.n_grams, 0), 1) * 1000000.0), 6)
         AS mean_lr
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Shannon entropy quality screens
# ---------------------------------------------------------------------------


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token- and character-level Shannon entropy per document (the
    gibberish / template / binary-payload screens). The oracle
    replays the identical e6-snapped ``c·ln c`` integer terms."""
    docs = load_table(spark, sf_dir, "documents")
    return X.entropy_scores(docs).orderBy("doc_id")


Q_TEXT_ENTROPY_ORACLE = f"""
WITH {_TOK_CTE},
t AS (SELECT doc_id, unnest(toks) AS s FROM tok),
tc AS (SELECT doc_id, s, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
tper AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(c * round(ln(c) * 1000000, 0)::BIGINT)::BIGINT AS s_e6
  FROM tc GROUP BY doc_id
),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(length(lower(text))),
                i -> substr(lower(text), i + 1, 1))) AS s
  FROM documents WHERE length(text) >= 1
),
cc AS (SELECT doc_id, s, count(*)::BIGINT AS c FROM ch GROUP BY 1, 2),
cper AS (
  SELECT doc_id, sum(c)::BIGINT AS n_chars,
         sum(c * round(ln(c) * 1000000, 0)::BIGINT)::BIGINT AS s_e6
  FROM cc GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(tper.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(tper.n_types, 0)::BIGINT AS n_types,
       coalesce(round(ln(tper.n_tokens)
                      - tper.s_e6::DOUBLE / (tper.n_tokens * 1000000.0), 6),
                0.0) AS token_entropy,
       coalesce(cper.n_chars, 0)::BIGINT AS n_chars,
       coalesce(round(ln(cper.n_chars)
                      - cper.s_e6::DOUBLE / (cper.n_chars * 1000000.0), 6),
                0.0) AS char_entropy
FROM documents d
LEFT JOIN tper ON d.doc_id = tper.doc_id
LEFT JOIN cper ON d.doc_id = cper.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR resampling (Gumbel-top-k over the log-ratio weights)
# ---------------------------------------------------------------------------

_DSIR_K = 20


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DSIR selection pipeline: log-ratio scores
    (:func:`q_dsir_log_ratio`'s operator) + Gumbel-top-k resampling —
    weighted sampling without replacement over mean log-ratio weights.
    The oracle replays the md5-lattice Gumbel draws and the ranked
    truncation exactly."""
    docs = load_table(spark, sf_dir, "documents")
    scored = X.dsir_log_ratio(
        docs.withColumn("is_target", F.col("source").isin(*_DSIR_TARGET)),
        num_buckets=_DSIR_BUCKETS,
    )
    return (
        SA.gumbel_topk(scored, log_weight_col="mean_lr", k=_DSIR_K)
        .select("doc_id", "mean_lr", "gumbel_key", "rank")
        .orderBy("rank")
    )


Q_DSIR_SELECT_ORACLE = (
    f"WITH {_DSIR_CTES}"
    + f"""
, scored AS (
  SELECT d.doc_id,
         round(coalesce(per.lr_e6, 0)::DOUBLE
               / (greatest(coalesce(per.n_grams, 0), 1) * 1000000.0), 6)
           AS mean_lr
  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
),
keyed AS (
  SELECT doc_id, mean_lr,
         round(mean_lr - ln(-ln(
             (list_sum(list_transform(range(4), kk ->
                  (strpos('0123456789abcdef',
                          substr(md5(doc_id::VARCHAR), kk + 1, 1)) - 1)
                  * (1 << (4 * (3 - kk)))))::DOUBLE + 0.5) / 65536.0)),
               6) AS gumbel_key
  FROM scored
),
ranked AS (
  SELECT doc_id, mean_lr, gumbel_key,
         row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC)::INTEGER
           AS rank
  FROM keyed
)
SELECT doc_id, mean_lr, gumbel_key, rank
FROM ranked WHERE rank <= {_DSIR_K}
ORDER BY rank
"""
)


# ---------------------------------------------------------------------------
# UniMax epoch-capped budget allocation
# ---------------------------------------------------------------------------

_UNIMAX_FRAC_E6 = 1800000  # budget = 1.8x the corpus (forces the cap to bind)
_UNIMAX_CAP = 2


def q_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. 2023) language-budget waterfilling over
    the skewed ``lang`` column: every low-resource language runs its
    full ``epoch_cap`` epochs, the head language absorbs the leftover
    at the common water level. See
    :func:`..operators.sampling.unimax_alloc`; the oracle replays the
    exact-integer prefix test and the single rounded division."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.unimax_alloc(
        docs,
        budget_frac_e6=_UNIMAX_FRAC_E6,
        epoch_cap=_UNIMAX_CAP,
        group_col="lang",
    )


Q_UNIMAX_ALLOC_ORACLE = f"""
WITH c AS (
  SELECT lang AS grp, sum(n_chars)::BIGINT AS n FROM documents GROUP BY lang
),
t AS (SELECT sum(n)::BIGINT AS tot FROM c),
s AS (
  SELECT grp, n, (n * {_UNIMAX_CAP})::BIGINT AS s,
         ((tot::HUGEINT * {_UNIMAX_FRAC_E6}) // 1000000)::BIGINT AS B
  FROM c CROSS JOIN t
),
m AS (
  SELECT grp, n, s, B,
         coalesce(sum(s) OVER (ORDER BY s ASC, grp ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         count(*) OVER () AS k,
         row_number() OVER (ORDER BY s ASC, grp ASC) AS i
  FROM s
),
f AS (
  SELECT grp, n, s, B, (s * (k - i + 1) <= B - cum) AS is_full FROM m
),
g AS (
  SELECT grp, n, s, B, is_full,
         sum(CASE WHEN is_full THEN s ELSE 0 END) OVER ()::BIGINT AS s_full,
         (count(*) OVER ()
          - sum(CASE WHEN is_full THEN 1 ELSE 0 END) OVER ())::BIGINT AS n_not
  FROM f
),
a AS (
  SELECT grp, n, s,
         CASE WHEN is_full THEN s::DOUBLE
              ELSE round((B - s_full)::DOUBLE / greatest(n_not, 1), 6)
         END AS alloc
  FROM g
)
SELECT grp AS lang, n::BIGINT AS n, s::BIGINT AS supply, alloc,
       round(alloc / n, 6) AS epochs
FROM a ORDER BY lang
"""


# ---------------------------------------------------------------------------
# DoReMi-lite domain reweighting
# ---------------------------------------------------------------------------


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exponentiated-gradient DoReMi step (Xie et al. 2023) over
    per-source excess unigram-NLL. See
    :func:`..operators.text.doremi_weights`; the oracle replays the
    e6-snapped NLL model, the exact `div` losses, and the EG step."""
    docs = load_table(spark, sf_dir, "documents")
    return X.doremi_weights(docs, eta=1.0)


Q_DOREMI_WEIGHTS_ORACLE = f"""
WITH {_TOK_CTE},
tt AS (
  SELECT d.source AS grp, unnest(t.toks) AS term
  FROM tok t JOIN documents d ON t.doc_id = d.doc_id
),
c AS (SELECT term, count(*) AS c FROM tt GROUP BY term),
tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM c),
w AS (
  SELECT term,
         round(-ln((c.c + 1)::DOUBLE / (tot.total + tot.vocab))
               * 1000000, 0)::BIGINT AS nll_e6
  FROM c, tot
),
per AS (
  SELECT grp, count(*)::BIGINT AS n_tokens, sum(nll_e6)::BIGINT AS sum_nll_e6
  FROM tt JOIN w USING (term) GROUP BY grp
),
g AS (
  SELECT grp, n_tokens, sum_nll_e6,
         sum(sum_nll_e6) OVER ()::BIGINT AS tsum,
         sum(n_tokens) OVER ()::BIGINT AS tn
  FROM per
),
e AS (
  SELECT grp, n_tokens,
         (sum_nll_e6 // n_tokens)::BIGINT AS loss_e6,
         greatest((sum_nll_e6 // n_tokens) - (tsum // tn), 0)::BIGINT
           AS excess_e6,
         n_tokens::DOUBLE / tn AS share
  FROM g
),
r AS (
  SELECT grp, n_tokens, loss_e6, excess_e6, share,
         share * exp(1.0 * excess_e6 / 1000000.0) AS raw
  FROM e
)
SELECT grp AS source, n_tokens, loss_e6, excess_e6,
       round(share, 6) AS share,
       round(raw / sum(raw) OVER (), 6) AS weight
FROM r ORDER BY source
"""


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

_CDC_WIN = 8
_CDC_MOD = 64


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined (FastCDC-style) chunk table — shift-robust
    boundaries from trailing-window hashes. See
    :func:`..operators.text.cdc_chunks`; the oracle replays the
    identical per-position md5 boundary test and span slicing."""
    docs = load_table(spark, sf_dir, "documents")
    return X.cdc_chunks(docs, window=_CDC_WIN, modulus=_CDC_MOD).orderBy(
        "doc_id", "chunk_id"
    )


# shared CTE chain (boundary positions -> spans -> chunk table), used
# by the chunk-table oracle AND the chunk-level dup census
_CDC_CTES = f"""
b AS (
  SELECT doc_id, text, length(text)::BIGINT AS n,
         CASE WHEN length(text) >= {_CDC_WIN} THEN
           list_filter(range({_CDC_WIN}, length(text) + 1), i ->
             (list_sum(list_transform(range(4), k ->
                 (strpos('0123456789abcdef',
                         substr(md5(substr(text, (i - {_CDC_WIN} + 1)::INTEGER,
                                           {_CDC_WIN})), k + 1, 1)) - 1)
                 * (1 << (4 * (3 - k)))))::BIGINT % {_CDC_MOD}) = 0)
         ELSE []::BIGINT[] END AS bnds
  FROM documents
),
sp AS (
  SELECT doc_id, text,
         list_prepend(0, bnds) AS starts,
         list_append(bnds, n) AS ends
  FROM b
),
ex AS (
  SELECT doc_id, text, starts, ends,
         unnest(range(len(starts))) AS j
  FROM sp
),
chunks AS (
  SELECT doc_id, j::INTEGER AS chunk_id,
         starts[j + 1]::BIGINT AS start,
         (ends[j + 1] - starts[j + 1])::BIGINT AS chunk_len,
         md5(substr(text, (starts[j + 1] + 1)::INTEGER,
                    (ends[j + 1] - starts[j + 1])::INTEGER)) AS chunk_hash
  FROM ex
  WHERE ends[j + 1] > starts[j + 1]
)
"""

Q_CDC_CHUNKS_ORACLE = f"""
WITH {_CDC_CTES}
SELECT doc_id, chunk_id, start, chunk_len, chunk_hash
FROM chunks ORDER BY doc_id, chunk_id
"""


def q_cdc_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication census over the CDC chunk table
    (min-owner convention). See
    :func:`..operators.text.cdc_dup_stats`; the oracle replays the
    chunk CTEs, the min-owner table, and the per-doc rollup."""
    docs = load_table(spark, sf_dir, "documents")
    return X.cdc_dup_stats(docs, window=_CDC_WIN, modulus=_CDC_MOD).orderBy(
        "doc_id"
    )


Q_CDC_DUP_STATS_ORACLE = f"""
WITH {_CDC_CTES},
own AS (
  SELECT chunk_hash, min(doc_id) AS owner FROM chunks GROUP BY chunk_hash
)
SELECT c.doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN o.owner < c.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_dup_chunks,
       sum(CASE WHEN o.owner < c.doc_id THEN c.chunk_len ELSE 0 END)::BIGINT
         AS dup_chars,
       sum(c.chunk_len)::BIGINT AS total_chars,
       round(sum(CASE WHEN o.owner < c.doc_id
                      THEN c.chunk_len ELSE 0 END)::DOUBLE
             / greatest(sum(c.chunk_len), 1), 6) AS dup_char_ratio
FROM chunks c JOIN own o USING (chunk_hash)
GROUP BY c.doc_id ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# semantic decontamination (corpus vs eval set, cell-confined)
# ---------------------------------------------------------------------------

_SEMCON_TAU = 0.5


def q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: every 20th vector stands in
    for the benchmark/eval set; corpus vectors cosine-similar to an
    in-cell benchmark vector are flagged. The oracle replays the
    unrolled k-means quantizer, the cell-confined corpus x benchmark
    scoring, and the clean rule. See
    :func:`..operators.similarity.semantic_contamination`."""
    from rootstock_collective_state_sync_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    corp = emb.filter(F.col("vec_id") % 20 != 0)
    return S.semantic_contamination(
        corp, bench, num_cells=16, threshold=_SEMCON_TAU
    ).orderBy("vec_id")


def _semantic_contamination_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.training import (
        _COS_SQL,
        _ivf_cells_oracle,
    )

    return _ivf_cells_oracle(tail=f""",
corp AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
  WHERE e.vec_id % 20 <> 0
),
bt AS (
  SELECT e.embedding, c.cell
  FROM embeddings e JOIN cells c USING (vec_id)
  WHERE e.vec_id % 20 = 0
),
pr AS (
  SELECT corp.vec_id AS id,
         {_COS_SQL.format(a="corp.embedding", b="bt.embedding")} AS s
  FROM corp JOIN bt ON corp.cell = bt.cell
),
h AS (
  SELECT id, count(*)::BIGINT AS n_bench_hits, max(s) AS max_bench_sim
  FROM pr WHERE s >= {_SEMCON_TAU} GROUP BY id
)
SELECT t.vec_id, t.cell,
       coalesce(h.n_bench_hits, 0)::BIGINT AS n_bench_hits,
       h.max_bench_sim,
       (CASE WHEN h.id IS NULL THEN 1 ELSE 0 END)::INTEGER AS clean
FROM corp t LEFT JOIN h ON t.vec_id = h.id
ORDER BY t.vec_id""")


Q_SEMANTIC_CONTAMINATION_ORACLE = _semantic_contamination_oracle()


# ---------------------------------------------------------------------------
# BM25 retrieval over a query table
# ---------------------------------------------------------------------------

_BM25_QUERIES = (
    (1, "fast hash join merge"),
    (2, "window stream batch spark"),
    (3, "slow table scan filter"),
)
_BM25_K = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query over a fixed 3-query table. See
    :func:`..operators.text.bm25_topk`; the oracle replays the
    query-term broadcast filter, the Lucene +1 IDF, the e6-snapped
    per-term contributions, and the per-query shortlist."""
    docs = load_table(spark, sf_dir, "documents")
    queries = local_df(
        spark, list(_BM25_QUERIES), "query_id long, query_text string"
    )
    return X.bm25_topk(docs, queries, k=_BM25_K).orderBy("query_id", "rk")


_BM25_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)

Q_BM25_TOPK_ORACLE = f"""
WITH {_TOK_CTE},
q(query_id, query_text) AS (VALUES {_BM25_VALUES}),
tokd AS (SELECT doc_id, unnest(toks) AS term FROM tok),
stats AS (SELECT count(*)::BIGINT AS N, sum(len(toks))::BIGINT AS T FROM tok),
qt AS (
  SELECT query_id,
         unnest(list_distinct(list_filter(
             string_split_regex(lower(query_text), '[^a-z0-9]+'),
             x -> x <> ''))) AS term
  FROM q
),
ts AS (SELECT DISTINCT term FROM qt),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tokd JOIN ts USING (term) GROUP BY 1, 2
),
dfv AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
idf AS (
  SELECT term, ln((s.N::DOUBLE - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM dfv, stats s
),
dls AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tok),
avgv AS (SELECT T::DOUBLE / greatest(N, 1) AS avgdl FROM stats),
co AS (
  SELECT qt.query_id, tf.doc_id,
         round(idf.idf
               * (tf.tf::DOUBLE * 2.2
                  / (tf.tf::DOUBLE
                     + 1.2 * (0.25 + 0.75 * dls.dl / avgv.avgdl)))
               * 1000000.0, 0)::BIGINT AS c_e6
  FROM tf
  JOIN dls USING (doc_id)
  JOIN idf USING (term)
  JOIN qt USING (term)
  CROSS JOIN avgv
),
scored AS (
  SELECT query_id, doc_id, count(*)::BIGINT AS n_hit_terms,
         sum(c_e6)::BIGINT AS s_e6
  FROM co GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, n_hit_terms, s_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s_e6 DESC, doc_id ASC)::INTEGER AS rk
  FROM scored
)
SELECT query_id, rk, doc_id, n_hit_terms,
       round(s_e6::DOUBLE / 1000000.0, 6) AS score
FROM ranked WHERE rk <= {_BM25_K}
ORDER BY query_id, rk
"""


# ---------------------------------------------------------------------------
# per-source corpus datasheet
# ---------------------------------------------------------------------------


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source governance census (volumes, length moments, integer
    mean quality, language spread + modal language). See
    :func:`..operators.text.corpus_datasheet`; the oracle replays the
    integer `div` means and the (count desc, lang asc) mode rank."""
    docs = load_table(spark, sf_dir, "documents")
    return X.corpus_datasheet(docs)


Q_CORPUS_DATASHEET_ORACLE = f"""
WITH {_QUALITY_E7_CTE},
per AS (
  SELECT d.source AS grp,
         count(*)::BIGINT AS n_docs,
         sum(len(t.toks))::BIGINT AS total_tokens,
         sum(length(d.text))::BIGINT AS total_chars,
         min(length(d.text))::BIGINT AS min_chars,
         max(length(d.text))::BIGINT AS max_chars,
         sum(q.q_e7)::BIGINT AS sq_e7,
         count(DISTINCT d.lang)::BIGINT AS n_langs
  FROM documents d
  JOIN tok t ON d.doc_id = t.doc_id
  JOIN q ON d.doc_id = q.doc_id
  GROUP BY d.source
),
lc AS (
  SELECT source AS grp, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2
),
tl AS (
  SELECT grp, lang AS top_lang FROM (
    SELECT grp, lang,
           row_number() OVER (PARTITION BY grp
                              ORDER BY c DESC, lang ASC) AS r
    FROM lc
  ) WHERE r = 1
)
SELECT per.grp AS source, n_docs, total_tokens,
       (total_tokens // n_docs)::BIGINT AS mean_tokens,
       total_chars, min_chars, max_chars,
       (sq_e7 // n_docs)::BIGINT AS mean_quality_e7,
       n_langs, tl.top_lang
FROM per JOIN tl ON per.grp = tl.grp
ORDER BY source
"""


def q_quality_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-curve summary beside `quality_auc`'s ROC view: exact
    tie-aware average precision of the heuristic quality score
    against the Gopher keep decision — the imbalance-honest metric.
    See :func:`..operators.evaluate.average_precision`."""
    from rootstock_collective_state_sync_spark.operators import rules as RL
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        average_precision,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = RL.gopher_quality(docs).select(
        "doc_id", F.col("gopher_keep").cast("int").alias("keep")
    )
    q = docs.select(
        "doc_id", X.quality_score_e7(F.col("text")).alias("q_e7")
    )
    return average_precision(q.join(flags, "doc_id"), "q_e7", "keep")


def _quality_avg_precision_oracle() -> str:
    from rootstock_collective_state_sync_spark.plans.quality import (
        Q_GOPHER_QUALITY_ORACLE,
    )

    return f"""
WITH g AS (
  SELECT doc_id, gopher_keep AS keep FROM ({Q_GOPHER_QUALITY_ORACLE})
),
q2 AS (
  SELECT doc_id, q_e7 FROM (WITH {_QUALITY_E7_CTE} SELECT * FROM q)
),
j AS (SELECT q2.q_e7 AS s, g.keep FROM q2 JOIN g USING (doc_id)),
ps AS (
  SELECT s, sum(keep)::BIGINT AS pos, count(*)::BIGINT AS tot
  FROM j GROUP BY s
),
sc AS (
  SELECT *,
         coalesce(sum(pos) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pref_pos,
         coalesce(sum(tot) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pref_tot
  FROM ps
),
t AS (SELECT sum(pos)::BIGINT AS p_all, sum(tot)::BIGINT AS t_all FROM ps)
SELECT t.p_all AS n_pos, (t.t_all - t.p_all)::BIGINT AS n_neg,
       sum(CASE WHEN t.p_all > 0 AND pos > 0
                THEN round(pos::DOUBLE * (t.p_all - pref_pos) * 1e9
                           / ((t.t_all - pref_tot)::DOUBLE * t.p_all))
                ELSE 0 END)::BIGINT AS ap_e9
FROM sc, t GROUP BY t.p_all, t.t_all
"""


Q_QUALITY_AVG_PRECISION_ORACLE = _quality_avg_precision_oracle()


def q_classifier_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the in-engine domain classifier's
    binned Brier score (reliability − resolution + uncertainty) —
    the scalar companion to the `classifier_calibration` reliability
    diagram. See :func:`..operators.evaluate.brier_decomposition`."""
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        brier_decomposition,
    )

    docs = load_table(spark, sf_dir, "documents")
    label = F.array_contains(X.tokens(F.col("text")), "spark").cast("int")
    w, b = X.train_logistic_head(
        docs,
        label_col=label,
        dim=_HASH_DIM,
        sample_size=_CLF_SAMPLE,
        iters=_CLF_ITERS,
        lr=_CLF_LR,
    )
    scores = X.score_logistic_head(docs, w, b, dim=_HASH_DIM)
    joined = docs.select("doc_id", label.alias("y")).join(scores, "doc_id")
    return brier_decomposition(joined, "score", "y", bins=10)


def _classifier_brier_oracle() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, label AS y, score FROM ({_domain_classifier_oracle()})
),
per AS (
  SELECT least(floor(score * 10)::INTEGER, 9) AS bin,
         count(*)::BIGINT AS nk,
         sum(round(score * 1e6)::BIGINT)::BIGINT AS sp6,
         sum(y)::BIGINT AS yk
  FROM base GROUP BY 1
),
t AS (SELECT sum(nk)::BIGINT AS n, sum(yk)::BIGINT AS n_pos FROM per),
terms AS (
  SELECT t.n, t.n_pos,
         round(nk::DOUBLE * (sp6::DOUBLE / (nk * 1e6) - yk::DOUBLE / nk)
               * (sp6::DOUBLE / (nk * 1e6) - yk::DOUBLE / nk)
               / t.n * 1e9)::BIGINT AS rel_t,
         round(nk::DOUBLE
               * (yk::DOUBLE / nk - t.n_pos::DOUBLE / t.n)
               * (yk::DOUBLE / nk - t.n_pos::DOUBLE / t.n)
               / t.n * 1e9)::BIGINT AS res_t
  FROM per, t
),
agg AS (
  SELECT n, n_pos, sum(rel_t)::BIGINT AS rel_e9,
         sum(res_t)::BIGINT AS res_e9
  FROM terms GROUP BY 1, 2
)
SELECT n, n_pos, rel_e9, res_e9,
       round(n_pos::DOUBLE * (n - n_pos) / (n::DOUBLE * n)
             * 1e9)::BIGINT AS unc_e9,
       (rel_e9 - res_e9
        + round(n_pos::DOUBLE * (n - n_pos) / (n::DOUBLE * n)
                * 1e9)::BIGINT)::BIGINT AS brier_e9
FROM agg
"""


Q_CLASSIFIER_BRIER_ORACLE = _classifier_brier_oracle()
