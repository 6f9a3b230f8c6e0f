"""Similarity-search queries over the `embeddings` table.

All cosine math uses the integer-quantization scheme from
operators/similarity.py so the DuckDB oracle reproduces Spark's doubles
bit-for-bit (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators import similarity as S
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

_QUANT = "CAST(round(CAST({x} AS DOUBLE) * 1000) AS BIGINT)"


# --------------------------------------------------------------------------
_BRUTE_FORCE_ORACLE = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 10),
    pairs AS (
      SELECT qid, e.vec_id AS nid, qe, e.embedding AS ne
      FROM q, embeddings e WHERE e.vec_id <> q.qid
    ),
    comp AS (
      SELECT qid, nid,
             CAST(SUM(t.qq * t.nq) AS BIGINT) AS dot,
             CAST(SUM(t.qq * t.qq) AS BIGINT) AS qn,
             CAST(SUM(t.nq * t.nq) AS BIGINT) AS nn
      FROM pairs, LATERAL (
        SELECT {_QUANT.format(x='qe[i]')} AS qq,
               {_QUANT.format(x='ne[i]')} AS nq
        FROM generate_series(1, 64) g(i)
      ) t
      GROUP BY qid, nid
    ),
    ranked AS (
      SELECT qid, nid,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) AS cosine,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                        nid) AS rank
      FROM comp
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= 5 ORDER BY qid, rank
    """


@register(
    "ann_cosine_topk",
    oracle=_BRUTE_FORCE_ORACLE,
    tags=("similarity", "bench"),
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.brute_force_topk(emb, queries, k=5)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


# Same semantics + oracle, Arrow-vectorized numpy path (exactness proven
# by sharing the oracle with the Column-expression implementation).
@register(
    "ann_cosine_topk_vectorized",
    oracle=_BRUTE_FORCE_ORACLE,
    tags=("similarity", "vectorized"),
)
def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.vectorized_topk(emb, queries, k=5)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, q,
             array_to_string(list_transform(q[1:8],
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM qv
    ),
    qs AS (SELECT vec_id AS qid, q AS qq, bucket FROM b WHERE vec_id < 10),
    cand AS (
      SELECT qid, c.vec_id AS nid, qq, c.q AS nq
      FROM qs JOIN b c USING (bucket) WHERE c.vec_id <> qs.qid
    ),
    comp AS (
      SELECT qid, nid,
             CAST(SUM(t.x * t.y) AS BIGINT) AS dot,
             CAST(SUM(t.x * t.x) AS BIGINT) AS qn,
             CAST(SUM(t.y * t.y) AS BIGINT) AS nn
      FROM cand, LATERAL (
        SELECT qq[i] AS x, nq[i] AS y FROM generate_series(1, 64) g(i)
      ) t
      GROUP BY qid, nid
    ),
    ranked AS (
      SELECT qid, nid,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) AS cosine,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                        nid) AS rank
      FROM comp
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank
    """,
    tags=("similarity",),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.lsh_topk(emb, queries, k=3, n_bits=8)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
@register(
    "embedding_neardup",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding, label
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    qv AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM base
    ),
    qb AS (
      SELECT vec_id, label, q,
             array_to_string(list_transform(q[1:8],
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM qv
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.q AS qa, b.q AS qb
      FROM qb a JOIN qb b
        ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    comp AS (
      SELECT vec_a, vec_b,
             CAST(SUM(t.x * t.y) AS BIGINT) AS dot,
             CAST(SUM(t.x * t.x) AS BIGINT) AS na,
             CAST(SUM(t.y * t.y) AS BIGINT) AS nb
      FROM pairs, LATERAL (
        SELECT qa[i] AS x, qb[i] AS y FROM generate_series(1, 64) g(i)
      ) t
      GROUP BY vec_a, vec_b
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine
    FROM comp
    WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= 0.999
    ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "dedup"),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 == 0).unionByName(
        emb.where(F.col("vec_id") % 100 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
        )
    )
    return S.near_dup_pairs(base).orderBy("vec_a", "vec_b")


# --------------------------------------------------------------------------
@register(
    "embedding_centroids",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM({_QUANT.format(x='embedding[1]')}) AS DOUBLE) / COUNT(*) AS c0,
           CAST(SUM({_QUANT.format(x='embedding[2]')}) AS DOUBLE) / COUNT(*) AS c1,
           CAST(SUM({_QUANT.format(x='embedding[3]')}) AS DOUBLE) / COUNT(*) AS c2,
           CAST(SUM({_QUANT.format(x='embedding[4]')}) AS DOUBLE) / COUNT(*) AS c3
    FROM embeddings
    GROUP BY label ORDER BY label
    """,
    tags=("similarity", "agg"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.label_centroids(emb, dims=4).orderBy("label")


# --------------------------------------------------------------------------
# Product quantization + asymmetric distance (the IVF-PQ building
# block): corpus compressed to 4×2-bit codes (one byte per 64-float
# vector), queries scored via per-subspace lookup tables. md5-order
# codebooks keep the whole pipeline integer-replayable — see
# operators/similarity.pq_encode_topk.
@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    seeds AS (
      SELECT (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                - 1) AS c,
             q AS cv
      FROM (SELECT vec_id, q FROM qv
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4)
    ),
    sd AS (
      SELECT v.vec_id, sub.s, sc.c,
             SUM((v.q[sub.s*16 + t.i] - sc.cv[sub.s*16 + t.i])
                 * (v.q[sub.s*16 + t.i] - sc.cv[sub.s*16 + t.i])) AS d
      FROM qv v,
           LATERAL (SELECT s FROM generate_series(0, 3) g(s)) sub,
           seeds sc,
           LATERAL (SELECT i FROM generate_series(1, 16) g(i)) t
      GROUP BY v.vec_id, sub.s, sc.c
    ),
    codes AS (
      SELECT vec_id, s, c AS code FROM (
        SELECT vec_id, s, c,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        FROM sd) WHERE rn = 1
    ),
    qsd AS (SELECT vec_id AS qid, s, c, d FROM sd WHERE vec_id < 5),
    pairs AS (
      SELECT q.qid, n.vec_id AS nid, SUM(q.d) AS adist
      FROM codes n
      JOIN qsd q ON q.s = n.s AND q.c = n.code
      WHERE n.vec_id <> q.qid
      GROUP BY q.qid, n.vec_id
    ),
    ranked AS (
      SELECT qid, nid, adist,
             row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
      FROM pairs
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, CAST(adist AS BIGINT) AS adist
    FROM ranked WHERE rank <= 5 ORDER BY qid, rank
    """,
    tags=("similarity", "ann"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = S.pq_encode_topk(emb, queries, k=5)
    return out.orderBy("qid", "rank")


# --------------------------------------------------------------------------
# ANN quality measurement: recall@3 of the sign-LSH index against exact
# brute-force ground truth, per query — the metric a real vector-index
# deployment tracks. Both pipelines run inside the query; recall is an
# exact integer (hits * 1000 // k) so the comparison is engine-stable.
_GT_CTES = f"""
    qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id < 10),
    gt_comp AS (
      SELECT qs.qid, c.vec_id AS nid,
             CAST(SUM(t.x * t.y) AS BIGINT) AS dot,
             CAST(SUM(t.x * t.x) AS BIGINT) AS qn,
             CAST(SUM(t.y * t.y) AS BIGINT) AS nn
      FROM qs, qv c,
           LATERAL (SELECT qs.qq[i] AS x, c.q[i] AS y
                    FROM generate_series(1, 64) g(i)) t
      WHERE c.vec_id <> qs.qid
      GROUP BY qs.qid, c.vec_id
    ),
    gt AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                          nid) AS rank
        FROM gt_comp) WHERE rank <= 3
    ),
    b AS (
      SELECT vec_id, q,
             array_to_string(list_transform(q[1:8],
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM qv
    ),
    lsh_cand AS (
      SELECT s.vec_id AS qid, c.vec_id AS nid, s.q AS qq, c.q AS nq
      FROM b s JOIN b c USING (bucket)
      WHERE s.vec_id < 10 AND c.vec_id <> s.vec_id
    ),
    lsh_comp AS (
      SELECT qid, nid,
             CAST(SUM(t.x * t.y) AS BIGINT) AS dot,
             CAST(SUM(t.x * t.x) AS BIGINT) AS qn,
             CAST(SUM(t.y * t.y) AS BIGINT) AS nn
      FROM lsh_cand, LATERAL (
        SELECT qq[i] AS x, nq[i] AS y FROM generate_series(1, 64) g(i)) t
      GROUP BY qid, nid
    ),
    lsh AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY CAST(dot AS DOUBLE)
                          / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                          nid) AS rank
        FROM lsh_comp) WHERE rank <= 3
    )
"""


@register(
    "ann_lsh_recall",
    oracle=f"""
    WITH {_GT_CTES}
    SELECT g.qid,
           CAST(COUNT(l.nid) AS BIGINT) AS hits,
           CAST(COUNT(l.nid) * 1000 // 3 AS BIGINT) AS recall_x1000
    FROM gt g LEFT JOIN lsh l ON l.qid = g.qid AND l.nid = g.nid
    GROUP BY g.qid
    ORDER BY g.qid
    """,
    tags=("similarity", "ann", "measurement"),
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    gt = S.brute_force_topk(emb, queries, k=3).select("qid", "nid")
    lsh = S.lsh_topk(emb, queries, k=3, n_bits=8).select(
        F.col("qid").alias("l_qid"), F.col("nid").alias("l_nid")
    )
    joined = gt.join(
        lsh,
        (F.col("qid") == F.col("l_qid")) & (F.col("nid") == F.col("l_nid")),
        "left",
    )
    return (
        joined.groupBy("qid")
        .agg(F.count("l_nid").alias("hits"))
        .select(
            "qid",
            F.col("hits").cast("long").alias("hits"),
            F.floor(F.col("hits") * 1000 / 3).cast("long").alias("recall_x1000"),
        )
        .orderBy("qid")
    )


# --------------------------------------------------------------------------
# Hard-negative mining: for each query vector, the top-5 most-similar
# corpus vectors with a DIFFERENT label — the contrastive-training data
# prep step. Same broadcast-queries x one-corpus-scan shape as
# ann_cosine_topk; the label inequality is part of the broadcast join
# condition so cross-label pairs never reach the scoring shuffle.
@register(
    "ann_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
               FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT qid, e.vec_id AS nid, qe, e.embedding AS ne
      FROM q, embeddings e
      WHERE e.vec_id <> q.qid AND e.label <> q.qlabel
    ),
    comp AS (
      SELECT qid, nid,
             CAST(SUM(t.qq * t.nq) AS BIGINT) AS dot,
             CAST(SUM(t.qq * t.qq) AS BIGINT) AS qn,
             CAST(SUM(t.nq * t.nq) AS BIGINT) AS nn
      FROM pairs, LATERAL (
        SELECT {_QUANT.format(x='qe[i]')} AS qq,
               {_QUANT.format(x='ne[i]')} AS nq
        FROM generate_series(1, 64) g(i)
      ) t
      GROUP BY qid, nid
    ),
    ranked AS (
      SELECT qid, nid,
             CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) AS cosine,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                        nid) AS rank
      FROM comp
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= 5 ORDER BY qid, rank
    """,
    tags=("similarity", "training"),
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.hard_negative_topk(emb, queries, k=5)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
# Hybrid retrieval with reciprocal-rank fusion: the lexical ranking
# (integer-idf tf scoring, as text_ranked_search) and the vector
# ranking (exact integer-quantized cosine vs the vec_id-0 query) each
# produce a top-100 list; RRF fuses them as
#   score = Σ_lists 10⁹ div (60 + rank)
# — integer division, so fusion is exact arithmetic and the fused
# order is a total order (ties broken by doc_id). The standard
# RAG-retrieval shape: both lists are top-k-bounded BEFORE the join,
# so the fuse step touches ≤ 200 rows regardless of corpus size.
_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_HYBRID_TERMS = ("merge", "vector", "stream")


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
      WHERE token IN {str(tuple(_HYBRID_TERMS))}
      GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    idf AS (
      SELECT token, (((SELECT n FROM n) - df) * 1000) // df AS idf_q FROM df
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN {str(tuple(_HYBRID_TERMS))}
      GROUP BY doc_id, token
    ),
    scored AS (
      SELECT t.doc_id, SUM(t.tf * i.idf_q) AS score
      FROM tf t JOIN idf i USING (token)
      GROUP BY t.doc_id
    ),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM scored QUALIFY lex_rank <= 100
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    comp AS (
      SELECT e.vec_id AS nid,
             CAST(SUM(t.qq * t.nq) AS BIGINT) AS dot,
             CAST(SUM(t.qq * t.qq) AS BIGINT) AS qn,
             CAST(SUM(t.nq * t.nq) AS BIGINT) AS nn
      FROM embeddings e, q, LATERAL (
        SELECT {_QUANT.format(x='qe[i]')} AS qq,
               {_QUANT.format(x='e.embedding[i]')} AS nq
        FROM generate_series(1, 64) g(i)
      ) t
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ),
    ann AS (
      SELECT nid,
             row_number() OVER (
               ORDER BY CAST(dot AS DOUBLE)
                        / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) DESC,
                        nid) AS ann_rank
      FROM comp QUALIFY ann_rank <= 100
    )
    SELECT CAST(COALESCE(l.doc_id, a.nid) AS BIGINT) AS doc_id,
           CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(a.ann_rank, 0) AS BIGINT) AS ann_rank,
           CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + l.lex_rank), 0)
              + COALESCE({_RRF_SCALE} // ({_RRF_K} + a.ann_rank), 0)
             AS BIGINT) AS rrf_score
    FROM lex l FULL JOIN ann a ON a.nid = l.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
    tags=("similarity", "search", "text"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-20 of lexical and vector retrieval. Both arms end in
    TakeOrderedAndProject (orderBy+limit — no global sort), the fuse is
    a full outer join over ≤ 100+100 rows, and every score is integer
    arithmetic (`div`), so the fused list is bit-stable."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical arm (text_ranked_search's integer-idf scoring, k=100)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).where(F.col("token").isin(*_HYBRID_TERMS))
    n = docs.count()  # driver-side scalar (a count, not data)
    df_t = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_t.select(
        "token",
        F.floor(((F.lit(n) - F.col("df")) * 1000) / F.col("df")).alias("idf_q"),
    )
    scored = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .join(F.broadcast(idf), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_q")).alias("score"))
    )
    lex_top = scored.orderBy(F.col("score").desc(), "doc_id").limit(100)
    lw = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(lw).cast("long").alias("lex_rank")
    )

    # vector arm (brute-force exact cosine vs vec_id 0, k=100)
    ann = (
        S.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=100)
        .select(F.col("nid"), F.col("rank").cast("long").alias("ann_rank"))
    )

    fused = lex.join(ann, lex.doc_id == ann.nid, "full")
    rrf = F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0)
    ) + F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_K} + ann_rank)"), F.lit(0)
    )
    return (
        fused.select(
            F.coalesce(F.col("doc_id"), F.col("nid")).cast("long").alias(
                "doc_id"
            ),
            F.coalesce(F.col("lex_rank"), F.lit(0)).cast("long").alias(
                "lex_rank"
            ),
            F.coalesce(F.col("ann_rank"), F.lit(0)).cast("long").alias(
                "ann_rank"
            ),
            rrf.cast("long").alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Top principal direction by matrix-free power iteration — see
# operators/pca.py for the exact-integer scheme (quantize → v' = Xᵀ(Xv)
# in one pass per step → renormalize by exact floor division). The
# oracle replays both steps with the pmod floor-division identity,
# which is `//`-semantics-proof because its numerator is an exact
# multiple of the divisor.
@register(
    "embedding_pca_power",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, g.i, {_QUANT.format(x='embedding[g.i]')} AS q
      FROM embeddings, generate_series(1, 64) g(i)
    ),
    s1 AS (SELECT vec_id, SUM(q) AS s FROM e GROUP BY vec_id),
    m1 AS (SELECT e.i, CAST(SUM(s1.s * e.q) AS BIGINT) AS m
           FROM e JOIN s1 USING (vec_id) GROUP BY e.i),
    d1 AS (SELECT GREATEST(1, (MAX(ABS(m)) - (MAX(ABS(m)) % 1024)) // 1024)
             AS d FROM m1),
    v1 AS (SELECT i, (m - (((m % d) + d) % d)) // d AS v FROM m1, d1),
    s2 AS (SELECT e.vec_id, SUM(e.q * v1.v) AS s
           FROM e JOIN v1 USING (i) GROUP BY e.vec_id),
    m2 AS (SELECT e.i, CAST(SUM(s2.s * e.q) AS BIGINT) AS m
           FROM e JOIN s2 USING (vec_id) GROUP BY e.i),
    d2 AS (SELECT GREATEST(1, (MAX(ABS(m)) - (MAX(ABS(m)) % 1024)) // 1024)
             AS d FROM m2)
    SELECT CAST(i AS BIGINT) AS dim_idx,
           CAST((m - (((m % d) + d) % d)) // d AS BIGINT) AS v
    FROM m2, d2 ORDER BY dim_idx
    """,
    tags=("similarity", "embedding", "iterative"),
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.pca import power_iteration_top

    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration_top(emb, dims=64, steps=2).orderBy("dim_idx")


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss ±1 random projection (Achlioptas 2003;
# operators/randproj.py): 64-d embeddings squeezed to 16 dims with a
# compile-time md5 sign matrix. Every projected coordinate is an exact
# integer sum over quantized components — zero shuffles in the Spark
# plan (per-row aggregate folds), the matrix travels as a plan
# constant. The oracle rebuilds the same matrix with SQL md5.
@register(
    "embedding_random_projection",
    oracle="""
    WITH q AS (
      SELECT vec_id, t.i,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
               AS qv
      FROM embeddings,
           LATERAL (SELECT i FROM generate_series(1, 64) g(i)) t
      WHERE vec_id < 50
    ),
    s AS (
      SELECT a.j, b.i,
             CASE WHEN CAST(('0x' || substr(md5(CAST(a.j AS VARCHAR) || ':'
                              || CAST(b.i AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(1, 16) a(j), generate_series(1, 64) b(i)
    )
    SELECT q.vec_id, CAST(s.j AS BIGINT) AS dim,
           CAST(SUM(q.qv * s.sgn) AS BIGINT) AS proj_q
    FROM q JOIN s USING (i)
    GROUP BY 1, 2
    ORDER BY vec_id, dim
    """,
    tags=("similarity", "projection", "jl"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.randproj import random_project

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return random_project(emb, d=64, k=16).orderBy("vec_id", "dim")


# --------------------------------------------------------------------------
# Embedding-norm QA profile per label (round 12): the sanity table an
# ANN pipeline checks before indexing — unnormalized vectors, collapsed
# clusters, and dead labels all show up as squared-norm anomalies.
# Exactness without fold-order sensitivity: each element's square is
# quantized to an integer PER ELEMENT (floor(1e8 * x²) in float64 —
# float32→float64 conversion is exact, so both engines square the same
# doubles), and integer sums are order-free; no float accumulates
# across elements or rows anywhere in the compared result.
@register(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                               * 100000000) AS BIGINT))) AS sqnorm_x1e8
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(sqnorm_x1e8) AS BIGINT) AS min_sqnorm_x1e8,
           CAST(MAX(sqnorm_x1e8) AS BIGINT) AS max_sqnorm_x1e8,
           CAST(SUM(sqnorm_x1e8) // COUNT(*) AS BIGINT) AS avg_sqnorm_x1e8
    FROM n GROUP BY label ORDER BY label
    """,
    tags=("similarity", "dq", "stats"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    elem = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * x.cast("double") * F.lit(100000000.0)
        ).cast("long"),
    )
    n = emb.select(
        "label",
        F.aggregate(
            elem, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sqnorm_x1e8"),
    )
    return (
        n.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.min("sqnorm_x1e8").cast("long").alias("min_sqnorm_x1e8"),
            F.max("sqnorm_x1e8").cast("long").alias("max_sqnorm_x1e8"),
            F.expr("(SUM(sqnorm_x1e8)) div COUNT(*)")
            .cast("long")
            .alias("avg_sqnorm_x1e8"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "min_sqnorm_x1e8",
            "max_sqnorm_x1e8",
            "avg_sqnorm_x1e8",
        )
        .orderBy("label")
    )
