"""IVF (inverted-file) similarity search — the coarse-quantizer scale
path: assign every vector to its nearest integer centroid, probe only the
query's inverted list. Fully oracle-checkable thanks to integer centroids
(round(sum/n)) and integer-quantized cosines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators import similarity as S
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

_QUANT = "CAST(round(CAST({x} AS DOUBLE) * 1000) AS BIGINT)"


@register(
    "ann_ivf_topk",
    # r14: ivf_topk checkpoints the k-row centroid table (guide §2.4 —
    # it fed both the corpus and the query assignment).
    checkpointed=True,
    oracle=f"""
    WITH qv AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      FROM qv
    ),
    cent AS (
      SELECT cluster, list(s ORDER BY i) AS cq FROM (
        SELECT label AS cluster, g.i AS i,
               CAST(round(CAST(SUM(q[g.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s
        FROM qv, generate_series(1, 64) g(i)
        GROUP BY label, g.i
      ) GROUP BY cluster
    ),
    cent_n AS (
      SELECT cluster, cq,
             CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS cn
      FROM cent
    ),
    assign AS (
      SELECT vec_id, q, n2, cluster FROM (
        SELECT v.vec_id, v.q, v.n2, c.cluster,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY CAST(d.dot AS DOUBLE)
                          / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.cn AS DOUBLE)) DESC,
                          c.cluster) AS rn
        FROM norms v CROSS JOIN cent_n c, LATERAL (
          SELECT CAST(SUM(v.q[i] * c.cq[i]) AS BIGINT) AS dot
          FROM generate_series(1, 64) g(i)
        ) d
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST(d.dot AS DOUBLE)
             / sqrt(CAST(qa.n2 AS DOUBLE) * CAST(ca.n2 AS DOUBLE)) AS cosine
      FROM assign qa
      JOIN assign ca ON qa.cluster = ca.cluster AND ca.vec_id <> qa.vec_id,
      LATERAL (
        SELECT CAST(SUM(qa.q[i] * ca.q[i]) AS BIGINT) AS dot
        FROM generate_series(1, 64) g(i)
      ) d
      WHERE qa.vec_id < 10
    ),
    ranked AS (
      SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
      FROM scored
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank
    """,
    tags=("similarity",),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.ivf_topk(emb, queries, k=3)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


@register(
    "ann_ivf_topk_nprobe2",
    checkpointed=True,
    oracle=f"""
    WITH qv AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      FROM qv
    ),
    cent AS (
      SELECT cluster, list(s ORDER BY i) AS cq FROM (
        SELECT label AS cluster, g.i AS i,
               CAST(round(CAST(SUM(q[g.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s
        FROM qv, generate_series(1, 64) g(i)
        GROUP BY label, g.i
      ) GROUP BY cluster
    ),
    cent_n AS (
      SELECT cluster, cq,
             CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS cn
      FROM cent
    ),
    assign AS MATERIALIZED (
      -- list_dot_product is exact here (products <= (2.1e6)^2, 64-term
      -- sums < 2^53) and ~40x faster than the per-element LATERAL
      SELECT vec_id, q, n2, cluster, rn FROM (
        SELECT v.vec_id, v.q, v.n2, c.cluster,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY CAST(list_dot_product(v.q, c.cq) AS DOUBLE)
                          / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.cn AS DOUBLE)) DESC,
                          c.cluster) AS rn
        FROM norms v CROSS JOIN cent_n c
      )
    ),
    scored AS (
      SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST(list_dot_product(qa.q, ca.q) AS DOUBLE)
             / sqrt(CAST(qa.n2 AS DOUBLE) * CAST(ca.n2 AS DOUBLE)) AS cosine
      FROM assign qa
      JOIN assign ca ON qa.cluster = ca.cluster AND ca.vec_id <> qa.vec_id
                    AND ca.rn = 1
      WHERE qa.vec_id < 10 AND qa.rn <= 2
    ),
    ranked AS (
      SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
      FROM scored
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank
    """,
    tags=("similarity",),
)
def ann_ivf_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: queries probe their 2 nearest inverted lists —
    recall recovery for boundary vectors at the cost of one extra
    list scan per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.ivf_topk(emb, queries, k=3, nprobe=2)
    return out.select(
        "qid", "nid", F.col("rank").cast("long").alias("rank"), "cosine"
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
# The composed IVF-PQ index — coarse inverted lists bound the search,
# PQ codes compress the candidates (asymmetric-distance lookup tables).
# See operators/similarity.ivfpq_topk for the storage/probe story. The
# oracle replays BOTH stages: IVF centroid assignment (max integer-dot
# cosine) and the PQ codebook/encode/ADC arithmetic.
@register(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> {_QUANT.format(x='x')}) AS q
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      FROM qv
    ),
    cent AS (
      SELECT cluster, list(s ORDER BY i) AS cq FROM (
        SELECT label AS cluster, g.i AS i,
               CAST(round(CAST(SUM(q[g.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s
        FROM qv, generate_series(1, 64) g(i)
        GROUP BY label, g.i
      ) GROUP BY cluster
    ),
    cent_n AS (
      SELECT cluster, cq,
             CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS cn
      FROM cent
    ),
    assign AS (
      SELECT vec_id, q, cluster FROM (
        SELECT v.vec_id, v.q, c.cluster,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY CAST(d.dot AS DOUBLE)
                          / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.cn AS DOUBLE)) DESC,
                          c.cluster) AS rn
        FROM norms v CROSS JOIN cent_n c, LATERAL (
          SELECT CAST(SUM(v.q[i] * c.cq[i]) AS BIGINT) AS dot
          FROM generate_series(1, 64) g(i)
        ) d
      ) WHERE rn = 1
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
    qassign AS (SELECT vec_id AS qid, cluster FROM assign WHERE vec_id < 10),
    qsd AS (SELECT vec_id AS qid, s, c, d FROM sd WHERE vec_id < 10),
    pairs AS (
      SELECT qa.qid, n.vec_id AS nid, SUM(qs.d) AS adist
      FROM assign n
      JOIN qassign qa ON qa.cluster = n.cluster AND n.vec_id <> qa.qid
      JOIN codes c ON c.vec_id = n.vec_id
      JOIN qsd qs ON qs.qid = qa.qid AND qs.s = c.s AND qs.c = c.code
      GROUP BY qa.qid, n.vec_id
    ),
    ranked AS (
      SELECT qid, nid, adist,
             row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
      FROM pairs
    )
    SELECT qid, nid, CAST(rank AS BIGINT) AS rank, CAST(adist AS BIGINT) AS adist
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank
    """,
    tags=("similarity", "ann"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.ivfpq_topk(emb, queries, k=3)
    return out.orderBy("qid", "rank")
