"""Privacy-audit queries (round 10): k-anonymity suppression,
l-diversity, and the generalization ladder over the documents table
(operators/privacy.py) — the group-level disclosure-risk checks of a
corpus release, complementing the row-level PII family (pii_redact,
gdpr_forget_users). All-integer/boolean outputs; DuckDB replays each
bit-exactly.

Quasi-identifiers are synthesized from the corpus's own metadata:
(source, lang, size-bucket) — exactly the side columns a published
training corpus ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.privacy import (
    generalization_ladder,
    k_anonymity_groups,
    l_diversity_audit,
)
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

_K = 5
_L = 3


@register(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT source, lang,
           CAST(n_chars - n_chars % 200 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) < {_K} AS suppressed
    FROM documents
    GROUP BY source, lang, bucket
    ORDER BY source, lang, bucket
    """,
    tags=("privacy", "agg"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (source, lang, 200-char size bucket) quasi-identifier
    group with its count; groups under k={_K} flagged suppressed. One
    hash-agg."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "bucket",
        (F.col("n_chars") - F.col("n_chars") % 200).cast("long"),
    )
    return k_anonymity_groups(
        docs, ["source", "lang", "bucket"], k=_K
    ).orderBy("source", "lang", "bucket")


@register(
    "privacy_l_diversity",
    oracle=f"""
    SELECT source,
           CAST(n_chars - n_chars % 500 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS distinct_sensitive,
           COUNT(DISTINCT lang) >= {_L} AS diverse
    FROM documents
    GROUP BY source, bucket
    ORDER BY source, bucket
    """,
    tags=("privacy", "agg"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity of the language column inside each
    (source, 500-char bucket) group — a k-anonymous group with one
    language still leaks it (homogeneity attack)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "bucket",
        (F.col("n_chars") - F.col("n_chars") % 500).cast("long"),
    )
    return l_diversity_audit(
        docs, ["source", "bucket"], "lang", l=_L
    ).orderBy("source", "bucket")


_WIDTHS: list[int | None] = [200, 1000, None]


@register(
    "privacy_generalization_ladder",
    oracle=f"""
    WITH lv AS (
      SELECT source, u.level,
             CASE u.level WHEN 0 THEN 200 WHEN 1 THEN 1000
                          ELSE -1 END AS width,
             CASE u.level WHEN 0 THEN n_chars - n_chars % 200
                          WHEN 1 THEN n_chars - n_chars % 1000
                          ELSE -1 END AS bucket
      FROM documents, (SELECT unnest(range(0, {len(_WIDTHS)})) AS level) u),
    pb AS (
      SELECT source, level, width, bucket, COUNT(*) AS n
      FROM lv GROUP BY source, level, width, bucket),
    pl AS (
      SELECT source, level, width,
             COUNT(*) AS n_buckets, MIN(n) AS min_group
      FROM pb GROUP BY source, level, width),
    q AS (SELECT * FROM pl WHERE min_group >= {_K}),
    c AS (SELECT source, MIN(level) AS chosen_level FROM q GROUP BY source)
    SELECT c.source AS source,
           CAST(c.chosen_level AS BIGINT) AS chosen_level,
           CAST(q.width AS BIGINT) AS chosen_width,
           CAST(q.n_buckets AS BIGINT) AS n_buckets,
           CAST(q.min_group AS BIGINT) AS min_group
    FROM c JOIN q ON q.source = c.source AND q.level = c.chosen_level
    ORDER BY c.source
    """,
    tags=("privacy", "agg"),
)
def privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per source, the minimal n_chars generalization (200-wide →
    1000-wide → single bucket) at which every bucket is k-anonymous —
    Samarati's ladder as one relational pass (no per-level job)."""
    docs = load_table(spark, sf_dir, "documents")
    return generalization_ladder(
        docs, "source", "n_chars", _WIDTHS, k=_K
    ).orderBy("source")


_T_PPM = 300000  # t = 0.3


@register(
    "privacy_t_closeness",
    oracle=f"""
    WITH gs AS (
      SELECT lang, CAST(n_chars - n_chars % 500 AS BIGINT) AS bucket,
             source, COUNT(*) AS c_gs
      FROM documents GROUP BY lang, bucket, source
    ),
    g AS (SELECT lang, bucket, SUM(c_gs) AS c_g FROM gs GROUP BY lang, bucket),
    s AS (SELECT source, SUM(c_gs) AS c_s FROM gs GROUP BY source),
    tot AS (SELECT SUM(c_s) AS c FROM s),
    terms AS (
      SELECT gs.lang, gs.bucket, g.c_g, tot.c,
             GREATEST(gs.c_gs * tot.c - s.c_s * g.c_g, 0) AS num
      FROM gs
      JOIN s ON s.source = gs.source
      JOIN g ON g.lang = gs.lang AND g.bucket = gs.bucket
      CROSS JOIN tot
    )
    SELECT lang, bucket,
           CAST(c_g AS BIGINT) AS n,
           CAST(SUM(num) * 1000000 // (c_g * c) AS BIGINT) AS t_ppm,
           SUM(num) * 1000000 // (c_g * c) <= {_T_PPM} AS close
    FROM terms
    GROUP BY lang, bucket, c_g, c
    ORDER BY lang, bucket
    """,
    tags=("privacy", "agg"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over (lang, 500-char bucket) classes with `source`
    as the sensitive attribute — completes the k-anonymity /
    l-diversity / t-closeness release-audit trio. Exact-ppm total
    variation per class (operators/privacy.t_closeness_audit)."""
    from ftm_datalake_spark.operators.privacy import t_closeness_audit

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "bucket",
        (F.col("n_chars") - F.col("n_chars") % 500).cast("long"),
    )
    return t_closeness_audit(
        docs, ["lang", "bucket"], "source", t_ppm=_T_PPM
    ).orderBy("lang", "bucket")


_DMIN_PPM = 100_000
_DMAX_PPM = 600_000


@register(
    "privacy_delta_presence",
    oracle=f"""
    SELECT lang,
           CAST(n_chars - n_chars % 500 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_world,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_release,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS delta_ppm,
           SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) BETWEEN {_DMIN_PPM} AND {_DMAX_PPM} AS within
    FROM documents
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
    tags=("privacy", "agg"),
)
def privacy_delta_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """δ-presence over (lang, 500-char bucket) groups with a synthetic
    release membership (doc_id % 3 == 0 — a deterministic third of the
    corpus published): completes the k-anonymity / l-diversity /
    t-closeness / δ-presence release-audit quartet
    (operators/privacy.delta_presence_audit)."""
    from ftm_datalake_spark.operators.privacy import delta_presence_audit

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        (F.col("n_chars") - F.col("n_chars") % 500)
        .cast("long")
        .alias("bucket"),
        (F.col("doc_id") % 3 == 0).alias("released"),
    )
    return delta_presence_audit(
        docs, ["lang", "bucket"], "released", _DMIN_PPM, _DMAX_PPM
    ).orderBy("lang", "bucket")
