"""Remaining SURVEY §2 checklist items as oracle-paired queries:
A7 distinct line-sets, J8 set-equality checks, F12 coalesce chains,
A3 coverage intervals, and the approximate-distinct scale variant."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A7: distinct line-set (dedup identical lines before diffing).
# Reference: ftm_datalake/archive/documents.py:129-136.
@register(
    "distinct_line_set",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
    tags=("setop", "reference"),
)
def distinct_line_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("user_id", "event_type").distinct().orderBy(
        "user_id", "event_type"
    )


# --------------------------------------------------------------------------
# J8: set-compare integrity check between two scans (crawl equality test).
# Reference: tests/test_crawl.py:20-23.
@register(
    "set_equality_check",
    oracle="""
    WITH a AS (SELECT user_id, event_type FROM events WHERE event_id < 500),
         b AS (SELECT user_id, event_type FROM events
               WHERE event_id < 500 AND event_type <> 'error')
    SELECT 'a_minus_b' AS side, COUNT(*) AS n FROM (
      SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'b_minus_a' AS side, COUNT(*) AS n FROM (
      SELECT * FROM b EXCEPT ALL SELECT * FROM a)
    ORDER BY side
    """,
    tags=("setop", "reference"),
)
def set_equality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.where(F.col("event_id") < 500).select("user_id", "event_type")
    b = events.where(
        (F.col("event_id") < 500) & (F.col("event_type") != "error")
    ).select("user_id", "event_type")
    rows_a = a.exceptAll(b).agg(F.count("*").alias("n")).select(
        F.lit("a_minus_b").alias("side"), "n"
    )
    rows_b = b.exceptAll(a).agg(F.count("*").alias("n")).select(
        F.lit("b_minus_a").alias("side"), "n"
    )
    return rows_a.unionByName(rows_b).orderBy("side")


# --------------------------------------------------------------------------
# F12: source-url coalesce chain.
# Reference: ftm_datalake/sync/aleph.py:44-51.
@register(
    "coalesce_source_url",
    oracle="""
    SELECT doc_id,
           COALESCE(NULLIF(source, 'src0'), 'lang:' || lang, 'unknown') AS origin
    FROM documents ORDER BY doc_id
    """,
    tags=("projection", "reference"),
)
def coalesce_source_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.col("source"), F.lit("src0")),
            F.concat(F.lit("lang:"), F.col("lang")),
            F.lit("unknown"),
        ).alias("origin"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# A3: coverage intervals (min/max span per group).
# Reference: Collector date coverage, tests/test_archive.py:48-55.
@register(
    "coverage_intervals",
    oracle="""
    SELECT event_type,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "reference"),
)
def coverage_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact median per group (sort-based percentile; both engines interpolate
# a + (b-a)*0.5 over the sorted values, so doubles agree bit-for-bit).
@register(
    "median_order_value",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "stats"),
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("median_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# P7 full shape: FTM entity proxies. The internal operator
# (`project_entities`) carries MAP<STRING,ARRAY<STRING>> properties; the
# *declared* registry output serializes the map to its canonical JSON
# string (fixed key order from map construction) so the result is
# hashable/portable across engines — the oracle rebuilds the identical
# JSON literal in SQL.
@register(
    "entities_full",
    oracle="""
    SELECT 'docs-file-'
             || md5(md5(source || '/' || CAST(doc_id AS VARCHAR))
                    || md5(md5(text))) AS id,
           'PlainText' AS schema,
           '{"contentHash":["' || md5(text)
             || '"],"fileName":["' || CAST(doc_id AS VARCHAR)
             || '"],"fileSize":["' || CAST(n_chars AS VARCHAR)
             || '"],"mimeType":["text/plain"]}' AS properties,
           'docs' AS dataset
    FROM documents ORDER BY id
    """,
    tags=("projection", "reference"),
)
def entities_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.pipelines.ingest import project_entities

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias(
            "key"
        ),
        F.md5("text").alias("content_hash"),
        F.col("n_chars").alias("size"),
        F.lit("text/plain").alias("mimetype"),
        F.lit("docs").alias("dataset"),
    )
    entities = project_entities(docs)
    return entities.select(
        "id",
        "schema",
        F.to_json("properties").alias("properties"),
        "dataset",
    ).orderBy("id")


# --------------------------------------------------------------------------
# Approximate distinct (HLL) — the 100 TB variant of entity counting.
# Re-registered (round 5) on the deterministic relational HLL path
# (operators/sketches.py) instead of Spark's approx_count_distinct, whose
# sketch internals no other engine reproduces: m=256 registers from exact
# integer (bucket, rho) hashing, raw estimate as exact dyadic double
# arithmetic, and the standard small-range linear-counting branch via a
# driver-baked m*ln(m/V) literal table (JVM Math.log is 1 ulp off libm on
# some inputs; the table makes both engines read the same doubles). Fully
# DuckDB-oracled — estimate, branch, and exact count all hash-match.
_ADU_M = 256
_ADU_ALPHA_MM = 0.7213 / (1 + 1.079 / _ADU_M) * _ADU_M * _ADU_M


def _adu_oracle() -> str:
    from ftm_datalake_spark.plans.corpus_ops import _hll_rho_sql

    m = _ADU_M
    raw = f"{_ADU_ALPHA_MM!r} / (s + ({m} - nb) * 1.0)"
    return f"""
    WITH hashed AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events
    ),
    probe AS (
      SELECT event_type, h % {m} AS bucket, {_hll_rho_sql(24)} AS rho
      FROM (SELECT event_type, h, CAST(floor(h / {m}) AS BIGINT) AS w
            FROM hashed)
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS r
      FROM probe GROUP BY event_type, bucket
    ),
    per AS (
      SELECT event_type, SUM(pow(2.0, -r)) AS s, COUNT(*) AS nb
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CASE WHEN nb < {m} AND ({raw}) <= {2.5 * m!r}
                  THEN {m} * ln({float(m)!r} / ({m} - nb))
                  ELSE {raw} END AS approx_users,
             CAST(nb AS BIGINT) AS buckets_used
      FROM per
    )
    SELECT e.event_type, e.approx_users, e.buckets_used, x.exact_users
    FROM est e JOIN (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type) x USING (event_type)
    ORDER BY e.event_type
    """


@register(
    "approx_distinct_users",
    oracle=_adu_oracle(),
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.sketches import (
        hll_estimate_full_by,
        hll_registers_by,
    )

    events = load_table(spark, sf_dir, "events")
    regs = hll_registers_by(
        events.select("event_type", F.col("user_id").alias("key")),
        "event_type",
        m=_ADU_M,
    )
    est = hll_estimate_full_by(regs, "event_type", m=_ADU_M)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("estimate").alias("approx_users"),
            F.col("buckets_used").cast("long").alias("buckets_used"),
            "exact_users",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# CDC apply (operators/documents.apply_cdc): a deterministic synthetic
# change feed over the documents snapshot — deletes (doc_id%10=0), two
# conflicting updates where the higher seq must win (doc_id%10=1), and
# inserts of brand-new keys (doc_id%10=2, shifted by 1e6). The oracle
# replays the same feed in SQL.
@register(
    "cdc_apply_documents",
    oracle="""
    WITH snap AS (SELECT doc_id, lang, source, n_chars FROM documents),
    changes AS (
      SELECT doc_id, 1 AS seq, 'D' AS op,
             lang AS c_lang, source AS c_source, n_chars AS c_n_chars
      FROM snap WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id, 1, 'U', 'yy', source, n_chars
      FROM snap WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id, 2, 'U', 'xx', source, n_chars
      FROM snap WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id + 1000000, 1, 'I', 'new', 'srcX', CAST(0 AS BIGINT)
      FROM snap WHERE doc_id % 10 = 2
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY seq DESC, op DESC) AS rn
        FROM changes) WHERE rn = 1
    )
    SELECT COALESCE(s.doc_id, l.doc_id) AS doc_id,
           CASE WHEN l.op IS NOT NULL THEN l.c_lang ELSE s.lang END AS lang,
           CASE WHEN l.op IS NOT NULL THEN l.c_source ELSE s.source END
             AS source,
           CASE WHEN l.op IS NOT NULL THEN l.c_n_chars ELSE s.n_chars END
             AS n_chars
    FROM snap s FULL OUTER JOIN latest l ON s.doc_id = l.doc_id
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY doc_id
    """,
    tags=("cdc", "merge", "reference"),
)
def cdc_apply_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.documents import apply_cdc

    snap = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    m = F.col("doc_id") % 10
    deletes = snap.where(m == 0).select(
        "doc_id", F.lit(1).alias("seq"), F.lit("D").alias("op"),
        "lang", "source", "n_chars",
    )
    upd_lo = snap.where(m == 1).select(
        "doc_id", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.lit("yy").alias("lang"), "source", "n_chars",
    )
    upd_hi = snap.where(m == 1).select(
        "doc_id", F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.lit("xx").alias("lang"), "source", "n_chars",
    )
    inserts = snap.where(m == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit(1).alias("seq"), F.lit("I").alias("op"),
        F.lit("new").alias("lang"), F.lit("srcX").alias("source"),
        F.lit(0).cast("long").alias("n_chars"),
    )
    changes = deletes.unionByName(upd_lo).unionByName(upd_hi).unionByName(
        inserts
    )
    return apply_cdc(snap, changes, ["doc_id"]).orderBy("doc_id")
