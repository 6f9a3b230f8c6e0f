"""Data-quality registry queries (operators/quality.py): one declarative
rule suite over orders+lineitem with domain, range, threshold,
referential-integrity, and uniqueness checks — long-form integer output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.quality import (
    dq_duplicate_key_count,
    dq_orphan_count,
    dq_rule_summary,
)
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


@register(
    "dq_validation_suite",
    oracle="""
    WITH o AS (SELECT * FROM orders), l AS (SELECT * FROM lineitem)
    SELECT * FROM (
      SELECT 'orders.status_domain' AS rule,
             (SELECT COUNT(*) FROM o) AS n_rows,
             (SELECT COUNT(*) FROM o
              WHERE o_orderstatus NOT IN ('P','O','F')) AS n_violations
      UNION ALL
      SELECT 'orders.totalprice_positive',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FROM o WHERE NOT (o_totalprice > 0))
      UNION ALL
      SELECT 'orders.totalprice_under_450k',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FROM o WHERE o_totalprice > 450000)
      UNION ALL
      SELECT 'orders.unique_orderkey',
             (SELECT COUNT(*) FROM o),
             CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
                SELECT COUNT(*) AS c FROM o GROUP BY o_orderkey))
              AS BIGINT)
      UNION ALL
      SELECT 'lineitem.discount_range',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l
              WHERE NOT (l_discount >= 0 AND l_discount <= 0.1))
      UNION ALL
      SELECT 'lineitem.high_discount',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l WHERE l_discount > 0.08)
      UNION ALL
      SELECT 'lineitem.quantity_min_one',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l WHERE NOT (l_quantity >= 1))
      UNION ALL
      SELECT 'lineitem.orderkey_exists',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l
              WHERE NOT EXISTS (
                SELECT 1 FROM o WHERE o.o_orderkey = l.l_orderkey))
    ) ORDER BY rule
    """,
    tags=("dq", "validation", "agg"),
)
def dq_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite: predicate rules in one scan per table, plus FK
    and uniqueness checks. Violating rules here are thresholds that DO
    trip on the data (totalprice_under_450k, high_discount) so counting
    is exercised, not just zeros."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_rules = dq_rule_summary(
        orders,
        {
            "orders.status_domain": ~F.col("o_orderstatus").isin("P", "O", "F"),
            "orders.totalprice_positive": ~(F.col("o_totalprice") > 0),
            "orders.totalprice_under_450k": F.col("o_totalprice") > 450000,
        },
    )
    l_rules = dq_rule_summary(
        li,
        {
            "lineitem.discount_range": ~(
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1)
            ),
            "lineitem.high_discount": F.col("l_discount") > 0.08,
            "lineitem.quantity_min_one": ~(F.col("l_quantity") >= 1),
        },
    )
    fk = dq_orphan_count(li, "l_orderkey", orders, "o_orderkey", "lineitem.orderkey_exists")
    uniq = dq_duplicate_key_count(orders, ["o_orderkey"], "orders.unique_orderkey")
    return o_rules.unionAll(l_rules).unionAll(fk).unionAll(uniq).orderBy("rule")


# --------------------------------------------------------------------------
# Key-skew report (operators/quality.key_skew_report): the pre-join
# shuffle-skew diagnosis — top-10 heavy hitters on orders.o_custkey with
# exact per-million share. Integer ppm via the (s - s % d) / d identity
# (exactly divisible pair → exact double division in both engines).
@register(
    "dq_skew_report_orders",
    oracle="""
    WITH c AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT COUNT(*) AS total, COUNT(DISTINCT o_custkey) AS dk FROM orders
    ),
    top AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 10)
    SELECT top.key, CAST(top.n AS BIGINT) AS n,
           CAST((top.n * 1000000 - (top.n * 1000000) % t.total) / t.total
                AS BIGINT) AS share_ppm,
           CAST(t.total AS BIGINT) AS total_rows,
           CAST(t.dk AS BIGINT) AS distinct_keys
    FROM top CROSS JOIN t
    ORDER BY n DESC, key
    """,
    tags=("quality", "ops", "agg"),
)
def dq_skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.quality import key_skew_report

    orders = load_table(spark, sf_dir, "orders")
    return key_skew_report(orders, "o_custkey", top_n=10)


# --------------------------------------------------------------------------
# Table profile (operators/quality.table_profile): per-column
# null/distinct/min/max fingerprint of `documents` in ONE scan — every
# column adds aggregates to the same global agg, never another pass.
@register(
    "dq_table_profile_documents",
    oracle="""
    SELECT 'lang' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT lang) AS n_distinct,
           MIN(CAST(lang AS VARCHAR)) AS min_s,
           MAX(CAST(lang AS VARCHAR)) AS max_s
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT source),
           MIN(CAST(source AS VARCHAR)), MAX(CAST(source AS VARCHAR))
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT n_chars),
           MIN(CAST(n_chars AS VARCHAR)), MAX(CAST(n_chars AS VARCHAR))
    FROM documents
    ORDER BY "column"
    """,
    tags=("quality", "ops", "agg"),
)
def dq_table_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.quality import table_profile

    docs = load_table(spark, sf_dir, "documents")
    return table_profile(docs, ["lang", "source", "n_chars"]).orderBy("column")


# --------------------------------------------------------------------------
# Profile drift (operators/quality.profile_drift): snapshot-over-snapshot
# per-column deltas — the CI rows for schema/distribution drift. Old
# snapshot = even doc_ids, new = the full table.
@register(
    "dq_profile_drift_documents",
    oracle="""
    WITH oldp AS (
      SELECT 'lang' AS col, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT lang) AS n_distinct,
             MIN(CAST(lang AS VARCHAR)) AS min_s, MAX(CAST(lang AS VARCHAR)) AS max_s
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'n_chars', COUNT(*),
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT n_chars),
             MIN(CAST(n_chars AS VARCHAR)), MAX(CAST(n_chars AS VARCHAR))
      FROM documents WHERE doc_id % 2 = 0
    ),
    newp AS (
      SELECT 'lang' AS col, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT lang) AS n_distinct,
             MIN(CAST(lang AS VARCHAR)) AS min_s, MAX(CAST(lang AS VARCHAR)) AS max_s
      FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(*),
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT n_chars),
             MIN(CAST(n_chars AS VARCHAR)), MAX(CAST(n_chars AS VARCHAR))
      FROM documents
    )
    SELECT COALESCE(n.col, o.col) AS "column",
           CAST(COALESCE(n.n_rows, 0) - COALESCE(o.n_rows, 0) AS BIGINT) AS d_rows,
           CAST(COALESCE(n.n_null, 0) - COALESCE(o.n_null, 0) AS BIGINT) AS d_null,
           CAST(COALESCE(n.n_distinct, 0) - COALESCE(o.n_distinct, 0) AS BIGINT)
             AS d_distinct,
           COALESCE(n.min_s <> o.min_s, TRUE) AS min_changed,
           COALESCE(n.max_s <> o.max_s, TRUE) AS max_changed
    FROM oldp o FULL OUTER JOIN newp n ON o.col = n.col
    ORDER BY "column"
    """,
    tags=("quality", "ops", "join"),
)
def dq_profile_drift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.quality import profile_drift, table_profile

    docs = load_table(spark, sf_dir, "documents")
    old = table_profile(docs.where(F.col("doc_id") % 2 == 0), ["lang", "n_chars"])
    new = table_profile(docs, ["lang", "n_chars"])
    return profile_drift(old, new).orderBy("column")


# --------------------------------------------------------------------------
# Benford first-digit audit (round 12): the leading-digit distribution
# of order totals vs Benford's law — the classic data-forensics screen
# for fabricated or truncated numeric columns. Output per digit 1-9:
# observed count, observed share (exact ppm), the Benford expectation
# floor(1e6*log10(1+1/d)) (log10 of nine small rational constants —
# both engines IEEE-double these identically, and none lands near a
# floor boundary), and the signed deviation. Two hash aggs + a
# broadcast 1-row total.
@register(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT SUM(n_obs) AS n FROM c)
    SELECT c.digit,
           CAST(c.n_obs AS BIGINT) AS n_obs,
           CAST(c.n_obs * 1000000 // t.n AS BIGINT) AS obs_ppm,
           CAST(FLOOR(1000000 * LOG10(1 + 1.0 / c.digit)) AS BIGINT)
             AS benford_ppm,
           CAST(c.n_obs * 1000000 // t.n
                - CAST(FLOOR(1000000 * LOG10(1 + 1.0 / c.digit)) AS BIGINT)
                AS BIGINT) AS dev_ppm
    FROM c, t
    ORDER BY c.digit
    """,
    tags=("dq", "stats"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n_obs"))
    t = c.agg(F.sum("n_obs").alias("n"))
    benford = F.floor(
        F.lit(1000000) * F.log10(1 + 1.0 / F.col("digit"))
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n_obs").cast("long").alias("n_obs"),
            F.expr("(n_obs * 1000000) div n").cast("long").alias("obs_ppm"),
            benford.alias("benford_ppm"),
            (
                F.expr("(n_obs * 1000000) div n").cast("long") - benford
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence over the (lang, source) contingency
# table — the categorical-drift / segment-independence check a corpus
# QA suite runs next to the Benford and profile-drift audits. Exactness
# scheme: chi2 = sum_cells (O*N - R*C)^2 / (N*R*C); each cell's term is
# floored at 1e6 scale in DECIMAL(38,0)/HUGEINT and the SUM OF FLOORS
# is the emitted statistic — deterministic in both engines (floor-sum,
# not float-sum), off from the real-valued chi2 by < n_cells ULPs at
# ppm scale. Plan: one (lang, source) hash agg, two tiny margin aggs
# broadcast back.
@register(
    "dq_chi_square_independence",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, SUM(o) AS r FROM o GROUP BY lang),
    c AS (SELECT source, SUM(o) AS c FROM o GROUP BY source),
    t AS (SELECT SUM(o) AS n FROM o),
    cells AS (
      SELECT (o.o * t.n - r.r * c.c)::HUGEINT AS dev,
             (t.n * r.r * c.c)::HUGEINT AS den
      FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_lang,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_source,
           CAST((SELECT SUM(dev * dev * 1000000 // den) FROM cells)
                AS BIGINT) AS chi2_x1e6
    FROM t
    """,
    tags=("dq", "stats", "agg"),
)
def dq_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("o")
    )
    r = o.groupBy("lang").agg(F.sum("o").alias("r"))
    c = o.groupBy("source").agg(F.sum("o").alias("c"))
    t = o.agg(F.sum("o").alias("n"))
    dec = "decimal(38,0)"
    cells = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .select(
            (F.col("o") * F.col("n") - F.col("r") * F.col("c"))
            .cast(dec)
            .alias("dev"),
            (F.col("n") * F.col("r") * F.col("c")).cast(dec).alias("den"),
            "n",
        )
    )
    terms = cells.select(
        "n",
        (F.col("dev") * F.col("dev") * F.lit(1000000).cast(dec)).alias(
            "snum"
        ),
        "den",
    ).select(
        "n",
        # exact integer floor division on decimals (the Spearman
        # pattern: (num - mod) / den stays integral)
        (
            (F.col("snum") - F.pmod(F.col("snum"), F.col("den")))
            / F.col("den")
        )
        .cast("long")
        .alias("term"),
    )
    agg = terms.groupBy("n").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("term").cast("long").alias("chi2_x1e6"),
    )
    margins = r.agg(F.count("*").cast("long").alias("n_lang")).crossJoin(
        c.agg(F.count("*").cast("long").alias("n_source"))
    )
    return agg.crossJoin(F.broadcast(margins)).select(
        F.col("n").cast("long").alias("n"),
        "n_cells",
        "n_lang",
        "n_source",
        "chi2_x1e6",
    )
