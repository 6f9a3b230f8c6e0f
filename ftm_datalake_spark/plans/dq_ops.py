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
