"""Data-quality validation: declarative rule suites evaluated in one scan,
plus referential-integrity and key-uniqueness checks.

A lake ingesting 100 TB needs constraint validation as a first-class
pass (the reference validates rows one-at-a-time through pydantic models,
ftm_datalake/model.py; at scale that becomes a relational job). Shapes:

- Predicate rules: ALL rules evaluate in ONE aggregation over ONE scan —
  each rule is a conditional sum, so adding a rule adds a column, not a
  pass. No shuffle beyond the single global agg (partial-merged).
- Referential integrity: left-anti join child→parent, counted. The
  parent side ships only its key column (column pruning) and broadcasts
  when small.
- Uniqueness: hash-agg on the key with HAVING count>1 — uniform shuffle.

All outputs are (rule, n_rows, n_violations) long-form integers —
order-independent and bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_rule_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate violation predicates in one scan → long-form summary.

    `rules` maps rule name → boolean Column that is TRUE for a violating
    row. Output: (rule, n_rows, n_violations), one row per rule.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__v_{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(F.count("*").cast("long").alias("__n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"__v_{i}").alias("n_violations")
            )
            for i, name in enumerate(rules)
        ]
    )
    return wide.select(
        F.explode(pairs).alias("p"), F.col("__n").alias("n_rows")
    ).select("p.rule", "n_rows", "p.n_violations")


def dq_orphan_count(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, rule: str
) -> DataFrame:
    """Referential integrity: child rows whose fk has no parent pk."""
    orphans = child.select(F.col(fk)).join(
        parent.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return (
        child.agg(F.count("*").cast("long").alias("n_rows"))
        .crossJoin(
            orphans.agg(F.count("*").cast("long").alias("n_violations"))
        )
        .select(F.lit(rule).alias("rule"), "n_rows", "n_violations")
    )


def dq_duplicate_key_count(df: DataFrame, keys: list[str], rule: str) -> DataFrame:
    """Uniqueness: rows beyond the first per key (0 when the key is unique)."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("__c"))
        .agg(
            F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations")
        )
    )
    return (
        df.agg(F.count("*").cast("long").alias("n_rows"))
        .crossJoin(dups)
        .select(F.lit(rule).alias("rule"), "n_rows", "n_violations")
    )
