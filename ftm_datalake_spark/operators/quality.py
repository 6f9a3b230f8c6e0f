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
        # coalesce: SUM over zero rows is NULL; an empty table has zero
        # violations, not unknown violations
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"__v_{i}")
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


def _share_ppm(num: Column, den: Column) -> Column:
    """Integer parts-per-million share, bit-exact cross-engine: subtract
    the modulus first so the double division is of an exactly-divisible
    pair (quotient <= 1e6 << 2^53) — floor(x/y) on raw doubles can be
    off by one ulp when the true ratio is an exact integer. Mirrors the
    oracle's (n*1000000 - (n*1000000) % d) / d identity."""
    scaled = num.cast("long") * F.lit(1_000_000)
    return ((scaled - scaled % den) / den).cast("long")


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Heavy-hitter report for a join/agg key — the pre-join diagnosis
    for shuffle skew: top-N keys by count with exact share in
    parts-per-million, ranked (count DESC, key ASC), plus total rows and
    distinct-key cardinality. One groupBy + TakeOrderedAndProject
    (per-task k-row heaps, no global sort); the totals ride along from a
    1-row broadcast frame (documented global scalar)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("__total"),
        F.count_distinct(F.col(key_col)).alias("__distinct"),
    )
    top = counts.orderBy(F.col("n").desc(), "key").limit(top_n)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            _share_ppm(F.col("n"), F.col("__total")).alias("share_ppm"),
            F.col("__total").cast("long").alias("total_rows"),
            F.col("__distinct").cast("long").alias("distinct_keys"),
        )
        .orderBy(F.col("n").desc(), "key")
    )


def table_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column fingerprint in ONE scan: nulls, distincts, min/max (as
    strings — type-stable across engines). Every column adds aggregates
    to the same single global agg, not a pass. Long format:
    (column, n_rows, n_null, n_distinct, min_s, max_s)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            # empty table: zero nulls, not unknown nulls
            F.coalesce(
                F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__null{i}"),
            F.count_distinct(col).alias(f"__dist{i}"),
            F.min(col.cast("string")).alias(f"__min{i}"),
            F.max(col.cast("string")).alias(f"__max{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null{i}").cast("long").alias("n_null"),
                F.col(f"__dist{i}").cast("long").alias("n_distinct"),
                F.col(f"__min{i}").alias("min_s"),
                F.col(f"__max{i}").alias("max_s"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return one.select(
        F.explode(per_col).alias("p"), F.col("__rows").cast("long").alias("n_rows")
    ).select("p.column", "n_rows", "p.n_null", "p.n_distinct", "p.min_s", "p.max_s")


def profile_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot-over-snapshot profile delta: joins two table_profile
    outputs on column and emits integer deltas plus changed-min/max
    flags — the CI row set for schema and distribution drift. Columns
    present in only one snapshot surface with full-magnitude deltas."""
    o = old.select(
        "column",
        F.col("n_rows").alias("rows_old"),
        F.col("n_null").alias("null_old"),
        F.col("n_distinct").alias("dist_old"),
        F.col("min_s").alias("min_old"),
        F.col("max_s").alias("max_old"),
    )
    n = new.select(
        "column",
        F.col("n_rows").alias("rows_new"),
        F.col("n_null").alias("null_new"),
        F.col("n_distinct").alias("dist_new"),
        F.col("min_s").alias("min_new"),
        F.col("max_s").alias("max_new"),
    )
    j = o.join(n, "column", "full_outer")
    return j.select(
        "column",
        (F.coalesce("rows_new", F.lit(0)) - F.coalesce("rows_old", F.lit(0)))
        .cast("long")
        .alias("d_rows"),
        (F.coalesce("null_new", F.lit(0)) - F.coalesce("null_old", F.lit(0)))
        .cast("long")
        .alias("d_null"),
        (F.coalesce("dist_new", F.lit(0)) - F.coalesce("dist_old", F.lit(0)))
        .cast("long")
        .alias("d_distinct"),
        F.coalesce(F.col("min_new") != F.col("min_old"), F.lit(True)).alias(
            "min_changed"
        ),
        F.coalesce(F.col("max_new") != F.col("max_old"), F.lit(True)).alias(
            "max_changed"
        ),
    )
