"""Skew-resilient aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy with one hot key
(e.g. a statement entity with millions of fragments, or the empty-string
content hash) still funnels that key's rows into one reducer for the
*final* merge. Salting splits the hot key across `salt_buckets` partial
aggregates, then merges the partials — the classic two-phase pattern,
expressed relationally so it composes with any algebraic aggregate.

Only algebraic aggregates (sum/count/min/max) can be salted this way;
collect_list-style holistic aggregates must go through the unsalted path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: {out_col: (in_col, fn)} with fn in
    sum|count|min|max.

    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    `salt_buckets` reducers; phase 2 merges the ≤salt_buckets partials
    per key (count merges by summing)."""
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for name, (_col, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r} cannot be salted")

    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                getattr(F, fn)(col).alias(f"__p_{name}")
                for name, (col, fn) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{name}").alias(name)
            for name, (_col, fn) in aggs.items()
        ]
    )


def top_frequent_keys(df: DataFrame, key: Column, top_n: int = 10) -> DataFrame:
    """Diagnose skew: the hottest grouping keys and their counts."""
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "key")
        .limit(top_n)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt the (skewed) fact side, replicate
    the dim side across all `salt_buckets` salts, join on (key, salt).

    A hot fact key's rows spread over `salt_buckets` reducers instead of
    funneling into one; the dim side grows ×salt_buckets, which is the
    deliberate trade — use when the dim is small-ish but too big (or the
    fact side too skewed) for a plain broadcast. This is the manual form
    of AQE's skew-join splitting, usable when AQE can't see the skew
    (e.g. the first shuffle of a freshly-scanned fact table) or in
    non-adaptive engines.
    """
    salted_facts = facts.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return salted_facts.join(replicated_dim, [on, "__salt"], how).drop("__salt")
