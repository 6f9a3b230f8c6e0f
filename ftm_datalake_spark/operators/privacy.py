"""Privacy auditing over training corpora: k-anonymity, l-diversity,
and the generalization ladder — the release-gating checks a corpus
curator runs before shipping data that joins quasi-identifiers
(source, size, language...) to document payloads.

All integer/string arithmetic, so a DuckDB oracle replays every check
bit-exactly (registry: plans/privacy_ops.py). No reference counterpart
— extends the pipeline's PII family (pii_redact, gdpr_forget_users)
from row scrubbing to group-level disclosure risk.

Scale shape: each check is one hash-aggregation over the
quasi-identifier key (map-side partial combine does the heavy
lifting); the ladder evaluates a FIXED list of generalization levels
in a single pass (grid of |levels| × |groups| aggregates — levels is a
small constant, never data-dependent), so no iteration, no driver
loop, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """(quasi..., n, suppressed): every quasi-identifier combination
    with its row count; groups smaller than ``k`` are flagged
    suppressed — releasing them would let an attacker who knows a
    record's quasi-identifiers single it out among fewer than k
    candidates (Sweeney's k-anonymity)."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("n")
    ).withColumn("suppressed", F.col("n") < F.lit(int(k)))


def l_diversity_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """(quasi..., n, distinct_sensitive, diverse): distinct-l-diversity
    per quasi-identifier group — a k-anonymous group whose sensitive
    attribute is constant still discloses it (homogeneity attack);
    ``diverse`` requires at least ``l`` distinct sensitive values."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct(sensitive_col).cast("long").alias(
            "distinct_sensitive"
        ),
    ).withColumn(
        "diverse", F.col("distinct_sensitive") >= F.lit(int(l))
    )


def _bucket(value_col: Column, width: int | None) -> Column:
    """Generalization of a numeric column at one ladder level: floor to
    a ``width`` multiple; width None = fully generalized (one bucket)."""
    if width is None:
        return F.lit(-1).cast("long")
    return (
        (value_col - value_col % F.lit(int(width))).cast("long")
    )


def generalization_ladder(
    df: DataFrame,
    group_col: str,
    value_col: str,
    widths: list[int | None],
    k: int,
) -> DataFrame:
    """(group, chosen_level, chosen_width, n_buckets, min_group): per
    ``group_col`` partition, the FIRST ladder level whose buckets of
    ``value_col`` are all k-anonymous — the minimal generalization the
    release needs (Samarati's ladder, coarsest-last; the final level
    should be None = everything in one bucket so a level always
    exists, k <= partition size permitting).

    One pass: every level's bucket is computed as a column, one
    explode over the |widths| constant, one (group, level, bucket)
    hash-agg, one (group, level) fold, then a min-struct pick of the
    first qualifying level — no per-level job, no driver loop."""
    levels = F.array(
        *[
            F.struct(
                F.lit(i).alias("level"),
                _bucket(F.col(value_col), w).alias("bucket"),
                F.lit(-1 if w is None else int(w)).cast("long").alias(
                    "width"
                ),
            )
            for i, w in enumerate(widths)
        ]
    )
    exploded = df.select(
        F.col(group_col).alias("grp"), F.explode(levels).alias("lv")
    ).select("grp", "lv.level", "lv.bucket", "lv.width")
    per_bucket = exploded.groupBy("grp", "level", "width", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    per_level = per_bucket.groupBy("grp", "level", "width").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.min("n").cast("long").alias("min_group"),
    )
    qualifying = per_level.where(F.col("min_group") >= F.lit(int(k)))
    chosen = qualifying.groupBy("grp").agg(
        F.min(
            F.struct("level", "width", "n_buckets", "min_group")
        ).alias("w")
    )
    return chosen.select(
        F.col("grp").alias(group_col),
        F.col("w.level").cast("long").alias("chosen_level"),
        F.col("w.width").alias("chosen_width"),
        F.col("w.n_buckets").alias("n_buckets"),
        F.col("w.min_group").alias("min_group"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int,
) -> DataFrame:
    """(quasi..., n, t_ppm, close): t-closeness per quasi-identifier
    group — l-diversity's successor (Li/Li/Venkatasubramanian, ICDE
    2007): a group whose sensitive-attribute DISTRIBUTION skews far
    from the corpus-wide one still leaks (skewness attack), even with
    many distinct values. Distance is total variation in exact ppm
    (the categorical EMD): t = (1/2) * sum_s |P(s|g) - P(s)| over the
    WHOLE sensitive domain. Because both distributions sum to 1, that
    equals the sum of POSITIVE deviations only, t = sum_s max(P(s|g) -
    P(s), 0) — and a value ABSENT from the group deviates negatively,
    contributing zero. So summing over the (group x sensitive) pairs
    actually PRESENT is exact, no cross join over the domain needed
    (ADVICE r12 #2: the former |·|/2 over present pairs dropped the
    absent values' |0 - P(s)| mass and undercounted t — a one-value
    group in a 50/50 corpus scored 0.25, not the true 0.5). Integer
    rationals throughout: max(c_gs*C - c_s*C_g, 0) // (C_g*C), no
    float anywhere. Plan shape: two hash aggs (group x sensitive, then
    group) against broadcast global tallies."""
    gs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("c_gs")
    )
    g = gs.groupBy(*quasi_cols).agg(F.sum("c_gs").alias("c_g"))
    s = df.groupBy(sensitive_col).agg(F.count("*").alias("c_s"))
    tot = s.agg(F.sum("c_s").alias("c"))
    terms = (
        gs.join(F.broadcast(s), sensitive_col)
        .join(g, quasi_cols)
        .crossJoin(F.broadcast(tot))
        .select(
            *quasi_cols,
            "c_g",
            "c",
            F.greatest(
                F.col("c_gs") * F.col("c") - F.col("c_s") * F.col("c_g"),
                F.lit(0),
            ).alias("num"),
        )
    )
    return (
        terms.groupBy(*quasi_cols, "c_g", "c")
        .agg(F.sum("num").alias("num_sum"))
        .select(
            *quasi_cols,
            F.col("c_g").cast("long").alias("n"),
            F.expr("(num_sum * 1000000) div (c_g * c)")
            .cast("long")
            .alias("t_ppm"),
        )
        .withColumn("close", F.col("t_ppm") <= F.lit(int(t_ppm)))
    )


def delta_presence_audit(
    df: DataFrame,
    quasi_cols: list[str],
    member_col: str,
    dmin_ppm: int,
    dmax_ppm: int,
) -> DataFrame:
    """(quasi..., n_world, n_release, delta_ppm, within): δ-presence
    per quasi-identifier group (Nergiz/Atzori/Clifton, SIGMOD 2007) —
    the fourth release audit after k-anonymity / l-diversity /
    t-closeness. Where those bound what a group REVEALS, δ-presence
    bounds what MEMBERSHIP in the release leaks: given the public
    world table and a boolean release-membership column, delta(g) =
    P(row ∈ release | quasi group g) = n_release / n_world must stay
    inside [δ_min, δ_max] — a group released wholesale (delta=1)
    confirms membership for everyone matching it, a group never
    released (delta=0) confirms absence. Exact integer ppm, one hash
    agg; ``within`` flags the compliant groups."""
    g = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("n_world"),
        F.sum(F.col(member_col).cast("long")).cast("long").alias("n_release"),
    )
    return g.select(
        *quasi_cols,
        "n_world",
        "n_release",
        F.expr("(n_release * 1000000) div n_world")
        .cast("long")
        .alias("delta_ppm"),
    ).withColumn(
        "within",
        (F.col("delta_ppm") >= F.lit(int(dmin_ppm)))
        & (F.col("delta_ppm") <= F.lit(int(dmax_ppm))),
    )
