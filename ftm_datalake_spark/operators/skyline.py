"""Skyline (Pareto-dominance) operator — Börzsönyi et al., ICDE 2001.

A row is on the 2-D skyline iff no other row is at least as good on
both criteria and strictly better on one (here: MAXIMIZE `max_col`,
MINIMIZE `min_col`). The naive relational form is the quadratic
NOT-EXISTS self-join; this implementation uses the sort-based
reduction that survives 100 TB:

1. collapse the data to one candidate per `max_col` value — only the
   per-group MINIMUM of `min_col` can be on the frontier (one hash agg,
   map-side combined, output bounded by |distinct max_col|);
2. a cumulative strict-min sweep over that collapsed frame in
   `max_col`-descending order: a candidate survives iff its min is
   strictly below every min seen at a larger `max_col` (a window over
   the already-tiny frame — the `corpus_temperature_mixing` global-
   scalar shape, NOT a data-scale sort);
3. broadcast the frontier back to count the rows sitting exactly on
   each frontier point (ties on both coordinates are mutually
   non-dominating, so they all belong to the skyline).

The data-scale work is therefore one hash agg + one broadcast-join
scan; no self-join ever forms. The quadratic NOT EXISTS stays as the
DuckDB oracle, which doubles as a semantics cross-check.

Reference role: the reference engine has no preference/dominance
operator; this extends the analytics family (same lane as the
hypertable/layout additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame, max_col: str, min_col: str
) -> DataFrame:
    """Frontier of (maximize max_col, minimize min_col): one row per
    surviving frontier point with the count of source rows on it.
    Columns: max_col, frontier_<min_col>, n_rows."""
    frontier_val = f"frontier_{min_col}"
    cand = df.groupBy(max_col).agg(F.min(min_col).alias(frontier_val))
    # Strict-min sweep over the collapsed frame (|distinct max_col|
    # rows): dominated iff some larger-max candidate has min <= ours.
    w = (
        Window.orderBy(F.desc(max_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        cand.withColumn("__best_larger", F.min(frontier_val).over(w))
        .where(
            F.col("__best_larger").isNull()
            | (F.col(frontier_val) < F.col("__best_larger"))
        )
        .drop("__best_larger")
    )
    # Rename before the join-back: sky descends from df, so qualified
    # df[...]/sky[...] references would be an ambiguous self-join.
    sky_r = sky.select(
        F.col(max_col).alias("__sky_max"),
        F.col(frontier_val).alias("__sky_min"),
    )
    return (
        df.join(
            F.broadcast(sky_r),
            (F.col(max_col) == F.col("__sky_max"))
            & (F.col(min_col) == F.col("__sky_min")),
        )
        .groupBy("__sky_max", "__sky_min")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            F.col("__sky_max").alias(max_col),
            F.col("__sky_min").alias(frontier_val),
            "n_rows",
        )
    )
