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


def skyline_3d(
    df: DataFrame, max_col: str, min_col: str, min_col2: str
) -> DataFrame:
    """3-D frontier (maximize `max_col`, minimize `min_col` AND
    `min_col2`) — the k-dimension extension of the sort-based
    reduction, as iterated dominance over collapsed candidate frames
    (no self-join, no cartesian):

    1. collapse to one candidate per (max, min) pair — only the
       per-pair minimum of `min_col2` can be on the frontier (one hash
       agg, map-side combined);
    2. LOCAL sweep: within each `max_col` group, drop candidates
       dominated by a smaller-`min_col` sibling (a window partitioned
       by the group — never global). Equal-max dominance is now fully
       resolved;
    3. GLOBAL staircase merge: for every distinct `max_col` value
       a_t, the candidates from strictly larger values form a 2-D
       staircase; a candidate at a_t survives iff no staircase point
       sits at (min_col <=, min_col2 <=). The staircase strata come
       from ONE non-equi join against the broadcast |distinct max_col|
       frame (a bounded BroadcastNestedLoopJoin — the BNLJ_OK sketch/
       spine shape, plans/lint.py), and the membership test is a
       stair-before-probe cumulative min inside a window partitioned
       by a_t — again never global;
    4. broadcast the frontier back to count source rows sitting
       exactly on each frontier point (full ties are mutually
       non-dominating and all belong).

    The data-scale work is one hash agg + one broadcast-join count
    scan; everything after step 1 runs on the collapsed candidate
    frame, whose size is bounded by the sum of per-group 2-D frontier
    sizes. Same documented idiom as :func:`skyline_2d`: a
    high-cardinality continuous measure pair grows that frame — fine
    for quantized/real-world measures, the quadratic NOT-EXISTS stays
    as the DuckDB oracle cross-check."""
    a, b, c = max_col, min_col, min_col2
    fb, fc = f"frontier_{b}", f"frontier_{c}"
    mm = df.groupBy(a, b).agg(F.min(c).alias("__c"))
    w_local = (
        Window.partitionBy(a)
        .orderBy(F.col(b).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        mm.withColumn("__lmin", F.min("__c").over(w_local))
        .where(F.col("__lmin").isNull() | (F.col("__c") < F.col("__lmin")))
        .select(
            F.col(a).alias("__a"), F.col(b).alias("__b"), F.col("__c")
        )
    )
    avals = cand.select(F.col("__a").alias("__a_t")).distinct()
    # staircase strata: larger-max candidates keyed by each threshold
    # they must be compared against (bounded: |avals| is the distinct
    # value count of the MAX dimension, broadcast side of the BNLJ)
    pairs = cand.join(F.broadcast(avals), F.col("__a") > F.col("__a_t"))
    stair = (
        pairs.groupBy("__a_t", "__b")
        .agg(F.min("__c").alias("__c"))
        .withColumn("__kind", F.lit(0))
    )
    probes = cand.select(
        F.col("__a").alias("__a_t"), "__b", "__c", F.lit(1).alias("__kind")
    )
    merged = stair.unionByName(probes)
    # stair rows sort before their probe at equal min_col (kind 0 < 1),
    # so the preceding-rows cumulative min covers exactly the staircase
    # points with min_col <= the probe's — dominated iff that min is
    # <= the probe's min_col2 (max strictly larger already)
    w_merge = (
        Window.partitionBy("__a_t")
        .orderBy(F.col("__b").asc(), F.col("__kind").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = F.min(F.when(F.col("__kind") == 0, F.col("__c"))).over(w_merge)
    sky = (
        merged.withColumn("__dom", dom)
        .where(
            (F.col("__kind") == 1)
            & (F.col("__dom").isNull() | (F.col("__dom") > F.col("__c")))
        )
        .select(
            F.col("__a_t").alias("__sky_a"),
            F.col("__b").alias("__sky_b"),
            F.col("__c").alias("__sky_c"),
        )
    )
    return (
        df.join(
            F.broadcast(sky),
            (F.col(a) == F.col("__sky_a"))
            & (F.col(b) == F.col("__sky_b"))
            & (F.col(c) == F.col("__sky_c")),
        )
        .groupBy("__sky_a", "__sky_b", "__sky_c")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            F.col("__sky_a").alias(a),
            F.col("__sky_b").alias(fb),
            F.col("__sky_c").alias(fc),
            "n_rows",
        )
    )


def skyline_kd(
    df: DataFrame, max_cols: list[str], min_cols: list[str]
) -> DataFrame:
    """k-dimensional frontier (maximize every ``max_cols`` member,
    minimize every ``min_cols`` member) — completes the dominance
    family for multi-objective corpus curation (VERDICT r11 stretch
    #7). Same scale contract as :func:`skyline_3d`: the only data-scale
    work is one hash agg (the collapse) and one broadcast join-back
    count; ALL dominance reasoning runs on the collapsed candidate
    frame.

    Stages:

    1. collapse to one candidate per (k-1)-prefix of the dimension
       tuple — only the per-group best of the last dimension can be on
       the frontier (one hash agg, map-side combined);
    2. pairwise-fold prune (k >= 3): within each (k-2)-prefix group, a
       best-first sweep of the last two dimensions drops candidates
       dominated by a same-group sibling (a window over the collapsed
       frame — the skyline_2d sweep applied per group);
    3. exact dominance on the pruned frame: a LEFT ANTI join of the
       frame against its broadcast self with the strict-dominance
       predicate (all dims at-least-as-good AND one strictly better).
       This is a bounded BroadcastNestedLoopJoin — both sides are the
       pruned candidate frame, the BNLJ_OK sketch/spine shape — NOT a
       data-scale self-join; the collapse bounds it by the distinct
       count of the (k-1)-prefix, and the prune cuts it further. Its
       cost is O(|pruned|²) worst case, and |pruned| is governed by the
       data's frontier structure, not corpus size — the 10× probe
       (scripts/scale_probe.probe_skyline_4d) measures ~17k survivors
       at BOTH 100k and 1M input rows, so the post-collapse term is
       scale-invariant while the collapse scales linearly;
    4. broadcast the frontier back and count the source rows sitting
       exactly on each frontier point.

    The quadratic NOT-EXISTS stays as the DuckDB oracle. Dimension
    values are compared in their native types with direction-aware
    predicates (no negation encoding), so decimals/dates work
    unchanged. Output: ``max_cols`` keep their names, each min col
    becomes ``frontier_<name>``, plus ``n_rows``. Quantize
    near-continuous measures before calling — the candidate frame is
    bounded by |distinct (k-1)-prefix|, the same documented idiom as
    the 2-D/3-D forms."""
    from functools import reduce
    from operator import and_, or_

    dims: list[tuple[str, bool]] = [(c, True) for c in max_cols] + [
        (c, False) for c in min_cols
    ]
    if len(dims) < 2:
        raise ValueError("skyline needs at least two dimensions")
    names = [c for c, _ in dims]
    is_max = {c: m for c, m in dims}
    head, last = names[:-1], names[-1]

    best_last = F.max(last) if is_max[last] else F.min(last)
    cand = df.groupBy(*head).agg(best_last.alias(last))

    if len(names) >= 3:
        # one prune sweep per head dimension: partition by the other
        # head dims, order the pivot best-first, and drop candidates
        # whose last-dim value is not strictly better than the best
        # seen at a strictly-better pivot (2-D dominance with the
        # remaining dims equal). Each sweep only removes dominated
        # rows, and removal is transitively sound: a pruned
        # dominator's own dominator chain ends at a frontier point,
        # which no sweep ever removes — so the final anti-join against
        # the pruned frame stays exact. Sweeps run on the collapsed
        # frame (bounded), and each one shrinks the quadratic BNLJ
        # below.
        for pivot in names[:-1]:
            others = [c for c in names[:-1] if c != pivot]
            order = (
                F.col(pivot).desc() if is_max[pivot] else F.col(pivot).asc()
            )
            w = (
                Window.partitionBy(*others)
                .orderBy(order)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            cum = (F.max(last) if is_max[last] else F.min(last)).over(w)
            survives = (
                F.col(last) > F.col("__cum")
                if is_max[last]
                else F.col(last) < F.col("__cum")
            )
            cand = (
                cand.withColumn("__cum", cum)
                .where(F.col("__cum").isNull() | survives)
                .drop("__cum")
            )

    ref = cand.select(
        *[F.col(c).alias(f"__q{i}") for i, c in enumerate(names)]
    )

    def _ge(i: int, c: str):
        q, p = F.col(f"__q{i}"), F.col(c)
        return q >= p if is_max[c] else q <= p

    def _gt(i: int, c: str):
        q, p = F.col(f"__q{i}"), F.col(c)
        return q > p if is_max[c] else q < p

    dominated = reduce(and_, (_ge(i, c) for i, c in enumerate(names))) & (
        reduce(or_, (_gt(i, c) for i, c in enumerate(names)))
    )
    sky = cand.join(F.broadcast(ref), dominated, "left_anti")

    sky_r = sky.select(
        *[F.col(c).alias(f"__s{i}") for i, c in enumerate(names)]
    )
    back = reduce(
        and_, (F.col(c) == F.col(f"__s{i}") for i, c in enumerate(names))
    )
    out_names = [
        c if is_max[c] else f"frontier_{c}" for c in names
    ]
    return (
        df.join(F.broadcast(sky_r), back)
        .groupBy(*[f"__s{i}" for i in range(len(names))])
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            *[
                F.col(f"__s{i}").alias(out)
                for i, out in enumerate(out_names)
            ],
            "n_rows",
        )
    )
