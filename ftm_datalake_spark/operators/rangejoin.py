"""Range (interval) join — points matched into [start, end] intervals.

Spark plans a naive `t1.ts BETWEEN t2.start AND t2.end` join as a
broadcast-nested-loop (quadratic per key). The scale-correct formulation
bucketizes time: every interval explodes into the fixed-width buckets it
overlaps, every point maps to its bucket, and the join becomes an
equi-join on (key, bucket) refined by the exact predicate. Bucket width
trades explode factor vs candidate precision; intervals spanning many
buckets produce duplicate candidates, removed by distinct on the
interval/point identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.functions.timeutil import ts_micros

MICROS_PER_HOUR = 3_600_000_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_micros: int = MICROS_PER_HOUR,
) -> DataFrame:
    """Inner join: point rows × interval rows with
    interval.start <= point.ts <= interval.end (same key).

    Output: all point columns + all interval columns."""
    p_bucket = F.floor(ts_micros(F.col(point_ts)) / bucket_micros)
    i_start = F.floor(ts_micros(F.col(start_ts)) / bucket_micros)
    i_end = F.floor(ts_micros(F.col(end_ts)) / bucket_micros)

    p = points.withColumn("__bucket", p_bucket.cast("long"))
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(i_start.cast("long"), i_end.cast("long"))),
    )
    joined = p.join(i, [on, "__bucket"]).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    # a point lands in exactly one bucket, so no duplicate candidates to
    # dedup — each (point, interval) pair meets in the point's bucket only
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_micros: int = MICROS_PER_HOUR,
) -> DataFrame:
    """Interval × interval overlap join (half-open semantics:
    l.start < r.end AND r.start < l.end), same key.

    Both sides explode into the fixed-width buckets they span, the join
    is an equi-join on (key, bucket), the exact overlap predicate
    refines, and duplicates (pairs meeting in several shared buckets)
    collapse via distinct on the pair identity — so the plan is a hash
    join at any scale, never a nested loop. Callers must pass inputs
    with disjoint column names apart from `on`.
    """
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(left_start)) / bucket_micros).cast("long"),
                F.floor(ts_micros(F.col(left_end)) / bucket_micros).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(right_start)) / bucket_micros).cast("long"),
                F.floor(ts_micros(F.col(right_end)) / bucket_micros).cast("long"),
            )
        ),
    )
    joined = (
        lb.join(rb, [on, "__bucket"])
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        .drop("__bucket")
    )
    return joined.distinct()
