"""Exact global rank over a total order — without a single-partition sort.

A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole table
through ONE task (Spark plans a single-partition Exchange), which is a
scale-killer: correct at sf0.1, dead at 100x. The scale-correct scheme is
the one ``RDD.zipWithIndex`` uses, expressed DataFrame-native:

    range-repartition on the order columns      (distributed sort shuffle)
      -> per-partition row_number               (parallel windows)
      -> + cumulative row offset of the partition (driver-side, P integers)

The shuffled frame is materialized once (localCheckpoint, which cuts the
lineage) so the offset pass and the ranked output observe the SAME range
bounds — bounds are sampled, so two independent evaluations of the
Exchange could disagree. A bare persist() is not enough: evicted or
executor-lost blocks would be silently RECOMPUTED with fresh bounds,
corrupting ranks; with a checkpoint, lost blocks fail loudly instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach a 1-based exact global rank by ``order_cols``; returns
    (ranked_df, total_row_count).

    The order must be total (include a unique tiebreak column) for the
    rank to be deterministic. The per-partition counts collected to the
    driver are P integers — metadata, not data. The shuffled input is
    localCheckpoint-ed (lineage cut) so it can never be recomputed under
    different sampled range bounds; the blocks are freed when the
    returned plan is garbage-collected.
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["n"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(p):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    off_expr = F.create_map(
        *[x for pid in range(p) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = parted.withColumn(
        rank_col,
        F.row_number().over(w).cast("long") + off_expr[F.col("__pid")],
    ).drop("__pid")
    return ranked, acc


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_end",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach an exact global running sum of ``value_col`` over the total
    order ``order_cols`` — the same two-phase scheme as
    :func:`with_global_rank` (range shuffle → per-partition window → P
    driver-side partial-sum offsets), so no single-partition Exchange
    appears in the plan. ``out_col`` is the INCLUSIVE running sum (the
    value of the current row is included)."""
    return with_global_cumsums(
        df, order_cols, [(value_col, out_col)], num_partitions
    )


def with_global_cumsums(
    df: DataFrame,
    order_cols: list[str],
    cols: list[tuple[str, str]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-column form of :func:`with_global_cumsum`: attach one exact
    global running sum per ``(value_col, out_col)`` pair over the SAME
    total order, sharing a single range shuffle + checkpoint + driver
    offset pass instead of one per column."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = {
        r["__pid"]: [r[f"s{i}"] for i in range(len(cols))]
        for r in parted.groupBy("__pid")
        .agg(
            *[
                F.sum(value_col).alias(f"s{i}")
                for i, (value_col, _) in enumerate(cols)
            ]
        )
        .collect()
    }
    out = parted
    for i, (value_col, out_col) in enumerate(cols):
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(p):
            offsets[pid] = acc
            acc += (partials.get(pid) or [0] * len(cols))[i] or 0
        off_expr = F.create_map(
            *[x for pid in range(p) for x in (F.lit(pid), F.lit(offsets[pid]))]
        )
        w = (
            Window.partitionBy("__pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            out_col,
            F.sum(F.col(value_col)).over(w).cast("long")
            + off_expr[F.col("__pid")],
        )
    return out.drop("__pid")


def ntile_by_rank(rank: F.Column, n_rows: int, n_buckets: int) -> F.Column:
    """SQL NTILE(n) bucket from an exact 1-based rank: the first
    ``n_rows % n_buckets`` buckets get ``ceil(n_rows / n_buckets)`` rows,
    the rest get the floor — identical to the window-function definition,
    but computed by arithmetic on the distributed rank instead of a
    global window."""
    base, rem = divmod(n_rows, n_buckets)
    if base == 0:
        return rank.cast("int")
    cut = rem * (base + 1)
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (base + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rank - 1 - cut) / base) + 1)
        .cast("int")
    )
