"""Bucketed tables: shuffle-free co-located joins for the lake's hot keys.

At 100 TB the recurring joins are statements⋈entities on canonical_id and
documents⋈file_info on key. Writing both sides bucketed by the join key
(`bucketBy(n, key)` + saveAsTable) lets every later join run with ZERO
exchange on either side — the sort-merge join reads co-located buckets.
This is the Spark-native replacement for maintaining a manually
partitioned key layout.

Sizing rule: buckets ≈ total_size / 256 MB, rounded to a power of two so
bucket pruning composes with partition pruning; at 100 TB that is
O(100k) buckets — well within metastore limits when combined with
dataset partition columns."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_no_shuffle(df: DataFrame) -> bool:
    """Assert-helper: true if the physical plan contains no Exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns — the
    multi-dimensional clustering key. Range-partitioning + sorting a table
    by this key co-locates rows that are close in BOTH dimensions, so
    min/max file statistics prune scans with predicates on either column
    (the Delta/Iceberg OPTIMIZE ZORDER trick, expressed as one integer
    projection).

    Pure bit arithmetic (shiftleft/or), JVM-codegen end-to-end."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = (
            key
            .bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return key


def write_zordered(
    df: DataFrame, out_dir: str, col_a: str, col_b: str,
    num_files: int = 16, bits: int = 16,
) -> None:
    """Rewrite a table clustered by the z-order of (col_a, col_b): range-
    repartition on the Morton key then sort within partitions, so every
    parquet file covers a compact rectangle of the (a, b) space and its
    min/max footer stats prune on either predicate."""
    keyed = df.withColumn("__z", zorder_key(F.col(col_a), F.col(col_b), bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
