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

from pyspark.sql import DataFrame, SparkSession


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
