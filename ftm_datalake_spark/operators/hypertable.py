"""Hypertable-style multi-resolution time rollups (continuous-aggregate
pattern): a fine-grained rollup is materialized once, and every coarser
resolution derives from the finer partials instead of re-scanning raw
data.

Only algebraic aggregates compose (sum/count/min/max — avg must be
carried as sum+count). At 100 TB this turns the daily/monthly dashboards
from full scans into aggregations over the (tiny) hourly table; the
composition is exact because the partials are exact decimal/long sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: F.Column, width: str) -> F.Column:
    """Truncate a timestamp to a bucket boundary (hour|day|month|year)."""
    return F.date_trunc(width, ts)


def rollup_level(
    events: DataFrame,
    width: str,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The finest rollup level, computed from raw rows."""
    return (
        events.groupBy(
            time_bucket(F.col(ts_col), width).alias("bucket"), *keys
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )


def rollup_coarser(finer: DataFrame, width: str, keys: list[str]) -> DataFrame:
    """Derive a coarser level from a finer one: partials compose
    (counts sum, sums sum, min/max re-min/max). No raw-data scan."""
    return (
        finer.groupBy(
            time_bucket(F.col("bucket"), width).alias("bucket"), *keys
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
