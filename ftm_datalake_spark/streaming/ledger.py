"""Task-ledger incrementality (SURVEY §2.10 I1).

The reference's @anycache decorator records a cache key per completed task
and skips tasks whose key exists (reference: ftm_datalake/crawl.py:64-71,
ftm_datalake/archive/cache.py:11-23, docs/cache.md). Spark-first, the
ledger is a parquet table and "skip" is a left-anti join — one broadcast
(ledger keys are small relative to work) or shuffle join, no per-task
key-value lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.schemas import TASK_LEDGER_SCHEMA


def cache_key(prefix: str, dataset: F.Column, key: F.Column) -> F.Column:
    """'{prefix}/{dataset}/{key}' — the reference's key scheme
    (ftm_datalake/worker.py:22-26)."""
    return F.concat_ws("/", F.lit(prefix), dataset, key)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    try:
        return spark.read.schema(TASK_LEDGER_SCHEMA).parquet(ledger_path)
    except Exception:
        return spark.createDataFrame([], TASK_LEDGER_SCHEMA)


def pending_work(incoming: DataFrame, ledger: DataFrame, key_col: str = "cache_key") -> DataFrame:
    """Rows of `incoming` whose key is not in the ledger."""
    return incoming.join(
        F.broadcast(ledger.select(key_col).distinct()), key_col, "left_anti"
    )


def record_completed(done: DataFrame, ledger_path: str, key_col: str = "cache_key") -> None:
    """Append completed keys to the ledger (idempotent consumers dedup on read)."""
    (
        done.select(
            F.col(key_col).alias("cache_key"),
            F.current_timestamp().alias("completed_at"),
        )
        .write.mode("append")
        .parquet(ledger_path)
    )
