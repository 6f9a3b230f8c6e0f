"""Spill-aware sizing helpers: derive shuffle partitioning and scan-split
settings from data volume instead of hardcoding them.

The rules of thumb encoded here (and used by session.build_session's
defaults at test scale):
- shuffle partitions sized so each post-shuffle partition holds
  ~TARGET_PARTITION_BYTES (default 128 MB) — large enough to amortize
  task overhead, small enough to aggregate in executor memory without
  spill; AQE then coalesces the tail.
- scan splits at 128 MB-256 MB keep task counts ~O(input/128MB), which at
  100 TB is ~800k tasks — fine for a 1000-executor cluster, catastrophic
  if splits were 4 MB.
- never fewer partitions than 2x total cores (parallelism floor).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def estimate_input_bytes(paths: list[str]) -> int:
    total = 0
    for path in paths:
        if os.path.isfile(path):
            total += os.path.getsize(path)
        else:
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def recommended_shuffle_partitions(
    input_bytes: int,
    total_cores: int,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    expansion: float = 1.0,
) -> int:
    """Partitions for a shuffle over ~input_bytes (x expansion for wide
    transforms like explode): bytes-based, floored at 2x cores."""
    by_size = int(input_bytes * expansion // target_partition_bytes) + 1
    return max(by_size, 2 * total_cores)


def apply_recommended_conf(
    spark: SparkSession, input_paths: list[str], expansion: float = 1.0
) -> dict[str, int]:
    """Set shuffle partitions for the upcoming job from actual input size.

    With AQE on this sets the *initial* partition count; AQE coalesces
    down, so erring high is cheap and erring low (spill) is not."""
    cores = spark.sparkContext.defaultParallelism
    n_bytes = estimate_input_bytes(input_paths)
    parts = recommended_shuffle_partitions(n_bytes, cores, expansion=expansion)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return {"input_bytes": n_bytes, "shuffle_partitions": parts, "cores": cores}


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (plan-audit helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
