"""Streaming data-quality monitor: the batch rule suite
(operators/quality.dq_rule_summary) run continuously over a stage
stream, with cumulative totals maintained by merge.

Shape: per micro-batch, the suite's ONE-scan aggregation produces a
(rule, n_rows, n_violations) frame; foreachBatch merges it into a tiny
cumulative state table (one row per rule) by integer addition —
violation counts are mergeable by construction, the same
map-side-partials-ARE-the-merge property the sketches exploit. State is
rules-cardinality small at any corpus scale; each batch costs one scan
of the new files only. Exactly-once: the sink rewrites state atomically
per batch under the streaming checkpoint's replay guarantees (a
replayed batch re-merges from the PRIOR state snapshot it re-reads —
state is versioned by batch id, so replays are idempotent)."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.quality import dq_rule_summary


def merge_rule_summaries(prev: DataFrame, batch: DataFrame) -> DataFrame:
    """Cumulative (rule, n_rows, n_violations) merge: full-outer on rule,
    integer sums. prev/batch both in dq_rule_summary's output shape."""
    p = prev.select(
        "rule",
        F.col("n_rows").alias("__pr"),
        F.col("n_violations").alias("__pv"),
    )
    b = batch.select(
        "rule",
        F.col("n_rows").alias("__br"),
        F.col("n_violations").alias("__bv"),
    )
    return p.join(b, "rule", "full_outer").select(
        "rule",
        (F.coalesce("__pr", F.lit(0)) + F.coalesce("__br", F.lit(0)))
        .cast("long")
        .alias("n_rows"),
        (F.coalesce("__pv", F.lit(0)) + F.coalesce("__bv", F.lit(0)))
        .cast("long")
        .alias("n_violations"),
    )


def dq_stream_monitor(
    stream_df: DataFrame,
    rules: dict[str, Column],
    state_dir: str,
    checkpoint_dir: str,
):
    """Attach the rule suite to a stream; returns the StreamingQuery.

    State layout: ``state_dir/v={batch_id}`` parquet per batch, current =
    highest batch id — a replayed batch id overwrites its own version
    (idempotent) instead of double-counting. Read the current totals
    with :func:`read_dq_state`."""
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        summary = dq_rule_summary(batch_df, rules)
        prior_versions = _versions(spark, state_dir)
        prior = [v for v in prior_versions if v < batch_id]
        if prior:
            prev = spark.read.parquet(
                os.path.join(state_dir, f"v={max(prior)}")
            )
            summary = merge_rule_summaries(prev, summary)
        summary.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _versions(spark, state_dir: str) -> list[int]:
    """State-version ids via the Hadoop FS client — the monitor's state
    dir may live on any scheme the stream itself does (fsutil contract:
    missing dir = no state yet, unresolvable scheme raises)."""
    from ftm_datalake_spark import fsutil

    out = []
    for name in fsutil.list_names(spark, state_dir):
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def read_dq_state(spark, state_dir: str) -> DataFrame | None:
    """Current cumulative totals (highest state version), or None."""
    versions = _versions(spark, state_dir)
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={versions[-1]}"))
