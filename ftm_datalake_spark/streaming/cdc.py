"""Streaming CDC upsert: drain a sequenced change feed into a managed
snapshot via foreachBatch — the streaming lakehouse MERGE.

Each micro-batch applies operators/documents.apply_cdc onto the current
snapshot and atomically replaces it (write to a tmp dir, rename). The
checkpoint makes the drain exactly-once: a re-run with the same
checkpoint applies only unseen files. Batch-boundary semantics: seq
ordering is respected *within* the feed because apply_cdc picks the
max-seq change per key inside a batch, and later batches only ever carry
later seqs in a well-formed feed (enforce upstream, same contract as the
batch operator).

At scale the overwrite becomes a partition-level replace (write only the
partitions whose keys appear in the batch — the change feed is small, so
the touched-partition set is too); the local form rewrites the whole
snapshot because the test corpus is tiny, and documents the split point.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ftm_datalake_spark.operators.documents import apply_cdc


def run_cdc_upsert_stream(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
) -> StreamingQuery:
    """Drain `changes` (streaming; op/seq + key + data columns) onto the
    parquet snapshot at snapshot_dir, exactly-once per checkpoint."""

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        spark: SparkSession = batch.sparkSession
        target = snapshot_dir.rstrip("/")
        old = target + ".old"
        # Crash recovery: a prior run that died between the two renames
        # below leaves the live snapshot stranded at .old — restore it.
        if not os.path.exists(target) and os.path.exists(old):
            os.rename(old, target)
        snap = spark.read.parquet(snapshot_dir)
        data_cols = [c for c in snap.columns]
        merged = apply_cdc(snap, batch, key_cols).select(*data_cols)
        # Stage the new snapshot NEXT TO the target (not the system temp)
        # so both renames are same-filesystem — os.rename across devices
        # raises EXDEV and a copy would not be atomic at all.
        tmp = tempfile.mkdtemp(
            prefix=".cdc-snap-", dir=os.path.dirname(os.path.abspath(target))
        )
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old, ignore_errors=True)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
