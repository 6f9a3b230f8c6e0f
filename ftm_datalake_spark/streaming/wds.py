"""Streaming WebDataset publisher (VERDICT r11 stretch #8): a
foreachBatch sink that appends tar shards + manifest deltas
incrementally — the continuous-publish mode of the training-export
story.

Each micro-batch runs the batch shard sink
(sources/sinks.write_webdataset_shards — the same byte-deterministic
tar builder with the same 3-backend storage dispatch) under a
batch-scoped shard prefix, then merges the batch's manifest entries
into the cumulative ``manifest.json`` with an atomic byte swap.

Exactly-once calculus, mirroring the pointer-CDC design
(streaming/cdc.py):

- shard names are DETERMINISTIC per (batch_id, in-batch shard index):
  ``shard-b{batch_id:06d}-{i:06d}.tar``. A re-delivered batch rewrites
  the SAME names with the SAME bytes (the tar builder is
  byte-deterministic), so replays are idempotent overwrites;
- the manifest merge is keyed by shard path, so re-merging a batch's
  entries is a no-op — the manifest never double-counts a replayed
  batch;
- the manifest is the commit record, written LAST via
  ``write_bytes_atomic``: a kill mid-batch leaves orphan shards that
  no manifest names (invisible to manifest-driven readers), and the
  checkpoint re-delivers the batch, which overwrites those very
  shards before committing them;
- per-batch global ranks restart at 1, so shard assignment within a
  batch depends only on the batch's own rows — cross-batch order is
  the batch order, which Structured Streaming already fixes.

Readers: :func:`read_webdataset_manifest` lists committed shards;
``sources/sinks.read_webdataset_shards`` over the directory also works
once orphans are impossible (steady state), but the manifest is the
consistent view.

Scheme support: shard BYTES dispatch exactly like the batch sink
(local / s3 / pure-Python-resolvable / JVM fallback), and since round
13 the manifest read-merge-swap goes through fsutil_py — the
pure-Python metadata tier (local ``os``, ``s3://`` via boto3 with
``s3_conn``, pyarrow-resolvable schemes, JVM fsutil only as the last
fallback for viewfs-style schemes). A pure-s3 deployment without s3a
jars therefore hosts the WHOLE streaming publish: shards task-side
through boto3, manifest driver-side through boto3 (VERDICT r12
next-round #3; reference analogue: fsspec-uniform metadata IO,
/root/reference/ftm_datalake/archive/base.py:25-29).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ftm_datalake_spark import fsutil_py

MANIFEST = "manifest.json"


def _read_manifest(
    spark: SparkSession, out_dir: str, s3_conn: dict | None = None
) -> list[dict]:
    uri = f"{out_dir.rstrip('/')}/{MANIFEST}"
    if not fsutil_py.exists(spark, uri, s3_conn) and not fsutil_py.exists(
        spark, uri + ".__bak__", s3_conn
    ):
        return []
    return json.loads(fsutil_py.read_bytes_with_fallback(spark, uri, s3_conn))


def stream_webdataset_publish(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    shard_size: int = 1000,
    key_col: str = "doc_id",
    text_col: str = "text",
    binary_col: str | None = None,
    s3_conn: dict | None = None,
) -> StreamingQuery:
    """Drain a streaming docs frame into an append-only WebDataset
    shard directory with a replay-safe cumulative manifest."""
    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    def publish_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        entries = write_webdataset_shards(
            batch,
            out_dir,
            shard_size=shard_size,
            key_col=key_col,
            text_col=text_col,
            binary_col=binary_col,
            prefix=f"shard-b{batch_id:06d}",
            s3_conn=s3_conn,
            write_manifest=False,
        )
        # Keyed by shard BASENAME, not full path: the name
        # (prefix-shardid.tar) is unique by construction and invariant
        # across path forms, so a replay into a directory whose
        # manifest predates the r13 caller-URI fix (generic-fs entries
        # then recorded pyarrow's scheme-stripped form) overwrites the
        # legacy entry instead of adding a duplicate under the new
        # form (ADVICE r13 #4). The re-landed entry carries the
        # current (caller-URI) path, normalizing the manifest forward.
        current = {
            m["path"].rsplit("/", 1)[-1]: m
            for m in _read_manifest(spark, out_dir, s3_conn)
        }
        for m in entries:
            # idempotent by name: a replayed batch re-lands identical
            # entries (byte-deterministic tars) under identical names
            current[m["path"].rsplit("/", 1)[-1]] = {
                "shard_id": m["shard_id"],
                "path": m["path"],
                "n_samples": m["n_samples"],
                "sha256": m["sha256"],
                "batch_id": batch_id,
            }
        # batch_id is absent from entries a prior BATCH sink wrote into
        # the same directory (write_manifest=True) — sort those first
        # (-1) instead of KeyError-ing the first streaming batch that
        # adopts the directory (ADVICE r12 #3)
        merged = sorted(
            current.values(),
            key=lambda m: (m.get("batch_id", -1), m["shard_id"]),
        )
        fsutil_py.write_bytes_atomic(
            spark,
            f"{out_dir.rstrip('/')}/{MANIFEST}",
            json.dumps(merged, indent=1).encode("utf-8"),
            s3_conn,
        )

    return (
        docs.writeStream.foreachBatch(publish_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_webdataset_manifest(
    spark: SparkSession, out_dir: str, s3_conn: dict | None = None
) -> list[dict]:
    """The committed shard list — the consistent view of a streaming
    publish (orphan shards from a crashed batch are absent until their
    re-delivery commits them)."""
    return _read_manifest(spark, out_dir, s3_conn)
