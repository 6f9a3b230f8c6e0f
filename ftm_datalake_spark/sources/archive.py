"""Content-addressed blob archiving + dataset config (SURVEY §2.1 S7/S10).

S10 blob sink: the reference copies each crawled file into the
`archive/ab/cd/ef/<sha1>` layout and writes info.json per file
(ftm_datalake/archive/dataset.py:119-148). Spark-first, the copy is a
foreachPartition job over (source path, content_hash) rows — each
executor copies its partition's blobs with no driver involvement — and
the *metadata* goes to the documents table instead of per-file JSON.
Preferred mode at scale is copy=False: leave blobs in place and only
manage metadata (the reference supports the same choice).

S7 config: YAML `config.yml` per dataset, a driver-side small read
(ftm_datalake/archive/dataset.py:75-83).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

from pyspark.sql import DataFrame

from ftm_datalake_spark.functions.checksum import shard_path  # noqa: F401  (expr twin)


def _shard(content_hash: str) -> str:
    return f"{content_hash[0:2]}/{content_hash[2:4]}/{content_hash[4:6]}/{content_hash}"


def archive_blobs(
    files: DataFrame,
    archive_root: str,
    dataset: str,
    path_col: str = "path",
    hash_col: str = "content_hash",
) -> None:
    """S10: distributed copy of blobs into the sharded archive layout.

    `files` carries (local source path, content hash); each partition
    copies its own blobs. Idempotent: existing target shards are kept
    (content-addressing makes overwrites meaningless). Missing source
    files are SKIPPED, not fatal: the archive pass is driven by the
    merged documents table, which retains rows from earlier crawls whose
    source file may since have been removed — one stale row must not
    crash the whole job (same tolerance as gc_blobs' delete)."""
    base = os.path.join(archive_root, dataset, "archive")

    def copy_partition(rows: Iterator) -> None:
        import uuid

        for row in rows:
            src = row[path_col]
            if src.startswith("file:"):
                src = src[len("file:") :]
            target = os.path.join(base, _shard(row[hash_col]))
            if os.path.exists(target):
                continue
            os.makedirs(os.path.dirname(target), exist_ok=True)
            # copy via temp + atomic rename: a task killed mid-copy must
            # not leave a truncated blob that future runs skip as done
            tmp = f"{target}.__tmp__{uuid.uuid4().hex}"
            try:
                shutil.copyfile(src, tmp)
                os.rename(tmp, target)
            except FileNotFoundError:
                pass  # stale table row: source removed since its crawl
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)

    files.select(path_col, hash_col).foreachPartition(copy_partition)


def archive_blob_bytes(
    files: DataFrame,
    archive_root: str,
    dataset: str,
    content_col: str = "content",
    hash_col: str = "content_hash",
) -> None:
    """S10 for remote stores: write blob BYTES (already fetched
    task-side, e.g. by the HTTP backend) into the sharded layout — no
    local source path exists to copy from. Same idempotence and
    temp+rename atomicity as archive_blobs; bytes flow executor→disk,
    never through the driver."""
    base = os.path.join(archive_root, dataset, "archive")

    def write_partition(rows: Iterator) -> None:
        import uuid

        for row in rows:
            target = os.path.join(base, _shard(row[hash_col]))
            if os.path.exists(target):
                continue
            os.makedirs(os.path.dirname(target), exist_ok=True)
            tmp = f"{target}.__tmp__{uuid.uuid4().hex}"
            try:
                with open(tmp, "wb") as fh:
                    fh.write(bytes(row[content_col]))
                os.rename(tmp, target)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)

    files.select(content_col, hash_col).foreachPartition(write_partition)


def open_blob(archive_root: str, dataset: str, content_hash: str) -> bytes:
    """S9: read one archived blob back (serving-layer point read)."""
    with open(os.path.join(archive_root, dataset, "archive", _shard(content_hash)), "rb") as fh:
        return fh.read()


def read_dataset_config(config_path: str) -> dict:
    """S7: dataset config.yml (driver-side; not a distributed op)."""
    import yaml

    with open(config_path, encoding="utf-8") as fh:
        return yaml.safe_load(fh) or {}
