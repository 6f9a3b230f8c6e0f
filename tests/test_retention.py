"""Deletion propagation: forget_keys table rewrite + refcounted blob GC
(pipelines/retention.py). The shared-blob case is the one that matters:
content-addressing dedups identical payloads across keys, so a blob must
survive until its LAST referencing key is forgotten."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def lake(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import crawl
    from ftm_datalake_spark.__main__ import _dispatch
    import argparse

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"unique alpha")
    (src / "b.txt").write_bytes(b"shared payload")
    (src / "c.txt").write_bytes(b"shared payload")  # same blob as b
    lake_dir = str(tmp_path / "lake")
    _dispatch(
        spark,
        argparse.Namespace(
            cmd="crawl", source=str(src), dataset="ds", lake=lake_dir,
            include=None, exclude=None, archive=True,
        ),
    )
    return lake_dir


def _blob_hashes(lake_dir: str) -> set[str]:
    out = set()
    for root, _dirs, names in os.walk(os.path.join(lake_dir, "ds", "archive")):
        out.update(names)
    return out


def test_forget_and_gc_respects_refcounts(spark, lake):
    import hashlib

    from ftm_datalake_spark.pipelines.ingest import read_documents
    from ftm_datalake_spark.pipelines.retention import forget_and_gc, gc_blobs

    sha_unique = hashlib.sha1(b"unique alpha").hexdigest()
    sha_shared = hashlib.sha1(b"shared payload").hexdigest()
    assert _blob_hashes(lake) == {sha_unique, sha_shared}

    # forget b.txt: its blob is still referenced by c.txt → kept
    keys = spark.createDataFrame([("b.txt",)], "key string")
    audit = forget_and_gc(spark, lake, "ds", keys)
    assert audit == {"rows_removed": 1, "blobs_collected": 0}
    assert _blob_hashes(lake) == {sha_unique, sha_shared}

    # forget c.txt too: refcount hits zero → blob collected
    keys = spark.createDataFrame([("c.txt",)], "key string")
    audit = forget_and_gc(spark, lake, "ds", keys)
    assert audit == {"rows_removed": 1, "blobs_collected": 1}
    assert _blob_hashes(lake) == {sha_unique}
    assert {r.key for r in read_documents(spark, lake, "ds").collect()} == {
        "a.txt"
    }
    # idempotent: nothing left to collect, absent key is a no-op
    assert gc_blobs(spark, lake, "ds") == 0
    audit = forget_and_gc(
        spark, lake, "ds", spark.createDataFrame([("zzz",)], "key string")
    )
    assert audit == {"rows_removed": 0, "blobs_collected": 0}


def test_gc_dry_run_plans_without_deleting(spark, lake):
    from ftm_datalake_spark.pipelines.retention import (
        forget_keys,
        gc_blobs,
        orphan_blobs,
    )

    forget_keys(
        spark, lake, "ds", spark.createDataFrame([("a.txt",)], "key string")
    )
    plan = orphan_blobs(spark, lake, "ds").collect()
    assert len(plan) == 1 and plan[0]["content_hash"] in _blob_hashes(lake)
    assert gc_blobs(spark, lake, "ds", dry_run=True) == 1
    assert plan[0]["content_hash"] in _blob_hashes(lake)  # still on disk
    assert gc_blobs(spark, lake, "ds") == 1
    assert plan[0]["content_hash"] not in _blob_hashes(lake)
