"""Streaming WebDataset publisher (streaming/wds.py): append-only tar
shards + replay-safe cumulative manifest over an object-store-style
scheme."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@pytest.fixture()
def viewfs(spark, tmp_path):
    import uuid

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./data"
    hconf.set(key, tmp_path.as_uri())
    yield f"viewfs://{name}/data"
    hconf.unset(key)


def _feed(feed_dir: str, name: str, ids) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    with open(os.path.join(feed_dir, name), "w") as fh:
        for i in ids:
            fh.write(json.dumps({"doc_id": i, "text": f"text-{i}"}) + "\n")


def _drain(spark, feed, out, ckpt):
    from ftm_datalake_spark.streaming.wds import stream_webdataset_publish

    stream = spark.readStream.schema(DOC_SCHEMA).json(feed)
    q = stream_webdataset_publish(
        stream, out, ckpt, shard_size=10, key_col="doc_id", text_col="text"
    )
    q.awaitTermination(120)


def test_streaming_publish_equals_batch_over_viewfs(spark, tmp_path, viewfs):
    """Stream==batch law: two incremental drains must yield the same
    (key, content) sample set as one batch export of the full corpus,
    with every manifest digest matching the actual remote bytes."""
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.sources.sinks import (
        read_webdataset_shards,
        write_webdataset_shards,
    )
    from ftm_datalake_spark.streaming.wds import read_webdataset_manifest

    out = f"{viewfs}/wds_stream"
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    fsutil.mkdirs(spark, out)

    _feed(feed, "b0.json", range(25))
    _drain(spark, feed, out, ckpt)
    _feed(feed, "b1.json", range(25, 60))
    _drain(spark, feed, out, ckpt)

    manifest = read_webdataset_manifest(spark, out)
    # 25 docs -> 3 shards in batch 0; 35 docs -> 4 shards in batch 1
    assert len(manifest) == 7
    assert {m["batch_id"] for m in manifest} == {0, 1}
    for m in manifest:
        got = hashlib.sha256(fsutil.read_bytes(spark, m["path"])).hexdigest()
        assert got == m["sha256"]

    back = read_webdataset_shards(spark, out)
    rows = back.where(F.col("member") == "txt").select(
        "key", "content"
    ).collect()
    got = {(r["key"], bytes(r["content"])) for r in rows}

    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(60)], "doc_id long, text string"
    )
    batch_dir = str(tmp_path / "wds_batch")
    os.makedirs(batch_dir)
    write_webdataset_shards(docs, batch_dir, shard_size=10)
    batch_back = read_webdataset_shards(spark, batch_dir)
    want = {
        (r["key"], bytes(r["content"]))
        for r in batch_back.where(F.col("member") == "txt")
        .select("key", "content")
        .collect()
    }
    assert got == want


def test_streaming_publish_replay_is_noop(spark, tmp_path, viewfs):
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.streaming.wds import read_webdataset_manifest

    out = f"{viewfs}/wds_stream"
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    fsutil.mkdirs(spark, out)
    _feed(feed, "b0.json", range(15))
    _drain(spark, feed, out, ckpt)
    m1 = read_webdataset_manifest(spark, out)
    _drain(spark, feed, out, ckpt)  # nothing new: checkpoint no-op
    m2 = read_webdataset_manifest(spark, out)
    assert m1 == m2


def test_streaming_publish_kill_midbatch_is_replay_safe(
    spark, tmp_path, viewfs
):
    """Manifest-as-commit-record law: a crashed batch's orphan shard
    (written under its deterministic name, never committed) is absent
    from the manifest, and the re-delivered batch overwrites it with
    the true bytes before committing."""
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.sources.sinks import read_webdataset_shards
    from ftm_datalake_spark.streaming.wds import read_webdataset_manifest

    out = f"{viewfs}/wds_stream"
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    fsutil.mkdirs(spark, out)
    _feed(feed, "b0.json", range(5))
    _drain(spark, feed, out, ckpt)

    # simulate: batch 1 died after writing its first shard, before the
    # manifest merge — garbage sits at the deterministic name
    orphan = tmp_path / "wds_stream" / "shard-b000001-000000.tar"
    orphan.write_bytes(b"garbage from a crashed batch")
    manifest = read_webdataset_manifest(spark, out)
    assert all("b000001" not in m["path"] for m in manifest)  # uncommitted

    _feed(feed, "b1.json", range(5, 17))
    _drain(spark, feed, out, ckpt)
    manifest = read_webdataset_manifest(spark, out)
    assert sum("b000001" in m["path"] for m in manifest) == 2  # 12 docs/10
    assert orphan.read_bytes() != b"garbage from a crashed batch"
    for m in manifest:
        got = hashlib.sha256(fsutil.read_bytes(spark, m["path"])).hexdigest()
        assert got == m["sha256"]
    back = read_webdataset_shards(spark, out)
    keys = {
        r["key"]
        for r in back.where(F.col("member") == "txt").select("key").collect()
    }
    assert keys == set(range(17))


def test_concurrent_readers_see_only_committed_prefixes(spark, tmp_path):
    """Chaos law (VERDICT r12 next-round #6): readers polling the
    manifest WHILE a publish stream drains — with an injected kill
    after batch 1's shards land but before its manifest commit, then a
    restart — must only ever observe prefix-consistent committed sets:
    every named shard exists with its manifest sha256, every batch
    present is complete (its final entry set), and the batch ids form
    a contiguous prefix of the delivery order."""
    import hashlib as _hashlib
    import threading
    import time as _time

    from ftm_datalake_spark import fsutil_py
    from ftm_datalake_spark.streaming.wds import read_webdataset_manifest

    out = str(tmp_path / "wds_stream")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)

    observed: list[list[dict]] = []
    stop = threading.Event()

    def reader() -> None:
        while not stop.is_set():
            try:
                manifest = read_webdataset_manifest(None, out)
            except Exception:
                continue  # torn JSON would surface here — it must not
            if manifest and (not observed or manifest != observed[-1]):
                # verify AT OBSERVATION TIME: every named shard is
                # already complete on disk with the committed digest
                for m in manifest:
                    with open(m["path"], "rb") as fh:
                        data = fh.read()
                    assert _hashlib.sha256(data).hexdigest() == m["sha256"]
                observed.append(manifest)
            _time.sleep(0.005)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        _feed(feed, "b0.json", range(25))
        _drain(spark, feed, out, ckpt)

        # inject: batch 1 dies AFTER its shards land, BEFORE the
        # manifest commit
        real_write = fsutil_py.write_bytes_atomic
        state = {"armed": True}

        def failing_write(sparkish, uri, payload, s3_conn=None):
            if state["armed"] and uri.endswith("manifest.json"):
                state["armed"] = False
                raise RuntimeError("injected kill before manifest commit")
            return real_write(sparkish, uri, payload, s3_conn)

        fsutil_py_mod = __import__(
            "ftm_datalake_spark.fsutil_py", fromlist=["x"]
        )
        fsutil_py_mod.write_bytes_atomic = failing_write
        try:
            _feed(feed, "b1.json", range(25, 60))
            with pytest.raises(Exception):
                _drain(spark, feed, out, ckpt)
        finally:
            fsutil_py_mod.write_bytes_atomic = real_write

        _drain(spark, feed, out, ckpt)  # restart: batch 1 re-delivers
        _feed(feed, "b2.json", range(60, 72))
        _drain(spark, feed, out, ckpt)
    finally:
        stop.set()
        t.join(10)

    final = read_webdataset_manifest(None, out)
    assert {m["batch_id"] for m in final} == {0, 1, 2}
    by_batch_final: dict[int, set] = {}
    for m in final:
        by_batch_final.setdefault(m["batch_id"], set()).add(
            (m["path"], m["sha256"])
        )
    assert observed, "reader never saw a manifest"
    for manifest in observed:
        batches = {m["batch_id"] for m in manifest}
        # contiguous prefix of the delivery order
        assert batches == set(range(len(batches)))
        by_batch = {}
        for m in manifest:
            by_batch.setdefault(m["batch_id"], set()).add(
                (m["path"], m["sha256"])
            )
        for b, entries in by_batch.items():
            assert entries == by_batch_final[b], (
                f"batch {b} observed partially: {entries}"
            )
