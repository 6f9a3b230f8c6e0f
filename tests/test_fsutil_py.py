"""fsutil_py: the pure-Python metadata tier (VERDICT r12 next-round #3).

Proves a pure-s3 deployment WITHOUT s3a jars can host the streaming
WebDataset manifest and the pointer-CDC pointer: every metadata
operation (read/write/list/exists/delete) runs through boto3 / os /
pyarrow — a spy hard-disables the JVM FS client for the duration, so a
fallback regression fails loudly instead of silently passing through
py4j. Replay laws re-assert under the new routing.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

BUCKET = "graft-meta"


@pytest.fixture(scope="module")
def s3srv():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    conn = {
        "endpoint_url": f"http://{host}:{port}",
        "region_name": "us-east-1",
        "access_key": "testing",
        "secret_key": "testing",
    }
    client = boto3.client(
        "s3",
        endpoint_url=conn["endpoint_url"],
        region_name=conn["region_name"],
        aws_access_key_id=conn["access_key"],
        aws_secret_access_key=conn["secret_key"],
    )
    client.create_bucket(Bucket=BUCKET)
    yield conn, client
    server.stop()


@pytest.fixture()
def no_jvm_fs(monkeypatch):
    """Hard-disable the JVM FileSystem client: any fsutil metadata call
    during the test is a routing regression."""
    from ftm_datalake_spark import fsutil

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("JVM FS client used for metadata")

    monkeypatch.setattr(fsutil, "hadoop_fs", _boom)


def test_primitives_local_need_no_spark(tmp_path, no_jvm_fs):
    from ftm_datalake_spark import fsutil_py

    uri = str(tmp_path / "dir" / "artifact.json")
    assert not fsutil_py.exists(None, uri)
    fsutil_py.write_bytes_atomic(None, uri, b'{"v": 1}')
    fsutil_py.write_bytes_atomic(None, uri, b'{"v": 2}')  # atomic replace
    assert fsutil_py.read_bytes_with_fallback(None, uri) == b'{"v": 2}'
    assert fsutil_py.list_names(None, str(tmp_path / "dir")) == [
        "artifact.json"
    ]
    assert fsutil_py.delete(None, uri)
    assert not fsutil_py.exists(None, uri)
    assert fsutil_py.list_names(None, str(tmp_path / "missing")) == []


def test_primitives_on_moto_s3_need_no_spark(s3srv, no_jvm_fs):
    from ftm_datalake_spark import fsutil_py

    conn, client = s3srv
    base = f"s3://{BUCKET}/meta"
    uri = f"{base}/SNAPSHOT"
    assert not fsutil_py.exists(None, uri, conn)
    fsutil_py.write_bytes_atomic(None, uri, b"gen-init", conn)
    fsutil_py.write_bytes_atomic(None, uri, b"gen-000000000000", conn)
    assert (
        fsutil_py.read_bytes_with_fallback(None, uri, conn)
        == b"gen-000000000000"
    )
    # directory-ish listing: immediate children only, dirs collapsed
    client.put_object(Bucket=BUCKET, Key="meta/gen-init/part-0.parquet",
                      Body=b"x")
    client.put_object(Bucket=BUCKET, Key="meta/gen-init/part-1.parquet",
                      Body=b"y")
    assert fsutil_py.list_names(None, base, conn) == ["SNAPSHOT", "gen-init"]
    assert fsutil_py.exists(None, f"{base}/gen-init", conn)  # prefix-dir
    # recursive prefix delete (generation GC)
    assert fsutil_py.delete(None, f"{base}/gen-init", s3_conn=conn)
    assert fsutil_py.list_names(None, base, conn) == ["SNAPSHOT"]
    assert not fsutil_py.delete(None, f"{base}/gen-init", s3_conn=conn)


def test_streaming_wds_publish_pure_s3(spark, tmp_path, s3srv, no_jvm_fs):
    """The whole streaming WebDataset publish on s3 without s3a jars:
    shard bytes task-side via boto3, manifest via the pure-Python
    metadata tier — and the replay law holds under the new routing."""
    from ftm_datalake_spark.streaming.wds import (
        read_webdataset_manifest,
        stream_webdataset_publish,
    )

    conn, client = s3srv
    out = f"s3://{BUCKET}/wds_stream"
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def _feed(name: str, ids) -> None:
        with open(os.path.join(feed, name), "w") as fh:
            for i in ids:
                fh.write(json.dumps({"doc_id": i, "text": f"text-{i}"}) + "\n")

    def _drain() -> None:
        stream = spark.readStream.schema("doc_id long, text string").json(feed)
        q = stream_webdataset_publish(
            stream, out, ckpt, shard_size=10, s3_conn=conn
        )
        q.awaitTermination(120)

    _feed("b0.json", range(25))
    _drain()
    _feed("b1.json", range(25, 60))
    _drain()

    manifest = read_webdataset_manifest(spark, out, conn)
    assert len(manifest) == 7  # 3 shards batch 0 + 4 shards batch 1
    assert {m["batch_id"] for m in manifest} == {0, 1}
    for m in manifest:
        assert m["path"].startswith(f"s3://{BUCKET}/wds_stream/shard-b")
        key = m["path"][len(f"s3://{BUCKET}/"):]
        body = client.get_object(Bucket=BUCKET, Key=key)["Body"].read()
        assert hashlib.sha256(body).hexdigest() == m["sha256"]

    _drain()  # checkpoint no-op: nothing new
    assert read_webdataset_manifest(spark, out, conn) == manifest


def test_pointer_cdc_drain_uses_no_jvm_metadata(spark, tmp_path, no_jvm_fs):
    """A full pointer-CDC drain (local data plane) performs ZERO JVM
    FS-client metadata operations: pointer read/flip, generation
    listing, and GC all route through fsutil_py."""
    from pyspark.sql import types as T

    from ftm_datalake_spark.streaming.cdc import (
        init_pointer_snapshot,
        read_pointer_snapshot,
        run_cdc_upsert_stream_pointer,
    )

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("val", T.StringType()),
        ]
    )
    base = str(tmp_path / "snapbase")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    init_pointer_snapshot(
        spark.createDataFrame(
            [("a", "v1"), ("b", "v2")], "key string, val string"
        ),
        base,
    )
    for i, rows in enumerate(
        [
            [{"key": "a", "seq": 1, "op": "U", "val": "v1x"}],
            [{"key": "c", "seq": 2, "op": "I", "val": "v3"}],
            [{"key": "b", "seq": 3, "op": "D", "val": None}],
        ]
    ):
        with open(os.path.join(feed, f"b{i}.json"), "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
    stream = spark.readStream.schema(schema).json(feed)
    q = run_cdc_upsert_stream_pointer(
        stream, base, str(tmp_path / "ckpt"), ["key"], keep=2
    )
    q.awaitTermination(120)
    got = {
        r.key: r.val for r in read_pointer_snapshot(spark, base).collect()
    }
    assert got == {"a": "v1x", "c": "v3"}
    # GC ran (keep=2) without the JVM client either
    gens = sorted(
        n for n in os.listdir(base) if n.startswith("gen-")
    )
    assert len(gens) == 2


def test_pointer_protocol_hosted_on_moto_s3(s3srv, no_jvm_fs):
    """The pointer lifecycle a pure-s3 deployment runs: publish a
    generation's pointer, read through it, flip, list generations, GC
    the old one — all metadata, all boto3, no SparkSession at all."""
    from ftm_datalake_spark import fsutil_py
    from ftm_datalake_spark.streaming.cdc import POINTER_NAME, _read_pointer

    conn, client = s3srv
    base = f"s3://{BUCKET}/cdcbase"
    # generations land (in production: parquet via a jar-equipped data
    # plane; here: stand-in objects — the pointer protocol is the test)
    client.put_object(Bucket=BUCKET, Key="cdcbase/gen-init/part-0", Body=b"g0")
    fsutil_py.write_bytes_atomic(
        None, f"{base}/{POINTER_NAME}", b"gen-init", conn
    )
    assert _read_pointer(None, base, conn) == "gen-init"

    client.put_object(
        Bucket=BUCKET, Key="cdcbase/gen-000000000000/part-0", Body=b"g1"
    )
    fsutil_py.write_bytes_atomic(
        None, f"{base}/{POINTER_NAME}", b"gen-000000000000", conn
    )
    assert _read_pointer(None, base, conn) == "gen-000000000000"
    gens = [
        n
        for n in fsutil_py.list_names(None, base, conn)
        if n.startswith("gen-")
    ]
    assert gens == ["gen-000000000000", "gen-init"]
    fsutil_py.delete(None, f"{base}/gen-init", s3_conn=conn)
    assert fsutil_py.list_names(None, base, conn) == [
        POINTER_NAME,
        "gen-000000000000",
    ]


def test_jvm_fallback_tier_over_viewfs(spark, tmp_path):
    """The last-resort tier: a scheme neither os/boto3/pyarrow resolve
    (viewfs mount table) must route through the JVM fsutil client with
    full read/write-atomic/list/exists/delete semantics — and demand a
    SparkSession (spark=None raises instead of degrading)."""
    import uuid

    from ftm_datalake_spark import fsutil_py

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./data"
    hconf.set(key, tmp_path.as_uri())
    try:
        base = f"viewfs://{name}/data"
        uri = f"{base}/meta/artifact.json"
        assert not fsutil_py.exists(spark, uri)
        fsutil_py.write_bytes_atomic(spark, uri, b'{"v": 1}')
        fsutil_py.write_bytes_atomic(spark, uri, b'{"v": 2}')
        assert fsutil_py.read_bytes_with_fallback(spark, uri) == b'{"v": 2}'
        assert fsutil_py.list_names(spark, f"{base}/meta") == [
            "artifact.json"
        ]
        assert fsutil_py.delete(spark, uri)
        assert not fsutil_py.exists(spark, uri)
        with pytest.raises(ValueError):
            fsutil_py.read_bytes(None, uri)
    finally:
        hconf.unset(key)
