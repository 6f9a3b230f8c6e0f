"""Sync-pipeline tests: memorious import + key funcs + batched push,
mirroring the reference's tests/test_sync.py coverage (SURVEY §5)."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("request_id", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("title", T.StringType()),
        T.StructField("retrieved_at", T.TimestampType()),
        T.StructField("modified_at", T.TimestampType()),
        T.StructField("_file_name", T.StringType()),
    ]
)

NOW = dt.datetime(2024, 1, 1)


def _meta(spark):
    rows = [
        ("https://ex.com/docs/f%20ile.pdf?x=1", "r1", 200, "aa11",
         {"Content-Type": "application/pdf", "Content-Length": "123"},
         "File", NOW, None, "aa11.data.pdf"),
        ("https://ex.com/docs/other.csv", "r2", 200, "bb22",
         {"Content-Type": "text/csv"}, "Other", NOW, NOW, "bb22.data.csv"),
        ("https://ex.com/missing", "r3", 404, None, {}, None, NOW, None, None),
    ]
    return spark.createDataFrame(rows, META_SCHEMA)


def test_memorious_import_default_key(spark):
    from ftm_datalake_spark.pipelines.sync import memorious_import

    out = {r["key"]: r for r in memorious_import(_meta(spark)).collect()}
    # not_found row skipped; reference key scheme (memorious.get_file_key):
    # url-decoded PATH, host and query dropped, slashes stripped
    assert set(out) == {"docs/f ile.pdf", "docs/other.csv"}
    assert out["docs/f ile.pdf"]["size"] == 123
    assert out["docs/other.csv"]["size"] is None
    assert out["docs/other.csv"]["mimetype"] == "text/csv"


def test_memorious_import_strip_prefix_key(spark):
    from ftm_datalake_spark.pipelines.sync import key_strip_prefix, memorious_import

    out = memorious_import(
        _meta(spark), key_func=lambda df: key_strip_prefix(F.col("url"), "docs/")
    )
    assert {r["key"] for r in out.collect()} == {"f ile.pdf", "other.csv"}


def test_memorious_import_template_key(spark):
    from ftm_datalake_spark.pipelines.sync import key_from_template, memorious_import

    udf = key_from_template("{{ request_id }}/{{ content_hash }}")
    out = memorious_import(
        _meta(spark),
        key_func=lambda df: udf(F.struct("request_id", "content_hash")),
    )
    assert {r["key"] for r in out.collect()} == {"r1/aa11", "r2/bb22"}


def test_sync_to_aleph_end_to_end(spark, tmp_path):
    """Folders dim → create-once folder ids → upload rows carry resolved
    parent ids → batched push (reference sync/aleph.py:95-141)."""
    import uuid

    from ftm_datalake_spark.pipelines.sync import sync_to_aleph

    docs = spark.createDataFrame(
        [
            ("a/b/one.txt", "h1"),
            ("a/b/two.txt", "h2"),
            ("a/three.txt", "h3"),
            ("top.txt", "h4"),
        ],
        "key string, content_hash string",
    )

    created: list[tuple[str, str | None]] = []

    def make_folder(path: str, parent_id: str | None) -> str:
        # runs driver-side (folder creation is sequential in the reference)
        created.append((path, parent_id))
        return f"fid:{path}"

    outdir = str(tmp_path / "aleph")
    os.makedirs(outdir, exist_ok=True)

    def send(batch: list[dict]) -> None:
        # runs on executors: collect through disk, like a real HTTP sink
        with open(os.path.join(outdir, f"{uuid.uuid4().hex}.json"), "w") as fh:
            json.dump(batch, fh)

    sync_to_aleph(docs, make_folder, send, batch_size=10)
    sent = [json.load(open(os.path.join(outdir, p))) for p in os.listdir(outdir)]

    # create-once, parents before children, with resolved parent ids
    assert created == [("a", None), ("a/b", "fid:a")]

    rows = {r["key"]: r for b in sent for r in b}
    assert rows["a/b/one.txt"]["parent_id"] == "fid:a/b"
    assert rows["a/b/one.txt"]["file_name"] == "one.txt"
    assert rows["a/b/one.txt"]["foreign_id"] == "a/b/one.txt"
    assert rows["a/three.txt"]["parent_id"] == "fid:a"
    assert rows["top.txt"]["parent_id"] is None
    assert len(rows) == 4


def test_push_in_batches(spark, tmp_path):
    from ftm_datalake_spark.pipelines.sync import push_in_batches

    outdir = str(tmp_path / "pushed")
    os.makedirs(outdir, exist_ok=True)

    def send(batch: list[dict]) -> None:
        # stand-in for the HTTP sink: one file per request
        import uuid

        with open(os.path.join(outdir, f"{uuid.uuid4().hex}.json"), "w") as fh:
            json.dump(batch, fh)

    df = spark.range(2500).select(F.col("id"), (F.col("id") % 7).alias("v"))
    push_in_batches(df, send, batch_size=1000, max_concurrency=2)

    batches = [json.load(open(os.path.join(outdir, p))) for p in os.listdir(outdir)]
    assert sum(len(b) for b in batches) == 2500
    assert max(len(b) for b in batches) <= 1000
    ids = sorted(row["id"] for b in batches for row in b)
    assert ids == list(range(2500))
