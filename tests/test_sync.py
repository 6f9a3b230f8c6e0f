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


# ----------------------------------------------- aleph entity loading (new)
def _write_ftm_dataset(spark, root, name, n_entities):
    """A published dataset layout: entities.ftm.json + index.json with an
    FTM resource row (checksum'd), like the nomenklatura dataset spec."""
    import hashlib

    ds_dir = os.path.join(root, name)
    os.makedirs(ds_dir, exist_ok=True)
    ents = spark.createDataFrame(
        [(f"{name}-e{i}", "Document", {"title": [f"doc {i}"]}, name) for i in range(n_entities)],
        "id string, schema string, properties map<string,array<string>>, dataset string",
    )
    from ftm_datalake_spark.sources.sinks import write_entities_jsonl

    target = write_entities_jsonl(ents, ds_dir)
    checksum = hashlib.sha1(open(target, "rb").read()).hexdigest()
    index = {
        "name": name,
        "resources": [
            {
                "name": "entities.ftm.json",
                "url": target,
                "mime_type": "application/json+ftm",
                "checksum": checksum,
            },
            {"name": "documents.csv", "url": "x", "mime_type": "text/csv"},
        ],
    }
    index_path = os.path.join(ds_dir, "index.json")
    with open(index_path, "w") as fh:
        json.dump(index, fh)
    return index_path


def test_load_entities_dataset_incremental(spark, tmp_path):
    from ftm_datalake_spark.pipelines.sync import load_entities_dataset

    index_uri = _write_ftm_dataset(spark, str(tmp_path), "ds_a", 25)
    outdir = str(tmp_path / "pushed")
    os.makedirs(outdir)

    def send(batch: list[dict]) -> None:
        import uuid

        with open(os.path.join(outdir, f"{uuid.uuid4().hex}.json"), "w") as fh:
            json.dump(batch, fh)

    ledger = str(tmp_path / "ledger")
    meta_calls: list[str] = []
    stats = load_entities_dataset(
        spark, index_uri, send, ledger_dir=ledger, batch_size=10,
        update_metadata=lambda ix: meta_calls.append(ix["name"]),
    )
    assert stats == {"resources": 1, "entities": 25, "skipped_resources": 0}
    assert meta_calls == ["ds_a"]  # update_collection_metadata hook, once
    pushed = [
        e for p in os.listdir(outdir)
        for b in [json.load(open(os.path.join(outdir, p)))] for e in b
    ]
    assert sorted(e["id"] for e in pushed) == sorted(f"ds_a-e{i}" for i in range(25))
    assert all(len(json.load(open(os.path.join(outdir, p)))) <= 10 for p in os.listdir(outdir))

    # second run: the resource checksum is in the ledger -> skipped, no new pushes
    n_files = len(os.listdir(outdir))
    stats2 = load_entities_dataset(spark, index_uri, send, ledger_dir=ledger)
    assert stats2 == {"resources": 0, "entities": 0, "skipped_resources": 1}
    assert len(os.listdir(outdir)) == n_files


def test_load_entities_catalog_globs(spark, tmp_path):
    from ftm_datalake_spark.pipelines.sync import load_entities_catalog

    uri_a = _write_ftm_dataset(spark, str(tmp_path), "pub_a", 3)
    uri_b = _write_ftm_dataset(spark, str(tmp_path), "pub_b", 4)
    uri_c = _write_ftm_dataset(spark, str(tmp_path), "internal_c", 5)
    catalog = {
        "datasets": [
            {"name": "pub_a", "index_url": uri_a},
            {"name": "pub_b", "index_url": uri_b},
            {"name": "internal_c", "index_url": uri_c},
        ]
    }
    cat_path = str(tmp_path / "catalog.json")
    with open(cat_path, "w") as fh:
        json.dump(catalog, fh)
    outdir = str(tmp_path / "pushed_cat")
    os.makedirs(outdir)

    def send(batch: list[dict]) -> None:
        import uuid

        with open(os.path.join(outdir, f"{uuid.uuid4().hex}.json"), "w") as fh:
            json.dump(batch, fh)

    res = load_entities_catalog(
        spark, cat_path, send, include_dataset="pub_*", exclude_dataset="*_b"
    )
    assert [(r["dataset"], r["entities"]) for r in res] == [("pub_a", 3)]
