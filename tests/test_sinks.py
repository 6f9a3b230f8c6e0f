"""Spec-layout sink tests: documents.csv roundtrip, index.json, entities
JSONL, zip export/import (SURVEY §2.1 S8, S11-S14)."""

from __future__ import annotations

import json
import os
import zipfile

from pyspark.sql import functions as F


def _documents(spark):
    rows = [
        ("b.txt", "h2", 20, "text/plain", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
        ("a.txt", "h1", 10, "text/plain", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "key string, content_hash string, size long, mimetype string, created_at string, updated_at string"
    )
    return df.withColumn("created_at", F.to_timestamp("created_at")).withColumn(
        "updated_at", F.to_timestamp("updated_at")
    )


def test_documents_csv_roundtrip(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import write_documents_csv
    from ftm_datalake_spark.sources.tables import read_documents_csv

    out = str(tmp_path / "ds")
    target = write_documents_csv(_documents(spark), out)
    assert os.path.basename(target) == "documents.csv"
    with open(target) as fh:
        header = fh.readline().strip()
    assert header == "key,content_hash,size,mimetype,created_at,updated_at"
    # snapshot written alongside
    snaps = [p for p in os.listdir(out) if p.startswith("documents.csv.")]
    assert len(snaps) == 1
    # roundtrip through the S3 csv scan
    back = read_documents_csv(spark, target)
    assert [r["key"] for r in back.orderBy("key").collect()] == ["a.txt", "b.txt"]
    assert back.where(F.col("size").isNull()).count() == 0


def test_index_json(tmp_path):
    from ftm_datalake_spark.sources.sinks import write_index_json

    target = write_index_json(
        {"name": "ds1", "entity_count": 75, "total_file_size": 22385367, "nothing": None},
        str(tmp_path),
    )
    data = json.loads(open(target).read())
    assert data == {"name": "ds1", "entity_count": 75, "total_file_size": 22385367}


def test_entities_jsonl(spark, tmp_path):
    from ftm_datalake_spark.operators.statements import aggregate_statements
    from ftm_datalake_spark.schemas import STATEMENT_SCHEMA
    from ftm_datalake_spark.sources.sinks import write_entities_jsonl

    stmts = spark.createDataFrame(
        [
            ("s1", "e1", "e1", "Person", "name", "Alice", "ds1", "ingest", None, None),
            ("s2", "e2", "e2", "Company", "name", "ACME", "ds1", "ingest", None, None),
        ],
        STATEMENT_SCHEMA,
    )
    target = write_entities_jsonl(aggregate_statements(stmts), str(tmp_path))
    lines = [json.loads(line) for line in open(target)]
    assert [x["id"] for x in lines] == ["e1", "e2"]
    assert lines[0]["properties"]["name"] == ["Alice"]


def test_documents_diff_text(spark, tmp_path):
    # byte-format details are covered in tests/test_unified_diff.py; this
    # is the sink-level smoke: -/+ lines for the changed keys, with the
    # reference's unified-diff headers and hunk markers present.
    from ftm_datalake_spark.sources.sinks import write_documents_diff

    old = _documents(spark)
    new = _documents(spark).withColumn(
        "content_hash",
        F.when(F.col("key") == "b.txt", F.lit("h2x")).otherwise(
            F.col("content_hash")
        ),
    )
    target = write_documents_diff(
        old, new, str(tmp_path / "documents.csv.diff"), "", "2024-02-01T00:00:00"
    )
    text = open(target).read()
    # reference writer quirk: header elements carry difflib's own
    # lineterm PLUS the writer's "+ '\n'" — a blank line after each
    assert text.startswith("--- \n\n+++ \t2024-02-01T00:00:00\n\n")
    assert "@@ " in text
    assert "-b.txt,h2," in text and "+b.txt,h2x," in text
    assert "a.txt,h1" not in text  # unchanged rows never appear (n=0)


def test_zip_export_roundtrip(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import (
        export_dataset_zip,
        read_zip_store,
        write_documents_csv,
    )

    ds_dir = str(tmp_path / "ds")
    write_documents_csv(_documents(spark), ds_dir, snapshot=False)
    zip_path = str(tmp_path / "ds.ftm_datalake.zip")
    export_dataset_zip(ds_dir, zip_path)
    assert zipfile.ZipFile(zip_path).namelist() == ["documents.csv"]

    staged = read_zip_store(spark, zip_path, str(tmp_path / "staging"))
    assert staged.count() == 1
    assert staged.first()["path"].endswith("documents.csv")
    # Parity with the reference exporter (export.py:17): members are LZMA
    # and read back byte-exact through the stdlib decompressor.
    with zipfile.ZipFile(zip_path) as zf:
        info = zf.infolist()[0]
        assert info.compress_type == zipfile.ZIP_LZMA
        member = zf.read(info)
    with open(str(tmp_path / "ds" / "documents.csv"), "rb") as fh:
        assert member == fh.read()


def test_zip_store_distributed_duplicate_names(spark, tmp_path):
    """Duplicate entry names are legal in zip; the distributed reader must
    return each member's OWN bytes (index-based access), not the first
    member's bytes repeated."""
    from ftm_datalake_spark.sources.sinks import read_zip_store_distributed

    zip_path = str(tmp_path / "dup.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("same/name.bin", b"first-payload")
        zf.writestr("same/name.bin", b"second-payload-longer")
        zf.writestr("other.bin", b"other")

    rows = read_zip_store_distributed(spark, zip_path, num_partitions=4).collect()
    assert len(rows) == 3
    dup_contents = sorted(
        bytes(r["content"])
        for r in rows
        if r["path"].endswith("same/name.bin")
    )
    assert dup_contents == [b"first-payload", b"second-payload-longer"]
    for r in rows:
        assert r["length"] == len(bytes(r["content"]))


def test_zip_store_distributed_read(spark, tmp_path):
    """Entry-parallel zip read: driver touches only the central directory;
    every member's bytes and metadata match a direct zipfile read."""
    import hashlib

    from ftm_datalake_spark.sources.sinks import read_zip_store_distributed

    zip_path = str(tmp_path / "blobs.zip")
    blobs = {f"blob/{i:03d}.bin": bytes([i]) * (100 + i) for i in range(40)}
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in blobs.items():
            zf.writestr(name, content)

    df = read_zip_store_distributed(spark, zip_path, num_partitions=8)
    assert df.schema.simpleString() == (
        "struct<path:string,modificationTime:timestamp,length:bigint,content:binary>"
    )
    rows = df.collect()
    assert len(rows) == 40
    got = {r["path"].split("!/")[1]: bytes(r["content"]) for r in rows}
    assert got == blobs
    for r in rows:
        assert r["length"] == len(blobs[r["path"].split("!/")[1]])
        assert hashlib.sha1(bytes(r["content"])).hexdigest() == hashlib.sha1(
            blobs[r["path"].split("!/")[1]]
        ).hexdigest()
    # the extraction really is distributed over >1 partition
    assert df.rdd.getNumPartitions() == 8


def test_compact_table_bounds_files_and_rows(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import compact_table

    df = spark.range(10_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "compacted")
    n_files = compact_table(df, out, max_records_per_file=2_000, partitions=2)
    # 2 partitions x 5 row-capped splits each = <= 10, >= ceil(10000/2000)
    assert 5 <= n_files <= 10
    assert spark.read.parquet(out).count() == 10_000
    import pyarrow.parquet as pq
    import glob as g
    for f in g.glob(out + "/part-*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 2_000


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema drift across parquet files: mergeSchema reconciles old
    (no `lang`) and new (with `lang`) files into one frame with nulls
    for the missing column — the lakehouse schema-evolution read path."""
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "evolving")
    old.write.mode("append").parquet(path)
    new.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"


# ---------------------------------------------------------------- webdataset


def test_webdataset_shards_roundtrip_and_determinism(spark, tmp_path):
    """Shards are exactly shard_size (except the tail), members roundtrip,
    and the tar bytes are identical under any input partitioning."""
    import json as _json
    import tarfile

    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    docs = spark.createDataFrame(
        [(i, f"text of doc {i}") for i in range(117)], "doc_id LONG, text STRING"
    )

    out1 = str(tmp_path / "wds1")
    m1 = write_webdataset_shards(docs.repartition(7), out1, shard_size=50)
    assert [m["n_samples"] for m in m1] == [50, 50, 17]
    assert [m["shard_id"] for m in m1] == [0, 1, 2]

    # roundtrip: every key present once, contents match, member order sorted
    seen = {}
    for m in m1:
        with tarfile.open(m["path"]) as tar:
            names = tar.getnames()
            assert names == sorted(names)
            for name in names:
                data = tar.extractfile(name).read().decode()
                key = int(name.split(".")[0])
                seen[key] = data
    assert seen == {i: f"text of doc {i}" for i in range(117)}

    # manifest on disk matches the return value
    disk = _json.load(open(f"{out1}/manifest.json"))
    assert disk == m1

    # partitioning-independence: different upstream partitioning, same bytes
    out2 = str(tmp_path / "wds2")
    m2 = write_webdataset_shards(docs.repartition(3), out2, shard_size=50)
    assert [m["sha256"] for m in m2] == [m["sha256"] for m in m1]


def test_webdataset_binary_members(spark, tmp_path):
    import tarfile

    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    docs = spark.createDataFrame(
        [(i, f"t{i}", bytearray(bytes([i % 256]) * 4)) for i in range(5)],
        "doc_id LONG, text STRING, payload BINARY",
    )
    out = str(tmp_path / "wds")
    m = write_webdataset_shards(docs, out, shard_size=10, binary_col="payload")
    assert [x["n_samples"] for x in m] == [5]
    with tarfile.open(m[0]["path"]) as tar:
        assert tar.extractfile("000000003.bin").read() == bytes([3]) * 4
        assert tar.extractfile("000000003.txt").read() == b"t3"


def test_webdataset_read_back(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(23)], "doc_id LONG, text STRING"
    )
    out = str(tmp_path / "wds")
    write_webdataset_shards(docs, out, shard_size=10)
    back = read_webdataset_shards(spark, out)
    rows = back.where("member = 'txt'").collect()
    assert {r["key"]: bytes(r["content"]).decode() for r in rows} == {
        i: f"body {i}" for i in range(23)
    }
    # three shards contributed
    assert len({r["shard_path"] for r in rows}) == 3


def test_orc_roundtrip_partition_pruning(spark, tmp_path):
    """ORC write/read roundtrip with Hive-partitioned layout; an equality
    filter on the partition column must prune to one directory at plan
    time (PartitionFilters), and the data must survive bit-exact."""
    from ftm_datalake_spark.sources.sinks import read_table_orc, write_table_orc

    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation_orc")
    write_table_orc(nation, out, partition_by=["n_regionkey"])
    back = read_table_orc(spark, out)
    # roundtrip: same multiset of rows (partition col type survives)
    a = nation.select("n_nationkey", "n_name", "n_regionkey")
    b = back.select("n_nationkey", "n_name", F.col("n_regionkey").cast("long"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # pruning: only the matching region's directory is scanned
    pruned = back.where(F.col("n_regionkey") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "n_regionkey" in plan
    assert pruned.count() == nation.where("n_regionkey = 2").count()


def test_webdataset_accepts_single_slash_file_uri(spark, tmp_path):
    """Regression (r11 review): `file:/p` is as legal as `file:///p` —
    slicing a fixed `file://` prefix mangled the single-slash form into
    a relative garbage path."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.sources.sinks import write_webdataset_shards

    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), F.col("id")).alias("text"),
    )
    out = tmp_path / "wds_uri"
    m = write_webdataset_shards(docs, f"file:{out}", shard_size=10)
    assert len(m) == 1 and (out / "shard-000000.tar").is_file()
    assert (out / "manifest.json").is_file()
