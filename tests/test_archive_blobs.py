"""S7/S9/S10 tests: blob archiving into the sharded layout, point
read-back, config.yml, FTM JSONL read-back, sorted statements export."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def test_archive_blobs_roundtrip(spark, tmp_path):
    from ftm_datalake_spark.sources.archive import archive_blobs, open_blob
    from ftm_datalake_spark.sources.tables import scan_binary_files
    from ftm_datalake_spark.functions.checksum import content_checksum

    src = str(tmp_path / "src")
    os.makedirs(src)
    payloads = {"one.bin": b"payload one", "two.bin": b"payload two!"}
    for name, content in payloads.items():
        open(os.path.join(src, name), "wb").write(content)

    files = scan_binary_files(spark, src).select(
        "path", content_checksum(F.col("content")).alias("content_hash")
    )
    root = str(tmp_path / "lake")
    archive_blobs(files, root, "ds1")
    # idempotent second run
    archive_blobs(files, root, "ds1")

    for content in payloads.values():
        ch = hashlib.sha1(content).hexdigest()
        expect_path = os.path.join(
            root, "ds1", "archive", ch[0:2], ch[2:4], ch[4:6], ch
        )
        assert os.path.isfile(expect_path)
        assert open_blob(root, "ds1", ch) == content


def test_dataset_config_yaml(tmp_path):
    from ftm_datalake_spark.sources.archive import read_dataset_config

    cfg = tmp_path / "config.yml"
    cfg.write_text("name: test_dataset\ntitle: Test\ncoverage:\n  frequency: weekly\n")
    data = read_dataset_config(str(cfg))
    assert data["name"] == "test_dataset"
    assert data["coverage"]["frequency"] == "weekly"


def test_entities_jsonl_read_back(spark, tmp_path):
    """S6: scan entities.ftm.json back into ENTITY_SCHEMA rows."""
    from ftm_datalake_spark.operators.statements import aggregate_statements
    from ftm_datalake_spark.schemas import ENTITY_SCHEMA, STATEMENT_SCHEMA
    from ftm_datalake_spark.sources.sinks import write_entities_jsonl

    stmts = spark.createDataFrame(
        [
            ("s1", "e1", "e1", "Person", "name", "Alice", "ds1", "ingest", None, None),
            ("s2", "e1", "e1", "Person", "name", "Bob", "ds2", "ingest", None, None),
        ],
        STATEMENT_SCHEMA,
    )
    target = write_entities_jsonl(aggregate_statements(stmts), str(tmp_path))
    from pyspark.sql import types as T

    read_schema = ENTITY_SCHEMA.add("datasets", T.ArrayType(T.StringType()))
    back = spark.read.schema(read_schema).json(target)
    row = back.first()
    assert row["id"] == "e1"
    assert row["properties"]["name"] == ["Alice", "Bob"]
    assert row["datasets"] == ["ds1", "ds2"]


def test_sorted_statements_export(spark):
    """O3: globally sorted statements without a single-task funnel."""
    from ftm_datalake_spark.operators.statements import sorted_statements
    from ftm_datalake_spark.schemas import STATEMENT_SCHEMA

    rows = [
        (f"s{i}", f"e{i % 7}", f"e{i % 7}", "Person", f"p{i % 3}", f"v{i}", "ds1",
         "ingest", None, None)
        for i in range(100)
    ]
    stmts = spark.createDataFrame(rows, STATEMENT_SCHEMA)
    out = sorted_statements(stmts)
    # partition-level sort: concatenating partitions in order yields the
    # global order (repartitionByRange guarantees non-overlapping ranges)
    collected = [
        (r["canonical_id"], r["prop"], r["value"])
        for part in out.rdd.glom().collect()
        for r in part
    ]
    assert collected == sorted(collected)
