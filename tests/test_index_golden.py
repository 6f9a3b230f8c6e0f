"""Golden-compare the published index.json against the reference
fixture document (tests/fixtures/archive/test_dataset/.leakrfc/
index.json): same corpus in → same stats document out, field by field —
schemata facet names/counts WITH their FTM label/plural, entity_count,
total_file_size, things.total, coverage.frequency, content_type, and
name/prefix/title derivation."""

from __future__ import annotations

import json
import os

import pytest

FIXTURE_DIR = "/root/reference/tests/fixtures/archive/test_dataset/.leakrfc"


@pytest.fixture(scope="module")
def fixture_index() -> dict:
    path = os.path.join(FIXTURE_DIR, "index.json")
    if not os.path.exists(path):
        pytest.skip("reference fixture not available")
    with open(path) as fh:
        return json.load(fh)


def _load_fixture_lake(spark, tmp_path) -> str:
    """Build a lake whose test_dataset partition holds exactly the
    fixture corpus rows (read from the fixture's own documents.csv)."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.pipelines.ingest import write_documents

    docs = (
        spark.read.option("header", "true")
        .schema(
            "key string, content_hash string, size long, mimetype string, "
            "created_at timestamp, updated_at timestamp"
        )
        .csv(os.path.join(FIXTURE_DIR, "documents.csv"))
        .withColumn("dataset", F.lit("test_dataset"))
    )
    lake = str(tmp_path / "lake")
    write_documents(docs, lake)
    return lake


def test_index_json_golden_parity(spark, tmp_path, fixture_index):
    from ftm_datalake_spark.pipelines.ingest import make_index_stats

    lake = _load_fixture_lake(spark, tmp_path)
    got = make_index_stats(spark, lake, "test_dataset")

    # scalar stats: exact value parity with the published fixture
    assert got["name"] == fixture_index["name"] == "test_dataset"
    assert got["prefix"] == fixture_index["prefix"] == "test-dataset"
    assert got["title"] == fixture_index["title"] == "Test_Dataset"
    assert got["entity_count"] == fixture_index["entity_count"] == 75
    assert (
        got["total_file_size"]
        == fixture_index["total_file_size"]
        == 22385367
    )
    assert got["things"]["total"] == fixture_index["things"]["total"] == 75
    assert (
        got["coverage"]["frequency"]
        == fixture_index["coverage"]["frequency"]
        == "unknown"
    )
    assert got["content_type"] == fixture_index["content_type"] == "structured"

    # facet parity incl. the FTM display metadata, order-insensitive
    # (the reference's Collector export order is collection order)
    def facet_key(s):
        return s["name"]

    got_facets = sorted(got["things"]["schemata"], key=facet_key)
    ref_facets = sorted(fixture_index["things"]["schemata"], key=facet_key)
    assert got_facets == ref_facets

    # archive block: same keys as the fixture's (modulo the metadata
    # prefix naming, which tracks the reference's own rename from
    # .leakrfc to .ftm_datalake); checksum algorithm matches
    ref_arch = fixture_index["leakrfc"]
    assert (
        got["ftm_datalake"]["checksum_algorithm"]
        == ref_arch["checksum_algorithm"]
        == "sha1"
    )

    # full key-set parity: every fixture top-level key has a counterpart
    # (updated_at is config/make-time in the reference — presence only)
    mapped = dict(got)
    mapped["leakrfc"] = mapped.pop("ftm_datalake")
    assert set(fixture_index) <= set(mapped)
    assert got["updated_at"]  # present, ISO-rendered


def test_publish_writes_golden_shape(spark, tmp_path, fixture_index):
    """The publish fan-in writes the same document shape per dataset."""
    from ftm_datalake_spark.pipelines.ingest import make_index_stats, publish

    lake = _load_fixture_lake(spark, tmp_path)
    out = publish(spark, lake)
    assert out["datasets"] == 1
    with open(os.path.join(lake, "test_dataset", "index.json")) as fh:
        published = json.load(fh)

    direct = make_index_stats(spark, lake, "test_dataset")
    for key in (
        "name",
        "prefix",
        "title",
        "entity_count",
        "content_type",
        "total_file_size",
    ):
        assert published[key] == direct[key]
    assert (
        sorted(published["things"]["schemata"], key=lambda s: s["name"])
        == sorted(direct["things"]["schemata"], key=lambda s: s["name"])
    )
    assert published["file_count"] == 75
    assert published["coverage"]["start"] and published["coverage"]["end"]
