"""Non-file:// Hadoop filesystem scheme exercised OFFLINE (S3 waiver
hardening, VERDICT r5 item 7): the scan/crawl paths claim to be
URI-agnostic ("any Hadoop-FS URI works — only jars and credentials
differ for s3a"). This test makes that claim executable without
network: ViewFileSystem (``viewfs://``) ships in hadoop-common, so a
mount table backed by local files gives a genuinely different scheme —
different FileSystem class, different URI authority/resolution path —
through the same `spark.read` entry points the S3A connector uses.
Plus a jar-presence check that keeps the s3a waiver honest: if
hadoop-aws ever appears in the bundled jars, the waiver text must be
revisited."""

from __future__ import annotations

import glob
import os

import pytest


@pytest.fixture()
def viewfs(spark, tmp_path):
    """Mount tmp_path under viewfs://<unique>/data via a mount-table
    entry on the live Hadoop configuration. The mount-table name is
    unique per test because Hadoop caches FileSystem instances by
    (scheme, authority) — reusing an authority would resolve through
    the previous test's mount."""
    import uuid

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./data"
    hconf.set(key, tmp_path.as_uri())
    yield f"viewfs://{name}/data"
    hconf.unset(key)


def test_scan_binary_files_over_viewfs(spark, tmp_path, viewfs):
    from ftm_datalake_spark.sources.tables import scan_binary_files

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_bytes(b"alpha")
    (tmp_path / "sub" / "b.txt").write_bytes(b"bravo!")

    rows = scan_binary_files(spark, viewfs).select("path", "length").collect()
    got = {os.path.basename(r["path"]): r["length"] for r in rows}
    assert got == {"a.txt": 5, "b.txt": 6}
    # paths come back in the viewfs scheme — the engine never assumed file://
    assert all(r["path"].startswith("viewfs://graft-") for r in rows)


def test_crawl_listing_over_viewfs(spark, tmp_path, viewfs):
    """The crawl listing (metadata-only scan + key derivation) works
    unchanged on a non-file scheme: keys derive from the URI with the
    source prefix stripped, exactly as they would under s3a://."""
    from ftm_datalake_spark.pipelines.ingest import crawl_listing

    (tmp_path / "x").mkdir()
    (tmp_path / "x" / "doc.pdf").write_bytes(b"%PDF")
    (tmp_path / "root.txt").write_bytes(b"r")

    listing = crawl_listing(spark, viewfs)
    keys = sorted(r["key"] for r in listing.select("key").collect())
    assert keys == ["root.txt", "x/doc.pdf"]


def test_parquet_roundtrip_over_viewfs(spark, tmp_path, viewfs):
    """The managed-table write/read path is scheme-agnostic too."""
    df = spark.range(100).withColumnRenamed("id", "v")
    df.write.mode("overwrite").parquet(f"{viewfs}/tbl")
    back = spark.read.parquet(f"{viewfs}/tbl")
    assert back.count() == 100
    assert os.path.isdir(tmp_path / "tbl")  # physically landed at the mount


def test_s3a_waiver_jar_presence_is_current():
    """COVERAGE.md's s3a waiver states the bundled Spark ships no
    hadoop-aws jars. Verify that claim against the actual jars dir so
    the waiver can never silently rot."""
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    aws_jars = glob.glob(os.path.join(jars_dir, "*hadoop-aws*")) + glob.glob(
        os.path.join(jars_dir, "*aws-sdk*")
    )
    assert aws_jars == [], (
        "hadoop-aws jars are now bundled - update COVERAGE.md's s3a "
        f"waiver and add a live s3a test: {aws_jars}"
    )
