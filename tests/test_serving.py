from __future__ import annotations


def test_lookup_and_headers(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents
    from ftm_datalake_spark.serving import blob_shard_uri, file_headers, lookup_file

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "doc.txt"), "wb") as fh:
        fh.write(b"serve me")
    crawl(spark, src, "ds1", lake)
    docs = read_documents(spark, lake, "ds1")

    info = lookup_file(docs, "ds1", "doc.txt")
    assert info is not None and info["size"] == 8
    headers = file_headers(info)
    assert headers["Content-Type"] == "text/plain"
    assert headers["Content-Length"] == "8"

    assert lookup_file(docs, "ds1", "nope.txt") is None  # 404 semantics

    uri = blob_shard_uri("s3://lake", "ds1", "abcdef012345")
    assert uri == "s3://lake/ds1/archive/ab/cd/ef/abcdef012345"


def _mini_docs(spark, n=200, datasets=("ds1", "ds2")):
    import datetime as dt

    from ftm_datalake_spark.schemas import DOCUMENTS_SCHEMA

    now = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (f"dir{i%7}/f{i:04d}.txt", f"hash{i:040d}"[:40], i, "text/plain",
         now, now, datasets[i % len(datasets)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def test_projection_lookup_prunes_to_one_partition(spark, tmp_path):
    """The O(1) serving projection: a point GET's scan carries
    PartitionFilters on BOTH partition columns (dataset, shard) — one
    directory read per GET, never a table scan."""
    from ftm_datalake_spark.serving import (
        build_lookup_projection,
        make_projection_lookup,
        projection_frame,
    )

    docs = _mini_docs(spark)
    proj = build_lookup_projection(docs, str(tmp_path / "proj"), num_shards=16)

    lookup = make_projection_lookup(spark, proj, num_shards=16)
    info = lookup("ds1", "dir0/f0000.txt")
    assert info is not None and info["size"] == 0 and "shard" not in info
    assert lookup("ds1", "no/such.txt") is None
    assert lookup("nope", "dir0/f0000.txt") is None

    plan = (
        projection_frame(spark, proj, "ds1", "dir0/f0000.txt", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition pruning on dataset AND shard reached the scan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "dataset" in pf[0] and "shard" in pf[0]
    # the key predicate is pushed into the parquet row groups
    assert "PushedFilters" in plan and "key" in plan.split("PushedFilters", 1)[1][:200]


def test_dict_snapshot_lookup_o1_and_guard(spark):
    """Small-lake path: one collect, then O(1) dict hits per GET — no
    Spark job on the request path (latency smoke: 1000 GETs < 100ms)."""
    import time

    import pytest as _pytest

    from ftm_datalake_spark.serving import make_dict_snapshot_lookup

    docs = _mini_docs(spark)
    lookup = make_dict_snapshot_lookup(docs)
    assert lookup("ds1", "dir0/f0000.txt")["size"] == 0
    assert lookup("ds1", "missing.txt") is None

    t0 = time.perf_counter()
    for i in range(1000):
        lookup("ds1", f"dir{i%7}/f{i%200:04d}.txt")
    assert time.perf_counter() - t0 < 0.1  # no per-GET Spark job

    with _pytest.raises(ValueError, match="max_rows"):
        make_dict_snapshot_lookup(docs, max_rows=10)


def test_api_serves_from_projection(spark, tmp_path):
    """DatalakeApi's pluggable lookup accepts the projection-backed
    callable — GET path end-to-end on the pruned scan."""
    from ftm_datalake_spark.api import DatalakeApi
    from ftm_datalake_spark.serving import (
        build_lookup_projection,
        make_projection_lookup,
    )

    docs = _mini_docs(spark, n=20)
    proj = build_lookup_projection(docs, str(tmp_path / "proj"), num_shards=4)
    lookup = make_projection_lookup(spark, proj, num_shards=4)

    api = DatalakeApi(lookup, lambda info: b"", secret=None)
    info = api.lookup("ds1", "dir0/f0000.txt")
    assert info is not None and info["key"] == "dir0/f0000.txt"
