"""S2 remote-store backend: crawl an S3 object store (SURVEY §2.1).

The reference exercises its crawl against a mocked S3
(/root/reference/tests/conftest.py:83-171, moto + fsspec patches); its
storage layer treats S3 as one more fsspec scheme. Spark-side, the
bundled Hadoop has no hadoop-aws jar in this container, so — exactly
like the HTTP backend (sources/http_store.py) — the S3 store is built
from the two primitives the object store actually offers:

- LISTING: driver-side, metadata-only — paginated ListObjectsV2 under
  a prefix, yielding relative keys. No blob bytes flow here; a 100 TB
  bucket lists in O(objects/1000) small responses (or is replaced by
  an S3 Inventory manifest passed as ``keys``).
- FETCH: task-side — keys are parallelized and each task GETs its own
  objects through an Arrow-batched mapInPandas with ONE boto3 client
  per task, so blob bytes go store → executor, never through the
  driver. Output is binaryFile-shaped (path, modificationTime, length,
  content), so the downstream crawl pipeline (checksum → projection →
  merge) is IDENTICAL to the local-FS and HTTP paths.

When a hadoop-aws jar IS on the classpath, plain ``spark.read`` over
``s3a://`` remains the right tool for bulk TABLE scans; this backend
covers the CRAWL path, which needs object-level control (skip-existing
anti-join, include/exclude pruning BEFORE any GET) that a bulk
binaryFile scan does not give.

boto3 is optional: functions raise ImportError with guidance when it
is absent (the engine core never imports it at module load).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import DataFrame, SparkSession


def _require_boto3():
    try:
        import boto3  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without boto3
        raise ImportError(
            "the S3 store backend needs boto3 (pip install boto3); "
            "for Spark-native s3a:// table scans add hadoop-aws instead"
        ) from exc


def _client(conn: dict):
    """One boto3 S3 client from a plain-dict config. The dict (not a
    client object) is what crosses the driver→task boundary — boto3
    clients don't pickle, and one client per task amortizes the TLS
    handshake over that task's whole key batch."""
    import boto3

    return boto3.client(
        "s3",
        endpoint_url=conn.get("endpoint_url"),
        region_name=conn.get("region_name", "us-east-1"),
        aws_access_key_id=conn.get("access_key"),
        aws_secret_access_key=conn.get("secret_key"),
    )


def list_s3_objects(bucket: str, prefix: str = "", conn: dict | None = None) -> list[str]:
    """Sorted relative keys under ``prefix`` — driver-side metadata
    traversal via paginated ListObjectsV2 (the reference's fsspec
    ls; an S3 Inventory manifest is the drop-in replacement at the
    scale where even listing is a job)."""
    _require_boto3()
    conn = conn or {}
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    client = _client(conn)
    keys: list[str] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=full):
        for obj in page.get("Contents", []):
            key = obj["Key"]
            if key.endswith("/"):  # zero-byte "directory" markers
                continue
            keys.append(key[len(full):])
    return sorted(keys)


def scan_s3_store(
    spark: SparkSession,
    bucket: str,
    keys: list[str] | None = None,
    prefix: str = "",
    num_partitions: int | None = None,
    conn: dict | None = None,
) -> DataFrame:
    """binaryFile-shaped scan of an S3 store: (path, modificationTime,
    length, content). ``keys`` defaults to a ListObjectsV2 walk.
    Fetches run task-side, Arrow-batched, one client per task; the
    object's LastModified becomes modificationTime.

    Path-column convention matches the HTTP store: ``path`` is the
    LOGICAL store path ``s3://bucket/[prefix/]key`` so ``path_to_key``
    strips the base prefix and round-trips to the exact table key."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    _require_boto3()
    conn = dict(conn or {})
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    base = f"s3://{bucket}/{full}"
    if keys is None:
        keys = list_s3_objects(bucket, prefix, conn)
    p = num_partitions or spark.sparkContext.defaultParallelism
    meta = spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).repartition(min(p, max(1, len(keys))), "key")

    out_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def fetch(batches):
        client = _client(conn)  # one per task, reused across batches
        for pdf in batches:
            paths, mtimes, lengths, contents = [], [], [], []
            for key in pdf["key"]:
                res = client.get_object(Bucket=bucket, Key=full + key)
                body = res["Body"].read()
                paths.append(base + key)
                mtimes.append(res["LastModified"])
                lengths.append(len(body))
                contents.append(body)
            yield pd.DataFrame(
                {
                    "path": paths,
                    "modificationTime": mtimes,
                    "length": lengths,
                    "content": contents,
                }
            )

    return meta.mapInPandas(fetch, out_schema)


def _glob_prune(keys: list[str], include: str | None, exclude: str | None) -> list[str]:
    if include:
        keys = [k for k in keys if re.match(r"\A" + fnmatch.translate(include), k)]
    if exclude:
        keys = [
            k for k in keys if not re.match(r"\A" + fnmatch.translate(exclude), k)
        ]
    return keys


def crawl_scan_s3(
    spark: SparkSession,
    bucket: str,
    dataset: str,
    keys: list[str] | None = None,
    prefix: str = "",
    include: str | None = None,
    exclude: str | None = None,
    conn: dict | None = None,
) -> DataFrame:
    """The crawl_scan twin for S3 sources: same DOCUMENTS_SCHEMA rows,
    same glob semantics as the local/HTTP paths; include/exclude prune
    the KEY LIST before any fetch — excluded blobs are never downloaded
    (reference skips before fetching, ftm_datalake/crawl.py:58-71)."""
    from ftm_datalake_spark.pipelines.ingest import _document_rows

    conn = conn or {}
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    if keys is None:
        keys = list_s3_objects(bucket, prefix, conn)
    keys = _glob_prune(keys, include, exclude)
    files = scan_s3_store(spark, bucket, keys, prefix, conn=conn)
    return _document_rows(files, f"s3://{bucket}/{full}", dataset)


def crawl_s3(
    spark: SparkSession,
    bucket: str,
    dataset: str,
    lake_dir: str,
    prefix: str = "",
    include: str | None = None,
    exclude: str | None = None,
    conn: dict | None = None,
) -> dict:
    """Full crawl of an S3 store into the lake: list → skip-existing
    anti-join → fetch only the delta → merge → write. Identical
    incremental contract to crawl_http (the reference's key-existence
    skip, ftm_datalake/crawl.py:67-71): a key already in the documents
    table is never re-fetched — a re-crawl of an unchanged bucket GETs
    ZERO objects. Returns the crawl counters."""
    from ftm_datalake_spark.operators.documents import merge_documents
    from ftm_datalake_spark.pipelines.ingest import (
        read_documents,
        write_documents,
    )

    conn = conn or {}
    keys = _glob_prune(list_s3_objects(bucket, prefix, conn), include, exclude)
    n_total = len(keys)
    current = read_documents(spark, lake_dir, dataset)
    listing_df = spark.createDataFrame([(k,) for k in keys] or [], "key string")
    new_keys = sorted(
        r["key"]
        for r in listing_df.join(
            current.select("key"), "key", "left_anti"
        ).collect()
    )
    if new_keys:
        rows = crawl_scan_s3(
            spark, bucket, dataset, keys=new_keys, prefix=prefix, conn=conn
        )
        merged = merge_documents(current, rows)
        write_documents(merged, lake_dir)
    return {"files_total": n_total, "added_or_updated": len(new_keys)}


def read_s3_range(
    bucket: str, key: str, start: int, length: int, conn: dict | None = None
) -> bytes:
    """Ranged object read (bytes [start, start+length)) — S3's native
    Range GET; the twin of http_store.read_http_range for streaming a
    slice of a large blob without fetching the object."""
    _require_boto3()
    client = _client(conn or {})
    res = client.get_object(
        Bucket=bucket, Key=key, Range=f"bytes={start}-{start + length - 1}"
    )
    return res["Body"].read()
