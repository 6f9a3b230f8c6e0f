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


def _keys_df(
    spark: SparkSession,
    keys: "list[str] | DataFrame",
    num_partitions: int | None = None,
) -> DataFrame:
    """Normalize a key source to a single-column ``key`` DataFrame.
    Lists (bounded: a ListObjectsV2 walk) are parallelized; DataFrames
    (an S3 Inventory manifest — possibly 10⁸ rows) pass through without
    ever touching the driver."""
    if isinstance(keys, DataFrame):
        df = keys.select("key")
        return df.repartition(num_partitions, "key") if num_partitions else df
    p = num_partitions or spark.sparkContext.defaultParallelism
    return spark.createDataFrame(
        [(k,) for k in keys] or [], "key string"
    ).repartition(min(p, max(1, len(keys))), "key")


def scan_s3_store(
    spark: SparkSession,
    bucket: str,
    keys: "list[str] | DataFrame | None" = None,
    prefix: str = "",
    num_partitions: int | None = None,
    conn: dict | None = None,
    on_missing: str = "error",
) -> DataFrame:
    """binaryFile-shaped scan of an S3 store: (path, modificationTime,
    length, content). ``keys`` defaults to a ListObjectsV2 walk; a
    DataFrame of keys (S3 Inventory manifest — see
    :func:`read_s3_inventory`) stays distributed end to end. Fetches run
    task-side, Arrow-batched, one client per task; the object's
    LastModified becomes modificationTime.

    ``on_missing``: at 100 TB a listing is always stale — objects get
    deleted between list and fetch. ``"error"`` (default) fails the
    task loudly; ``"skip"`` drops the missing key from the output and
    the caller counts the shortfall — the reference's ``not_found``
    counter semantics (ftm_datalake/sync/memorious.py:29-33).

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

    if on_missing not in ("error", "skip"):
        raise ValueError(
            f"on_missing must be 'error' or 'skip', got {on_missing!r}"
        )
    _require_boto3()
    conn = dict(conn or {})
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    base = f"s3://{bucket}/{full}"
    if keys is None:
        keys = list_s3_objects(bucket, prefix, conn)
    meta = _keys_df(spark, keys, num_partitions)
    skip_missing = on_missing == "skip"

    out_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def fetch(batches):
        from botocore.exceptions import ClientError

        client = _client(conn)  # one per task, reused across batches
        for pdf in batches:
            paths, mtimes, lengths, contents = [], [], [], []
            for key in pdf["key"]:
                try:
                    res = client.get_object(Bucket=bucket, Key=full + key)
                except ClientError as exc:
                    code = exc.response.get("Error", {}).get("Code", "")
                    if skip_missing and code in ("NoSuchKey", "404"):
                        continue  # deleted between list and fetch
                    raise
                body = res["Body"].read()
                paths.append(base + key)
                mtimes.append(res["LastModified"])
                lengths.append(len(body))
                contents.append(body)
            # explicit dtypes: an all-skipped batch is EMPTY, and pandas
            # would otherwise infer float64 for the timestamp column,
            # which Arrow refuses to cast
            yield pd.DataFrame(
                {
                    "path": pd.Series(paths, dtype="object"),
                    "modificationTime": pd.to_datetime(
                        pd.Series(mtimes, dtype="object"), utc=True
                    ),
                    "length": pd.Series(lengths, dtype="int64"),
                    "content": pd.Series(contents, dtype="object"),
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


def _glob_prune_df(
    keys: DataFrame, include: str | None, exclude: str | None
) -> DataFrame:
    """The same fnmatch semantics as :func:`_glob_prune`, pushed into
    the plan (rlike on the anchored translated pattern) so a manifest's
    keys are pruned distributed, before any GET."""
    from pyspark.sql import functions as F

    if include:
        keys = keys.where(
            F.col("key").rlike(r"\A" + fnmatch.translate(include))
        )
    if exclude:
        keys = keys.where(
            ~F.col("key").rlike(r"\A" + fnmatch.translate(exclude))
        )
    return keys


def read_s3_inventory(
    spark: SparkSession,
    manifest_uri: str,
    fmt: str = "parquet",
    key_col: str = "key",
    prefix: str = "",
    url_encoded: bool = False,
) -> DataFrame:
    """S3 Inventory manifest → a distributed ``key`` DataFrame for
    :func:`scan_s3_store` / :func:`crawl_s3`.

    At 10⁸+ objects even ListObjectsV2 is the bottleneck (10⁵ sequential
    pages); S3 Inventory delivers the listing AS DATA — daily parquet/CSV
    files of (bucket, key, size, ...). This reader normalizes that to
    the crawl's relative-key contract: filter to ``prefix``, strip it,
    drop zero-byte directory markers. ``url_encoded=True`` decodes the
    CSV flavor's URL-encoded keys (the Inventory spec encodes them;
    parquet inventories store raw keys). Everything is plan-level —
    the keys never visit the driver."""
    from pyspark.sql import functions as F

    if fmt == "parquet":
        inv = spark.read.parquet(manifest_uri)
    elif fmt == "csv":
        inv = spark.read.option("header", True).csv(manifest_uri)
    else:
        raise ValueError(f"unsupported inventory format: {fmt!r}")
    keys = inv.select(F.col(key_col).cast("string").alias("key"))
    if url_encoded:
        keys = keys.select(F.url_decode("key").alias("key"))
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    if full:
        keys = keys.where(F.col("key").startswith(full)).select(
            F.expr(f"substring(key, {len(full) + 1})").alias("key")
        )
    return keys.where(~F.col("key").endswith("/"))


def crawl_scan_s3(
    spark: SparkSession,
    bucket: str,
    dataset: str,
    keys: "list[str] | DataFrame | None" = None,
    prefix: str = "",
    include: str | None = None,
    exclude: str | None = None,
    conn: dict | None = None,
) -> DataFrame:
    """The crawl_scan twin for S3 sources: same DOCUMENTS_SCHEMA rows,
    same glob semantics as the local/HTTP paths; include/exclude prune
    the KEY SOURCE before any fetch — excluded blobs are never
    downloaded (reference skips before fetching, crawl.py:58-71). A
    DataFrame key source (Inventory manifest) is pruned in-plan."""
    from ftm_datalake_spark.pipelines.ingest import _document_rows

    conn = conn or {}
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    if keys is None:
        keys = list_s3_objects(bucket, prefix, conn)
    if isinstance(keys, DataFrame):
        keys = _glob_prune_df(keys, include, exclude)
    else:
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
    keys: "DataFrame | list[str] | None" = None,
) -> dict:
    """Full crawl of an S3 store into the lake: list → skip-existing
    anti-join → fetch only the delta → merge → write. Identical
    incremental contract to crawl_http (the reference's key-existence
    skip, ftm_datalake/crawl.py:67-71): a key already in the documents
    table is never re-fetched — a re-crawl of an unchanged bucket GETs
    ZERO objects.

    ``keys`` overrides the driver-side ListObjectsV2 walk with a key
    source of any scale — pass :func:`read_s3_inventory`'s DataFrame to
    crawl from an S3 Inventory manifest. The new-key path is fully
    distributed (glob prune → anti-join → task-side GET); no key set is
    ever collected to the driver, so a 10⁸-object manifest crawls with
    driver memory O(1) (VERDICT r8 #2). Objects deleted between listing
    and fetch are skipped and counted (``not_found`` — the reference's
    memorious counter, sync/memorious.py:29-33).

    Returns the crawl counters: files_total (listed after pruning),
    added_or_updated (rows landed), not_found (listed but gone by
    fetch time)."""
    from ftm_datalake_spark.operators.documents import merge_documents
    from ftm_datalake_spark.pipelines.ingest import (
        _document_rows,
        read_documents,
        write_documents,
    )

    conn = dict(conn or {})
    prefix = prefix.strip("/")
    full = prefix + "/" if prefix else ""
    if keys is None:
        keys = list_s3_objects(bucket, prefix, conn)
    listing = _glob_prune_df(_keys_df(spark, keys), include, exclude)
    # pin: the listing feeds three jobs (total count, anti-join, fetch);
    # for the list flavor this is a re-parallelize, for the manifest
    # flavor one distributed materialization of the key column only
    listing = listing.localCheckpoint(eager=True)
    n_total = listing.count()
    current = read_documents(spark, lake_dir, dataset)
    n_before = current.count()
    new_keys = listing.join(
        current.select("key"), "key", "left_anti"
    ).localCheckpoint(eager=True)
    n_new = new_keys.count()
    n_after = n_before
    if n_new:
        files = scan_s3_store(
            spark,
            bucket,
            keys=new_keys,
            prefix=prefix,
            conn=conn,
            on_missing="skip",
        )
        rows = _document_rows(files, f"s3://{bucket}/{full}", dataset)
        merged = merge_documents(current, rows)
        write_documents(merged, lake_dir)
        n_after = read_documents(spark, lake_dir, dataset).count()
    return {
        "files_total": n_total,
        "added_or_updated": n_after - n_before,
        "not_found": n_new - (n_after - n_before),
    }


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
