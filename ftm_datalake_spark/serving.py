"""Point-lookup serving surface (SURVEY §2.9 Q1-Q3).

The reference serves GET /{dataset}/{key} by reading one info.json and
streaming the blob (ftm_datalake/api/main.py:77-94, api/util.py:19-77).
Engine-side, serving parity means: keep the documents table fresh and
answer point lookups from it. A real deployment would front this with
FastAPI + a cached collected dict or an external KV projection; the JWT
auth layer (reference api/auth.py:43-68) is implemented as the pure-Python
helper ``ftm_datalake_spark.auth`` (Q3: token-scoped lookup, expiry,
404-hiding).

The lookup predicate hits the `dataset` partition column first, so the
scan prunes to one partition before the key filter."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_file(documents: DataFrame, dataset: str, key: str) -> dict | None:
    """Q1: metadata for one (dataset, key); None if absent (404 semantics)."""
    rows = (
        documents.where((F.col("dataset") == dataset) & (F.col("key") == key))
        .limit(1)
        .collect()
    )
    return rows[0].asDict() if rows else None


def file_headers(info: dict) -> dict[str, str]:
    """Q1: HTTP header projection of a metadata row
    (reference: api/util.py:19-31)."""
    headers = {
        "X-Dataset": str(info.get("dataset")),
        "X-Key": str(info.get("key")),
        "X-Checksum": str(info.get("content_hash")),
        "Content-Type": str(info.get("mimetype") or "application/octet-stream"),
        "Content-Length": str(info.get("size")),
    }
    if info.get("updated_at") is not None:
        headers["Last-Modified"] = str(info["updated_at"])
    return headers


def blob_shard_uri(archive_root: str, dataset: str, content_hash: str) -> str:
    """Q2: where the blob bytes live in the content-addressed layout
    (ab/cd/ef/<hash>; reference: ftm_datalake/util.py:8-11). The serving
    layer streams straight from the object store — never through Spark."""
    shard = f"{content_hash[0:2]}/{content_hash[2:4]}/{content_hash[4:6]}/{content_hash}"
    return f"{archive_root.rstrip('/')}/{dataset}/archive/{shard}"
