"""S2 remote-store backend: crawl an HTTP store (SURVEY §2.1).

The reference's storage layer is fsspec-backed and its tests exercise a
live local HTTP range server (reference tests/conftest.py:60-80). Spark
has no Hadoop filesystem for http://, so the backend is built from the
two primitives an HTTP store actually offers:

- LISTING: driver-side, metadata-only — either a caller-supplied key
  list (manifest/inventory, the common object-store case) or a
  recursive walk of an autoindex page (``python -m http.server``
  style), yielding relative keys. Listing is metadata scale by
  definition — bytes never flow here.
- FETCH: task-side — keys are parallelized and each task GETs its own
  keys through an Arrow-batched mapInPandas, so blob bytes go straight
  from the HTTP store to executors, never through the driver. Output is
  binaryFile-shaped (path, modificationTime, length, content), so the
  whole downstream crawl pipeline (checksum → projection → merge) is
  IDENTICAL to the local-FS path — proven by the http-vs-local crawl
  parity test (tests/test_http_store.py).

Ranged reads (``read_http_range``) cover the reference's range-server
contract for streaming single blobs without full downloads."""

from __future__ import annotations

import datetime as dt
import posixpath
import re
from email.utils import parsedate_to_datetime
from html.parser import HTMLParser
from urllib.parse import quote, unquote, urljoin
from urllib.request import Request, urlopen

from pyspark.sql import DataFrame, SparkSession


class _HrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value:
                    self.hrefs.append(value)


def _safe_key(key: str) -> bool:
    """Reject autoindex-derived keys that could escape the base prefix:
    a crafted page can serve hrefs like ``a/../../x`` (which pass a
    naive leading-``../`` check) that the server then resolves OUTSIDE
    the store root. A key is safe iff posixpath.normpath is the
    identity (no ``..``/``.`` segments, no ``//``, no trailing
    artifacts) and it stays relative."""
    if not key or key.startswith("/"):
        return False
    norm = posixpath.normpath(key)
    # Reject '.' segments explicitly: normpath('.') == '.' is the
    # identity, so a bare './' href would otherwise re-queue the same
    # directory under a new prefix string (one wasted GET per page).
    return norm == key and not any(
        seg in ("..", ".") for seg in key.split("/")
    )


def list_http_autoindex(base_url: str, timeout: float = 30.0) -> list[str]:
    """Recursively walk an HTML autoindex (http.server / nginx style)
    and return sorted relative keys. Driver-side metadata traversal —
    one small HTML page per directory, no blob bytes. Candidate keys
    are normalized: any href whose resolved path contains ``..``/``.``
    segments or collapses under posixpath.normpath is discarded, so a
    hostile autoindex page cannot yield keys that escape the base
    prefix when the server resolves the GET."""
    base_url = base_url.rstrip("/") + "/"
    keys: list[str] = []
    stack = [""]
    seen = set()
    while stack:
        prefix = stack.pop()
        if prefix in seen:
            continue
        seen.add(prefix)
        with urlopen(base_url + quote(prefix), timeout=timeout) as res:
            html = res.read().decode(res.headers.get_content_charset() or "utf-8")
        parser = _HrefParser()
        parser.feed(html)
        for href in parser.hrefs:
            if href.startswith(("?", "#")) or "://" in href:
                continue
            rel = unquote(href)
            if rel.startswith("/"):  # absolute within server: keep subtree only
                continue
            if rel.endswith("/"):
                if _safe_key(prefix + rel.rstrip("/")):
                    stack.append(prefix + rel)
            elif _safe_key(prefix + rel):
                keys.append(prefix + rel)
    return sorted(keys)


def _http_date(value: str | None) -> dt.datetime | None:
    if not value:
        return None
    try:
        return parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return None


def read_http_range(
    url: str, start: int, length: int, timeout: float = 30.0
) -> bytes:
    """Ranged blob read (bytes [start, start+length)) — the reference's
    range-server contract (tests/conftest.py:60-80): stream a slice
    without fetching the object."""
    req = Request(url, headers={"Range": f"bytes={start}-{start + length - 1}"})
    with urlopen(req, timeout=timeout) as res:
        if res.status not in (200, 206):
            raise OSError(f"range request failed: {res.status}")
        body = res.read()
    if res.status == 200:  # server ignored Range: slice locally
        return body[start : start + length]
    return body


def scan_http_store(
    spark: SparkSession,
    base_url: str,
    keys: "list[str] | DataFrame | None" = None,
    num_partitions: int | None = None,
    timeout: float = 60.0,
    on_missing: str = "error",
) -> DataFrame:
    """binaryFile-shaped scan of an HTTP store: (path, modificationTime,
    length, content). ``keys`` defaults to an autoindex walk; a
    DataFrame of keys stays distributed end to end. Fetches run
    task-side, Arrow-batched; Last-Modified becomes modificationTime
    (fetch time when the server sends none). ``on_missing="skip"``
    drops keys the server answers 404/410 for — listings are stale at
    scale; the caller counts the shortfall (the reference's not_found
    counter, ftm_datalake/sync/memorious.py:29-33).

    Path-column convention: ``path`` is the LOGICAL store path —
    ``base + raw_key`` (unquoted) — chosen so ``path_to_key`` strips the
    base prefix and round-trips to the exact table key. The wire URL is
    ``base + quote(key)``; the two differ only by percent-encoding and
    the raw-key form is the single convention recorded everywhere."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from pyspark.sql import DataFrame as _DF

    if on_missing not in ("error", "skip"):
        raise ValueError(
            f"on_missing must be 'error' or 'skip', got {on_missing!r}"
        )
    skip_missing = on_missing == "skip"
    base = base_url.rstrip("/") + "/"
    if keys is None:
        keys = list_http_autoindex(base)
    if isinstance(keys, _DF):
        meta = keys.select("key")
        if num_partitions:
            meta = meta.repartition(num_partitions, "key")
    else:
        p = num_partitions or spark.sparkContext.defaultParallelism
        meta = spark.createDataFrame(
            [(k,) for k in keys] or [], "key string"
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
        from urllib.error import HTTPError

        for pdf in batches:
            paths, mtimes, lengths, contents = [], [], [], []
            for key in pdf["key"]:
                url = base + quote(key)
                try:
                    with urlopen(url, timeout=timeout) as res:
                        body = res.read()
                        modified = _http_date(
                            res.headers.get("Last-Modified")
                        )
                except HTTPError as exc:
                    if skip_missing and exc.code in (404, 410):
                        continue  # deleted between list and fetch
                    raise
                paths.append(base + key)
                mtimes.append(modified or dt.datetime.now(dt.timezone.utc))
                lengths.append(len(body))
                contents.append(body)
            # explicit dtypes: an all-skipped batch is empty and pandas
            # would infer float64 for the timestamp column
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


def crawl_http(
    spark: SparkSession,
    base_url: str,
    dataset: str,
    lake_dir: str,
    include: str | None = None,
    exclude: str | None = None,
    listing_out: list | None = None,
) -> dict:
    """Full crawl of an HTTP store into the lake: list → skip-existing
    anti-join → fetch only the delta → merge → write. The incremental
    contract is the reference's key-existence skip
    (ftm_datalake/crawl.py:67-71): an HTTP autoindex carries no
    size/mtime, so a key already in the documents table is never
    re-fetched (re-crawl of an unchanged store downloads ZERO bytes —
    asserted by a fetch-spy test). Returns the crawl counters. Pass
    ``listing_out`` (a list) to receive the UNFILTERED autoindex
    listing, so a follow-up pass (e.g. ``crawl --archive``) can reuse
    it instead of walking the store a second time."""
    import fnmatch

    from ftm_datalake_spark.operators.documents import merge_documents
    from ftm_datalake_spark.pipelines.ingest import (
        read_documents,
        write_documents,
    )

    base = base_url.rstrip("/") + "/"
    keys = list_http_autoindex(base)
    if listing_out is not None:
        listing_out.extend(keys)
    if include:
        keys = [k for k in keys if re.match(r"\A" + fnmatch.translate(include), k)]
    if exclude:
        keys = [
            k for k in keys if not re.match(r"\A" + fnmatch.translate(exclude), k)
        ]
    n_total = len(keys)
    current = read_documents(spark, lake_dir, dataset)
    n_before = current.count()
    # skip-existing as a Spark anti-join, kept FULLY distributed: the
    # new-key set feeds the fetch as a DataFrame, never a driver list
    # (same contract as the S3 inventory-manifest crawl)
    listing_df = spark.createDataFrame([(k,) for k in keys] or [], "key string")
    new_keys = listing_df.join(
        current.select("key"), "key", "left_anti"
    ).localCheckpoint(eager=True)
    n_new = new_keys.count()
    n_after = n_before
    if n_new:
        from ftm_datalake_spark.pipelines.ingest import _document_rows

        files = scan_http_store(spark, base, keys=new_keys, on_missing="skip")
        rows = _document_rows(files, base, dataset)
        merged = merge_documents(current, rows)
        write_documents(merged, lake_dir)
        n_after = read_documents(spark, lake_dir, dataset).count()
    return {
        "files_total": n_total,
        "added_or_updated": n_after - n_before,
        "not_found": n_new - (n_after - n_before),
    }


def crawl_scan_http(
    spark: SparkSession,
    base_url: str,
    dataset: str,
    keys: list[str] | None = None,
    include: str | None = None,
    exclude: str | None = None,
) -> DataFrame:
    """The crawl_scan twin for HTTP sources: same DOCUMENTS_SCHEMA rows,
    same glob semantics, checksum computed task-side over fetched bytes.
    Include/exclude prune the KEY LIST before any fetch — excluded blobs
    are never downloaded (reference skips before fetching,
    ftm_datalake/crawl.py:58-71)."""
    import fnmatch

    from ftm_datalake_spark.pipelines.ingest import _document_rows

    base = base_url.rstrip("/") + "/"
    if keys is None:
        keys = list_http_autoindex(base)
    if include:
        keys = [k for k in keys if re.match(r"\A" + fnmatch.translate(include), k)]
    if exclude:
        keys = [
            k for k in keys if not re.match(r"\A" + fnmatch.translate(exclude), k)
        ]
    files = scan_http_store(spark, base, keys)
    return _document_rows(files, base, dataset)
