"""Path / URL key expressions (SURVEY §2.8 F4, F5, F7).

Reference: ftm_datalake/model.py:102-104 (name from key),
ftm_datalake/sync/aleph.py:98-104 (parent folder chain),
ftm_datalake/sync/memorious.py:125-149 (url → key funcs).
All pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_name(key: Column) -> Column:
    """F7: last path segment."""
    return F.element_at(F.split(key, "/"), -1)


def parent_path(key: Column) -> Column:
    """F7: parent directory ('' for top-level keys)."""
    parts = F.split(key, "/")
    return F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/")


def ancestor_paths(key: Column) -> Column:
    """J7 helper: array of every ancestor prefix of a key.

    'a/b/c.txt' -> ['a', 'a/b']. Used with explode+distinct to build the
    folders dimension table instead of the reference's memoized recursion
    (ftm_datalake/sync/aleph.py:95-107).
    """
    parts = F.split(key, "/")
    n = F.size(parts)
    idx = F.sequence(F.lit(1), n - 1)
    return F.when(
        n > 1,
        F.transform(idx, lambda i: F.array_join(F.slice(parts, 1, i), "/")),
    ).otherwise(F.array().cast("array<string>"))


def path_to_key(path: Column, source_uri: str) -> Column:
    """Archive key from a scanned file path: strip the file: scheme and
    the source prefix (regex-escaped — paths may contain metacharacters).

    Shared by the batch and streaming crawl scans so key derivation can
    never diverge between them."""
    import re

    prefix = source_uri.rstrip("/") + "/"
    no_scheme = F.regexp_replace(path, r"^file:", "")
    return F.regexp_replace(no_scheme, "^" + re.escape(prefix), "")


def url_to_key(url: Column) -> Column:
    """F4: derive an archive key from a crawled URL — the unquoted URL
    *path* with leading/trailing slashes stripped (scheme, host, query and
    fragment dropped), matching the reference's ``get_file_key``
    (ftm_datalake/sync/memorious.py:125-126,
    ``unquote(urlparse(url).path).strip('/')``).

    Decoding is lenient: a malformed percent-escape keeps the raw path
    (``try_url_decode`` → NULL → coalesce) instead of aborting the whole
    sync job, like urllib's forgiving ``unquote``. A URL without a scheme
    is treated entirely as a path, mirroring ``urlparse``.
    """
    has_scheme = url.rlike(r"^[a-z][a-z0-9+.-]*://")
    path = F.when(
        has_scheme, F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    ).otherwise(url)
    no_query = F.regexp_replace(path, r"[?#].*$", "")
    trimmed = F.regexp_replace(F.regexp_replace(no_query, "^/+", ""), "/+$", "")
    # java URLDecoder treats '+' as space; urllib's unquote does not —
    # protect literal '+' before decoding to keep reference-identical keys.
    plus_safe = F.regexp_replace(trimmed, r"\+", "%2B")
    return F.coalesce(F.try_url_decode(plus_safe), trimmed)


def strip_prefix(key: Column, prefix: str) -> Column:
    """F5: drop a literal leading prefix from keys.

    Reference: ftm_datalake/sync/memorious.py:140-149.
    """
    import re

    return F.regexp_replace(key, "^" + re.escape(prefix), "")
