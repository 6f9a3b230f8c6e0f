"""Checksum / ID-derivation expressions (SURVEY §2.8 F1-F3).

All are pure Column expressions (JVM-side, codegen-able) — no Python UDFs.

Reference recipes:
- F1 blob sha1: ftm_datalake/archive/dataset.py:38-41
- F2 entity-id data checksum over (key, content_hash): ftm_datalake/model.py:49-52
- F3 shard path ab/cd/ef/<hash>: ftm_datalake/util.py:8-11
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_checksum(content: Column) -> Column:
    """F1: sha1 hex digest of blob bytes (``binaryFile.content``)."""
    return F.sha1(content)


def data_checksum(*parts: Column) -> Column:
    """F2: deterministic checksum of a tuple of values.

    The reference hashes the python repr of the tuple
    (ftm_datalake/model.py:49-52); this engine defines its own canonical,
    cross-engine recipe: each part becomes a fixed token — ``md5(part)``,
    or the literal ``N`` for NULL — the tokens are concatenated, and the
    concatenation is md5'd. The token stream is uniquely parseable ('N' is
    outside the hex alphabet; every other token is exactly 32 hex chars),
    so the encoding is delimiter-unambiguous — ('a|b','c') and ('a','b|c')
    hash differently — and NULL is distinct from the empty string.
    DuckDB mirror: ``md5(md5(a) || md5(b))``.
    """
    tokens = [
        F.when(p.isNull(), F.lit("N")).otherwise(F.md5(p.cast("string")))
        for p in parts
    ]
    return F.md5(F.concat(*tokens))


def entity_id(dataset: Column, key: Column, content_hash: Column) -> Column:
    """'{dataset}-file-{checksum(key, content_hash)}'

    Reference: ftm_datalake/model.py:49-52.
    """
    return F.concat_ws("-", dataset, F.lit("file"), data_checksum(key, content_hash))


def shard_path(checksum: Column) -> Column:
    """F3: content-addressed blob layout ``ab/cd/ef/<checksum>``."""
    return F.concat_ws(
        "/",
        F.substring(checksum, 1, 2),
        F.substring(checksum, 3, 2),
        F.substring(checksum, 5, 2),
        checksum,
    )
