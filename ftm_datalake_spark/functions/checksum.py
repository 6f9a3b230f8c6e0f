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

    The reference hashes the python repr of the tuple; we define the engine's
    canonical recipe as sha1 of the '|'-joined utf-8 strings. Documented so
    IDs are reproducible across runs and engines.
    """
    return F.sha1(F.concat_ws("|", *parts).cast("binary"))


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
