"""Timestamp helpers robust to physical-type drift (F8, SURVEY §2.6).

Parquet written by different engines lands in Spark as TIMESTAMP (with
session tz) or TIMESTAMP_NTZ (no tz annotation, Spark ≥3.4). Operators
downstream should not care: ``ts_micros`` gives epoch-microseconds for
either, assuming the session timezone is pinned UTC (session.py), under
which the NTZ→TIMESTAMP cast is value-preserving and matches DuckDB's
naive-timestamp ``epoch_us`` semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column.

    ``F.unix_micros`` hard-fails on TIMESTAMP_NTZ at analysis time
    (DATATYPE_MISMATCH); casting to TIMESTAMP first accepts both types
    and is a no-op on TIMESTAMP. Purely JVM-side — stays inside
    whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
