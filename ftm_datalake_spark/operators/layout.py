"""Data-layout operators: Z-order clustering and small-file compaction.

Neither exists in the reference (it stores blobs in a sharded key-value
layout, ftm_datalake/archive/dataset.py:62-69); both are table-layout
services a 100 TB lake needs around the same data:

* **Z-order** interleaves the bits of several quantized columns into one
  sort key, so sorting by that single key co-locates rows that are close
  in *every* dimension. Parquet row-group / file min-max stats then
  prune multi-dimensional box predicates — a linear sort only ever
  prunes its leading column. This is how Delta/Iceberg `OPTIMIZE
  ZORDER BY` works; here it is expressed as pure Column arithmetic
  (shift/mask inside whole-stage codegen, no UDF) feeding
  ``repartitionByRange`` + ``sortWithinPartitions``.

* **Compaction planning** turns a file listing into target-sized
  write groups with a window cumulative sum — the standard fix for the
  small-files problem that kills scan throughput at scale (every file
  is a task; 10 M tiny files = 10 M tasks). The plan is deterministic
  and relational, so it runs AS a query, distributed, not as a
  driver-side loop over the listing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-number bit spreading masks: value & mask after each
# shift-and-or doubles the gap between payload bits (classic Morton
# encoding, e.g. "Bit Twiddling Hacks"). _SPREAD2[k] = (shift, mask)
# producing x with one zero bit between every payload bit, for payloads
# up to 32 bits in a 64-bit lane.
_SPREAD2: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread2(col: Column) -> Column:
    """Spread a ≤31-bit non-negative int so payload bits land on even
    positions (5 shift/mask ops, all JVM-side codegen)."""
    x = col.cast("long")
    for shift, mask in _SPREAD2:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(cols: list[Column], bits: int) -> Column:
    """Morton/Z-value of N quantized columns as one LONG sort key.

    Inputs must already be non-negative and < 2**bits (see
    ``quantize``); N * bits must fit in the 63 value bits of a long.
    The 2-column case uses magic-number spreading (10 ops total); the
    generic case materializes the bit-gather sum — ``bits * N`` cheap
    shift/mask terms, still pure codegen arithmetic, no UDF.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long's 63 value bits")
    if n == 1:
        return cols[0].cast("long")
    if n == 2 and bits <= 31:
        return _spread2(cols[0]).bitwiseOR(F.shiftleft(_spread2(cols[1]), 1))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zvalue_sql(cols: list[str], bits: int) -> str:
    """The same Z-value as ANSI-SQL text (naive bit-gather sum) — used
    by oracle queries so an independent engine checks the arithmetic."""
    terms = []
    for b in range(bits):
        for i, col in enumerate(cols):
            terms.append(f"((({col} >> {b}) & 1) << {b * len(cols) + i})")
    return " | ".join(terms)


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a bounded numeric column onto [0, 2**bits) for Z-encoding.

    Bounds come from table stats (at scale: the catalog, or a first
    aggregate pass); values outside [lo, hi] clamp to the edges, so a
    stale-stats outlier degrades clustering but never corrupts the key.
    """
    span = hi - lo
    if span <= 0:
        raise ValueError("quantize needs hi > lo")
    top = (1 << bits) - 1
    scaled = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 1))
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled)).cast("long")


def zorder_repartition(
    df: DataFrame, cols: list[Column], bits: int, num_partitions: int
) -> DataFrame:
    """Cluster a DataFrame for writing: range-partition by Z-value, then
    sort each partition by it.

    ``repartitionByRange`` samples the key distribution, so output files
    split the Z-curve into contiguous runs — every file covers a small
    hyper-rectangle-ish region and its parquet min/max stats prune on
    ALL dimensions. One shuffle, which any global clustering requires.
    """
    z = zvalue(cols, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def hilbert_index(
    df: DataFrame, x: str, y: str, bits: int, out: str = "hval"
) -> DataFrame:
    """Hilbert-curve index of two quantized columns — Z-order's locality,
    strictly improved: consecutive curve positions are always grid-
    adjacent (Manhattan distance 1), so a range of the sort key covers a
    tighter region than the same-length Z-curve run (no quadrant jumps).

    The classic per-level rotate-and-reflect recurrence runs as one
    narrow ``select`` per bit level: each level materializes new
    (x, y, d) columns, so the expression DAG stays linear in ``bits``
    instead of exponentiating, and the whole computation remains pure
    JVM column arithmetic inside codegen — no UDF.

    Inputs must be non-negative and < 2**bits (see ``quantize``).
    """
    if 2 * bits > 63:
        raise ValueError("2 x bits must fit in a long's 63 value bits")
    keep = df.columns
    cur = (
        df.withColumn("__hx", F.col(x).cast("long"))
        .withColumn("__hy", F.col(y).cast("long"))
        .withColumn(out, F.lit(0).cast("long"))
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d_new = F.col(out) + F.lit(s) * F.lit(s) * (
            (rx * 3).bitwiseXOR(ry).cast("long")
        )
        nx = (
            F.when(ry == 1, F.col("__hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hy"))
            .otherwise(F.col("__hy"))
        )
        ny = (
            F.when(ry == 1, F.col("__hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hx"))
            .otherwise(F.col("__hx"))
        )
        cur = cur.select(
            *keep,
            nx.alias("__hx"),
            ny.alias("__hy"),
            d_new.alias(out),
        )
    return cur.select(*keep, out)


def hilbert_sql(x: str, y: str, bits: int, keys: list[str], base: str) -> str:
    """The identical Hilbert recurrence as generated ANSI SQL (one nested
    subquery per bit level) — the oracle-side mirror, derived from the
    same formula but through a different code path, like zvalue_sql."""
    keycols = ", ".join(keys)
    inner = (
        f"SELECT {keycols}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {base}"
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        inner = f"""SELECT {keycols},
          CASE WHEN {ry} = 1 THEN hx
               WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END AS hx,
          CASE WHEN {ry} = 1 THEN hy
               WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END AS hy,
          hd + {s * s} * xor({rx} * 3, {ry}) AS hd
        FROM ({inner})"""
    return f"SELECT {keycols}, hd AS hval FROM ({inner})"


def build_skipping_index(spark, path: str, columns: list[str]) -> DataFrame:
    """File-level min/max skipping index over a parquet directory, AS A
    TABLE: one row per (file, column) with min/max/null_count/rows read
    from parquet footers — the catalog-style stats layer Delta/Iceberg
    keep in their metadata, for plain parquet directories.

    The footer reads run in tasks via mapInPandas over the file listing
    (binaryFile metadata scan, content column dropped immediately so no
    data bytes move): indexing 10 M files is a metadata-scale job
    distributed over the cluster, never a driver loop.
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("file", T.StringType(), False),
            T.StructField("column", T.StringType(), False),
            T.StructField("vmin", T.StringType(), True),
            T.StructField("vmax", T.StringType(), True),
            T.StructField("null_count", T.LongType(), True),
            T.StructField("num_rows", T.LongType(), False),
        ]
    )
    wanted = list(columns)

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fpath in pdf["path"]:
                local = fpath.removeprefix("file:")
                meta = pq.ParquetFile(local).metadata
                names = [meta.schema.column(i).name for i in range(meta.num_columns)]
                for col in wanted:
                    if col not in names:
                        continue
                    ci = names.index(col)
                    vmin = vmax = None
                    nulls = 0
                    for rg in range(meta.num_row_groups):
                        st = meta.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            vmin = vmax = None
                            break
                        vmin = st.min if vmin is None else min(vmin, st.min)
                        vmax = st.max if vmax is None else max(vmax, st.max)
                        nulls += st.null_count or 0
                    rows.append(
                        {
                            "file": fpath,
                            "column": col,
                            "vmin": None if vmin is None else str(vmin),
                            "vmax": None if vmax is None else str(vmax),
                            "null_count": nulls,
                            "num_rows": meta.num_rows,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path")
    )
    return listing.mapInPandas(read_footers, schema)


def prune_files_long(index: DataFrame, column: str, lo: int, hi: int) -> DataFrame:
    """Files whose [vmin, vmax] for a LONG column overlaps [lo, hi] —
    the skip decision as a query over the index table (stringified
    stats cast back). Files with no usable stats are kept (never skip
    on missing evidence)."""
    stats = index.where(F.col("column") == column)
    keep = (
        F.col("vmin").isNull()
        | (
            (F.col("vmax").cast("long") >= F.lit(lo))
            & (F.col("vmin").cast("long") <= F.lit(hi))
        )
    )
    return stats.where(keep).select("file")


def pruned_scan(
    spark,
    path: str,
    index: DataFrame,
    column: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """File-skipping scan: load ONLY the parquet files whose index
    min/max for ``column`` overlaps [lo, hi], then re-apply the
    predicate for row-level exactness — the Delta/Iceberg data-skipping
    read path for plain parquet directories, composed from
    :func:`build_skipping_index` + :func:`prune_files_long`.

    The kept-file list is driver-side metadata (file names, not data);
    at 100 TB the win is that a selective predicate on a clustered
    column (Z-order/Hilbert layouts above) never opens the other files
    at all — `df.inputFiles()` shrinks with selectivity, asserted in
    tests. Semantics are identical to a full scan + filter by
    construction (files are only skipped when their stats PROVE no row
    matches; missing stats keep the file)."""
    kept = [r["file"] for r in prune_files_long(index, column, lo, hi).collect()]
    if not kept:
        full_schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], full_schema)
    df = spark.read.parquet(*kept)
    return df.where(
        (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
    )


def compaction_plan(
    files: DataFrame,
    path_col: str = "path",
    size_col: str = "size",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Group small files into ~target-sized rewrite bins.

    Orders the listing by path (preserves key locality in sharded
    layouts), takes the running byte total, and assigns
    ``bin = floor(exclusive_prefix_sum / target)`` — a file lands in the
    bin its predecessors filled up to, so every bin except possibly the
    last holds ≥ target bytes once its first member overflows it.

    The prefix sum runs through the two-phase global-cumsum scheme
    (operators/rank.with_global_cumsum: range shuffle → per-partition
    window → P driver-side offsets), so even a 10M-file listing never
    funnels through a single-partition Exchange.

    Returns one row per bin: n_files, total_bytes, first/last path.
    """
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    summed = with_global_cumsum(files, [path_col], size_col, out_col="__cum")
    prefix = F.col("__cum") - F.col(size_col)  # exclusive prefix
    binned = summed.withColumn(
        "bin", F.floor(prefix / F.lit(target_bytes)).cast("long")
    ).drop("__cum")
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.min(path_col).alias("first_path"),
        F.max(path_col).alias("last_path"),
    )
