"""Layout operators: Z-value bit arithmetic vs a python reference, the
data-skipping payoff of Z-ordered writes (file min/max stats prune a 2-D
box predicate that a linear sort cannot), and compaction-plan invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.layout import (
    compaction_plan,
    quantize,
    zorder_repartition,
    zvalue,
)


def _z_ref(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zvalue_matches_reference_2d_and_3d(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 16, 50)
    ys = rng.integers(0, 1 << 16, 50)
    ws = rng.integers(0, 1 << 8, 50)
    df = spark.createDataFrame(
        [(int(x), int(y), int(w)) for x, y, w in zip(xs, ys, ws)],
        "x long, y long, w long",
    )
    got2 = [
        r["z"]
        for r in df.select(
            zvalue([F.col("x"), F.col("y")], 16).alias("z")
        ).collect()
    ]
    assert got2 == [_z_ref([int(x), int(y)], 16) for x, y in zip(xs, ys)]
    got3 = [
        r["z"]
        for r in df.select(
            zvalue([F.col("x"), F.col("y"), F.col("w")], 8).alias("z")
        ).collect()
    ]
    assert got3 == [
        _z_ref([int(x) & 0xFF, int(y) & 0xFF, int(w)], 8)
        for x, y, w in zip(xs, ys, ws)
    ]


def test_zvalue_rejects_overflow():
    with pytest.raises(ValueError):
        zvalue([F.col("a"), F.col("b")], 32)
    with pytest.raises(ValueError):
        zvalue([], 8)


def test_quantize_clamps_and_buckets(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (99.9999,), (100.0,), (250.0,)], "v double"
    )
    got = [
        r["q"]
        for r in df.select(quantize(F.col("v"), 0.0, 100.0, 4).alias("q")).collect()
    ]
    # lo clamps to 0, hi and beyond clamp to 15, interior scales to 16 buckets
    assert got == [0, 0, 15, 15, 15]


def _files_touched(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] overlaps [lo,hi], total files) via parquet
    footer stats — the same pruning decision a scan makes."""
    import glob as g

    touched = total = 0
    for f in sorted(g.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        total += 1
        fmin = min(
            meta.row_group(i).column(
                [meta.schema.column(j).name for j in range(meta.num_columns)].index(col)
            ).statistics.min
            for i in range(meta.num_row_groups)
        )
        fmax = max(
            meta.row_group(i).column(
                [meta.schema.column(j).name for j in range(meta.num_columns)].index(col)
            ).statistics.max
            for i in range(meta.num_row_groups)
        )
        if fmax >= lo and fmin <= hi:
            touched += 1
    return touched, total


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    # Deterministic pseudo-random 2-D points on a 256x256 grid.
    df = (
        spark.range(4096)
        .select(
            F.pmod(F.hash(F.col("id")), F.lit(256)).alias("x"),
            F.pmod(F.hash(F.col("id") + 7_000_000), F.lit(256)).alias("y"),
        )
        .withColumn("x", F.abs(F.col("x")))
        .withColumn("y", F.abs(F.col("y")))
    )
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    # Linear layout: globally sorted by x only.
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    # Z-order layout: clustered on (x, y) jointly.
    zorder_repartition(df, [F.col("x"), F.col("y")], 8, 16).write.parquet(zorder)

    # A y-only predicate: the x-sorted layout cannot prune at all.
    lin_y, lin_total = _files_touched(linear, "y", 100, 115)
    z_y, z_total = _files_touched(zorder, "y", 100, 115)
    assert lin_y == lin_total  # every file spans the full y range
    assert z_y <= z_total // 2  # z-order clusters y too

    # An x predicate still prunes in the z-order layout.
    z_x, _ = _files_touched(zorder, "x", 0, 31)
    assert z_x <= z_total // 2

    # Layout is a reshuffle, never a rewrite of values.
    a = spark.read.parquet(linear).groupBy().sum("x", "y").collect()
    b = spark.read.parquet(zorder).groupBy().sum("x", "y").collect()
    assert a == b


def test_compaction_plan_invariants(spark):
    files = spark.createDataFrame(
        [(f"src/{i:04d}", (i * 37) % 900 + 100) for i in range(200)],
        "path string, size long",
    )
    target = 5_000
    plan = compaction_plan(files, target_bytes=target).orderBy("bin").collect()
    # Partitions the listing: every file in exactly one bin.
    assert sum(r["n_files"] for r in plan) == 200
    total = sum(r["total_bytes"] for r in plan)
    assert total == files.groupBy().sum("size").collect()[0][0]
    # Bins are contiguous path ranges (no interleaving).
    for prev, nxt in zip(plan, plan[1:]):
        assert prev["last_path"] < nxt["first_path"]
    # Every bin except the last reaches the target once its spill-over
    # member lands (bin boundaries come from the exclusive prefix sum).
    for r in plan[:-1]:
        assert r["total_bytes"] >= target - 1000  # max single-file size


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "by_type")
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias(
            "etype"
        ),
    )
    df.write.partitionBy("etype").parquet(path)
    read = spark.read.parquet(path).where(F.col("etype") == "t3")
    plan = read._jdf.queryExecution().executedPlan().toString()
    # the filter must become a PartitionFilter on the directory layout,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "etype" in plan.split("PartitionFilters", 1)[1][:200]
    assert read.count() == 200


def test_skipping_index_prunes_and_never_lies(spark, tmp_path):
    from ftm_datalake_spark.operators.layout import (
        build_skipping_index,
        prune_files_long,
    )

    path = str(tmp_path / "table")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 100).alias("bucket")
    )
    # range-partitioned by id → each of 10 files holds a narrow id range
    df.repartitionByRange(10, "id").write.parquet(path)

    idx = build_skipping_index(spark, path, ["id", "bucket"])
    stats = idx.collect()
    files = {r["file"] for r in stats}
    assert len(files) == 10
    assert {r["column"] for r in stats} == {"id", "bucket"}
    total_rows = sum(r["num_rows"] for r in stats if r["column"] == "id")
    assert total_rows == 10_000

    # an id range predicate touches few files...
    kept = prune_files_long(idx, "id", 2000, 2999).collect()
    assert 1 <= len(kept) <= 3
    # ...and reading ONLY those files still returns every matching row
    got = (
        spark.read.parquet(*[r["file"] for r in kept])
        .where(F.col("id").between(2000, 2999))
        .count()
    )
    assert got == 1000
    # bucket is uniform across files: no pruning possible, all kept
    assert prune_files_long(idx, "bucket", 5, 10).count() == 10


def _hilbert_ref(order: int, x: int, y: int) -> int:
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_walks_adjacent(spark):
    from ftm_datalake_spark.operators.layout import hilbert_index

    # full 16x16 grid: exact match with the classic recurrence
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = hilbert_index(grid, "x", "y", 4).collect()
    got = {(r["x"], r["y"]): r["hval"] for r in rows}
    assert got == {
        (x, y): _hilbert_ref(16, x, y) for x in range(16) for y in range(16)
    }
    # bijection + the defining locality property: consecutive curve
    # positions are Manhattan-adjacent (Z-order violates this at every
    # quadrant boundary)
    byd = {h: xy for xy, h in got.items()}
    assert sorted(byd) == list(range(256))
    assert all(
        abs(byd[i][0] - byd[i + 1][0]) + abs(byd[i][1] - byd[i + 1][1]) == 1
        for i in range(255)
    )
    # spot-check a wider order
    rng = np.random.default_rng(3)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 12, (40, 2))]
    wide = spark.createDataFrame(pts, "x long, y long")
    wrows = hilbert_index(wide, "x", "y", 12).collect()
    assert {(r["x"], r["y"]): r["hval"] for r in wrows} == {
        (x, y): _hilbert_ref(1 << 12, x, y) for x, y in pts
    }


def test_zvalue_and_hilbert_hypothesis(spark):
    """Property sweep: random coordinate batches must match the pure-
    python references for both curves (one Spark job per batch keeps
    the sweep fast, so hypothesis drives the data, not the job count)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ftm_datalake_spark.operators.layout import hilbert_index, zvalue

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, (1 << 10) - 1), st.integers(0, (1 << 10) - 1)
            ),
            min_size=1,
            max_size=20,
        )
    )
    def run(pts):
        df = spark.createDataFrame(pts, "x long, y long")
        zrows = df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], 10).alias("z")
        ).collect()
        assert all(r["z"] == _z_ref([r["x"], r["y"]], 10) for r in zrows)
        hrows = hilbert_index(df, "x", "y", 10).collect()
        assert all(
            r["hval"] == _hilbert_ref(1 << 10, r["x"], r["y"]) for r in hrows
        )

    run()


def test_pruned_scan_equals_full_scan_and_skips_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.layout import (
        build_skipping_index,
        pruned_scan,
    )

    path = str(tmp_path / "tbl")
    # 10 files, ids range-clustered per file (0-999, 1000-1999, ...)
    (
        spark.range(10_000)
        .repartitionByRange(10, "id")
        .write.parquet(path)
    )
    idx = build_skipping_index(spark, path, ["id"]).cache()

    out = pruned_scan(spark, path, idx, "id", 2_500, 3_499)
    full = spark.read.parquet(path).where(
        (F.col("id") >= 2_500) & (F.col("id") <= 3_499)
    )
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in full.collect()
    )
    # the pruned plan opened only the 2 overlapping files of 10
    assert len(out.inputFiles()) == 2
    assert len(full.inputFiles()) == 10

    # empty overlap: no files read, schema preserved, zero rows
    none = pruned_scan(spark, path, idx, "id", 1_000_000, 2_000_000)
    assert none.count() == 0
    assert none.schema == spark.read.parquet(path).schema
    idx.unpersist()
