"""KMV/theta sketch: estimator accuracy against exact cardinalities,
the exact-below-k collapse, and partition-independence of the sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftm_datalake_spark.operators.sketches import (
    TWO52,
    kmv_set_estimates,
    kmv_sketch,
    kmv_theta,
)


def _keys(spark, n: int, offset: int = 0, parts: int = 8):
    return spark.range(offset, offset + n, 1, parts).select(
        F.col("id").alias("key")
    )


def test_kmv_exact_below_k(spark):
    sk = kmv_sketch(_keys(spark, 40), k=64)
    assert sk.count() == 40
    theta = kmv_theta(sk, 64).collect()[0]["theta"]
    assert theta == TWO52
    ests = {
        r["set_op"]: r["est"]
        for r in kmv_set_estimates(
            kmv_sketch(_keys(spark, 40), 64),
            kmv_sketch(_keys(spark, 30, offset=20), 64),
            64,
        ).collect()
    }
    # below k everything is exact: |A|=40, |B|=30, |A∪B|=50, |A∩B|=20
    assert ests == {"a": 40, "b": 30, "union": 50, "intersect": 20}


def test_kmv_estimates_track_exact_cardinalities(spark):
    k = 256
    a = _keys(spark, 5000)  # A = [0, 5000)
    b = _keys(spark, 5000, offset=3000)  # B = [3000, 8000)
    ests = {
        r["set_op"]: r["est"]
        for r in kmv_set_estimates(
            kmv_sketch(a, k), kmv_sketch(b, k), k
        ).collect()
    }
    for op, exact in (("a", 5000), ("b", 5000), ("union", 8000), ("intersect", 2000)):
        rel = abs(ests[op] - exact) / exact
        assert rel < 0.25, f"{op}: est {ests[op]} vs exact {exact}"


def test_kmv_sketch_partition_independent(spark):
    one = kmv_sketch(_keys(spark, 3000, parts=1), 128).collect()
    many = kmv_sketch(_keys(spark, 3000, parts=32), 128).collect()
    assert sorted(r["h"] for r in one) == sorted(r["h"] for r in many)
    # duplicates never change the sketch
    dup = _keys(spark, 3000).union(_keys(spark, 3000))
    dup_sk = kmv_sketch(dup, 128).collect()
    assert sorted(r["h"] for r in dup_sk) == sorted(r["h"] for r in one)


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.sketches import bloom_semi_join

    big = spark.range(20_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(40).select((F.col("id") * 13 + 7).alias("key"))
    got = bloom_semi_join(big, small, "k")
    want = big.join(
        small.select(F.col("key").alias("k")).distinct(), "k", "left_semi"
    )
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
    # the probe must prune: survivors of the bloom stage alone are far
    # fewer than the table (width 4096, 40 keys -> tiny fp rate)
    assert got.count() < 20_000 * 0.2


def test_bloom_semi_join_no_false_negatives_randomized(spark):
    import random

    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.sketches import bloom_semi_join

    rng = random.Random(7)
    keys = [rng.randint(0, 10_000) for _ in range(500)]
    member = sorted(set(rng.sample(keys, 25)))
    big = spark.createDataFrame([(k,) for k in keys], "k long")
    small = spark.createDataFrame([(k,) for k in member], "key long")
    got = {r.k for r in bloom_semi_join(big, small, "k").collect()}
    assert got == set(member) & set(keys)
