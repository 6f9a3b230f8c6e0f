"""Round-10 second-wave operator laws: DSIR importance weights,
meta-blocking WEP, the 2-D skyline, and the time-weighted average."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.blocking import meta_blocking_wep
from ftm_datalake_spark.operators.dsir import dsir_importance_weights
from ftm_datalake_spark.operators.skyline import skyline_2d


# ----------------------------------------------------------------- DSIR
# Two disjoint vocabularies: "target-ish" docs draw from vocab A,
# "background" docs from vocab B. With target = the A-labelled slice,
# every A doc must outweigh every B doc — the estimator's whole job.
def _dsir_docs(spark):
    rows = []
    for i in range(12):
        rows.append((i, " ".join(f"alpha{j} beta{j}" for j in range(8)), "A"))
    for i in range(12, 40):
        rows.append((i, " ".join(f"noise{i}x{j} filler{j}" for j in range(8)), "B"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_target_docs_outweigh_background(spark):
    docs = _dsir_docs(spark)
    w = dsir_importance_weights(docs, F.col("lang") == "A").collect()
    by_id = {r["doc_id"]: r["dsir_weight"] for r in w}
    a = [by_id[i] for i in range(12)]
    b = [by_id[i] for i in range(12, 40)]
    assert min(a) > max(b)


def test_dsir_weight_scales_with_doc_length(spark):
    # Same distribution, doubled text → n_bigrams roughly doubles and
    # the weight moves in the same direction (sum over occurrences).
    rows = [(0, "alpha beta alpha beta", "A"),
            (1, "alpha beta alpha beta alpha beta alpha beta", "A"),
            (2, "zig zag zig zag", "B")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r["doc_id"]: r for r in
         dsir_importance_weights(docs, F.col("lang") == "A").collect()}
    assert w[1]["n_bigrams"] > w[0]["n_bigrams"]
    assert w[1]["dsir_weight"] > w[0]["dsir_weight"] > w[2]["dsir_weight"]


# -------------------------------------------------------- meta-blocking
def _mb_docs(spark):
    # Docs 0-2 share a distinctive trigram run; docs 3-9 are unrelated;
    # ALL docs share a boilerplate run (hot blocks → purged by max_df).
    boiler = "common boiler plate run here"
    rows = []
    for i in range(3):
        rows.append((i, f"{boiler} shared alpha beta gamma tail{i} x{i}"))
    for i in range(3, 10):
        rows.append((i, f"{boiler} uniq{i}a uniq{i}b uniq{i}c uniq{i}d"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_wep_keeps_only_mean_or_better_edges(spark):
    docs = _mb_docs(spark)
    kept = meta_blocking_wep(docs, min_df=2, max_df=5).collect()
    kept_pairs = {(r["doc_a"], r["doc_b"]) for r in kept}
    # the genuinely-shared trio survives; nothing else can (their only
    # co-occurrence is the purged boilerplate)
    assert kept_pairs == {(0, 1), (0, 2), (1, 2)}


def test_hot_block_purged_by_max_df(spark):
    # Docs 0-9 share ONLY a boilerplate run; docs 10-11 share one
    # genuine rare trigram. With the cap lifted, the 45 boilerplate
    # pairs sit ABOVE the mean (the single cbs=1 edge drags it below
    # 3), so WEP alone keeps the flood — only the df cap removes it.
    boiler = "common boiler plate run here"
    rows = [(i, f"{boiler} uniq{i}a uniq{i}b uniq{i}c") for i in range(10)]
    rows += [(10, "alpha beta gamma pad10a pad10b"),
             (11, "alpha beta gamma pad11a pad11b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    flooded = {(r["doc_a"], r["doc_b"])
               for r in meta_blocking_wep(docs, 2, 10_000).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in meta_blocking_wep(docs, 2, 5).collect()}
    assert len(flooded) == 45  # the boilerplate flood survives WEP
    assert (10, 11) not in flooded  # cbs=1 < mean → WEP-pruned
    assert capped == {(10, 11)}  # cap kills the flood at the source


# --------------------------------------------------------------- skyline
def test_skyline_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 12), rng.randint(1, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, sz int, price int")
    got = {
        (r["sz"], r["frontier_price"], r["n_rows"])
        for r in skyline_2d(df, "sz", "price").collect()
    }
    # brute force: p on skyline iff no q with sz>=, price<=, strict one
    sky = set()
    pts = [(s, p) for _, s, p in rows]
    for s, p in set(pts):
        dominated = any(
            (s2 >= s and p2 <= p and (s2 > s or p2 < p)) for s2, p2 in pts
        )
        if not dominated:
            sky.add((s, p))
    want = {(s, p, sum(1 for s2, p2 in pts if (s2, p2) == (s, p)))
            for s, p in sky}
    assert got == want


def test_skyline_frontier_strictly_decreasing(spark, sf_dir):
    from ftm_datalake_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    rows = sorted(
        skyline_2d(part, "p_size", "p_retailprice").collect(),
        key=lambda r: r["p_size"],
    )
    prices = [float(r["frontier_p_retailprice"]) for r in rows]
    # larger size on the frontier must cost strictly more... inverse:
    # as size increases the frontier min price must strictly increase
    assert all(a < b for a, b in zip(prices, prices[1:]))


# ------------------------------------------------------------------ TWAP
def test_twap_constant_value_is_exact(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=10 * i), 1, "e", 42.5, "{}")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    stepped = df.select(
        "user_id", cents.alias("cents"),
        F.coalesce(
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")),
            F.lit(0),
        ).alias("dur_us"),
    ).withColumn("dur_ms", F.expr("dur_us div 1000"))
    out = (
        stepped.groupBy("user_id")
        .agg(F.expr("(sum(cents * dur_ms) * 1000) div sum(dur_ms)")
             .alias("twap_cents_x1000"))
        .collect()
    )
    # constant 42.50 → 4250 cents → 4_250_000 exactly
    assert out[0]["twap_cents_x1000"] == 4_250_000


def test_twap_registry_weights_by_duration(spark, sf_dir):
    # hand-built: 10.00 for 1 minute then 20.00 for 3 minutes
    # → (1000*60 + 2000*180) / 240 = 1750 cents → x1000
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "e", 10.0, "{}"),
        (1, t0 + dt.timedelta(minutes=1), 1, "e", 20.0, "{}"),
        (2, t0 + dt.timedelta(minutes=4), 1, "e", 99.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(sf_dir, f"{t}.parquet")
            dst = os.path.join(d, f"{t}.parquet")
            os.symlink(src, dst)
        from ftm_datalake_spark.plans import REGISTRY

        out = REGISTRY["events_time_weighted_value"].builder(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 3
    assert r["span_ms"] == 240_000
    assert r["twap_cents_x1000"] == 1_750_000


# ------------------------------------------------- sorted neighborhood
def test_sorted_neighborhood_matches_bruteforce(spark):
    from ftm_datalake_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"k{(i * 7) % 13:02d}", i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, key string, sub int")
    got = {
        (r["doc_a"], r["doc_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(
            df, ["key", "sub"], window=4
        ).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[2], r[0]))
    want = set()
    for i, a in enumerate(order):
        for d in range(1, 4):
            if i + d < len(order):
                want.add((a[0], order[i + d][0], d))
    assert got == want


def test_sorted_neighborhood_pair_budget(spark):
    # fanout is exactly window-1 per record minus the tail truncation —
    # no hot-key blowup possible by construction
    from ftm_datalake_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    n, w = 100, 6
    df = spark.createDataFrame(
        [(i, "same") for i in range(n)], "doc_id long, key string"
    )
    cnt = sorted_neighborhood_pairs(df, ["key"], window=w).count()
    assert cnt == n * (w - 1) - (w - 1) * w // 2


# ------------------------------------------------------- CCNet buckets
def test_perplexity_buckets_partition_and_order(spark, sf_dir):
    from ftm_datalake_spark.plans import REGISTRY

    rows = REGISTRY["quality_perplexity_buckets"].builder(
        spark, sf_dir
    ).collect()
    total = sum(r["n_docs"] for r in rows)
    import duckdb

    n_docs = duckdb.connect().execute(
        "SELECT COUNT(*) FROM read_parquet(?) WHERE "
        "len(string_split_regex(trim(text), '\\s+')) >= 3",
        [f"{sf_dir}/documents.parquet"],
    ).fetchone()[0]
    # every scoreable doc lands in exactly one bucket
    assert total == n_docs
    by_bucket: dict = {}
    for r in rows:
        by_bucket[r["bucket"]] = by_bucket.get(r["bucket"], 0) + r["n_docs"]
    # tertiles: no bucket may dominate (cut rule gives each >= 1 doc
    # and head/middle together must reach 2/3 by construction)
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert by_bucket.get("head", 0) + by_bucket.get("middle", 0) >= (
        2 * total
    ) // 3
