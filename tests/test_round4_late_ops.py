"""Property tests for the round-4 late additions: CDC chunking, MAD
anomalies, RFM segments, Pareto concentration, LSH-diverse sampling.

The registry oracle mirror (test_registry_oracle) already proves
cross-engine equality; these tests pin the SEMANTIC invariants each
operator promises, against independent brute-force references.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ftm_datalake_spark.plans import REGISTRY
from ftm_datalake_spark.sources.tables import load_table


# ---------------------------------------------------------------- CDC chunks
def _spark_chunks(spark, texts: dict[int, str]) -> dict[int, list[str]]:
    """Run the dedup_cdc_chunks chunker (same expression chain) on an
    arbitrary {doc_id: text} dict, returning per-doc chunk lists."""
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    base = df.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk"))

    def mark(x, i):
        prev = F.element_at(F.col("tk"), F.greatest(i, F.lit(1)))
        h = F.conv(
            F.substring(F.md5(F.concat(prev, F.lit(" "), x)), 1, 8), 16, 10
        ).cast("long")
        return F.when(
            (i > F.lit(0)) & (h % 16 == 0), F.concat(F.lit("\u0001"), x)
        ).otherwise(x)

    rows = base.select(
        "doc_id",
        F.split(F.array_join(F.transform("tk", mark), " "), " \u0001").alias("chunks"),
    ).collect()
    return {r["doc_id"]: list(r["chunks"]) for r in rows}


def test_cdc_chunking_is_lossless_and_deterministic(spark):
    texts = {
        1: " ".join(f"w{i % 97}" for i in range(500)),
        2: " ".join(f"tok{i * 7 % 131}" for i in range(300)),
        3: "single",
        4: "",
    }
    chunks = _spark_chunks(spark, texts)
    for doc_id, text in texts.items():
        # lossless: chunks rejoin to the trimmed original
        assert " ".join(chunks[doc_id]) == text.strip()
    # deterministic: identical text under a different doc_id chunks identically
    again = _spark_chunks(spark, {99: texts[1]})
    assert again[99] == chunks[1]


def test_cdc_chunking_edit_locality(spark):
    """Editing ONE word may only affect the chunks adjacent to the edit:
    boundary decisions involve only (prev, curr) word pairs, so every
    chunk not touching the edited word survives verbatim."""
    words = [f"w{i * 13 % 211}" for i in range(600)]
    orig = " ".join(words)
    edited_words = list(words)
    edited_words[300] = "EDITED"
    edited = " ".join(edited_words)
    chunks = _spark_chunks(spark, {1: orig, 2: edited})
    from collections import Counter

    diff = Counter(chunks[1])
    diff.subtract(Counter(chunks[2]))
    # at most 3 original chunks lost and 3 new chunks gained (the chunk
    # containing the word plus a possible merge/split on each side)
    lost = sum(v for v in diff.values() if v > 0)
    gained = sum(-v for v in diff.values() if v < 0)
    assert lost <= 3 and gained <= 3, (lost, gained)
    # and the overwhelming majority of chunks are shared
    shared = sum((Counter(chunks[1]) & Counter(chunks[2])).values())
    assert shared >= len(chunks[1]) - 3


# ------------------------------------------------------------- MAD anomalies
def test_mad_matches_bruteforce_pandas(spark, sf_dir):
    out = (
        REGISTRY["events_anomaly_mad"].builder(spark, sf_dir).toPandas()
        .set_index("event_type")
    )
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    ev["v"] = (ev["value"] * 100).round().astype("int64")  # cents, like DECIMAL(12,2)

    def lower_median(s: pd.Series) -> int:
        s = s.sort_values().reset_index(drop=True)
        n = len(s)
        # smallest value whose cumulative count reaches half the group
        return int(s.iloc[(n - 1) // 2]) if n % 2 == 1 else int(s.iloc[n // 2 - 1])

    for etype, grp in ev.groupby("event_type"):
        med = lower_median(grp["v"])
        dev = (grp["v"] - med).abs()
        mad = lower_median(dev)
        n_anom = int((dev > 5 * mad).sum())
        row = out.loc[etype]
        assert int(row["n"]) == len(grp)
        # query output is in original units (2-decimal doubles); the
        # brute force works in integer cents — round the *100 rescale
        assert round(row["med"] * 100) == med, (etype, row["med"], med)
        assert round(row["mad"] * 100) == mad, (etype, row["mad"], mad)
        assert int(row["n_anomalies"]) == n_anom, (etype, row["n_anomalies"], n_anom)


# ---------------------------------------------------------------- RFM totals
def test_rfm_segments_partition_all_customers(spark, sf_dir):
    out = REGISTRY["customer_rfm_segments"].builder(spark, sf_dir).toPandas()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    total_cents = orders.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
    ).collect()[0][0]
    assert out["n_customers"].sum() == n_cust
    assert out["total_monetary_cents"].sum() == total_cents
    assert set(out["segment"]).issubset(
        {f"R{r}F{f}M{m}" for r in "123" for f in "123" for m in "123"}
    )


# ------------------------------------------------------------------- Pareto
def test_pareto_thresholds_are_monotone_and_cover(spark, sf_dir):
    out = (
        REGISTRY["orders_revenue_pareto"].builder(spark, sf_dir).toPandas()
        .sort_values("pct").reset_index(drop=True)
    )
    assert list(out["pct"]) == [50, 80, 90, 95, 99]
    assert out["n_customers"].is_monotonic_increasing
    assert out["revenue_cents"].is_monotonic_increasing
    # each threshold is actually covered, and minimally so (removing the
    # marginal customer's revenue would drop below the threshold is hard
    # to assert without the per-customer frame; covered-ness is the
    # contract)
    for _, row in out.iterrows():
        assert row["revenue_pct"] >= row["pct"]
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert out["n_customers"].iloc[-1] <= n_cust


# ----------------------------------------------------------- diverse sample
def test_diverse_sample_one_per_bucket_and_argmax(spark, sf_dir):
    out = REGISTRY["sample_diverse_lsh"].builder(spark, sf_dir).toPandas()
    assert out["bucket"].is_unique
    assert out["bucket"].between(0, 255).all()
    # re-derive: every selected doc is the longest (ties: lowest id) in
    # its bucket, via an independent row_number computation
    from ftm_datalake_spark.operators import dedup as D
    from ftm_datalake_spark.operators import textops as TX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = (
        D.simhash(docs)
        .join(docs.select("doc_id", TX.token_count(F.col("text")).alias("nt")), "doc_id")
        .select(F.shiftright("simhash", 24).alias("bucket"), "doc_id", "nt")
        .toPandas()
    )
    best = (
        scored.sort_values(["bucket", "nt", "doc_id"], ascending=[True, False, True])
        .groupby("bucket").first().reset_index()
    )
    merged = out.merge(best, on="bucket")
    assert (merged["doc_id_x"] == merged["doc_id_y"]).all()
    assert (merged["n_tokens"] == merged["nt"]).all()


# ---------------------------------------------------------- moments sketch
def test_moments_sketch_merge_equals_direct(spark, sf_dir):
    """Mergeability: partial sketches on a finer key, merged up, must be
    ROW-IDENTICAL to sketching the coarse key directly — the property
    that makes the sketch safe for per-shard/per-day fan-in at scale."""
    from ftm_datalake_spark.operators.sketches import (
        moments_merge,
        moments_partials,
    )

    li = load_table(spark, sf_dir, "lineitem")
    direct = moments_partials(li, F.col("l_extendedprice"), ["l_returnflag"])
    fine = moments_partials(
        li, F.col("l_extendedprice"), ["l_returnflag", "l_linenumber"]
    ).drop("l_linenumber")
    merged = moments_merge(fine, ["l_returnflag"])
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0


def test_moments_sketch_estimates_sane(spark, sf_dir):
    """The normal-approximation estimates stay inside [min, max], are
    monotone p50 <= p90 <= p99, and land near the exact quantiles for
    the (roughly uniform) price distribution."""
    from ftm_datalake_spark.operators.sketches import (
        moments_estimates,
        moments_partials,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sk = moments_estimates(
        moments_partials(li, F.col("l_extendedprice"), ["l_returnflag"])
    )
    exact = {
        r["l_returnflag"]: r["q"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.9)").alias("q"))
        .collect()
    }
    rows = sk.collect()
    assert rows
    for r in rows:
        assert r["min_value"] <= r["est_p50"] <= r["est_p90"] <= r["est_p99"] <= r["max_value"]
        # price ~ uniform-ish: mean+1.28σ should be within 15% of true p90
        assert abs(r["est_p90"] - exact[r["l_returnflag"]]) / exact[r["l_returnflag"]] < 0.15


# ------------------------------------------------- weighted A-ES hash race
def test_weighted_hashrace_matches_bruteforce(spark):
    """The winner set must equal a hashlib brute force of the same race
    (md5-prefix of the id floor-divided by the weight, top-k) — pinning
    the exact key construction the oracle relies on."""
    import hashlib

    from ftm_datalake_spark.operators.training import weighted_sample_hashrace

    rows = [(i, (i * 7) % 9 + 1) for i in range(200)]  # (id, weight 1..9)
    df = spark.createDataFrame(rows, "item_id long, w long")
    got = [
        (r["item_id"], r["race_key"])
        for r in weighted_sample_hashrace(
            df, F.col("w"), k=25, id_cols=["item_id"]
        ).collect()
    ]

    def race(i, w):
        return int(hashlib.md5(f"{i}".encode()).hexdigest()[:8], 16) // w

    want = sorted(
        ((i, race(i, w)) for i, w in rows), key=lambda t: (t[1], t[0])
    )[:25]
    assert got == want


def test_weighted_hashrace_favors_heavy_items(spark):
    """Weight monotonicity: with weights 1 vs 64 split half/half, the
    heavy half must dominate the winner set (fixed hashes -> this is a
    deterministic assertion, not a flaky statistical one)."""
    from ftm_datalake_spark.operators.training import weighted_sample_hashrace

    rows = [(i, 64 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "item_id long, w long")
    sel = weighted_sample_hashrace(df, F.col("w"), k=100, id_cols=["item_id"])
    heavy = sel.where(F.col("wt") == 64).count()
    assert heavy >= 90  # E[heavy] ~ 98 of 100; 90 leaves slack


# --------------------------------------------------- HLL register rollup
def test_hll_weekly_registers_merge_equals_direct(spark, sf_dir):
    """Tiered-rollup property: weekly registers obtained by re-maxing the
    daily registers must equal registers built directly from raw events
    at week grain — max(max per day) == max per week."""
    from ftm_datalake_spark.operators.sketches import hll_registers_by
    from ftm_datalake_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        F.col("user_id").alias("key"),
    )
    daily = hll_registers_by(base, ["week", "day"])
    merged = daily.groupBy("week", "bucket").agg(F.max("r").alias("r"))
    direct = hll_registers_by(base.drop("day"), "week")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_stickiness_tracks_exact(spark, sf_dir):
    """The sketch stickiness should land near the exact one (64 buckets
    -> ~13% rsd; assert within 40% relative on every day)."""
    from ftm_datalake_spark.plans import REGISTRY

    sk = {
        (r["week"], r["day"]): r["day_stickiness"]
        for r in REGISTRY["events_dau_stickiness_hll"].builder(spark, sf_dir).collect()
    }
    from ftm_datalake_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    ).distinct()
    dau = du.groupBy("week", "day").agg(F.count("*").alias("dau"))
    wau = du.select("week", "user_id").distinct().groupBy("week").agg(
        F.count("*").alias("wau")
    )
    exact = {
        (r["week"], r["day"]): r["dau"] / r["wau"]
        for r in dau.join(wau, "week").collect()
    }
    assert set(sk) == set(exact)
    for k, v in exact.items():
        assert abs(sk[k] - v) / v < 0.40, (k, sk[k], v)


def test_weighted_per_group_caps_and_favors_heavy(spark):
    """Per-group A-ES: exactly k winners per group (when the group has
    >=k items) and heavy items dominate within each group."""
    from ftm_datalake_spark.operators.training import weighted_sample_per_group

    rows = [(g * 1000 + i, f"g{g}", 64 if i < 250 else 1)
            for g in range(3) for i in range(500)]
    df = spark.createDataFrame(rows, "item_id long, grp string, w long")
    sel = weighted_sample_per_group(
        df, F.col("w"), k=50, id_cols=["item_id"], group_cols=["grp"]
    )
    per = {r["grp"]: r["n"] for r in sel.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 50, "g1": 50, "g2": 50}
    heavy = sel.where(F.col("wt") == 64).count()
    assert heavy >= 135  # E ~ 147/150; deterministic given fixed hashes
