#!/usr/bin/env python
"""sf0.1 → sf1.0 scale probe for the data-bound bench headliners
(VERDICT r4 item 9).

The driver ships sf{0.001,0.01,0.1} only, so the sf1.0 input is
generated HERE, locally, by 10× replication of sf0.1 with shifted
entity keys — lineitem orderkeys shift per copy (entity count scales
10×, per-entity fanout constant, the TPC-H scaling law) and documents
get shifted doc_ids plus a per-copy suffix token (so copies are not
exact duplicates of each other and the dedup/ER workloads keep their
within-copy duplicate structure instead of becoming 10-way global
clones). Dimension dictionaries (partkey/suppkey vocab) stay fixed —
the probe scales rows and entities, not dimension cardinality; noted
in SCALING.md.

Usage: python scripts/scale_probe.py [out_json]
Writes one JSON line with per-query best-of-3 seconds at both scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADLINERS = [
    "q1_pricing_summary",
    "statement_aggregation_wide",
    "dedup_minhash_lsh",
    "dedup_common_segments",
    "er_blocked_matches",
    # round-6 eval family: the two order-dependent ones (two-phase
    # global cumsum over per-distinct-score tallies)
    "eval_auc_quality",
    "eval_lift_deciles",
    # round-6 late ops: per-shard epoch packing (window by pos) and the
    # top-K vocab broadcast join
    "corpus_epoch_packing",
    # round-8: the scale-honest 32-shard packing variant (the 4-shard
    # demo's 2.77x decade ratio was per-task window state, not plan
    # shape — n_shards >= parallelism is the 100 TB configuration)
    "corpus_epoch_packing_wide",
    "text_vocab_oov_rate",
    # round-6 iterative family: Pregel-on-relational loops (fixed node
    # set, 10× edge-derivation rows) and the one-pass-per-step
    # matrix-free power iteration over 10× embeddings
    "graph_weighted_sssp",
    "graph_kcore_trade",
    "embedding_pca_power",
    "er_golden_record",
    # round-9: Pregel-shaped LPA (fixed node set, 10× edge-derivation
    # rows), the broadcast-model scoring pass, and the per-source
    # boilerplate audit (two hash-aggs over 10× segments). The
    # semdedup/semantic-pairs family is deliberately NOT probed at a
    # FIXED k: within-cluster pair count is quadratic per cluster, and
    # SemDeDup's scale contract is k ∝ N (more clusters, not bigger
    # ones) — the probe's 10×-rows-same-k generator would measure a
    # shape the operator never runs at.
    "graph_label_propagation",
    "clf_token_vote_predict",
    "boilerplate_by_source",
    # round-10 second wave: DSIR is one corpus-scale agg behind a
    # 512-row broadcast LM (expect ~linear); TWAP is a per-user window
    # over 10× history (expect ~linear). er_meta_blocking_wep is
    # probed too but read its ratio knowingly: under 10× replication
    # every shingle's df multiplies ~10×, so the [2,20] purge removes
    # almost all blocks and the decade run degenerates to the postings
    # scan + df agg — a SUB-linear ratio here is the hot-block guard
    # doing its job, not a free lunch.
    "sample_dsir_weights",
    "events_time_weighted_value",
    "er_meta_blocking_wep",
]
COPIES = 10
PROBE_DIR = "/tmp/sfprobe/sf1.0"


def generate(spark, src_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(PROBE_DIR, exist_ok=True)
    li = spark.read.parquet(os.path.join(src_dir, "lineitem.parquet"))
    parts = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(c * 10_000_000)
        )
        for c in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, "lineitem.parquet"))

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    dparts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 1_000_000))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(f" copymarker{c:02d}")),
        )
        for c in range(COPIES)
    ]
    dout = dparts[0]
    for p in dparts[1:]:
        dout = dout.unionByName(p)
    dout.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "documents.parquet")
    )

    # orders scales WITH lineitem (shifted o_orderkey keeps the 1:n
    # lineitem join intact per copy; o_custkey fixed — same customer
    # dictionary, 10× orders per customer), so the graph ops' edge
    # derivation sees 10× join rows over the same node set.
    orders = spark.read.parquet(os.path.join(src_dir, "orders.parquet"))
    oparts = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(c * 10_000_000)
        )
        for c in range(COPIES)
    ]
    oout = oparts[0]
    for p in oparts[1:]:
        oout = oout.unionByName(p)
    oout.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "orders.parquet")
    )

    # embeddings: 10× corpus with shifted vec_ids (vec_id 0 stays the
    # designated query vector in copy 0 only — top-k probes keep one
    # query against a 10× corpus, the realistic growth axis).
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * 1_000_000))
        for c in range(COPIES)
    ]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "embeddings.parquet")
    )

    # events: 10× per-user history (fixed user set, each copy's rows
    # nudged +c seconds so the TWAP lead() window sees real gaps, not
    # a wall of exact-ts ties) — the realistic growth axis for the
    # user-keyed window family.
    from ftm_datalake_spark.sources.tables import load_table

    ev = load_table(spark, src_dir, "events")
    vparts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(c * 100_000_000))
        .withColumn("ts", F.timestamp_add("SECOND", F.lit(c), F.col("ts")))
        for c in range(COPIES)
    ]
    vout = vparts[0]
    for p in vparts[1:]:
        vout = vout.unionByName(p)
    vout.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "events.parquet")
    )

    # fixed dimension dictionaries the probed queries join against
    for dim in ("customer", "supplier"):
        spark.read.parquet(os.path.join(src_dir, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(PROBE_DIR, f"{dim}.parquet"))


def _canary(spark) -> float:
    """Host-speed reading: the same data-independent hash-agg bench.py
    uses (one shuffle, no I/O), so probe and bench canaries are
    directly comparable."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 100_000_000, 1, 32)
        .groupBy((F.col("id") % 4096).alias("k"))
        .agg(F.sum(F.hash("id").cast("long")).alias("s"))
        .write.format("noop").mode("overwrite").save()
    )
    return round(time.perf_counter() - t0, 3)


def _robust_sec(samples: list[float]) -> float:
    """Median after outlier rejection: drop samples > 2.5x the block
    minimum (the shared host shows multi-second CPU-starvation bursts
    that a plain median still absorbs at n=3), then take the median of
    the survivors — VERDICT r12 next-round #4's replacement for
    min-of-3, which could equally pick a suspiciously fast window."""
    keep = sorted(s for s in samples if s <= 2.5 * min(samples))
    mid = len(keep) // 2
    return keep[mid] if len(keep) % 2 else round(
        (keep[mid - 1] + keep[mid]) / 2, 3
    )


def _release_cached(spark) -> None:
    """Unpersist every pinned RDD block (eager localCheckpoints from
    the just-timed builder). Several headliners checkpoint eagerly
    inside their builders; in a shared probe session those blocks
    accumulate across queries and BLOCKS, squeezing unified memory
    until the largest ObjectHashAggregate starts spilling — measured
    r13: statement_aggregation_wide 36-69 s in-probe vs 3.5-4.6 s
    standalone, canaries normal throughout (so not tenancy). Each
    query must be timed against a clean storage pool, like its
    standalone re-measure."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):  # py4j MapConverter: dict-like view
        jrdd.unpersist()


def time_queries(spark, sf_dir: str) -> dict:
    """Per-query robust seconds with INTERLEAVED canaries (VERDICT r12
    next-round #4, the bench.py hardening applied here): a host-speed
    reading before each query and one after the block, so every
    measurement normalizes by its nearest canary window and a tenancy
    outlier or fast window cannot print a fake decade ratio."""
    from ftm_datalake_spark.plans import REGISTRY

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    canaries: list[float] = [min(_canary(spark), _canary(spark))]
    for name in HEADLINERS:
        builder = REGISTRY[name].builder
        _release_cached(spark)  # clean storage pool per query
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for attempt in range(5):
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            _release_cached(spark)  # drop this run's eager checkpoints
            # 3 clean samples suffice; keep sampling only while the
            # spread says the host was bursty during this block
            if attempt >= 2 and max(samples) <= 2.0 * min(samples):
                break
        timings[name] = _robust_sec(samples)
        spreads[name] = samples
        canaries.append(_canary(spark))
        print(f"{sf_dir} {name}: {timings[name]} {samples}", flush=True)
    # per-query normalization by the nearest canary window (the
    # reading before and after the query), like bench.py's
    normalized = {}
    for idx, name in enumerate(HEADLINERS):
        nearest = min(canaries[idx], canaries[idx + 1])
        if nearest:
            normalized[name] = round(timings[name] / nearest, 3)
    drift = (
        round(max(canaries) / min(canaries), 3) if min(canaries) else None
    )
    return {
        "sec": timings,
        "sec_normalized": normalized,
        "samples": spreads,
        "canaries": canaries,
        "canary_drift_ratio": drift,
    }


def probe_incremental_fold(spark, src_dir: str) -> dict:
    """VERDICT r8 #4: time a FIXED-size delta folded into exports built
    from 1× and 10× corpora. The O(|Δ|) claim predicts a decade ratio
    near 1 — the fold reads the delta, the ledgers' id/hash columns,
    and the affected shards only, never the corpus text. Two distinct
    deltas per scale (a re-fold of the same delta is the no-op replay
    path, not a fold), min of the two."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    cfg = dict(seq_len=512, n_shards=32, seed="probe", quality_gate=False)

    def fixed_delta(tag: str, n: int = 200):
        return spark.range(n).select(
            (F.col("id") + 900_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"pr{tag}w{j}x"), F.col("id").cast("string"))
                    for j in range(24)
                ],
            ).alias("text"),
        )

    out: dict = {}
    for scale, docs_path in (
        ("sf0.1", os.path.join(src_dir, "documents.parquet")),
        ("sf1.0", os.path.join(PROBE_DIR, "documents.parquet")),
    ):
        exp = os.path.join("/tmp/sfprobe", f"export_{scale.replace('.', '')}")
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        if not os.path.exists(os.path.join(exp, "manifest.json")):
            t0 = time.perf_counter()
            export_training(spark, docs, exp, **cfg)
            print(f"{scale} export build: {round(time.perf_counter()-t0,1)}s",
                  flush=True)
        samples = []
        for tag in ("a", "b"):
            delta = fixed_delta(scale.replace(".", "") + tag)
            t0 = time.perf_counter()
            export_training_incremental(spark, delta, exp)
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = min(samples)
        print(f"{scale} fold(|delta|=200): {min(samples)} {samples}", flush=True)
    out["ratio"] = round(out["sf1.0"] / out["sf0.1"], 2)
    return out


def probe_ivf_lifecycle(spark, src_dir: str) -> dict:
    """VERDICT r8 #4: IVF append and probe at 1× and 10× corpus, with
    nlist scaled by √10 alongside (the canonical FAISS sizing rule,
    nlist ∝ √N — it balances the append's two sub-costs: coarse
    assignment is O(|Δ|·nlist) compute while the anti-join/probe I/O is
    O(touched · N/nlist), so √N growth puts a √decade bound on each).
    Fixed 50-vector delta, fixed 5-query probe; decade ratios well
    under the naive 10× demonstrate appends and probes scale with the
    delta/probe, not the corpus."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_topk,
    )
    from ftm_datalake_spark.operators.similarity import ivf_centroids

    out: dict = {}
    for scale, emb_path, nlist in (
        ("sf0.1", os.path.join(src_dir, "embeddings.parquet"), 64),
        ("sf1.0", os.path.join(PROBE_DIR, "embeddings.parquet"), 202),
    ):
        emb = spark.read.parquet(emb_path)
        idx = os.path.join(
            "/tmp/sfprobe", f"ivf_{scale.replace('.', '')}"
        )
        if not os.path.exists(os.path.join(idx, "index_meta.json")):
            cents = ivf_centroids(
                emb.withColumn("label", F.col("vec_id") % nlist), "label"
            )
            t0 = time.perf_counter()
            build_ivf_index(spark, emb, idx, centroids=cents)
            print(f"{scale} ivf build (nlist={nlist}): "
                  f"{round(time.perf_counter()-t0,1)}s", flush=True)

        append_times, probe_times = [], []
        for shift in (800_000_000, 810_000_000):
            delta = emb.limit(50).withColumn(
                "vec_id", F.col("vec_id") + F.lit(shift)
            )
            t0 = time.perf_counter()
            append_ivf_index(spark, delta, idx)
            append_times.append(round(time.perf_counter() - t0, 3))
        queries = emb.limit(5)
        for _ in range(3):
            t0 = time.perf_counter()
            ivf_index_topk(spark, idx, queries, k=3, nprobe=1).write.format(
                "noop"
            ).mode("overwrite").save()
            probe_times.append(round(time.perf_counter() - t0, 3))
        out[scale] = {
            "append_50": min(append_times),
            "probe_5q": min(probe_times),
            "nlist": nlist,
        }
        print(f"{scale} ivf append {append_times} probe {probe_times}",
              flush=True)
    out["append_ratio"] = round(
        out["sf1.0"]["append_50"] / out["sf0.1"]["append_50"], 2
    )
    out["probe_ratio"] = round(
        out["sf1.0"]["probe_5q"] / out["sf0.1"]["probe_5q"], 2
    )
    return out


def probe_classifier_append(spark, src_dir: str) -> dict:
    """Round-9 O(|delta|) claim for the persisted classifier model
    (pipelines/classifier_store.py): a FIXED 200-doc delta appended to
    models built from 1× and 10× corpora. The append scans only the
    delta and writes one gen partition, so the decade ratio should be
    ~1. Two distinct deltas per scale (same-delta re-delivery is the
    no-op path), min of the two."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.pipelines.classifier_store import (
        append_classifier_model,
        build_classifier_model,
    )

    def fixed_delta(tag: str, n: int = 200):
        return spark.range(n).select(
            (F.col("id") + 950_000_000).alias("doc_id"),
            (F.col("id") % 5).cast("string").alias("lang"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"cl{tag}w{j}x"), F.col("id").cast("string"))
                    for j in range(24)
                ],
            ).alias("text"),
        )

    out: dict = {}
    for scale, docs_path in (
        ("sf0.1", os.path.join(src_dir, "documents.parquet")),
        ("sf1.0", os.path.join(PROBE_DIR, "documents.parquet")),
    ):
        model_dir = os.path.join(
            "/tmp/sfprobe", f"clf_{scale.replace('.', '')}"
        )
        docs = spark.read.parquet(docs_path)
        if not os.path.exists(os.path.join(model_dir, "tokledger")):
            t0 = time.perf_counter()
            build_classifier_model(spark, docs, model_dir)
            print(f"{scale} clf build: {round(time.perf_counter()-t0,1)}s",
                  flush=True)
        samples = []
        for tag in ("a", "b"):
            delta = fixed_delta(scale.replace(".", "") + tag)
            t0 = time.perf_counter()
            append_classifier_model(spark, delta, model_dir)
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = min(samples)
        print(f"{scale} clf append(|delta|=200): {min(samples)} {samples}",
              flush=True)
    out["ratio"] = round(out["sf1.0"] / out["sf0.1"], 2)
    return out


def probe_winnow_capped_skew(spark) -> dict:
    """VERDICT r9 next-round #2: one synthetic boilerplate run planted
    in 20% of docs, corpus sizes a decade apart. The CAPPED pair join
    drops the hot fingerprints before the self-join, so its runtime
    must track corpus size (~linear; ratio well under the quadratic
    ~100× the uncapped collision group implies). The uncapped join is
    timed at the SMALL scale only — its hot group is already C(n/5, 2)
    pairs per hot hash, and the decade would be 100× that (measured
    once as evidence, not worth re-measuring at 10×). Fingerprinting
    cost is excluded (eager checkpoint) — the probe targets the join."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.winnow import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    out: dict = {}
    fps_by_scale = {}
    for scale, n in (("n5k", 5_000), ("n50k", 50_000)):
        tail = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), F.col("id").cast("string"))
                for j in range(12)
            ],
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 5 == 0, F.concat(F.lit(boiler + " "), tail)
            )
            .otherwise(tail)
            .alias("text"),
        )
        fps_by_scale[scale] = winnow_fingerprints(docs).localCheckpoint(
            eager=True
        )
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            winnow_candidate_pairs(
                fps_by_scale[scale], min_shared=1, max_df=100
            ).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = {"capped_sec": min(samples), "hot_docs": n // 5}
        print(f"winnow capped {scale}: {min(samples)} {samples}", flush=True)
    t0 = time.perf_counter()
    uncapped_pairs = winnow_candidate_pairs(
        fps_by_scale["n5k"], min_shared=1
    ).count()
    out["n5k"]["uncapped_sec"] = round(time.perf_counter() - t0, 3)
    out["n5k"]["uncapped_pairs"] = uncapped_pairs
    out["capped_ratio"] = round(
        out["n50k"]["capped_sec"] / out["n5k"]["capped_sec"], 2
    )
    print(
        f"winnow uncapped n5k: {out['n5k']['uncapped_sec']}s "
        f"({uncapped_pairs} pairs); capped decade ratio "
        f"{out['capped_ratio']}",
        flush=True,
    )
    return out


def probe_statement_skew(spark) -> dict:
    """VERDICT r11 next-round #4: the flagship statement aggregation
    under planted celebrity skew — ONE entity owns 20% of all
    statements (4 props, distinct values: the collect_set worst case),
    corpus sizes a decade apart. A single-key set union cannot be split
    by AQE, so the unsalted plan funnels the hot key through one
    reducer — visible as wild sample variance, not just a slow minimum.
    The salted two-phase form (aggregate_statements salt_buckets=32)
    bounds per-reducer fan-in at 1/32 of the hot key and must show
    (a) a skew decade ratio < 2× the uniform one and (b) a collapsed
    spread. Both modes are bit-identical (law in
    tests/test_round12_ops.py; registry twin statement_aggregation_salted
    shares the flagship's DuckDB oracle)."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.statements import aggregate_statements

    def gen(n: int, skew: bool):
        df = spark.range(n).select(
            F.when(F.lit(skew) & (F.col("id") % 5 == 0), F.lit("celebrity"))
            .otherwise(
                F.concat(
                    F.lit("e"), (F.col("id") % (n // 50)).cast("string")
                )
            )
            .alias("canonical_id"),
            F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias(
                "prop"
            ),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
            F.concat(F.lit("ds"), (F.col("id") % 7).cast("string")).alias(
                "dataset"
            ),
            F.lit("Person").alias("schema"),
        )
        return df.localCheckpoint(eager=True)

    out: dict = {}
    for label, n in (("n1M", 1_000_000), ("n10M", 10_000_000)):
        row: dict = {}
        for mode, salt in (("unsalted", None), ("salted32", 32)):
            for kind in ("uniform", "skew"):
                df = gen(n, kind == "skew")
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    aggregate_statements(
                        df, salt_buckets=salt
                    ).write.format("noop").mode("overwrite").save()
                    samples.append(round(time.perf_counter() - t0, 2))
                row[f"{mode}_{kind}"] = {
                    "min": min(samples),
                    "max": max(samples),
                }
                df.unpersist()
                print(
                    f"stmt skew {label} {mode} {kind}: {samples}", flush=True
                )
        out[label] = row
    out["salted_skew_decade_ratio"] = round(
        out["n10M"]["salted32_skew"]["min"]
        / out["n1M"]["salted32_skew"]["min"],
        2,
    )
    out["unsalted_skew_decade_ratio"] = round(
        out["n10M"]["unsalted_skew"]["min"]
        / out["n1M"]["unsalted_skew"]["min"],
        2,
    )
    return out


def probe_random_projection(spark, src_dir: str) -> dict:
    """Full-corpus JL projection at 1× and 10× embeddings. The sign
    matrix is a plan constant and every coordinate is a per-row fold,
    so the decade ratio must track the scan (~linear, no shuffle term).
    The registry query caps at vec_id < 50 for the oracle; this probe
    drops the cap to measure the operator itself."""
    from ftm_datalake_spark.operators.randproj import random_project

    out: dict = {}
    for scale, path in (
        ("sf0.1", os.path.join(src_dir, "embeddings.parquet")),
        ("sf1.0", os.path.join(PROBE_DIR, "embeddings.parquet")),
    ):
        emb = spark.read.parquet(path)
        proj = random_project(emb, d=64, k=16)
        proj.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            random_project(emb, d=64, k=16).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = min(samples)
        print(f"{scale} jl_project_full: {min(samples)} {samples}",
              flush=True)
    out["ratio"] = round(out["sf1.0"] / out["sf0.1"], 2)
    return out




def probe_skyline_3d(spark) -> dict:
    """Round-11 3-D skyline decade check on synthetic quantized data
    (the registry query's `part` input is a fixed dimension dictionary
    that the sf1.0 generator deliberately does not scale, so this
    probe makes its own 10x pair). All post-collapse work runs on the
    candidate frame, so the decade ratio must track the first hash agg
    (~linear)."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.skyline import skyline_3d

    out: dict = {}
    for scale, n in (("n100k", 100_000), ("n1m", 1_000_000)):
        df = spark.range(n).select(
            (F.xxhash64("id") % 50).alias("a"),
            (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
            (F.xxhash64("id", F.lit(2)) % 1000).alias("c"),
        ).localCheckpoint(eager=True)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            skyline_3d(df, "a", "b", "c").write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = min(samples)
        print(f"skyline_3d {scale}: {min(samples)} {samples}", flush=True)
    out["ratio"] = round(out["n1m"] / out["n100k"], 2)
    return out


def probe_skyline_4d(spark) -> dict:
    """Round-12 k-D skyline decade check, same design as the 3-D probe:
    synthetic quantized dims, 10x pair. The post-collapse work (prune
    sweep + bounded BNLJ anti-join) runs on the candidate frame, so
    the decade ratio must track the collapse hash agg (~linear)."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.skyline import skyline_kd

    out: dict = {}
    for scale, n in (("n100k", 100_000), ("n1m", 1_000_000)):
        df = spark.range(n).select(
            (F.xxhash64("id") % 50).alias("a"),
            (F.xxhash64("id", F.lit(1)) % 200).alias("b"),
            (F.xxhash64("id", F.lit(2)) % 40).alias("c"),
            (F.xxhash64("id", F.lit(3)) % 1000).alias("d"),
        ).localCheckpoint(eager=True)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            skyline_kd(df, ["a"], ["b", "c", "d"]).write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[scale] = min(samples)
        print(f"skyline_4d {scale}: {min(samples)} {samples}", flush=True)
    out["ratio"] = round(out["n1m"] / out["n100k"], 2)
    return out


def probe_partitioned_cdc(spark, src_dir: str) -> dict:
    """Round-11 partition-level CDC replace: a FIXED 60-row change feed
    drained onto snapshots built from the 1x and 10x documents corpora,
    with n_buckets scaled with the corpus (constant bucket size - the
    100 TB configuration). The batch rewrites only the touched buckets,
    so the decade ratio must be ~flat; the full-rewrite swap form is
    timed at both scales for contrast (expect ~corpus-linear)."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from ftm_datalake_spark.streaming.cdc import (
        init_partitioned_snapshot,
        run_cdc_upsert_stream,
        run_cdc_upsert_stream_partitioned,
    )

    def feed_dir(tag: str, keys) -> str:
        d = f"/tmp/sfprobe/cdcfeed_{tag}"
        _sh.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        with open(os.path.join(d, "b1.json"), "w") as fh:
            for i, k in enumerate(keys):
                fh.write(json.dumps({
                    "doc_id": k, "seq": 1,
                    "op": "U" if i % 3 else "I", "text": f"upd-{k}",
                }) + "\n")
        return d

    out: dict = {}
    for scale, path, nb in (
        ("sf0.1", os.path.join(src_dir, "documents.parquet"), 64),
        ("sf1.0", os.path.join(PROBE_DIR, "documents.parquet"), 640),
    ):
        docs = spark.read.parquet(path).select("doc_id", "text")
        keys = [r["doc_id"] for r in docs.limit(40).collect()]
        keys += [990_000_000 + i for i in range(20)]  # inserts
        tag = scale.replace(".", "")
        part_snap = f"/tmp/sfprobe/cdc_part_{tag}"
        _sh.rmtree(part_snap, ignore_errors=True)
        init_partitioned_snapshot(docs, part_snap, ["doc_id"], n_buckets=nb)
        feed = feed_dir(tag + "p", keys)
        schema = "doc_id long, seq long, op string, text string"
        t0 = time.perf_counter()
        q = run_cdc_upsert_stream_partitioned(
            spark.readStream.schema(schema).json(feed),
            part_snap, f"/tmp/sfprobe/cdc_ckpt_{tag}p", ["doc_id"],
            n_buckets=nb,
        )
        q.awaitTermination(600)
        part_sec = round(time.perf_counter() - t0, 3)

        full_snap = f"/tmp/sfprobe/cdc_full_{tag}"
        _sh.rmtree(full_snap, ignore_errors=True)
        docs.write.parquet(full_snap)
        feed2 = feed_dir(tag + "f", keys)
        t0 = time.perf_counter()
        q = run_cdc_upsert_stream(
            spark.readStream.schema(schema).json(feed2),
            full_snap, f"/tmp/sfprobe/cdc_ckpt_{tag}f", ["doc_id"],
        )
        q.awaitTermination(600)
        full_sec = round(time.perf_counter() - t0, 3)
        out[scale] = {"partitioned_sec": part_sec, "full_swap_sec": full_sec,
                      "n_buckets": nb}
        print(f"{scale} cdc(|delta|=60): partitioned {part_sec}s "
              f"full-swap {full_sec}s", flush=True)
    out["partitioned_ratio"] = round(
        out["sf1.0"]["partitioned_sec"] / out["sf0.1"]["partitioned_sec"], 2
    )
    out["full_swap_ratio"] = round(
        out["sf1.0"]["full_swap_sec"] / out["sf0.1"]["full_swap_sec"], 2
    )
    return out


def main() -> None:
    from ftm_datalake_spark.session import build_session

    spark = build_session(
        app_name="scale-probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.exists(os.path.join(PROBE_DIR, "lineitem.parquet")):
        generate(spark, src)
    blk01 = time_queries(spark, src)
    # fresh SparkContext (storage pool reset) for the decade block: the
    # sf0.1 block's pinned blocks must not leak into the sf1.0 timings
    # (the other half of the r13 in-probe-vs-standalone contradiction
    # fix). NOTE this is NOT a fresh JVM — spark.stop() + build_session
    # in local mode reuses the same driver JVM through the persistent
    # py4j gateway, so heap fragmentation carries over and a new
    # spark.driver.memory conf would be inert; only the SparkContext
    # (block manager / storage pool) is actually fresh (ADVICE r13 #5).
    spark.stop()
    spark = build_session(
        app_name="scale-probe-sf10",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    blk10 = time_queries(spark, PROBE_DIR)
    sf01, sf10 = blk01["sec"], blk10["sec"]
    n01, n10 = blk01["sec_normalized"], blk10["sec_normalized"]
    # DEMO-config queries (VERDICT r11 next-round #6): shapes whose
    # registry parameters are sized for oracle-readable demos, not the
    # 100 TB configuration — their decade ratios measure the demo
    # sizing, so they are reported separately from the headline table.
    # corpus_epoch_packing packs into 4 shards (per-task window state
    # grows with corpus/4); corpus_epoch_packing_wide (32 shards,
    # n_shards >= parallelism) is the production configuration and
    # stays headline.
    demo = {"corpus_epoch_packing"}
    payload = {
        "sf0.1": sf01,
        "sf1.0": sf10,
        # headline decade ratios are CANARY-NORMALIZED (each query's
        # robust median divided by its nearest host-speed reading in
        # its own block), so host drift between the two blocks cannot
        # masquerade as super/sub-linear scaling; `ratio_raw` keeps
        # the unnormalized view for transparency
        "ratio": {
            k: round(n10[k] / n01[k], 2)
            for k in n01
            if k not in demo and k in n10
        },
        "ratio_raw": {
            k: round(sf10[k] / sf01[k], 2) for k in sf01 if k not in demo
        },
        "ratio_demo": {
            k: round(n10[k] / n01[k], 2)
            for k in n01
            if k in demo and k in n10
        },
        "canaries_sf0.1": blk01["canaries"],
        "canaries_sf1.0": blk10["canaries"],
        "canary_drift_ratio_sf0.1": blk01["canary_drift_ratio"],
        "canary_drift_ratio_sf1.0": blk10["canary_drift_ratio"],
        "samples_sf0.1": blk01["samples"],
        "samples_sf1.0": blk10["samples"],
        "ratio_demo_note": (
            "demo-sized configs (4-shard packing); the wide variants in "
            "`ratio` are the 100 TB configurations"
        ),
        # round-9: O(|delta|) lifecycle claims, timed (VERDICT r8 #4)
        "incremental_fold_200docs": probe_incremental_fold(spark, src),
        "ivf_lifecycle": probe_ivf_lifecycle(spark, src),
        "classifier_append_200docs": probe_classifier_append(spark, src),
        # round-10: the df-capped winnow pair join under planted skew
        "winnow_capped_skew": probe_winnow_capped_skew(spark),
        # round-10 second wave: shuffle-free JL over the full corpus
        "jl_projection_full": probe_random_projection(spark, src),
        # round-11: candidate-frame skyline + O(touched-buckets) CDC
        "skyline_3d_synthetic": probe_skyline_3d(spark),
        "skyline_4d_synthetic": probe_skyline_4d(spark),
        "partitioned_cdc_60rows": probe_partitioned_cdc(spark, src),
        # round-12: the flagship under planted celebrity skew,
        # unsalted vs the salted two-phase set union
        "statement_skew": probe_statement_skew(spark),
    }
    line = json.dumps(payload)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
