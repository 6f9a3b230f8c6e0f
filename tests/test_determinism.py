"""Partitioning-independence sweep: the engine claims every operator is
deterministic under ANY physical partitioning (md5-based sampling, total
sort orders, two-phase ranks, mergeable sketches). Lock it in: build
representative queries under two different shuffle-partition settings
and require bit-identical results.

The picked set is the risky surface: global ranks/ntile, sampling,
sketches (fold order varies with partitioning), sequence packing,
epoch shards, dedup keepers (min-id under commutative agg), BPE
training (argmax over partial aggregations), k-means (driver-collected
iteration state), LSH bucketing."""

from __future__ import annotations

import pytest

RISKY = [
    "global_sort_topk",
    "ntile_customer_quartiles",
    "sample_stratified",
    "sample_reservoir_k",
    "sample_per_source_cap",
    "sequence_packing",
    "corpus_epoch_shards",
    "sketch_hll_distinct_users",
    "approx_distinct_users",
    # round-5 late ops: integer argmax / quantized-rational ranks /
    # bloom bit folds must not leak partitioning
    "events_changepoint_meanshift",
    "text_pmi_collocations",
    "er_fellegi_sunter_matches",
    "bloom_semi_join_revenue",
    "dq_skew_report_orders",
    "sketch_cms_heavy_hitters",
    "sketch_theta_set_ops",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_kmeans",
    "bpe_train_merges",
    "topk_per_group",
    # round-4 late compositions: tie rules + hash folds must not leak
    # partitioning
    "pit_labeled_examples",
    "changefeed_documents",
    "asof_next_purchase",
    "lm_surprisal_topdocs",
    # round-6 eval family: rank-statistic cumsums and decile splits run
    # on range-partitioned tallies — results must not leak partitioning
    "eval_auc_quality",
    "eval_lift_deciles",
    "eval_pr_threshold_sweep",
    # per-shard epoch packing (window by pos) and the top-K vocab
    # boundary (global sort+limit) must not leak partitioning
    "corpus_epoch_packing",
    "text_vocab_oov_rate",
    # round-6 iterative family: frontier loops fold mins/degrees across
    # rounds, power iteration folds 64 global sums per step, RRF fuses
    # two rank lists, survivorship picks max_by struct keys — all must
    # be partitioning-invariant
    "graph_weighted_sssp",
    "graph_kcore_trade",
    "embedding_pca_power",
    "search_hybrid_rrf",
    "er_golden_record",
    "events_holt_linear",
    # round-10: ladder min-struct pick over per-level aggregates,
    # distinct position folds, sorted referrer-set signatures, and the
    # df-capped pair join must not leak partitioning
    "privacy_generalization_ladder",
    "dedup_duplicate_span_coverage",
    "entities_xref_inverted",
    "dedup_winnowing_pairs_capped",
    # round-10 second wave: the DSIR top-100 boundary, the WEP
    # mean-threshold scalar, the skyline strict-min sweep, and the
    # TWAP lead() fold must not leak partitioning
    "sample_dsir_weights",
    "er_meta_blocking_wep",
    "part_skyline_dominance",
    "events_time_weighted_value",
    # JL's per-row folds and scenecut's per-media lag window are
    # partition-local by construction — lock it
    "embedding_random_projection",
    "multimodal_video_scenecut",
    # wave 4: the distributed-rank neighbor join must produce the same
    # pairs at any partitioning (range bounds differ, ranks must not);
    # the CCNet tertile cutoffs fold a cumsum over range-partitioned
    # score tallies
    "er_sorted_neighborhood",
    "quality_perplexity_buckets",
    # wave 5: the VAD run-pack (per-media lag + cumsum), the two-row
    # t-test fold, and the vocab rank window
    "multimodal_audio_vad",
    "eval_welch_ttest",
    "text_zipf_slope",
]


def _rows(spark, name, sf_dir, partitions):
    from ftm_datalake_spark.plans import REGISTRY

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = REGISTRY[name].builder(spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", RISKY)
def test_identical_under_different_partitioning(spark, sf_dir, name):
    a = _rows(spark, name, sf_dir, 5)
    b = _rows(spark, name, sf_dir, 32)
    assert a == b
