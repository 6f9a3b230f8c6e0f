"""Evidence-priority ordering for the query registry.

The driver's correctness gate samples a PREFIX of the registry (the
first ~50 queries in ``queries()`` dict order — verified empirically:
each round's CORRECTNESS sample is exactly the first 50 registry entries
of that round, and rounds with identical registries sampled identical
sets). Registration order is module-import order, which bears no
relation to which queries most need driver evidence.

This list reorders the registry so the prefix is spent deliberately.

Round-11 curation (VERDICT r10 next #6): the r1–r10 sample union
stands at 256/256 — every pre-r11 query driver-green at least once,
zero never-sampled. Round 11 ADDED four oracled queries (part_skyline_3d,
corpus_shard_source_balance, events_user_activity_gini,
text_hapax_ratio), which lead because they have NO driver evidence
yet. The remaining 49
slots buy FRESHNESS: the queries with the OLDEST driver evidence,
oldest round first (the r5 sampler/text block the r10 prefix did not
reach, then the r6 analytics block). Regenerate with
scripts/gen_evidence.py each round.

Everything not listed keeps registration order after these.
"""

from __future__ import annotations

EVIDENCE_PRIORITY: tuple[str, ...] = (
    "part_skyline_3d",  # NEW r11 — never driver-sampled
    "corpus_shard_source_balance",  # NEW r11 — never driver-sampled
    "events_user_activity_gini",  # NEW r11 — never driver-sampled
    "text_hapax_ratio",  # NEW r11 — never driver-sampled
    "sample_importance_weighted",  # last driver sample: r5
    "sample_per_source_cap",  # last driver sample: r5
    "sample_reservoir_k",  # last driver sample: r5
    "sample_stratified",  # last driver sample: r5
    "sample_weighted_aes",  # last driver sample: r5
    "sample_weighted_per_lang",  # last driver sample: r5
    "sequence_packing",  # last driver sample: r5
    "sketch_moments_quantiles",  # last driver sample: r5
    "statement_incremental_merge",  # last driver sample: r5
    "text_bpe_tokens",  # last driver sample: r5
    "text_fingerprint",  # last driver sample: r5
    "text_langid",  # last driver sample: r5
    "text_pmi_collocations",  # last driver sample: r5
    "text_quality",  # last driver sample: r5
    "text_repetition",  # last driver sample: r5
    "text_token_count",  # last driver sample: r5
    "text_trigram_novelty",  # last driver sample: r5
    "ann_hard_negatives",  # last driver sample: r6
    "ann_ivf_topk_nprobe2",  # last driver sample: r6
    "asof_next_purchase",  # last driver sample: r6
    "basket_brand_association",  # last driver sample: r6
    "cube_order_stats",  # last driver sample: r6
    "customer_rfm_segments",  # last driver sample: r6
    "doc_commonness",  # last driver sample: r6
    "docs_source_vocab_overlap",  # last driver sample: r6
    "embedding_centroids",  # last driver sample: r6
    "events_active_windows",  # last driver sample: r6
    "events_conversion_latency",  # last driver sample: r6
    "events_dau_stickiness",  # last driver sample: r6
    "events_dau_stickiness_hll",  # last driver sample: r6
    "events_ewma_smoothed",  # last driver sample: r6
    "events_hourly_autocorr",  # last driver sample: r6
    "events_interarrival",  # last driver sample: r6
    "events_ohlc_hourly",  # last driver sample: r6
    "events_rolling_7d_users",  # last driver sample: r6
    "events_seasonality_profile",  # last driver sample: r6
    "grouping_sets_orders",  # last driver sample: r6
    "hypertable_daily_rollup",  # last driver sample: r6
    "lineitem_yoy_growth",  # last driver sample: r6
    "lm_surprisal_topdocs",  # last driver sample: r6
    "median_price_by_priority",  # last driver sample: r6
    "mode_event_type",  # last driver sample: r6
    "ntile_customer_quartiles",  # last driver sample: r6
    "orders_basket_size_distribution",  # last driver sample: r6
    "orders_cohort_ltv",  # last driver sample: r6
    "orders_revenue_pareto",  # last driver sample: r6
    "part_substitution_candidates",  # last driver sample: r6
    "pii_redact",  # last driver sample: r6
    "pit_labeled_examples",  # last driver sample: r6
)
