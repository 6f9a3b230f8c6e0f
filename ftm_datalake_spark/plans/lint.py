"""Plan-shape linting: the facts that matter at 100 TB, extracted from
a DataFrame's executed plan. One source of truth for the CLI verb
(`query --lint`), shared with the PLAN_AUDIT generator's counting
rules (scripts/gen_plan_audit.py) and the plan gates in
tests/test_plan_shapes.py.
"""

from __future__ import annotations


from pyspark.sql import DataFrame

# Registry queries whose BroadcastNestedLoopJoins are PROVEN bounded
# build sides — every entry is one of three shapes (spot-verified in
# source, VERDICT r10 wrong #1):
#   (a) a 1-row global-scalar crossJoin(broadcast(..)) ship (the
#       text_pmi_collocations idiom): totals, thresholds, cutoffs;
#   (b) a k-row sketch/centroid frame (k<=32 KMV registers, IVF
#       centroid lists, PQ codebooks) crossed against the probe side;
#   (c) a tiny spine (day/threshold grid) crossed for gap-fill.
# Anything else that plans a BNLJ is an unbounded pair blowup waiting
# for scale — tests/test_plan_shapes.py sweeps every registry query
# and fails on a BNLJ outside this list, symmetric to the
# GLOBAL_SCALAR_OK single-partition gate.
BNLJ_OK = frozenset(
    {
        "ann_cosine_topk",
        "ann_hard_negatives",
        "ann_ivf_topk",
        "ann_ivf_topk_nprobe2",
        "ann_ivfpq_topk",
        "ann_lsh_recall",
        "ann_pq_adc_topk",
        "part_skyline_4d",
        "corpus_shard_source_balance",
        # round-12 stats family: 1-row broadcast scalar spines
        "corpus_token_budget",
        "dq_benford_first_digit",
        "eval_kruskal_wallis",
        "eval_spearman",
        # round-13 stats family: 1-row scalar spines (rank/tie totals,
        # contingency margins) via crossJoin(broadcast(agg))
        "eval_mann_whitney",
        "dq_chi_square_independence",
        "privacy_t_closeness",
        "events_kaplan_meier",
        "text_source_divergence",
        "customer_rfm_segments",
        "dedup_lsh_recall",
        "dq_skew_report_orders",
        "dq_validation_suite",
        "embedding_pca_power",
        "er_meta_blocking_wep",
        "eval_lift_deciles",
        "eval_pr_threshold_sweep",
        "events_rolling_7d_users",
        "events_seasonality_profile",
        "orders_revenue_pareto",
        "part_skyline_3d",
        "q11_important_parts",
        "q22_sales_opportunity",
        "quality_iqr_outliers",
        "quality_perplexity_buckets",
        "sample_dsir_weights",
        "search_hybrid_rrf",
        "sketch_hll_distinct_users",
        "sketch_theta_set_ops",
        "text_pmi_collocations",
        "text_zipf_slope",
    }
)


def plan_shape(df: DataFrame) -> dict:
    """Static physical-plan shape counts. Shuffle counts are upper
    bounds — AQE collapses reused exchanges at runtime."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "cartesian_products": plan.count("CartesianProduct"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        # no codegen-span count: under AQE the pre-execution plan
        # (isFinalPlan=false) carries no codegen annotations, so any
        # static number here would be a lie; use
        # `query <name> --explain` (formatted mode) to see spans
    }


def lint_plan(
    df: DataFrame, checkpointed: bool = False, name: str | None = None
) -> dict:
    """plan_shape + verdicts. `cartesian` is a hard fail; a
    single-partition exchange is a warning (legitimate only for
    documented 1-row/collapsed-frame global scalars — the
    GLOBAL_SCALAR_OK list in tests/test_plan_shapes.py); a BNLJ is a
    warning unless `name` is in :data:`BNLJ_OK` (the proven-bounded
    registry entries). `checkpointed=True` marks counts truncated by
    localCheckpoint lineage cuts (see PLAN_AUDIT's CKPT column)."""
    shape = plan_shape(df)
    problems = []
    if shape["cartesian_products"]:
        problems.append("FAIL: cartesian product — unbounded pair blowup")
    if shape["single_partition_exchanges"]:
        problems.append(
            "WARN: single-partition exchange — fine for 1-row global"
            " scalars, fatal if the data term reaches it"
        )
    if shape["broadcast_nested_loop_joins"]:
        if name in BNLJ_OK:
            problems.append(
                "INFO: broadcast nested-loop join — allow-listed"
                " (BNLJ_OK: bounded scalar/sketch/spine build side)"
            )
        else:
            problems.append(
                "WARN: broadcast nested-loop join — fine for 1-row scalar"
                " crossJoins, fatal for real relations"
            )
    return {
        **shape,
        "checkpoint_truncated": checkpointed,
        "problems": problems,
        "ok": not any(p.startswith("FAIL") for p in problems),
    }
