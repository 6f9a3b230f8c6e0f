"""Evaluation-metric operators over a generic scored frame.

Input contract for every function here: a DataFrame with at least
``y`` (0/1 BIGINT label) and ``score`` (BIGINT, any scale) — the shape
``plans/eval_ops._scored_docs`` produces. All metrics are computed in
EXACT integer arithmetic (sums of longs, one final truncated integer
division via Spark ``div``), so results are bit-stable across engines
and partitionings; the plan builders in ``plans/eval_ops.py`` pair each
with a DuckDB oracle, and ``tests/test_eval_properties.py`` checks the
math against brute-force Python on arbitrary hypothesis-generated
inputs.

Scale shape (all five): the row-level frame collapses to
per-DISTINCT-score tallies (metadata cardinality) before anything
order-dependent happens; running counts use the two-phase global cumsum
(operators/rank.py) so no single-partition Exchange touches data — the
only SinglePartition nodes are 1-row metric finals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _per_score(scored: DataFrame) -> DataFrame:
    return scored.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )


def auc_exact(scored: DataFrame) -> DataFrame:
    """Mann-Whitney ROC-AUC with average-rank tie handling, x1e6.
    Columns: n_pos, n_neg, rank_sum_pos_x2, auc_x1e6."""
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    cum = with_global_cumsum(_per_score(scored), ["score"], "cnt", "cum_end").select(
        "score", "cnt", "pos", (F.col("cum_end") - F.col("cnt")).alias("n_below")
    )
    tot = cum.agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("n_below") + F.col("cnt") + 1)
        ).alias("r_pos_x2"),
    )
    return tot.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("r_pos_x2").cast("long").alias("rank_sum_pos_x2"),
        # single-class input leaves AUC undefined — explicitly NULL (not
        # a div-by-zero artifact, so the result is ANSI-mode-proof)
        F.expr(
            "CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL"
            " ELSE ((r_pos_x2 - n_pos * (n_pos + 1)) * 1000000)"
            " div (2 * n_pos * n_neg) END AS LONG)"
        ).alias("auc_x1e6"),
    )


def cohens_kappa_exact(scored: DataFrame, threshold: int) -> DataFrame:
    """Cohen's kappa of (score >= threshold) vs the label, x1e6.
    Columns: n, n11, n10, n01, n00, kappa_x1e6."""
    labeled = scored.select(
        F.when(F.col("score") >= threshold, 1).otherwise(0).alias("a"),
        F.col("y").alias("b"),
    )
    c = labeled.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("long")).alias("n11"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("long")).alias("n10"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("long")).alias("n01"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 0)).cast("long")).alias("n00"),
    )
    chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n11"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n00").cast("long").alias("n00"),
        (
            (F.col("n") * (F.col("n11") + F.col("n00")) - chance) * 1000000
        ).alias("__kn"),
        (F.col("n") * F.col("n") - chance).alias("__kd"),
    ).selectExpr(
        "n", "n11", "n10", "n01", "n00",
        # perfect chance agreement (denominator 0) is defined as kappa 0
        "CAST(CASE WHEN __kd = 0 THEN 0 ELSE __kn div __kd END AS LONG)"
        " AS kappa_x1e6",
    )


def calibration_bins_exact(scored: DataFrame) -> DataFrame:
    """Reliability bins of min(score/100, 1000) milli-probabilities.
    Columns: bin, n, mean_pred_x1e6, obs_rate_x1e6, brier_contrib."""
    p = scored.select(
        "y",
        F.least(F.expr("score div 100"), F.lit(1000).cast("long")).alias(
            "p_milli"
        ),
    )
    return (
        p.groupBy(
            F.least(F.expr("p_milli div 100"), F.lit(9).cast("long"))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum("p_milli") * 1000).alias("__sp"),
            (F.sum("y") * 1000000).alias("__sy"),
            F.sum(
                (F.col("p_milli") - 1000 * F.col("y"))
                * (F.col("p_milli") - 1000 * F.col("y"))
            ).cast("long").alias("brier_contrib"),
        )
        .selectExpr(
            "bin", "n",
            "CAST(__sp div n AS LONG) AS mean_pred_x1e6",
            "CAST(__sy div n AS LONG) AS obs_rate_x1e6",
            "brier_contrib",
        )
        .select("bin", "n", "mean_pred_x1e6", "obs_rate_x1e6", "brier_contrib")
        .orderBy("bin")
    )


def pr_threshold_sweep_exact(
    scored: DataFrame, thresholds: list[int]
) -> DataFrame:
    """Precision/recall/F1 (x1e6) at each threshold in one pass.
    Columns: thr, tp, fp, fn, precision_x1e6, recall_x1e6, f1_x1e6."""
    spark = scored.sparkSession
    thr = spark.createDataFrame([(int(t),) for t in thresholds], "thr long")
    agg = _per_score(scored).crossJoin(F.broadcast(thr)).groupBy("thr").agg(
        F.sum(
            F.when(F.col("score") >= F.col("thr"), F.col("pos")).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(F.col("score") >= F.col("thr"), F.col("cnt") - F.col("pos"))
            .otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("score") < F.col("thr"), F.col("pos")).otherwise(0)
        ).alias("fn"),
    )
    return agg.selectExpr(
        "CAST(thr AS LONG) AS thr",
        "CAST(tp AS LONG) AS tp",
        "CAST(fp AS LONG) AS fp",
        "CAST(fn AS LONG) AS fn",
        "CAST(CASE WHEN tp + fp = 0 THEN 0"
        " ELSE (tp * 1000000) div (tp + fp) END AS LONG) AS precision_x1e6",
        "CAST(CASE WHEN tp + fn = 0 THEN 0"
        " ELSE (tp * 1000000) div (tp + fn) END AS LONG) AS recall_x1e6",
        "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0"
        " ELSE (2 * tp * 1000000) div (2 * tp + fp + fn) END AS LONG)"
        " AS f1_x1e6",
    ).orderBy("thr")


def lift_deciles_exact(scored: DataFrame) -> DataFrame:
    """Cumulative gains / lift table over 10 score-descending deciles.
    Columns: decile, n, pos, cum_n, cum_pos, cum_capture_x1e6,
    lift_x1e6. A whole distinct-score group lands in the decile of its
    exclusive-end global position (ties never straddle engines)."""
    from ftm_datalake_spark.operators.rank import (
        with_global_cumsum,
        with_global_cumsums,
    )

    cum = with_global_cumsum(
        _per_score(scored).withColumn("neg", -F.col("score")),
        ["neg"],
        "cnt",
        "cum_end",
    )
    # totals come from the CHECKPOINTED tally frame — re-aggregating the
    # raw scored frame here would rescan + reshuffle the row-level data
    tot = cum.agg(
        F.sum("cnt").alias("n_total"), F.sum("pos").alias("pos_total")
    )
    dec = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.expr("((cum_end - 1) * 10) div n_total"), F.lit(9).cast("long")
        ).alias("decile"),
        "cnt",
        "pos",
    )
    g = dec.groupBy("decile").agg(
        F.sum("cnt").alias("n"), F.sum("pos").alias("pos")
    )
    # both running sums over the <=10 decile rows in ONE two-phase pass
    c = with_global_cumsums(g, ["decile"], [("n", "cum_n"), ("pos", "cum_pos")])
    return c.crossJoin(F.broadcast(tot)).selectExpr(
        "CAST(decile AS LONG) AS decile",
        "CAST(n AS LONG) AS n",
        "CAST(pos AS LONG) AS pos",
        "CAST(cum_n AS LONG) AS cum_n",
        "CAST(cum_pos AS LONG) AS cum_pos",
        "CAST(CASE WHEN pos_total = 0 THEN 0"
        " ELSE (cum_pos * 1000000) div pos_total END AS LONG)"
        " AS cum_capture_x1e6",
        "CAST(CASE WHEN cum_n = 0 OR pos_total = 0 THEN 0"
        " ELSE (cum_pos * n_total * 1000000) div (cum_n * pos_total)"
        " END AS LONG) AS lift_x1e6",
    ).orderBy("decile")
