"""Pipeline-evaluation operators (round 6): the metrics a training-data
pipeline uses to JUDGE its own heuristics at corpus scale — ROC-AUC of a
quality signal against labels, inter-labeler agreement (Cohen's kappa),
and calibration (reliability bins + Brier score).

No counterpart exists in the reference (its analyzers emit raw counters
only); these close the loop on the quality/langid family the way
ann_lsh_recall does for the ANN family.

All three are computed in EXACT integer arithmetic (scores and metrics
scaled to integers before any division, with integer floor division at
the end) so the DuckDB oracles hash-match bit-for-bit — no float
summation-order sensitivity anywhere.

Scale notes: every op is groupBy-aggregation shaped. The AUC rank sums
use per-score-value tallies (distinct score values, metadata scale)
with the two-phase global cumsum (operators/rank.py) rather than a
global window, so no single-partition Exchange appears; kappa and the
calibration bins are single map-side-combined aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

# The documents-table quality signal under evaluation: English stopword
# density per whitespace token, scaled to an exact integer score
# (operators/textops.STOPWORD_PATTERN's word list, same tokenization as
# text_quality). Label: is the document actually English (lang column).
_SCORE_SQL = """
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(len(regexp_extract_all(lower(text),
                '\\b(the|a|of|and|is|in)\\b')) * 1000000 //
              len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS score
  FROM documents
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_stop = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"\b(the|a|of|and|is|in)\b")
    )
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        # exact integer division (div), not floor(double/) — float
        # quotients lose exactness once numerators pass 2^53
        (n_stop.cast("long") * 1000000).alias("__num"),
        n_tok.cast("long").alias("__den"),
    ).selectExpr("doc_id", "y", "CAST(__num div __den AS LONG) AS score")


# --------------------------------------------------------------------------
# ROC-AUC by the Mann-Whitney rank statistic with average-rank tie
# handling: AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), where
# R_pos is the sum of positive-class ranks. Ranks are computed per
# DISTINCT score value (n_below + (cnt+1)/2), so ties get their average
# rank exactly; everything is kept in doubled integers (half-ranks x2)
# until one final integer floor division.
@register(
    "eval_auc_quality",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    per_score AS (
      SELECT score, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY score
    ),
    cum AS (
      SELECT score, cnt, pos,
             COALESCE(SUM(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_below
      FROM per_score
    ),
    tot AS (
      SELECT SUM(pos) AS n_pos, SUM(cnt) - SUM(pos) AS n_neg,
             SUM(pos * (2 * n_below + cnt + 1)) AS r_pos_x2
      FROM cum
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(r_pos_x2 AS BIGINT) AS rank_sum_pos_x2,
           CAST((r_pos_x2 - n_pos * (n_pos + 1)) * 1000000 //
                (2 * n_pos * n_neg) AS BIGINT) AS auc_x1e6
    FROM tot
    """,
    tags=("eval", "measurement"),
)
def eval_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    scored = _scored_docs(spark, sf_dir)
    per_score = scored.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    # exclusive running count over distinct scores — two-phase cumsum,
    # never a global single-partition window
    cum = with_global_cumsum(per_score, ["score"], "cnt", "cum_end").select(
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
        F.expr(
            "CAST(((r_pos_x2 - n_pos * (n_pos + 1)) * 1000000)"
            " div (2 * n_pos * n_neg) AS LONG)"
        ).alias("auc_x1e6"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa between two labelers: the stopword-density heuristic
# (score >= 30000, i.e. >= 3% stopword tokens -> "looks English") vs the
# lang column. kappa = (N*agree - sum_k(rowtot_k*coltot_k)) /
# (N^2 - sum_k(rowtot_k*coltot_k)) — exact integers throughout.
@register(
    "eval_cohens_kappa",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    labeled AS (
      SELECT CASE WHEN score >= 30000 THEN 1 ELSE 0 END AS a, y AS b
      FROM scored
    ),
    c AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
      FROM labeled
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           CAST((n * (n11 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                * 1000000 //
                (n * n
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                AS BIGINT) AS kappa_x1e6
    FROM c
    """,
    tags=("eval", "measurement"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_docs(spark, sf_dir)
    labeled = scored.select(
        F.when(F.col("score") >= 30000, 1).otherwise(0).alias("a"),
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
        "CAST(__kn div __kd AS LONG) AS kappa_x1e6",
    )


# --------------------------------------------------------------------------
# Calibration: treat min(score/100000, 1) as a pseudo-probability of
# "is English" in exact thousandths (p_milli in [0, 1000]); bucket into
# 10 reliability bins and report, per bin, the count, the exact mean
# predicted probability (x1e6, via integer sums) and the observed
# positive rate (x1e6) — plus each bin's Brier contribution
# sum((p_milli - 1000*y)^2), whose grand total over bins is the scaled
# Brier score. One map-side-combined aggregation.
@register(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    p AS (
      SELECT y, LEAST(score // 100, 1000) AS p_milli FROM scored
    )
    SELECT CAST(LEAST(p_milli // 100, 9) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(p_milli) * 1000 // COUNT(*) AS BIGINT) AS mean_pred_x1e6,
           CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS obs_rate_x1e6,
           CAST(SUM((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS BIGINT)
             AS brier_contrib
    FROM p
    GROUP BY bin
    ORDER BY bin
    """,
    tags=("eval", "measurement"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_docs(spark, sf_dir)
    p = scored.select(
        "y", F.least(F.expr("score div 100"), F.lit(1000).cast("long")).alias("p_milli")
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


# --------------------------------------------------------------------------
# Precision/recall/F1 sweep: the quality signal evaluated at 10
# thresholds at once. Scale shape: the corpus collapses to per-DISTINCT-
# score tallies first (metadata cardinality), and only THAT small frame
# is crossed with the broadcast 10-row threshold dim — the sweep never
# re-scans the data once per threshold, and no row-level frame is ever
# multiplied.
@register(
    "eval_pr_threshold_sweep",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    per_score AS (
      SELECT score, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY score
    ),
    thr AS (SELECT CAST(10000 * i AS BIGINT) AS thr
            FROM generate_series(0, 9) g(i)),
    agg AS (
      SELECT thr,
             SUM(CASE WHEN score >= thr THEN pos ELSE 0 END) AS tp,
             SUM(CASE WHEN score >= thr THEN cnt - pos ELSE 0 END) AS fp,
             SUM(CASE WHEN score < thr THEN pos ELSE 0 END) AS fn
      FROM per_score, thr GROUP BY thr
    )
    SELECT CAST(thr AS BIGINT) AS thr, CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
                ELSE tp * 1000000 // (tp + fp) END AS BIGINT)
             AS precision_x1e6,
           CAST(CASE WHEN tp + fn = 0 THEN 0
                ELSE tp * 1000000 // (tp + fn) END AS BIGINT)
             AS recall_x1e6,
           CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS BIGINT)
             AS f1_x1e6
    FROM agg ORDER BY thr
    """,
    tags=("eval", "measurement"),
)
def eval_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_docs(spark, sf_dir)
    per_score = scored.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    thr = spark.range(0, 10).select((F.col("id") * 10000).cast("long").alias("thr"))
    agg = per_score.crossJoin(F.broadcast(thr)).groupBy("thr").agg(
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


# --------------------------------------------------------------------------
# Cumulative gains / lift table: rank the corpus by the quality signal
# (descending), split into 10 deciles, and report per decile the capture
# rate of true positives and the lift over random. The decile of a
# score GROUP is decided by the group's exclusive-end position in the
# global descending order — computed with the two-phase cumsum over
# per-distinct-score tallies, so the only SinglePartition exchange is
# the 1-row (n_total, pos_total) scalar frame (allowlisted with the
# other eval-family global finals).
@register(
    "eval_lift_deciles",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    per_score AS (
      SELECT score, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY score
    ),
    tot AS (SELECT SUM(cnt) AS n_total, SUM(pos) AS pos_total FROM per_score),
    cum AS (
      SELECT cnt, pos, SUM(cnt) OVER (ORDER BY score DESC) AS cum_end
      FROM per_score
    ),
    dec AS (
      SELECT LEAST((cum_end - 1) * 10 // n_total, 9) AS decile, cnt, pos
      FROM cum, tot
    ),
    g AS (SELECT decile, SUM(cnt) AS n, SUM(pos) AS pos
          FROM dec GROUP BY decile),
    c AS (
      SELECT decile, n, pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(pos) OVER (ORDER BY decile) AS cum_pos
      FROM g
    )
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS pos, CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(CASE WHEN pos_total = 0 THEN 0
                ELSE cum_pos * 1000000 // pos_total END AS BIGINT)
             AS cum_capture_x1e6,
           CAST(CASE WHEN cum_n = 0 OR pos_total = 0 THEN 0
                ELSE (cum_pos * n_total * 1000000) // (cum_n * pos_total)
                END AS BIGINT) AS lift_x1e6
    FROM c, tot ORDER BY decile
    """,
    tags=("eval", "measurement"),
)
def eval_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    scored = _scored_docs(spark, sf_dir)
    per_score = scored.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    # descending order == ascending on the negated score
    cum = with_global_cumsum(
        per_score.withColumn("neg", -F.col("score")), ["neg"], "cnt", "cum_end"
    )
    tot = per_score.agg(
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
    # <=10 decile rows: the two running sums reuse the same two-phase
    # cumsum (no global window even here, so the gate stays clean)
    c = with_global_cumsum(g, ["decile"], "n", "cum_n")
    c = with_global_cumsum(c, ["decile"], "pos", "cum_pos")
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
