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
    checkpointed=True,
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
           CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE (r_pos_x2 - n_pos * (n_pos + 1)) * 1000000 //
                (2 * n_pos * n_neg) END AS BIGINT) AS auc_x1e6
    FROM tot
    """,
    tags=("eval", "measurement"),
)
def eval_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.evalmetrics import auc_exact

    return auc_exact(_scored_docs(spark, sf_dir))


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
           CAST(CASE WHEN n * n
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0
                THEN 0
                ELSE (n * (n11 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                * 1000000 //
                (n * n
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                END AS BIGINT) AS kappa_x1e6
    FROM c
    """,
    tags=("eval", "measurement"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.evalmetrics import cohens_kappa_exact

    return cohens_kappa_exact(_scored_docs(spark, sf_dir), threshold=30000)


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
    from ftm_datalake_spark.operators.evalmetrics import calibration_bins_exact

    return calibration_bins_exact(_scored_docs(spark, sf_dir))


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
    from ftm_datalake_spark.operators.evalmetrics import (
        pr_threshold_sweep_exact,
    )

    return pr_threshold_sweep_exact(
        _scored_docs(spark, sf_dir), [10000 * i for i in range(10)]
    )


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
    checkpointed=True,
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
    from ftm_datalake_spark.operators.evalmetrics import lift_deciles_exact

    return lift_deciles_exact(_scored_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test between two event cohorts (the A/B
# experiment readout): purchase vs click values in integer cents. The
# sufficient statistics are three exact BIGINT sums per group (n, Σx,
# Σx²) — map-side combined to ONE row per group, so the only
# single-partition exchange carries two rows (the eval_auc shape). The
# t statistic and Welch–Satterthwaite df are exact-IEEE doubles of
# those integers, identical in any engine.
@register(
    "eval_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s1,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s2
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type
    ),
    w AS (
      SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
             MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a1,
             MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS q1,
             MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
             MAX(CASE WHEN event_type = 'click' THEN s1 END) AS a2,
             MAX(CASE WHEN event_type = 'click' THEN s2 END) AS q2
      FROM g
    ),
    v AS (
      SELECT n1, n2, a1, a2,
             ((CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)
              / (n1 - 1)) / n1 AS v1,
             ((CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * a2 / n2)
              / (n2 - 1)) / n2 AS v2
      FROM w WHERE n1 > 1 AND n2 > 1
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(a1 AS BIGINT) AS sum1_cents,
           CAST(a2 AS BIGINT) AS sum2_cents,
           (CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2)
             / sqrt(v1 + v2) AS t_stat,
           (v1 + v2) * (v1 + v2)
           / (POWER(v1, 2) / (n1 - 1) + POWER(v2, 2) / (n2 - 1)) AS welch_df
    FROM v WHERE v1 + v2 > 0
    """,
    tags=("eval", "stats", "abtest"),
)
def eval_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    g = (
        events.where(F.col("event_type").isin("purchase", "click"))
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("event_type") == et, F.col(c))).alias(a)
            for et, c, a in [
                ("purchase", "n", "n1"), ("purchase", "s1", "a1"),
                ("purchase", "s2", "q1"), ("click", "n", "n2"),
                ("click", "s1", "a2"), ("click", "s2", "q2"),
            ]
        ]
    )
    v1 = (
        (F.col("q1").cast("double") - F.col("a1").cast("double") * F.col("a1") / F.col("n1"))
        / (F.col("n1") - 1)
    ) / F.col("n1")
    v2 = (
        (F.col("q2").cast("double") - F.col("a2").cast("double") * F.col("a2") / F.col("n2"))
        / (F.col("n2") - 1)
    ) / F.col("n2")
    # Degenerate-cohort guard (ADVICE r10): n<=1 makes the (n-1)
    # divisor null/zero and v1+v2=0 makes t a 0/0 — and the engines
    # DISAGREE on the degenerate value (Spark nulls an integer div-0,
    # DuckDB raises or yields inf under IEEE float division), so both
    # plan and oracle filter the same degenerate rows out instead of
    # serving an engine-dependent answer.
    v = w.where((F.col("n1") > 1) & (F.col("n2") > 1)).select(
        "n1", "n2", "a1", "a2", v1.alias("v1"), v2.alias("v2")
    )
    t = (
        F.col("a1").cast("double") / F.col("n1")
        - F.col("a2").cast("double") / F.col("n2")
    ) / F.sqrt(F.col("v1") + F.col("v2"))
    df_w = (F.col("v1") + F.col("v2")) * (F.col("v1") + F.col("v2")) / (
        F.pow("v1", 2) / (F.col("n1") - 1) + F.pow("v2", 2) / (F.col("n2") - 1)
    )
    return v.where(F.col("v1") + F.col("v2") > 0).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("a1").cast("long").alias("sum1_cents"),
        F.col("a2").cast("long").alias("sum2_cents"),
        t.alias("t_stat"),
        df_w.alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis rank-location statistics (round 12): does the document
# LENGTH distribution differ by source? Emits the exact sufficient
# statistics of the k-sample rank test per source — average-rank sum
# (x2 to stay integer under .5 ties), its deviation from the
# null-hypothesis expectation n_j(N+1)/2 (x2), and the null variance
# n_j(N+1)(N-n_j)/12 (x12) — so H and per-source z-scores are
# derivable without a single float op inside the hash-compared result.
# Rank sums use the per-score-tally + two-phase-cumsum shape of
# eval_auc_quality (no global window).
@register(
    "eval_kruskal_wallis",
    oracle="""
    WITH s AS (SELECT source, n_chars AS score FROM documents),
    g AS (SELECT score, COUNT(*) AS cnt FROM s GROUP BY score),
    c AS (
      SELECT score, cnt,
             SUM(cnt) OVER (ORDER BY score) - cnt AS n_below
      FROM g
    ),
    ps AS (SELECT source, score, COUNT(*) AS cs FROM s GROUP BY source, score),
    r AS (
      SELECT ps.source,
             SUM(ps.cs * (2 * c.n_below + c.cnt + 1)) AS rank_sum_x2,
             SUM(ps.cs) AS n
      FROM ps JOIN c ON ps.score = c.score
      GROUP BY ps.source
    ),
    t AS (SELECT SUM(n) AS big_n FROM r)
    SELECT r.source,
           CAST(r.n AS BIGINT) AS n,
           CAST(r.rank_sum_x2 AS BIGINT) AS rank_sum_x2,
           CAST(r.rank_sum_x2 - r.n * (t.big_n + 1) AS BIGINT) AS dev_x2,
           CAST(r.n * (t.big_n + 1) * (t.big_n - r.n) AS BIGINT) AS var_x12
    FROM r, t
    ORDER BY r.source
    """,
    tags=("eval", "stats", "rank"),
    checkpointed=True,
)
def eval_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("score")
    )
    g = docs.groupBy("score").agg(F.count("*").alias("cnt"))
    cum = with_global_cumsum(g, ["score"], "cnt", "cum_end").select(
        "score", "cnt", (F.col("cum_end") - F.col("cnt")).alias("n_below")
    )
    ps = docs.groupBy("source", "score").agg(F.count("*").alias("cs"))
    r = (
        ps.join(cum, "score")
        .groupBy("source")
        .agg(
            F.sum(
                F.col("cs") * (2 * F.col("n_below") + F.col("cnt") + 1)
            ).alias("rank_sum_x2"),
            F.sum("cs").alias("n"),
        )
    )
    tot = r.agg(F.sum("n").alias("big_n"))
    return (
        r.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("rank_sum_x2").cast("long").alias("rank_sum_x2"),
            (F.col("rank_sum_x2") - F.col("n") * (F.col("big_n") + 1))
            .cast("long")
            .alias("dev_x2"),
            (
                F.col("n")
                * (F.col("big_n") + 1)
                * (F.col("big_n") - F.col("n"))
            )
            .cast("long")
            .alias("var_x12"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Spearman rank correlation (round 12): monotone association between
# two quality signals — here document length (n_chars) vs BPE pre-token
# count — the check a pipeline runs before trusting one signal as a
# cheap proxy for another. Average ranks ride the per-value-tally +
# two-phase-cumsum shape (x2 to stay integer under .5 ties); the output
# is the exact tie-corrected sufficient-statistic row: n, the rank-
# difference square sum (x4), per-signal tie terms sum(t^3 - t), and
# the no-tie closed form rho = 1 - 6*sum(d^2)/(n^3-n) in exact ppm via
# a remainder-subtracted decimal floor (ties here are corrections at
# the ppm scale; the tie terms ship so the corrected rho is derivable
# without re-scanning).
@register(
    "eval_spearman",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars AS x,
             len(regexp_extract_all(text,
                 '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS y
      FROM documents
    ),
    gx AS (SELECT x, COUNT(*) AS cnt FROM d GROUP BY x),
    cx AS (
      SELECT x, cnt, SUM(cnt) OVER (ORDER BY x) - cnt AS n_below FROM gx
    ),
    gy AS (SELECT y, COUNT(*) AS cnt FROM d GROUP BY y),
    cy AS (
      SELECT y, cnt, SUM(cnt) OVER (ORDER BY y) - cnt AS n_below FROM gy
    ),
    r AS (
      SELECT d.doc_id,
             2 * cx.n_below + cx.cnt + 1 AS rx2,
             2 * cy.n_below + cy.cnt + 1 AS ry2
      FROM d JOIN cx ON cx.x = d.x JOIN cy ON cy.y = d.y
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM((rx2 - ry2) * (rx2 - ry2)) AS d2_x4
      FROM r
    ),
    tx AS (SELECT SUM(cnt * cnt * cnt - cnt) AS tie_x FROM gx),
    ty AS (SELECT SUM(cnt * cnt * cnt - cnt) AS tie_y FROM gy)
    SELECT CAST(s.n AS BIGINT) AS n,
           CAST(s.d2_x4 AS BIGINT) AS d2_x4,
           CAST(tx.tie_x AS BIGINT) AS tie_x,
           CAST(ty.tie_y AS BIGINT) AS tie_y,
           CAST(1000000 - (6000000::HUGEINT * s.d2_x4)
                // (4::HUGEINT * (s.n * s.n * s.n - s.n))
                AS BIGINT) AS rho_no_ties_x1e6
    FROM s, tx, ty
    """,
    tags=("eval", "stats", "rank"),
    checkpointed=True,
)
def eval_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    pattern = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    d = docs.select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.regexp_count(F.col("text"), F.lit(pattern)).alias("y"),
    )

    def ranks2(col: str):
        g = d.groupBy(col).agg(F.count("*").alias("cnt"))
        cum = with_global_cumsum(g, [col], "cnt", "cum_end")
        r = cum.select(
            col,
            (
                2 * (F.col("cum_end") - F.col("cnt")) + F.col("cnt") + 1
            ).alias(f"r{col}2"),
        )
        tie = g.agg(
            F.sum(
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ).alias(f"tie_{col}")
        )
        return r, tie

    rx, tiex = ranks2("x")
    ry, tiey = ranks2("y")
    r = d.join(rx, "x").join(ry, "y")
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("rx2") - F.col("ry2")) * (F.col("rx2") - F.col("ry2"))
        ).alias("d2_x4"),
    )
    out = s.crossJoin(F.broadcast(tiex)).crossJoin(F.broadcast(tiey))
    num = (F.lit(6000000).cast("decimal(38,0)") * F.col("d2_x4")).alias(
        "snum"
    )
    den = (
        F.lit(4).cast("decimal(38,0)")
        * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
    ).alias("den")
    staged = out.select("n", "d2_x4", "tie_x", "tie_y", num, den)
    return staged.select(
        F.col("n").cast("long").alias("n"),
        F.col("d2_x4").cast("long").alias("d2_x4"),
        F.col("tie_x").cast("long").alias("tie_x"),
        F.col("tie_y").cast("long").alias("tie_y"),
        (
            F.lit(1000000)
            - (
                (F.col("snum") - F.pmod(F.col("snum"), F.col("den")))
                / F.col("den")
            ).cast("long")
        )
        .cast("long")
        .alias("rho_no_ties_x1e6"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U: the nonparametric two-sample location test —
# completes the eval/stats family's rank trio (Spearman for paired
# monotone association, Kruskal-Wallis for k groups, M-W U for two).
# Same exactness scheme as eval_spearman: tie mid-ranks carried as
# DOUBLED ranks (2*below + cnt + 1, always an integer), so U is exact
# at 2x scale: U2_a = R2_a - n_a*(n_a+1), with the tie correction term
# sum(cnt^3 - cnt) emitted for the variance. Rank tallies cumulate via
# the two-phase global cumsum (operators/rank.py) — no single-partition
# rank funnel.
@register(
    "eval_mann_whitney",
    oracle="""
    WITH d AS (
      SELECT n_chars AS x,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp_a
      FROM documents
    ),
    g AS (SELECT x, COUNT(*) AS cnt FROM d GROUP BY x),
    c AS (
      SELECT x, cnt, SUM(cnt) OVER (ORDER BY x) - cnt AS n_below FROM g
    ),
    r AS (
      SELECT d.grp_a, 2 * c.n_below + c.cnt + 1 AS r2
      FROM d JOIN c ON c.x = d.x
    ),
    s AS (
      SELECT CAST(SUM(grp_a) AS BIGINT) AS n_a,
             CAST(COUNT(*) - SUM(grp_a) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN grp_a = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r2_a
      FROM r
    ),
    t AS (SELECT CAST(SUM(cnt*cnt*cnt - cnt) AS BIGINT) AS tie_term FROM g)
    SELECT s.n_a, s.n_b,
           CAST(s.r2_a - s.n_a * (s.n_a + 1) AS BIGINT) AS u2_a,
           CAST(2 * s.n_a * s.n_b - (s.r2_a - s.n_a * (s.n_a + 1))
                AS BIGINT) AS u2_b,
           t.tie_term
    FROM s, t
    """,
    tags=("eval", "stats", "rank"),
    checkpointed=True,
)
def eval_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("n_chars").alias("x"),
        (F.col("lang") == "en").cast("long").alias("grp_a"),
    )
    g = d.groupBy("x").agg(F.count("*").alias("cnt"))
    cum = with_global_cumsum(g, ["x"], "cnt", "cum_end")
    r2 = cum.select(
        "x",
        (2 * (F.col("cum_end") - F.col("cnt")) + F.col("cnt") + 1).alias(
            "r2"
        ),
    )
    joined = d.join(r2, "x")
    s = joined.agg(
        F.sum("grp_a").cast("long").alias("n_a"),
        (F.count("*") - F.sum("grp_a")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("grp_a") == 1, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r2_a"),
    )
    tie = g.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie_term")
    )
    return s.crossJoin(F.broadcast(tie)).select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        )
        .cast("long")
        .alias("u2_b"),
        "tie_term",
    )
