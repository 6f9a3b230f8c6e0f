"""Second-wave operator coverage: integrity reconciliation, JSON
extraction, EXISTS-style predicates, rollup aggregates, n-gram frequency
tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.documents import reconcile
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# The `make` integrity reconciliation (SURVEY §3.2) as one full-outer join:
# source-only → add, metadata-only → delete, hash mismatch → fix.
# Reference: twin task streams in ftm_datalake/make.py:52-111.
@register(
    "make_reconcile",
    oracle="""
    WITH src AS (
      SELECT CAST(event_id AS VARCHAR) AS key,
             md5(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) AS src_hash
      FROM events WHERE event_id % 7 <> 0
    ),
    meta AS (
      SELECT CAST(event_id AS VARCHAR) AS key,
             CASE WHEN event_id % 11 = 0
                  THEN md5('corrupt' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR))
                  ELSE md5(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) END AS meta_hash
      FROM events WHERE event_id % 5 <> 0
    )
    SELECT COALESCE(src.key, meta.key) AS key,
           CASE WHEN meta.key IS NULL THEN 'add'
                WHEN src.key IS NULL THEN 'delete'
                WHEN src.src_hash <> meta.meta_hash THEN 'fix'
                ELSE 'ok' END AS action
    FROM src FULL OUTER JOIN meta ON src.key = meta.key
    ORDER BY key
    """,
    tags=("join", "reference"),
)
def make_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vhash = F.md5(F.col("value").cast("decimal(18,2)").cast("string"))
    src = events.where(F.col("event_id") % 7 != 0).select(
        F.col("event_id").cast("string").alias("key"),
        vhash.alias("content_hash"),
    )
    meta = events.where(F.col("event_id") % 5 != 0).select(
        F.col("event_id").cast("string").alias("key"),
        F.when(
            F.col("event_id") % 11 == 0,
            F.md5(
                F.concat(
                    F.lit("corrupt"),
                    F.col("value").cast("decimal(18,2)").cast("string"),
                )
            ),
        )
        .otherwise(vhash)
        .alias("content_hash"),
    )
    return reconcile(src, meta).orderBy("key")


# --------------------------------------------------------------------------
# F10: JSON field extraction from the events `props` column.
@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    tags=("json", "agg"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select(
            (k % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("k_bucket")
    )


# --------------------------------------------------------------------------
# q4 shape: order-priority count with EXISTS semi join.
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q6 shape: pure filter + aggregate (pushdown showcase).
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25.0
    """,
    tags=("agg", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25.0)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(12,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Rollup aggregate (multi-granularity stats in one pass).
@register(
    "rollup_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Top-k per group via rank window (the reference's per-dataset "latest N"
# pattern generalized).
@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) t WHERE rn <= 5
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
    )


# --------------------------------------------------------------------------
# Fixed-width histogram via integer bucketing (exact, no float bins).
@register(
    "histogram_order_value",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("agg", "stats"),
)
def histogram_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# q17-style correlated comparison: parts priced above their type's average
# (exact decimal avg via sum/count, broadcast back).
@register(
    "above_type_average_parts",
    oracle="""
    WITH avg_by_type AS (
      SELECT p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS avg_price
      FROM part GROUP BY p_type
    )
    SELECT p.p_partkey, p.p_type, p.p_retailprice
    FROM part p JOIN avg_by_type a ON p.p_type = a.p_type
    WHERE p.p_retailprice > a.avg_price
    ORDER BY p.p_partkey
    """,
    tags=("join", "agg", "correlated"),
)
def above_type_average_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    avg_by_type = part.groupBy("p_type").agg(
        (
            F.sum(F.col("p_retailprice").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    return (
        part.join(F.broadcast(avg_by_type), "p_type")
        .where(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Global token vocabulary (training-pipeline staple): token → frequency.
@register(
    "token_vocabulary",
    oracle="""
    SELECT t.token, COUNT(*) AS freq
    FROM documents, UNNEST(string_split_regex(trim(text), '\\s+')) AS t(token)
    GROUP BY t.token
    ORDER BY freq DESC, token
    """,
    tags=("text", "agg"),
)
def token_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
    )


# --------------------------------------------------------------------------
# Inverted index export: token → sorted posting list (the reference's
# exports/inverted.idx artifact, docs/rfc.md exports section).
@register(
    "inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    )
    SELECT token,
           COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tok GROUP BY token ORDER BY token
    """,
    tags=("text", "agg", "reference"),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).distinct()
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            ),
        )
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# Top trigram table (n-gram language-model counts).
@register(
    "trigram_freq_top100",
    oracle="""
    WITH docs_aug AS (SELECT doc_id, text FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, len(tokens) - 2),
               i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
             )) AS trigram
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
            FROM docs_aug)
    )
    SELECT trigram, COUNT(*) AS freq
    FROM sh GROUP BY trigram
    ORDER BY freq DESC, trigram
    LIMIT 100
    """,
    tags=("text", "agg"),
)
def trigram_freq_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import ngram_array, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
    n = F.size(F.col("toks"))
    tri = ngram_array(F.col("toks"), 3)
    exploded = toked.where(n >= 3).select(F.explode(tri).alias("trigram"))
    return (
        exploded.groupBy("trigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "trigram")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Item-item co-occurrence (co-purchase) with per-item top-k: the
# recommender-system staple. The self-join explodes per order — bounded
# by order size (≤7 lineitems in TPC-H), so the pair stream is
# O(orders × size²) with uniform keys; top-k is a per-item window over
# the (much smaller) aggregated pair counts.
@register(
    "part_copurchase_topk",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    counts AS (
      SELECT part_a, part_b, COUNT(*) AS n FROM pairs
      GROUP BY part_a, part_b
    ),
    sym AS (
      SELECT part_a AS part, part_b AS other, n FROM counts
      UNION ALL
      SELECT part_b AS part, part_a AS other, n FROM counts
    ),
    ranked AS (
      SELECT part, other, n,
             row_number() OVER (
               PARTITION BY part ORDER BY n DESC, other) AS rank
      FROM sym
    )
    SELECT part, other, n, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY part, rank
    """,
    tags=("join", "recsys"),
)
def part_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    counts = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n"))
    )
    sym = counts.select(
        F.col("part_a").alias("part"), F.col("part_b").alias("other"), "n"
    ).unionByName(
        counts.select(
            F.col("part_b").alias("part"), F.col("part_a").alias("other"), "n"
        )
    )
    w = Window.partitionBy("part").orderBy(F.col("n").desc(), F.col("other"))
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("part", "other", "n", "rank")
        .orderBy("part", "rank")
    )


# --------------------------------------------------------------------------
# Deterministic correlation + least-squares regression per group:
# built-in corr() accumulates floats in partition order (not
# reproducible); here every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an
# EXACT decimal sum — algebraic, map-side combinable — and the final
# r/slope/intercept are single IEEE expressions over those exact
# inputs, so any engine computes identical doubles. The statistics
# shuffle is k group rows of 6 numbers, nothing else.
@register(
    "stats_qty_price_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / sqrt((n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                    * (n * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS r,
           (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS slope,
           (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
            - ((n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
               / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)))
              * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / n AS intercept
    FROM m ORDER BY flag
    """,
    tags=("agg", "stats"),
)
def stats_qty_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    # decimal → string → double: decimal-to-string is exact and
    # string-to-double is correctly rounded in both engines, so sums
    # beyond 2^53 convert identically (a direct decimal→double cast
    # rounds differently in DuckDB vs the JVM at the last ulp)
    sx = F.col("sx").cast("string").cast("double")
    sy = F.col("sy").cast("string").cast("double")
    sxy = F.col("sxy").cast("string").cast("double")
    sxx = F.col("sxx").cast("string").cast("double")
    syy = F.col("syy").cast("string").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return m.select(
        "flag",
        n.cast("long").alias("n"),
        (cov_n / F.sqrt(var_x * var_y)).alias("r"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("flag")


# --------------------------------------------------------------------------
# NULL-semantics conformance: nulls manufactured by an outer join
# (customers without orders), then the aggregate/predicate behaviors
# that differ between count(*) and count(col), null-safe equality, and
# null-aware conditional sums — locked cross-engine.
@register(
    "null_semantics_check",
    oracle="""
    WITH joined AS (
      SELECT c.c_custkey, c.c_nationkey, o.o_orderkey, o.o_totalprice
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orderless,
           COUNT(DISTINCT c_custkey) AS n_customers,
           SUM(CASE WHEN o_orderkey IS NOT NULL
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) IS NULL
             AS all_null_sum_is_null
    FROM joined
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("join", "nulls"),
)
def null_semantics_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders, orders.o_custkey == cust.c_custkey, "left"
    ).select("c_custkey", "c_nationkey", "o_orderkey", "o_totalprice")
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_orderless"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.sum(
                F.when(
                    F.col("o_orderkey").isNotNull(),
                    F.col("o_totalprice").cast("decimal(12,2)"),
                )
            )
            .isNull()
            .alias("all_null_sum_is_null"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Integer-exact n-gram LM surprisal (the CCNet perplexity-filter role,
# made cross-engine-exact): corpus trigram counts are the LM; each
# occurrence's surprisal is CAP - floor(log2(count)), computed as binary
# -string length so the score is pure integer arithmetic (no libm log —
# log2 via bin() is bit-exact in any engine). Rare-trigram-heavy docs
# score high (novel or garbled), boilerplate scores low — rank by avg
# surprisal ×1000 (integer division). Scale shape: one trigram explode,
# one vocab-scale count agg, one hash join back, one doc agg.
@register(
    "lm_surprisal_topdocs",
    oracle="""
    WITH tri AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, len(tokens) - 2),
               i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
             )) AS trigram
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
            FROM documents)
    ),
    lm AS (SELECT trigram, COUNT(*) AS freq FROM tri GROUP BY trigram),
    scored AS (
      SELECT t.doc_id,
             40 - (length(bin(l.freq)) - 1) AS surprisal
      FROM tri t JOIN lm l USING (trigram)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(surprisal) AS BIGINT) AS total_surprisal,
           CAST((SUM(surprisal) * 1000) // COUNT(*) AS BIGINT) AS avg_surprisal_x1000
    FROM scored
    GROUP BY doc_id
    ORDER BY avg_surprisal_x1000 DESC, doc_id
    LIMIT 50
    """,
    tags=("text", "training", "quality"),
)
def lm_surprisal_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import ngram_array, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
    n = F.size(F.col("toks"))
    tri_arr = ngram_array(F.col("toks"), 3)
    tri = toked.where(n >= 3).select(
        "doc_id", F.explode(tri_arr).alias("trigram")
    )
    lm = tri.groupBy("trigram").agg(F.count("*").alias("freq"))
    floor_log2 = F.length(F.conv(F.col("freq"), 10, 2)) - 1
    scored = tri.join(lm, "trigram").select(
        "doc_id", (F.lit(40) - floor_log2).alias("surprisal")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.sum("surprisal").cast("long").alias("total_surprisal"),
            F.floor(
                (F.sum("surprisal") * 1000) / F.count("*")
            ).cast("long").alias("avg_surprisal_x1000"),
        )
        .orderBy(F.desc("avg_surprisal_x1000"), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Changefeed derivation under the oracle gate: old = documents, new =
# documents with every 13th doc deleted, every 7th doc's text rewritten,
# and re-keyed copies of every 100th doc inserted — the feed must be
# exactly the I/U/D delta (U only where data truly differs, D carrying
# the deleted image). Composes documents.as_changefeed (the inverse of
# apply_cdc, roundtrip-law-tested in test_operators).
@register(
    "changefeed_documents",
    oracle="""
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'rev2: ' || text ELSE text END AS text
      FROM documents WHERE doc_id % 13 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 100 = 0
    ),
    j AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             o.text AS o_text, n.text AS n_text,
             o.doc_id IS NOT NULL AS in_old,
             n.doc_id IS NOT NULL AS in_new
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT doc_id,
           CASE WHEN NOT in_old THEN n_text
                WHEN NOT in_new THEN o_text
                ELSE n_text END AS text,
           CASE WHEN NOT in_old THEN 'I'
                WHEN NOT in_new THEN 'D'
                ELSE 'U' END AS op,
           CAST(1 AS BIGINT) AS seq
    FROM j
    WHERE NOT in_old OR NOT in_new OR o_text IS DISTINCT FROM n_text
    ORDER BY doc_id
    """,
    tags=("cdc", "versions"),
)
def changefeed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.documents import as_changefeed

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("rev2: "), F.col("text"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 100 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return (
        as_changefeed(docs, new, ["doc_id"])
        .select("doc_id", "text", "op", F.col("seq").cast("long").alias("seq"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary), the staple
# CRM rollup: per-customer order metrics, fixed tertile-calibrated
# thresholds (data-derived constants, documented below), segment label,
# per-segment rollup. Thresholds are compile-time constants rather than
# runtime quantiles so the query is a single agg -> map -> agg pipeline:
# one shuffle on o_custkey (uniform key), one on the 27-value segment
# label — no global sort or quantile pass at any scale. Monetary uses
# integer cents (floor(x*100+0.5)) so sums are exact in both engines.
# Thresholds = sf0.01 tertiles: recency 95/265 days, frequency 8/11,
# monetary cents 205e6/283e6.
@register(
    "customer_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
    labeled AS (
      SELECT custkey, frequency, monetary_cents,
        CASE WHEN date_diff('day', last_order, ref_date) <= 95 THEN 3
             WHEN date_diff('day', last_order, ref_date) <= 265 THEN 2
             ELSE 1 END AS r,
        CASE WHEN frequency >= 11 THEN 3
             WHEN frequency >= 8 THEN 2 ELSE 1 END AS f,
        CASE WHEN monetary_cents >= 283000000 THEN 3
             WHEN monetary_cents >= 205000000 THEN 2 ELSE 1 END AS m
      FROM cust, ref
    )
    SELECT 'R' || CAST(r AS VARCHAR) || 'F' || CAST(f AS VARCHAR)
             || 'M' || CAST(m AS VARCHAR) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS total_monetary_cents,
           CAST(SUM(frequency) AS DOUBLE) / COUNT(*) AS avg_frequency
    FROM labeled GROUP BY segment ORDER BY segment
    """,
    tags=("analytics", "agg"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    ref = orders.agg(F.max(F.to_date("o_orderdate")).alias("ref_date"))
    rec = F.datediff(F.col("ref_date"), F.col("last_order"))
    labeled = cust.crossJoin(F.broadcast(ref)).select(
        "custkey", "frequency", "monetary_cents",
        F.when(rec <= 95, 3).when(rec <= 265, 2).otherwise(1).alias("r"),
        F.when(F.col("frequency") >= 11, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
        .alias("f"),
        F.when(F.col("monetary_cents") >= 283000000, 3)
        .when(F.col("monetary_cents") >= 205000000, 2)
        .otherwise(1)
        .alias("m"),
    )
    return (
        labeled.groupBy(
            F.concat(
                F.lit("R"), F.col("r").cast("string"),
                F.lit("F"), F.col("f").cast("string"),
                F.lit("M"), F.col("m").cast("string"),
            ).alias("segment")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("total_monetary_cents"),
            (F.sum("frequency").cast("double") / F.count("*")).alias(
                "avg_frequency"
            ),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Basket-size distribution: line items per order histogram plus the
# average item count — the order-composition staple. Two cheap
# aggregations (order rollup, then size histogram); everything integer.
@register(
    "orders_basket_size_distribution",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_items,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_orders
    FROM per_order GROUP BY n_items ORDER BY n_items
    """,
    tags=("agg", "analytics"),
)
def orders_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_items")
    )
    hist = per_order.groupBy("n_items").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    # total as a window over the tiny histogram frame (<=7 rows), not
    # over orders — the single-partition exchange runs on the histogram
    return hist.select(
        "n_items",
        "n_orders",
        F.sum("n_orders").over(Window.partitionBy()).cast("long").alias("total_orders"),
    ).orderBy("n_items")


# --------------------------------------------------------------------------
# Moments-sketch quantile estimation (Gan et al., VLDB 2018 shape): a
# mergeable {n, min, max, Σv, Σv²} sketch per group, quantiles estimated
# from the moments. The query builds PARTIAL sketches on a finer key
# (returnflag × linestatus) and merges them up to returnflag — the exact
# fan-in a 100 TB per-shard / per-day rollup would do — then derives the
# estimates. Sketch arithmetic is integer-exact (cents in DECIMAL(38,0)),
# so even the derived doubles are bit-identical cross-engine.
@register(
    "sketch_moments_quantiles",
    oracle="""
    WITH q AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      FROM lineitem
    ),
    partial AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             MIN(v) AS vmin, MAX(v) AS vmax,
             SUM(CAST(v AS HUGEINT)) AS s1,
             SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2
      FROM q GROUP BY l_returnflag, l_linestatus
    ),
    merged AS (
      SELECT l_returnflag,
             CAST(SUM(n) AS BIGINT) AS n,
             MIN(vmin) AS vmin, MAX(vmax) AS vmax,
             SUM(s1) AS s1, SUM(s2) AS s2
      FROM partial GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n,
             CAST(vmin AS DOUBLE) AS lo, CAST(vmax AS DOUBLE) AS hi,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             sqrt(greatest(
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
               0.0)) AS std
      FROM merged
    )
    SELECT l_returnflag, n,
           lo / 100.0 AS min_value,
           hi / 100.0 AS max_value,
           mean / 100.0 AS mean_value,
           std / 100.0 AS std_value,
           least(greatest(mean + 0.0 * std, lo), hi) / 100.0 AS est_p50,
           least(greatest(mean + 1.2815515655446004 * std, lo), hi) / 100.0
             AS est_p90,
           least(greatest(mean + 2.3263478740408408 * std, lo), hi) / 100.0
             AS est_p99
    FROM m ORDER BY l_returnflag
    """,
    tags=("sketch", "agg", "mergeable"),
)
def sketch_moments_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.sketches import (
        moments_estimates,
        moments_merge,
        moments_partials,
    )

    li = load_table(spark, sf_dir, "lineitem")
    partial = moments_partials(
        li, F.col("l_extendedprice"), ["l_returnflag", "l_linestatus"]
    )
    merged = moments_merge(partial, ["l_returnflag"])
    return moments_estimates(merged).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Market-basket association rules over order baskets at brand grain:
# pairwise support / confidence / lift. The pair generation is a
# self-equi-join on l_orderkey with brand_a < brand_b — fanout bounded
# by basket size squared (baskets are ≤7 lines), NEVER all-pairs over
# brands or orders, so the shape is linear in orders at 100 TB. The
# brand marginals (≤25 rows) broadcast back onto the pair frame. All
# metrics are ratios of exact integer counts evaluated with one fixed
# formula, so the doubles are bit-identical cross-engine.
@register(
    "basket_brand_association",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    bc AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS brand_orders
      FROM ob GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS pair_orders
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b, p.pair_orders,
           CAST(p.pair_orders AS DOUBLE) / n.n_orders AS support,
           CAST(p.pair_orders AS DOUBLE) / ba.brand_orders AS confidence,
           CAST(p.pair_orders AS DOUBLE) * n.n_orders
             / (CAST(ba.brand_orders AS DOUBLE) * bb.brand_orders) AS lift
    FROM pairs p, n
    JOIN bc ba ON p.brand_a = ba.brand
    JOIN bc bb ON p.brand_b = bb.brand
    WHERE p.pair_orders >= 2
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 50
    """,
    tags=("agg", "analytics", "join"),
)
def basket_brand_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    # basket count is metadata-scale (one scalar), like the k-means
    # centroid collects: an exact integer, identical in the oracle's
    # subquery, so every derived double matches bit-for-bit
    n_orders = ob.select("l_orderkey").distinct().count()
    bc = ob.groupBy("brand").agg(F.count("*").cast("long").alias("brand_orders"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").cast("long").alias("pair_orders"))
        .where(F.col("pair_orders") >= 2)
    )
    ba = F.broadcast(bc.withColumnRenamed("brand", "brand_a").withColumnRenamed("brand_orders", "orders_a"))
    bb = F.broadcast(bc.withColumnRenamed("brand", "brand_b").withColumnRenamed("brand_orders", "orders_b"))
    return (
        pairs.join(ba, "brand_a")
        .join(bb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            (F.col("pair_orders").cast("double") / F.lit(n_orders)).alias("support"),
            (F.col("pair_orders").cast("double") / F.col("orders_a")).alias(
                "confidence"
            ),
            (
                F.col("pair_orders").cast("double")
                * F.lit(n_orders)
                / (F.col("orders_a").cast("double") * F.col("orders_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Vocabulary coverage: per-doc out-of-vocabulary rate against the
# corpus top-1000 vocabulary (tokenizer-coverage staple — high OOV
# flags noise/foreign docs before training). The vocab is a global
# sort + LIMIT (TakeOrdered, never a single-partition window) with the
# deterministic (freq DESC, token) tie order, then broadcast into a
# left join; the rate is exact scaled-integer division.
@register(
    "text_vocab_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
        ORDER BY freq DESC, token LIMIT 1000)),
    j AS (
      SELECT t.doc_id,
             CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v USING (token))
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_rate_x1e6
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "training", "agg"),
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(1000)
        .select("token", F.lit(1).alias("iv"))
    )
    j = tok.join(F.broadcast(vocab), "token", "left")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .selectExpr(
            "doc_id", "n_tokens", "n_oov",
            "CAST((n_oov * 1000000) div n_tokens AS LONG) AS oov_rate_x1e6",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Skyline / Pareto dominance (Börzsönyi et al., ICDE 2001;
# operators/skyline.py): parts that are undominated on (size MAX,
# retail price MIN). The Spark plan is the sort-based reduction — one
# per-size hash agg, a strict-min sweep over the <=50-row collapsed
# frame, a broadcast join back for frontier-point counts. The oracle
# keeps the quadratic NOT EXISTS as the semantic cross-check.
@register(
    "part_skyline_dominance",
    oracle="""
    WITH bysize AS (
      SELECT p_size, MIN(p_retailprice) AS minp FROM part GROUP BY p_size
    ),
    sky AS (
      SELECT p_size, minp FROM bysize b
      WHERE NOT EXISTS (
        SELECT 1 FROM bysize b2
        WHERE b2.p_size > b.p_size AND b2.minp <= b.minp)
    )
    SELECT CAST(s.p_size AS BIGINT) AS p_size,
           s.minp AS frontier_p_retailprice,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM sky s JOIN part p
      ON p.p_size = s.p_size AND p.p_retailprice = s.minp
    GROUP BY 1, 2
    ORDER BY p_size
    """,
    tags=("skyline", "dominance", "agg"),
)
def part_skyline_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    return (
        skyline_2d(part, max_col="p_size", min_col="p_retailprice")
        .select(
            F.col("p_size").cast("long").alias("p_size"),
            "frontier_p_retailprice",
            "n_rows",
        )
        .orderBy("p_size")
    )


# --------------------------------------------------------------------------
# 3-D skyline (operators/skyline.skyline_3d): parts undominated on
# (size MAX, retail price MIN, name length MIN) — the quality-vs-size
# corpus-frontier shape in k dimensions. Spark plan: per-(size,price)
# collapse -> local per-size sweep -> staircase merge per size stratum
# (the strata ship through ONE bounded BNLJ against the broadcast
# |distinct p_size| frame — BNLJ_OK) -> broadcast frontier count-back.
# The oracle keeps the quadratic NOT EXISTS over the per-(a,b)-collapsed
# frame as the semantic cross-check (restricting dominators to the
# collapsed frame is lossless: the per-pair min-c candidate dominates
# whatever its siblings dominate).
@register(
    "part_skyline_3d",
    oracle="""
    WITH pts AS (
      SELECT p_size AS a, p_retailprice AS b, LENGTH(p_name) AS c
      FROM part
    ),
    mm AS (SELECT a, b, MIN(c) AS c FROM pts GROUP BY a, b),
    sky AS (
      SELECT a, b, c FROM mm p
      WHERE NOT EXISTS (
        SELECT 1 FROM mm q
        WHERE q.a >= p.a AND q.b <= p.b AND q.c <= p.c
          AND (q.a > p.a OR q.b < p.b OR q.c < p.c))
    )
    SELECT CAST(s.a AS BIGINT) AS p_size,
           s.b AS frontier_p_retailprice,
           CAST(s.c AS BIGINT) AS frontier_name_len,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM sky s JOIN pts x ON x.a = s.a AND x.b = s.b AND x.c = s.c
    GROUP BY 1, 2, 3
    ORDER BY p_size, frontier_p_retailprice, frontier_name_len
    """,
    tags=("skyline", "dominance", "agg"),
)
def part_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.skyline import skyline_3d

    part = load_table(spark, sf_dir, "part").select(
        "p_size", "p_retailprice", F.length("p_name").alias("name_len")
    )
    return (
        skyline_3d(
            part, max_col="p_size", min_col="p_retailprice",
            min_col2="name_len",
        )
        .select(
            F.col("p_size").cast("long").alias("p_size"),
            "frontier_p_retailprice",
            F.col("frontier_name_len").cast("long").alias("frontier_name_len"),
            "n_rows",
        )
        .orderBy("p_size", "frontier_p_retailprice", "frontier_name_len")
    )


# --------------------------------------------------------------------------
# k-D skyline (VERDICT r11 stretch #7): the 4-objective frontier for
# multi-objective part curation — maximize size, minimize price bucket,
# name length, and type length. Iterated dominance over the collapsed
# candidate frame (operators/skyline.skyline_kd): one data-scale hash
# agg, a per-group prune sweep, a bounded BNLJ anti-join on the pruned
# frame (BNLJ_OK), broadcast join-back count. Quadratic NOT EXISTS is
# the oracle. FLOOR bucketing (not ROUND) so both engines share integer
# semantics.
@register(
    "part_skyline_4d",
    oracle="""
    WITH pts AS (
      SELECT p_size AS a,
             CAST(FLOOR(p_retailprice) AS BIGINT) AS b,
             LENGTH(p_name) AS c,
             LENGTH(p_type) AS d
      FROM part
    ),
    mm AS (SELECT a, b, c, MIN(d) AS d FROM pts GROUP BY a, b, c),
    sky AS (
      SELECT a, b, c, d FROM mm p
      WHERE NOT EXISTS (
        SELECT 1 FROM mm q
        WHERE q.a >= p.a AND q.b <= p.b AND q.c <= p.c AND q.d <= p.d
          AND (q.a > p.a OR q.b < p.b OR q.c < p.c OR q.d < p.d))
    )
    SELECT CAST(s.a AS BIGINT) AS p_size,
           s.b AS frontier_price_bucket,
           CAST(s.c AS BIGINT) AS frontier_name_len,
           CAST(s.d AS BIGINT) AS frontier_type_len,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM sky s
    JOIN pts x ON x.a = s.a AND x.b = s.b AND x.c = s.c AND x.d = s.d
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2, 3, 4
    """,
    tags=("skyline", "dominance", "agg"),
)
def part_skyline_4d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.skyline import skyline_kd

    part = load_table(spark, sf_dir, "part").select(
        "p_size",
        F.floor(F.col("p_retailprice")).cast("long").alias("price_bucket"),
        F.length("p_name").alias("name_len"),
        F.length("p_type").alias("type_len"),
    )
    return (
        skyline_kd(
            part,
            max_cols=["p_size"],
            min_cols=["price_bucket", "name_len", "type_len"],
        )
        .select(
            F.col("p_size").cast("long").alias("p_size"),
            F.col("frontier_price_bucket").alias("frontier_price_bucket"),
            F.col("frontier_name_len").cast("long").alias("frontier_name_len"),
            F.col("frontier_type_len").cast("long").alias(
                "frontier_type_len"
            ),
            "n_rows",
        )
        .orderBy(
            "p_size",
            "frontier_price_bucket",
            "frontier_name_len",
            "frontier_type_len",
        )
    )
