"""Window/pivot/grouping-set breadth: mode-per-group with deterministic
tiebreaks, PIVOT-style conditional aggregation, CUBE, and lag-based
inter-arrival analysis (exact integer microsecond math)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.functions.timeutil import ts_micros

from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Hypertable rollup: DAILY stats derived from HOURLY partials (continuous
# aggregate composition) — the oracle aggregates raw rows directly,
# proving the two-level composition is exact.
@register(
    "hypertable_daily_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
           MIN(value) AS vmin,
           MAX(value) AS vmax
    FROM events
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
    tags=("agg", "hypertable", "streaming"),
)
def hypertable_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.hypertable import rollup_coarser, rollup_level

    events = load_table(spark, sf_dir, "events")
    hourly = rollup_level(events, "hour", ["event_type"])
    daily = rollup_coarser(hourly, "day", ["event_type"])
    return daily.select(
        "bucket",
        "event_type",
        "n",
        F.col("total").cast("double").alias("total"),
        "vmin",
        "vmax",
    ).orderBy("bucket", "event_type")


# --------------------------------------------------------------------------
# Mode per group: most frequent event_type per user (ties → alphabetical).
@register(
    "mode_event_type",
    oracle="""
    SELECT user_id, event_type AS top_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) t WHERE rn = 1 ORDER BY user_id
    """,
    tags=("window", "agg"),
)
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Pivot: per-user counts by event type as wide columns.
@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("pivot", "agg"),
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for absent combos; normalize to 0 like the CASE sums
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# CUBE: all grouping combinations of (status, priority) in one pass.
@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# As-of join: for each click, the user's latest purchase at-or-before it.
# Oracle uses DuckDB's native ASOF JOIN; Spark uses the union-marker
# operator (operators/asof.py) — an operator the DataFrame API lacks.
@register(
    "asof_last_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, value, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.event_id, c.ts,
           p.purchase_id AS user_id_asof_purchase_id,
           p.value AS user_id_asof_value,
           p.ts AS user_id_asof_ts
    FROM clicks c
    ASOF JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
    tags=("join", "asof"),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "value", "ts"
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts"
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Range join: error events matched into the user's session intervals
# (sessions derived exactly as in events_sessionize). Spark uses the
# bucketized equi-join operator; the oracle is a plain inequality join.
@register(
    "range_join_session_errors",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id,
             ts
      FROM marked
    ),
    intervals AS (
      SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM sessions GROUP BY user_id, session_id
    ),
    errors AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT i.user_id, i.session_id, COUNT(e.event_id) AS n_errors
    FROM intervals i
    JOIN errors e ON e.user_id = i.user_id
                 AND e.ts >= i.session_start AND e.ts <= i.session_end
    GROUP BY i.user_id, i.session_id
    ORDER BY i.user_id, i.session_id
    """,
    tags=("join", "range"),
)
def range_join_session_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rangejoin import range_join
    from ftm_datalake_spark.plans.reference_ops import events_sessionize

    intervals = events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    events = load_table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    matched = range_join(
        errors, intervals, on="user_id", point_ts="ts",
        start_ts="session_start", end_ts="session_end",
    )
    return (
        matched.groupBy("user_id", "session_id")
        .agg(F.count("event_id").alias("n_errors"))
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# ntile quartiles: distribution bucketing with a deterministic total order.
@register(
    "ntile_customer_quartiles",
    checkpointed=True,
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT CAST(quartile AS INT) AS quartile,
           COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM t GROUP BY quartile ORDER BY quartile
    """,
    tags=("window", "stats"),
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT `ntile(4) OVER (ORDER BY ...)`: a global unpartitioned window is
    # a single-partition Exchange — the whole table through one task.
    # Scale-safe plan: exact distributed rank (range repartition +
    # partition-offset arithmetic, operators/rank.py) then the NTILE
    # bucket by arithmetic. Same result as the oracle's window ntile.
    from ftm_datalake_spark.operators.rank import ntile_by_rank, with_global_rank

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n_rows = with_global_rank(cust, ["c_acctbal", "c_custkey"])
    t = ranked.select(
        "c_acctbal", ntile_by_rank(F.col("rank"), n_rows, 4).alias("quartile")
    )
    return (
        t.groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
        .orderBy("quartile")
    )


# --------------------------------------------------------------------------
# Key slugification: the normalize-to-identifier string pipeline.
@register(
    "slugify_keys",
    oracle="""
    SELECT doc_id,
           trim(BOTH '-' FROM regexp_replace(
             lower(source || '-' || lang || '-doc-' || CAST(doc_id AS VARCHAR)),
             '[^a-z0-9]+', '-', 'g')) AS slug
    FROM documents ORDER BY doc_id
    """,
    tags=("projection", "text"),
)
def slugify_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.lower(
        F.concat_ws(
            "-",
            "source",
            "lang",
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")),
        )
    )
    slug = F.regexp_replace(
        F.regexp_replace(raw, "[^a-z0-9]+", "-"), "^-+|-+$", ""
    )
    return docs.select("doc_id", slug.alias("slug")).orderBy("doc_id")


# --------------------------------------------------------------------------
# Arbitrary GROUPING SETS: (status), (priority), and grand total — but
# not the (status, priority) cross — in a single pass.
@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "__orders_gs"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Lag window: per-user inter-arrival stats in exact integer microseconds.
@register(
    "events_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "agg"),
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = ts_micros(F.col("ts"))
    gaps = events.select(
        "user_id", (micros - F.lag(micros).over(w)).alias("gap_us")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("total_gap_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Range-interval rolling window: 7-day rolling revenue per order
# priority. The window input is the per-(priority, day) daily rollup —
# already aggregated small — and partitions by priority, so no global
# single-partition window at any scale. RANGE frames are in days
# (date-ordinal) to keep frame boundaries integer-exact in both engines.
@register(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             o_orderdate AS day,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS day_rev
      FROM orders GROUP BY priority, day
    )
    SELECT priority, day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (
             PARTITION BY priority
             ORDER BY CAST(CAST(day AS DATE) - DATE '1970-01-01' AS BIGINT)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_7d
    FROM daily
    ORDER BY priority, day
    """,
    tags=("window", "timeseries"),
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("day_rev"))
    w = (
        Window.partitionBy("priority")
        .orderBy(
            F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date"))
        )
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "priority",
        "day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("rolling_7d"),
    ).orderBy("priority", "day")


# --------------------------------------------------------------------------
# Skew-resilient aggregation under driver verification: events has only 5
# event types, so a plain groupBy funnels everything through 5 reducers;
# salted_agg (operators/skew.py) spreads each hot key over 16 salt
# buckets and merges the partials. The oracle is the PLAIN group-by —
# a green row proves the salted two-phase plan is semantically invisible.
@register(
    "salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "skew"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(14,2)")
    )
    out = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n": ("event_id", "count"),
            "total_value_dec": ("value_dec", "sum"),
            "min_event": ("event_id", "min"),
            "max_event": ("event_id", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        F.col("total_value_dec").cast("double").alias("total_value"),
        "min_event",
        "max_event",
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Exact group median by order statistics — no percentile interpolation
# ambiguity across engines: rank rows per group, pick the two middle
# positions ((n+1)//2 and (n+2)//2, equal when n is odd), and report
# their DECIMAL sum (median*2) cast to double at the edge. One window
# shuffle per group key; no global sort.
@register(
    "median_price_by_priority",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN price ELSE 0 END)
                + SUM(CASE WHEN rn = (n + 2) // 2 THEN price ELSE 0 END)
                AS DOUBLE) AS median_x2
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("window", "agg"),
)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    w = Window.partitionBy("o_orderpriority").orderBy(price, F.col("o_orderkey"))
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        price.alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n"),
            (
                F.sum(F.when(F.col("rn") == lo, F.col("price")).otherwise(F.lit(0)))
                + F.sum(F.when(F.col("rn") == hi, F.col("price")).otherwise(F.lit(0)))
            )
            .cast("double")
            .alias("median_x2"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Skew-resilient JOIN under driver verification: the fact side (events,
# 5 hot keys) is salted, the 5-row dim is replicated across the 16
# salts, and the join becomes (key, salt) — a hot key's rows spread
# over 16 reducers instead of one. Oracle is the PLAIN join+agg: a
# green row proves salting is semantically invisible.
@register(
    "salted_hot_key_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CAST(length(event_type) AS BIGINT) AS w
      FROM events
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(14,2)) * d.w) AS DOUBLE)
             AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("join", "skew"),
)
def salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(14,2)")
    )
    dim = (
        events.select("event_type")
        .distinct()
        .select(
            "event_type", F.length("event_type").cast("long").alias("w")
        )
    )
    joined = salted_join(events, dim, on="event_type", salt_buckets=16)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value_dec") * F.col("w"))
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# percent_rank / cume_dist coverage, windowed per nation (the partition
# key keeps every window bounded — no global single-partition exchange).
# The custkey tiebreak removes ties so both ratios are deterministic
# double divisions of identical integers.
@register(
    "window_rank_functions",
    oracle="""
    SELECT c_nationkey, c_custkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_custkey)
    QUALIFY c_custkey % 10 = 0
    ORDER BY c_nationkey, c_custkey
    """,
    tags=("window",),
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").cast("decimal(12,2)"), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .where(F.col("c_custkey") % 10 == 0)
        .orderBy("c_nationkey", "c_custkey")
    )


# --------------------------------------------------------------------------
# Unpivot (melt) — the inverse of pivot_user_event_counts: wide
# per-type count columns back to (key, event_type, n) long form via
# Spark's native unpivot; zero shuffle beyond the pivot it consumes.
@register(
    "unpivot_event_matrix",
    oracle="""
    WITH wide AS (
      SELECT user_id % 10 AS cohort,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase
      FROM events GROUP BY cohort
    )
    SELECT cohort, event_type, CAST(n AS BIGINT) AS n
    FROM wide
    UNPIVOT (n FOR event_type IN (click, error, purchase))
    ORDER BY cohort, event_type
    """,
    tags=("pivot", "agg"),
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .agg(
            *[
                F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
                for t in ("click", "error", "purchase")
            ]
        )
    )
    return (
        wide.unpivot(
            ids=["cohort"],
            values=["click", "error", "purchase"],
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .select("cohort", "event_type", F.col("n").cast("long").alias("n"))
        .orderBy("cohort", "event_type")
    )


# --------------------------------------------------------------------------
# Interval-overlap join: session intervals × error "incident windows"
# (±15 min around each error event), same user. Spark uses the bucketized
# interval_overlap_join operator (operators/rangejoin.py — both sides
# explode into fixed-width time buckets, equi-join on (key, bucket),
# exact half-open predicate refines, distinct collapses multi-bucket
# pairs); the oracle is a plain inequality join. At 100 TB the plan is a
# hash join on (user_id, bucket), never a nested loop.
@register(
    "interval_overlap_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id,
             ts
      FROM marked
    ),
    intervals AS (
      SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM sessions GROUP BY user_id, session_id
    ),
    incidents AS (
      SELECT user_id, event_id,
             ts - INTERVAL '15 minutes' AS win_start,
             ts + INTERVAL '15 minutes' AS win_end
      FROM events WHERE event_type = 'error'
    )
    SELECT i.user_id, i.session_id,
           COUNT(DISTINCT n.event_id) AS n_incidents
    FROM intervals i
    JOIN incidents n ON n.user_id = i.user_id
                    AND i.session_start < n.win_end
                    AND n.win_start < i.session_end
    GROUP BY i.user_id, i.session_id
    ORDER BY i.user_id, i.session_id
    """,
    tags=("join", "interval", "overlap"),
)
def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rangejoin import interval_overlap_join
    from ftm_datalake_spark.plans.reference_ops import events_sessionize

    intervals = events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    events = load_table(spark, sf_dir, "events")
    incidents = events.where(F.col("event_type") == "error").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("win_end"),
    )
    matched = interval_overlap_join(
        intervals, incidents, on="user_id",
        left_start="session_start", left_end="session_end",
        right_start="win_start", right_end="win_end",
    )
    return (
        matched.groupBy("user_id", "session_id")
        .agg(F.countDistinct("event_id").alias("n_incidents"))
        .orderBy("user_id", "session_id")
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH c AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bucket,
             ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, bucket
               ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, bucket
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM c)
    SELECT event_type, bucket,
           CAST(MAX(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT) AS open,
           CAST(MAX(cents) AS BIGINT) AS high,
           CAST(MIN(cents) AS BIGINT) AS low,
           CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)
             AS close,
           COUNT(*) AS n
    FROM ranked
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    tags=("events", "timeseries", "window"),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars: per (event_type, hour), the first/max/min/last
    value in integer cents. Open/close use min_by/max_by over the total
    (ts, event_id) order — one hash-aggregate, no window pass over the
    raw rows; the oracle derives the same bars through row_number
    windows, so two different aggregation strategies must agree."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    key = F.struct(F.col("ts"), F.col("event_id"))
    c = events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        cents.alias("cents"),
        key.alias("k"),
    )
    return (
        c.groupBy("event_type", "bucket")
        .agg(
            F.min_by("cents", F.col("k")).alias("open"),
            F.max("cents").alias("high"),
            F.min("cents").alias("low"),
            F.max_by("cents", F.col("k")).alias("close"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "events_ewma_smoothed",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    l AS (
      SELECT user_id, ts, event_id, cents,
             """
    + ",\n             ".join(
        f"LAG(cents, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS lag{j}"
        for j in range(1, 16)
    )
    + """
      FROM c)
    SELECT user_id, event_id,
           CAST(cents * 32768 """
    + " ".join(
        f"+ COALESCE(lag{j}, 0) * {1 << (15 - j)}" for j in range(1, 16)
    )
    + """ AS BIGINT) AS ewma_x32768
    FROM l
    ORDER BY user_id, event_id
    """,
    tags=("events", "timeseries", "window", "ewma"),
)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving sum with half-life decay 1/2 per
    event, over the last 16 events per user — expressed as 16 lag terms
    with dyadic weights 2^(15-j), so the whole smoother is EXACT 64-bit
    integer arithmetic (cents ≤ ~40k, x32768, x16 terms: < 2^36 —
    no overflow, no float rounding, bit-identical in any engine).
    One window shuffle on user_id; the 16 lags share a single sorted
    pass (one Window node in the plan)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    c = events.select("user_id", "ts", "event_id", cents.alias("cents"))
    ewma = F.col("cents") * F.lit(1 << 15)
    for j in range(1, 16):
        ewma = ewma + F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * F.lit(
            1 << (15 - j)
        )
    return c.select(
        "user_id", "event_id", ewma.cast("long").alias("ewma_x32768")
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Forward as-of join: for each click, the user's EARLIEST purchase
# at-or-after it — conversion-label assignment. The oracle states the
# semantics directly (first later purchase, smallest (id, value) tuple
# at timestamp ties) as a ranked inequality join; Spark uses the
# union-marker forward window (one shuffle, no range explosion).
@register(
    "asof_next_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, value, ts
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT c.user_id, c.event_id, c.ts,
             p.purchase_id, p.value, p.ts AS pts,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts, p.purchase_id, p.value) AS rn
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT user_id, event_id, ts,
           purchase_id AS user_id_next_purchase_id,
           value AS user_id_next_value,
           pts AS user_id_next_ts
    FROM pairs WHERE rn = 1 ORDER BY event_id
    """,
    tags=("join", "asof"),
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.asof import asof_join_forward

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "value", "ts"
    )
    return asof_join_forward(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts"
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Overlapping-interval merge (gaps-and-islands on RANGES, distinct from
# point-gap sessionization): each event opens a 10-minute attention
# window [ts, ts+10m]; overlapping windows per user merge into islands
# via the running-max-of-end trick — one window partitioned by user,
# state bounded by the user's events, no self-join. Output: per-user
# island count and total merged active time (integer micros → minutes).
@register(
    "events_active_windows",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(me - ms) // 60000000 AS BIGINT) AS active_minutes
    FROM merged
    GROUP BY user_id
    ORDER BY active_minutes DESC, user_id
    LIMIT 100
    """,
    tags=("window", "interval"),
)
def events_active_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 600_000_000).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_e, F.lit(1)).otherwise(F.lit(0)),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.floor(F.sum(F.col("me") - F.col("ms")) / 60_000_000)
            .cast("long")
            .alias("active_minutes"),
        )
        .orderBy(F.desc("active_minutes"), "user_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Revenue-concentration (Pareto) analysis: how many top customers cover
# 50/80/90/95/99% of total revenue. The global running sum over
# customers ordered by revenue DESC uses the two-phase scheme
# (operators/rank.with_global_cumsum: range shuffle -> per-partition
# window -> P driver-side offsets) so no single-partition Exchange
# appears — the naive SUM() OVER (ORDER BY ...) would funnel every
# customer through one task. Revenue is integer cents, so every
# cumulative sum and the threshold comparisons are exact; the grand
# total is a 1-row aggregate shipped via crossJoin(broadcast(..)).
@register(
    "orders_revenue_pareto",
    checkpointed=True,
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(rev) AS total FROM cust),
    cum AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM cust
    ),
    th AS (SELECT unnest([50, 80, 90, 95, 99]) AS pct)
    SELECT CAST(th.pct AS INT) AS pct,
           CAST(COALESCE(SUM(CASE WHEN c * 100 < th.pct * total THEN 1 END), 0)
                + 1 AS BIGINT) AS n_customers,
           CAST(MIN(CASE WHEN c * 100 >= th.pct * total THEN c END)
                AS BIGINT) AS revenue_cents,
           CAST(MIN(CASE WHEN c * 100 >= th.pct * total THEN c END)
                AS DOUBLE) * 100.0 / total AS revenue_pct
    FROM th, cum, tot
    GROUP BY th.pct, total ORDER BY pct
    """,
    tags=("window", "analytics", "scale"),
)
def orders_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.rank import with_global_cumsum

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev")
    ).select("o_custkey", "rev", (-F.col("rev")).alias("neg_rev"))
    # Grand total ships as a crossJoin(broadcast(1-row)) scalar — the
    # text_pmi_collocations idiom — instead of a driver-side collect,
    # so the whole query stays one job (VERDICT r10 wrong #3).
    tot = cust.agg(F.sum("rev").alias("total"))
    cum = with_global_cumsum(cust, ["neg_rev", "o_custkey"], "rev", "c")
    j = cum.crossJoin(F.broadcast(tot)).select(
        "c",
        "total",
        F.explode(F.array(*[F.lit(p) for p in (50, 80, 90, 95, 99)])).alias("pct"),
    )
    return (
        j.groupBy("pct", "total")
        .agg(
            (
                F.coalesce(
                    F.sum(
                        F.when(F.col("c") * 100 < F.col("pct") * F.col("total"), 1)
                    ),
                    F.lit(0),
                )
                + 1
            )
            .cast("long")
            .alias("n_customers"),
            F.min(
                F.when(F.col("c") * 100 >= F.col("pct") * F.col("total"), F.col("c"))
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .select(
            F.col("pct").cast("int").alias("pct"),
            "n_customers",
            "revenue_cents",
            (F.col("revenue_cents").cast("double") * 100.0 / F.col("total")).alias(
                "revenue_pct"
            ),
        )
        .orderBy("pct")
    )


# --------------------------------------------------------------------------
# Holt linear-trend forecast (double exponential smoothing) with dyadic
# gains α=1/2, β=1/4 over each user's last 12 events. The recurrence
#   l_t = α·x_t + (1-α)(l_{t-1}+b_{t-1});  b_t = β(l_t-l_{t-1}) + (1-β)b_{t-1}
# is LINEAR in the inputs, so 12 steps from (l,b)=(0,0) collapse to a
# closed-form weighted sum Σ c_m·lag_m whose coefficients are exact
# dyadic rationals — computed once at import via Fractions, emitted as
# integer numerators over the common denominator 2³⁶. Like
# events_ewma_smoothed, the whole smoother is then exact 64-bit
# arithmetic: one window pass per user, bit-identical in any engine.
# Forecast(next) = l_12 + b_12; missing lags contribute 0 (cold-start
# ramp, same convention as the EWMA).
def _holt_coefficients(steps: int = 12):
    from fractions import Fraction
    from math import gcd

    level: dict[int, Fraction] = {}
    trend: dict[int, Fraction] = {}
    for t in range(steps):
        l_new = {t: Fraction(1, 2)}
        for k, v in level.items():
            l_new[k] = l_new.get(k, Fraction(0)) + v / 2
        for k, v in trend.items():
            l_new[k] = l_new.get(k, Fraction(0)) + v / 2
        b_new: dict[int, Fraction] = {}
        for k, v in l_new.items():
            b_new[k] = b_new.get(k, Fraction(0)) + v / 4
        for k, v in level.items():
            b_new[k] = b_new.get(k, Fraction(0)) - v / 4
        for k, v in trend.items():
            b_new[k] = b_new.get(k, Fraction(0)) + 3 * v / 4
        level, trend = l_new, b_new
    forecast = {
        k: level.get(k, Fraction(0)) + trend.get(k, Fraction(0))
        for k in set(level) | set(trend)
    }
    den = 1
    for v in forecast.values():
        den = den * v.denominator // gcd(den, v.denominator)
    # lag m multiplies x_{steps-1-m}; m=0 is the current row
    coef = {steps - 1 - t: int(forecast[t] * den) for t in forecast}
    assert den <= 1 << 40 and max(abs(c) for c in coef.values()) < 1 << 40
    return coef, den


_HOLT_COEF, _HOLT_DEN = _holt_coefficients(12)


@register(
    "events_holt_linear",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    l AS (
      SELECT user_id, ts, event_id, cents,
             """
    + ",\n             ".join(
        f"LAG(cents, {m}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS lag{m}"
        for m in sorted(_HOLT_COEF)
        if m > 0
    )
    + """
      FROM c)
    SELECT user_id, event_id,
           CAST("""
    + " + ".join(
        f"COALESCE({'cents' if m == 0 else f'lag{m}'}, 0) * ({_HOLT_COEF[m]})"
        for m in sorted(_HOLT_COEF)
    )
    + f""" AS BIGINT) AS holt_num,
           CAST({_HOLT_DEN} AS BIGINT) AS holt_den
    FROM l
    ORDER BY user_id, event_id
    """,
    tags=("events", "timeseries", "window", "forecast"),
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-value forecast per event = holt_num / holt_den (exact
    integers). All 11 lags share ONE window pass (single Window node),
    the same shuffle shape as events_ewma_smoothed."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    c = events.select("user_id", "ts", "event_id", cents.alias("cents"))
    num = None
    for m in sorted(_HOLT_COEF):
        x = F.col("cents") if m == 0 else F.coalesce(
            F.lag("cents", m).over(w), F.lit(0)
        )
        term = x * F.lit(_HOLT_COEF[m])
        num = term if num is None else num + term
    return c.select(
        "user_id",
        "event_id",
        num.cast("long").alias("holt_num"),
        F.lit(_HOLT_DEN).cast("long").alias("holt_den"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Reorder-gap profile: per-customer lag() over the order history — the
# inter-purchase-interval analysis behind churn/repeat-rate dashboards,
# and the registry's coverage of the lag/lead window family (rank/
# running-total/ntile are covered elsewhere). Deterministic lag order:
# (o_orderdate, o_orderkey) — same-day orders tie-break on the key in
# both engines. Gaps in whole days, exact integers; one shuffle on
# custkey, window runs inside each partition.
@register(
    "orders_reorder_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(COALESCE(SUM(gap_days), 0) AS BIGINT) AS total_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM seq
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    ORDER BY custkey
    """,
    tags=("window", "agg"),
)
def orders_reorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    return (
        seq.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count("gap_days").cast("long").alias("n_gaps"),
            F.coalesce(F.sum("gap_days"), F.lit(0))
            .cast("long")
            .alias("total_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .where(F.col("n_orders") >= 3)
        .orderBy("custkey")
    )
