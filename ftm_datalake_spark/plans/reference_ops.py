"""Reference-parity operators (SURVEY §2) exercised on the driver's test
tables. The ftm documents-table semantics are simulated on `events`
(key=user_id, version=ts) and `documents` so each operator gets a DuckDB
oracle at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.functions.timeutil import ts_micros

from ftm_datalake_spark.operators.documents import latest_wins, snapshot_diff
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# J3/W1: latest-wins per key (documents merge core).
@register(
    "docs_latest_wins",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    tags=("window", "dedup", "reference"),
)
def docs_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_wins(events, ["user_id"], "ts", tiebreak_cols=["event_id"]).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )


# --------------------------------------------------------------------------
# J1+J2+J3: full documents merge — union + anti-delete + latest-wins.
# Reference: ftm_datalake/archive/documents.py:82-117.
@register(
    "docs_merge_upsert",
    oracle="""
    WITH cur AS (SELECT * FROM events WHERE event_id % 2 = 0),
         adds AS (SELECT * FROM events WHERE event_id % 2 = 1),
         dels AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'signup' AND value < 2.0),
         unioned AS (SELECT * FROM cur UNION ALL SELECT * FROM adds),
         kept AS (SELECT * FROM unioned
                  WHERE user_id NOT IN (SELECT user_id FROM dels))
    SELECT user_id, event_id, event_type, ts FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM kept
    ) t WHERE rn = 1
    """,
    tags=("join", "window", "reference", "bench"),
    bench=True,
)
def docs_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    current = events.where(F.col("event_id") % 2 == 0)
    adds = events.where(F.col("event_id") % 2 == 1)
    deleted = (
        events.where((F.col("event_type") == "signup") & (F.col("value") < 2.0))
        .select("user_id")
        .distinct()
    )
    # r14 (guide §2.4): anti-delete AFTER latest_wins. Whole-user_id
    # deletion commutes with keeping the newest row per user_id, but the
    # pre-aggregation anti-join was pushed below the Union by the
    # optimizer, duplicating the broadcast `deleted` subtree (its events
    # scan + distinct) into both branches; post-aggregation it builds
    # once and probes |users| rows instead of |events|. Measured sf0.1:
    # 0.63 → 0.48 s, output row-identical.
    merged = current.unionByName(adds)
    kept = latest_wins(merged, ["user_id"], "ts", tiebreak_cols=["event_id"])
    return kept.join(F.broadcast(deleted), "user_id", "left_anti").select(
        "user_id", "event_id", "event_type", "ts"
    )


# --------------------------------------------------------------------------
# J5: snapshot diff via multiset EXCEPT ALL.
# Reference: unified-diff of CSV snapshots, ftm_datalake/archive/documents.py:96-117.
@register(
    "snapshot_diff_added",
    oracle="""
    SELECT user_id, event_type FROM events
      WHERE event_id < 600 AND event_type <> 'error'
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE event_id < 300
    """,
    tags=("setop", "reference"),
)
def snapshot_diff_added(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v1 = events.where(F.col("event_id") < 300).select("user_id", "event_type")
    v2 = events.where(
        (F.col("event_id") < 600) & (F.col("event_type") != "error")
    ).select("user_id", "event_type")
    added, _ = snapshot_diff(v1, v2)
    return added


@register(
    "snapshot_diff_deleted",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_id < 300
    EXCEPT ALL
    SELECT user_id, event_type FROM events
      WHERE event_id < 600 AND event_type <> 'error'
    """,
    tags=("setop", "reference"),
)
def snapshot_diff_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v1 = events.where(F.col("event_id") < 300).select("user_id", "event_type")
    v2 = events.where(
        (F.col("event_id") < 600) & (F.col("event_type") != "error")
    ).select("user_id", "event_type")
    _, deleted = snapshot_diff(v1, v2)
    return deleted


# --------------------------------------------------------------------------
# I1: task-ledger incremental skip (anycache semantics).
# Reference: ftm_datalake/crawl.py:64-71, docs/cache.md.
@register(
    "task_ledger_skip",
    oracle="""
    WITH ledger AS (
      SELECT 'crawl/' || CAST(event_id AS VARCHAR) AS cache_key
      FROM events WHERE event_id % 3 = 0
    ),
    incoming AS (
      SELECT 'crawl/' || CAST(event_id AS VARCHAR) AS cache_key, event_type
      FROM events
    )
    SELECT event_type, COUNT(*) AS todo
    FROM incoming
    WHERE cache_key NOT IN (SELECT cache_key FROM ledger)
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("join", "anti", "incremental", "reference"),
)
def task_ledger_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    key = F.concat(F.lit("crawl/"), F.col("event_id").cast("string")).alias(
        "cache_key"
    )
    ledger = events.where(F.col("event_id") % 3 == 0).select(key)
    incoming = events.select(key, "event_type")
    return (
        incoming.join(ledger, "cache_key", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("todo"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A6/O3 flagship: statement → entity aggregation.
# Reference spec: docs/rfc.md:63-73,121-129 ("sorting a terabyte" → here a
# single hash-agg shuffle on canonical_id, no global sort).
@register(
    "statement_aggregation",
    oracle="""
    WITH s AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS canonical_id,
             event_type AS prop,
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value
      FROM events
    ),
    per_prop AS (
      SELECT canonical_id, prop,
             array_to_string(list_sort(list(DISTINCT value)), ',') AS vals
      FROM s GROUP BY canonical_id, prop
    )
    SELECT canonical_id,
           array_to_string(list_sort(list(prop || '=' || vals)), '|') AS properties,
           COUNT(*) AS n_props
    FROM per_prop
    GROUP BY canonical_id
    ORDER BY canonical_id
    """,
    tags=("agg", "reference", "flagship", "bench"),
    bench=True,
)
def statement_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stmts = events.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("canonical_id"),
        F.col("event_type").alias("prop"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("value"),
    )
    per_prop = stmts.groupBy("canonical_id", "prop").agg(
        F.array_join(F.sort_array(F.collect_set("value")), ",").alias("vals")
    )
    return (
        per_prop.groupBy("canonical_id")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.concat(F.col("prop"), F.lit("="), F.col("vals")))
                ),
                "|",
            ).alias("properties"),
            F.count("*").alias("n_props"),
        )
        .orderBy("canonical_id")
    )


# --------------------------------------------------------------------------
# Skew-hardened flagship twin (VERDICT r11 next-round #4): the same
# aggregation with the per-(entity, prop) set union split into two
# exact phases through a hash(value) salt, so a celebrity entity's hot
# key fans in over `salt` reducers instead of one. Set union is
# associative/commutative/idempotent — same oracle as
# statement_aggregation, and the driver gate proves bit-equality.
# Operator form: operators/statements.aggregate_statements(salt_buckets=…);
# planted-skew spread evidence in SCALE_PROBE_r12 (probe_statement_skew).
@register(
    "statement_aggregation_salted",
    oracle="""
    WITH s AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS canonical_id,
             event_type AS prop,
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value
      FROM events
    ),
    per_prop AS (
      SELECT canonical_id, prop,
             array_to_string(list_sort(list(DISTINCT value)), ',') AS vals
      FROM s GROUP BY canonical_id, prop
    )
    SELECT canonical_id,
           array_to_string(list_sort(list(prop || '=' || vals)), '|') AS properties,
           COUNT(*) AS n_props
    FROM per_prop
    GROUP BY canonical_id
    ORDER BY canonical_id
    """,
    tags=("agg", "reference", "flagship", "skew"),
)
def statement_aggregation_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stmts = events.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("canonical_id"),
        F.col("event_type").alias("prop"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("value"),
    )
    salt = F.pmod(F.xxhash64("value"), F.lit(32))
    partial = stmts.groupBy(
        "canonical_id", "prop", salt.alias("__salt")
    ).agg(F.collect_set("value").alias("__pvals"))
    per_prop = partial.groupBy("canonical_id", "prop").agg(
        F.array_join(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("__pvals")))
            ),
            ",",
        ).alias("vals")
    )
    return (
        per_prop.groupBy("canonical_id")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.concat(F.col("prop"), F.lit("="), F.col("vals")))
                ),
                "|",
            ).alias("properties"),
            F.count("*").alias("n_props"),
        )
        .orderBy("canonical_id")
    )


# --------------------------------------------------------------------------
# Auto-salt flagship twin (VERDICT r12 next-round #5): same aggregation,
# but the salting decision comes from the sampled skew probe
# (operators/statements._auto_salt_buckets — deterministic seed, one
# sampled hash-agg). Same oracle as the flagship: either branch is
# bit-identical output, and the driver gate proves the probe's pick
# never changes the answer.
@register(
    "statement_aggregation_auto",
    oracle="""
    WITH s AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS canonical_id,
             event_type AS prop,
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value
      FROM events
    ),
    per_prop AS (
      SELECT canonical_id, prop,
             array_to_string(list_sort(list(DISTINCT value)), ',') AS vals
      FROM s GROUP BY canonical_id, prop
    )
    SELECT canonical_id,
           array_to_string(list_sort(list(prop || '=' || vals)), '|') AS properties,
           COUNT(*) AS n_props
    FROM per_prop
    GROUP BY canonical_id
    ORDER BY canonical_id
    """,
    tags=("agg", "reference", "flagship", "skew"),
)
def statement_aggregation_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.statements import _auto_salt_buckets

    events = load_table(spark, sf_dir, "events")
    stmts = events.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("canonical_id"),
        F.col("event_type").alias("prop"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("value"),
    )
    buckets = _auto_salt_buckets(stmts)
    if buckets:
        salt = F.pmod(F.xxhash64("value"), F.lit(buckets))
        partial = stmts.groupBy(
            "canonical_id", "prop", salt.alias("__salt")
        ).agg(F.collect_set("value").alias("__pvals"))
        per_prop = partial.groupBy("canonical_id", "prop").agg(
            F.array_join(
                F.sort_array(
                    F.array_distinct(F.flatten(F.collect_list("__pvals")))
                ),
                ",",
            ).alias("vals")
        )
    else:
        per_prop = stmts.groupBy("canonical_id", "prop").agg(
            F.array_join(F.sort_array(F.collect_set("value")), ",").alias(
                "vals"
            )
        )
    return (
        per_prop.groupBy("canonical_id")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.concat(F.col("prop"), F.lit("="), F.col("vals")))
                ),
                "|",
            ).alias("properties"),
            F.count("*").alias("n_props"),
        )
        .orderBy("canonical_id")
    )


# --------------------------------------------------------------------------
# A1/A3/A5: per-source dataset stats → catalog fan-in.
# Reference: make_index(), ftm_datalake/archive/dataset.py:177-196.
@register(
    "dataset_stats",
    oracle="""
    SELECT source AS dataset,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
    FROM documents
    GROUP BY source
    ORDER BY dataset
    """,
    tags=("agg", "reference"),
)
def dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.col("source").alias("dataset"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.array_join(F.sort_array(F.collect_set("lang")), ",").alias("langs"),
        )
        .orderBy("dataset")
    )


# --------------------------------------------------------------------------
# A1-A3/A5 incremental twin (VERDICT r12 stretch #8): the same dataset
# stats derived through the delta-aware fold — build partial state on
# the base slice, fold an add batch, fold a delete batch, derive. The
# oracle recomputes from the equivalent final corpus, so driver
# evidence proves fold == full-recompute equality end-to-end.
# Operator: operators/stats_fold.py (reference recomputes from scratch:
# /root/reference/ftm_datalake/archive/dataset.py:177-196).
@register(
    "dataset_stats_incremental",
    oracle="""
    SELECT source AS dataset,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
    FROM documents
    WHERE doc_id % 4 <> 0
    GROUP BY source
    ORDER BY dataset
    """,
    tags=("agg", "reference", "incremental"),
)
def dataset_stats_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    kw = dict(
        dataset_col="source", measure_col="n_chars", dim_cols=["lang"]
    )
    state = build_stats_state(docs.where(F.col("doc_id") % 10 != 0), **kw)
    state = fold_stats_state(
        state, adds=docs.where(F.col("doc_id") % 10 == 0), **kw
    )
    state = fold_stats_state(
        state, deletes=docs.where(F.col("doc_id") % 4 == 0), **kw
    )
    doc = state.where(F.col("facet") == "doc").select(
        "dataset",
        F.col("n").alias("n_docs"),
        F.col("val").alias("total_chars"),
    )
    langs = (
        state.where((F.col("facet") == "lang") & (F.col("n") > 0))
        .groupBy("dataset")
        .agg(
            F.array_join(F.sort_array(F.collect_list("key_str")), ",").alias(
                "langs"
            )
        )
    )
    return doc.join(langs, "dataset").orderBy("dataset")


# --------------------------------------------------------------------------
# A2/P5: schema facets via a case-mapped class column.
# Reference: mime→schema map ftm_datalake/util.py:19-38 + Collector facets.
_LANG_SCHEMA_CASES = (
    ("en", "PlainText"),
    ("de", "Pages"),
    ("fr", "HyperText"),
    ("es", "Table"),
    ("zh", "Email"),
)


@register(
    "schema_facets",
    oracle="""
    SELECT CASE lang
             WHEN 'en' THEN 'PlainText'
             WHEN 'de' THEN 'Pages'
             WHEN 'fr' THEN 'HyperText'
             WHEN 'es' THEN 'Table'
             WHEN 'zh' THEN 'Email'
             ELSE 'Document' END AS schema,
           COUNT(*) AS count
    FROM documents
    GROUP BY schema
    ORDER BY schema
    """,
    tags=("agg", "reference"),
)
def schema_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mapped: F.Column = F.lit("Document")
    expr = None
    for lang, schema in _LANG_SCHEMA_CASES:
        cond = F.when(F.col("lang") == lang, F.lit(schema))
        expr = cond if expr is None else expr.when(F.col("lang") == lang, F.lit(schema))
    expr = expr.otherwise(mapped)
    return (
        docs.select(expr.alias("schema"))
        .groupBy("schema")
        .agg(F.count("*").alias("count"))
        .orderBy("schema")
    )


# --------------------------------------------------------------------------
# P7/F2: file → FTM entity projection with deterministic derived id.
# Reference: to_proxy(), ftm_datalake/model.py:37-52.
@register(
    "entity_projection",
    oracle="""
    SELECT 'docs-file-' || md5(md5(CAST(doc_id AS VARCHAR)) || md5(md5(text))) AS id,
           CASE lang
             WHEN 'en' THEN 'PlainText'
             WHEN 'de' THEN 'Pages'
             WHEN 'fr' THEN 'HyperText'
             WHEN 'es' THEN 'Table'
             WHEN 'zh' THEN 'Email'
             ELSE 'Document' END AS schema,
           CAST(n_chars AS BIGINT) AS file_size
    FROM documents
    ORDER BY id
    """,
    tags=("projection", "reference"),
)
def entity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.functions.checksum import entity_id

    docs = load_table(spark, sf_dir, "documents")
    content_hash = F.md5(F.col("text"))
    ent_id = entity_id(F.lit("docs"), F.col("doc_id").cast("string"), content_hash)
    expr = None
    for lang, schema in _LANG_SCHEMA_CASES:
        expr = (
            F.when(F.col("lang") == lang, F.lit(schema))
            if expr is None
            else expr.when(F.col("lang") == lang, F.lit(schema))
        )
    expr = expr.otherwise(F.lit("Document"))
    return docs.select(
        ent_id.alias("id"),
        expr.alias("schema"),
        F.col("n_chars").alias("file_size"),
    ).orderBy("id")


# --------------------------------------------------------------------------
# J7: folders dimension table from key paths (explode ancestors + distinct).
# Reference: memoized folder recursion, ftm_datalake/sync/aleph.py:95-107.
@register(
    "folders_dim",
    oracle="""
    SELECT DISTINCT source AS folder FROM documents
    UNION
    SELECT DISTINCT source || '/' || lang AS folder FROM documents
    ORDER BY folder
    """,
    tags=("join", "reference"),
)
def folders_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.functions.paths import ancestor_paths

    docs = load_table(spark, sf_dir, "documents")
    keys = docs.select(
        F.concat_ws(
            "/", "source", "lang", F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
        ).alias("key")
    )
    return (
        keys.select(F.explode(ancestor_paths(F.col("key"))).alias("folder"))
        .distinct()
        .orderBy("folder")
    )


# --------------------------------------------------------------------------
# P2/P3: glob include filter on keys.
# Reference: fnmatch include/exclude, ftm_datalake/crawl.py:58-62.
@register(
    "glob_filter_sources",
    oracle="""
    SELECT source, COUNT(*) AS n FROM documents
    WHERE source LIKE 'src1%'
    GROUP BY source ORDER BY source
    """,
    tags=("filter", "reference"),
)
def glob_filter_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("source").rlike("^src1"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Sessionization on the events stream (batch form of the streaming op;
# gap-based session assignment, 30-minute inactivity threshold).
@register(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("window", "streaming", "bench"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = ts_micros(F.col("ts"))
    prev = F.lag(micros).over(w)
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(prev.isNull() | ((micros - prev) > 1_800_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = marked.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_session").over(wsum).alias("session_id"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Tumbling-window aggregation (batch form of the streaming windowed agg).
@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    tags=("agg", "streaming"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Incremental ingest (A6 + I2 composed): the first half of the event
# stream is aggregated to entities, then the second half is merged in as
# a statement increment via merge_entity_increment — old statements are
# NEVER rescanned. The oracle aggregates everything in one pass, so a
# green row proves merge(aggregate(A), B) == aggregate(A ∪ B) on real
# data, not just the property test's synthetic rows.
@register(
    "statement_incremental_merge",
    oracle="""
    WITH s AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS canonical_id,
             event_type AS prop,
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
             'src' || CAST(user_id % 3 AS VARCHAR) AS dataset
      FROM events
    ),
    per_prop AS (
      SELECT canonical_id, prop,
             array_to_string(list_sort(list(DISTINCT value)), ',') AS vals
      FROM s GROUP BY canonical_id, prop
    ),
    props AS (
      SELECT canonical_id,
             array_to_string(list_sort(list(prop || '=' || vals)), '|')
               AS properties,
             COUNT(*) AS n_props
      FROM per_prop GROUP BY canonical_id
    ),
    ds AS (
      SELECT canonical_id,
             array_to_string(list_sort(list(DISTINCT dataset)), ',') AS datasets
      FROM s GROUP BY canonical_id
    )
    SELECT canonical_id AS id, properties, n_props, datasets
    FROM props JOIN ds USING (canonical_id)
    ORDER BY id
    """,
    tags=("agg", "reference", "incremental"),
)
def statement_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.statements import (
        aggregate_statements,
        merge_entity_increment,
    )

    events = load_table(spark, sf_dir, "events")

    def stmts(df: DataFrame) -> DataFrame:
        return df.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias(
                "canonical_id"
            ),
            F.col("event_type").alias("prop"),
            F.col("value").cast("decimal(18,2)").cast("string").alias("value"),
            F.concat(F.lit("src"), (F.col("user_id") % 3).cast("string")).alias(
                "dataset"
            ),
            F.lit("Event").alias("schema"),
        )

    old = aggregate_statements(stmts(events.where(F.col("event_id") % 2 == 0)))
    merged = merge_entity_increment(
        old, stmts(events.where(F.col("event_id") % 2 == 1))
    )
    props_str = F.array_join(
        F.transform(
            F.sort_array(F.map_entries(F.col("properties"))),
            lambda e: F.concat(
                e["key"], F.lit("="), F.array_join(e["value"], ",")
            ),
        ),
        "|",
    )
    return merged.select(
        "id",
        props_str.alias("properties"),
        F.size("properties").cast("long").alias("n_props"),
        F.array_join("datasets", ",").alias("datasets"),
    ).orderBy("id")


# --------------------------------------------------------------------------
# Entity-xref inverted index — the RFC's theoretical `inverted.idx`
# ("what entity IDs point to entity X", /root/reference/docs/rfc.md:100,
# 180), realized (VERDICT r9 next-round #7). Reference statements are
# synthesized from the TPC-H order graph: each order entity references
# its customer (o_custkey) and its line suppliers (l_suppkey), so the
# inverted table answers "which orders point at customer/supplier X".
@register(
    "entities_xref_inverted",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS referenced_id,
             'o' || CAST(o_orderkey AS VARCHAR) AS referrer
      FROM orders
      UNION
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS referenced_id,
             'o' || CAST(l_orderkey AS VARCHAR) AS referrer
      FROM lineitem
    )
    SELECT referenced_id, CAST(COUNT(*) AS BIGINT) AS n_referrers,
           md5(array_to_string(list_sort(list(referrer)), ',')) AS referrers_sig
    FROM pairs GROUP BY referenced_id
    ORDER BY referenced_id
    """,
    tags=("reference", "export", "inverted"),
)
def entities_xref_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted entity xref: referenced entity id → referrer count and
    an order-canonical signature over the sorted referrer set. One
    distinct on the (referenced, referrer) pairs + one hash-agg on
    referenced_id — a hub entity's referrers stay row-distributed until
    the bounded signature fold (operators/statements.entity_xref_*)."""
    from ftm_datalake_spark.operators.statements import entity_xref_inverted

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    stmts = (
        orders.select(
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias(
                "canonical_id"
            ),
            F.lit("customerRef").alias("prop"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "value"
            ),
        )
        .unionByName(
            lineitem.select(
                F.concat(
                    F.lit("o"), F.col("l_orderkey").cast("string")
                ).alias("canonical_id"),
                F.lit("supplierRef").alias("prop"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                    "value"
                ),
            )
        )
    )
    inv = entity_xref_inverted(stmts, ref_props=["customerRef", "supplierRef"])
    return inv.select(
        "referenced_id",
        "n_referrers",
        F.md5(F.array_join("referrers", ",")).alias("referrers_sig"),
    ).orderBy("referenced_id")
