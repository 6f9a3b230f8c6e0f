"""Training-corpus pipeline queries: decontamination, quota + stratified
sampling, sequence packing, PII redaction, incremental dedup, int8
embedding quantization — each oracle-paired.

These extend the reference's analyzer/export surface (docs/rfc.md:131-140)
with the passes a pretraining-data build runs between crawl and export.
Benchmark split / PII synthesis / old-new split are expressed identically
in both engines so the comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators import training as TR
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.plans.text_ops import _AUG_SQL, _BANDS_SQL, _SHINGLES_SQL, _augmented_docs
from ftm_datalake_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Benchmark decontamination: every 10th doc plays the eval set; train docs
# sharing >= 1 distinct word 5-gram with it are flagged. The benchmark gram
# set is broadcast (eval suites are MB-scale); only the per-doc hit count
# shuffles.
_GRAMS5_SQL = """
    SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(t) - 4),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                  || ' ' || t[i+4]
           ))) AS shingle
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents)
"""


@register(
    "decontaminate_benchmark",
    oracle=f"""
    WITH grams AS ({_GRAMS5_SQL}),
    bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 10 = 0)
    SELECT g.doc_id, COUNT(*) AS n_hits
    FROM grams g JOIN bench USING (shingle)
    WHERE g.doc_id % 10 <> 0
    GROUP BY g.doc_id
    ORDER BY doc_id
    """,
    tags=("training", "dedup"),
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    return TR.decontaminate(train, bench, k=5, min_hits=1).orderBy("doc_id")


# --------------------------------------------------------------------------
@register(
    "sample_per_source_cap",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 15
    ORDER BY source, rn
    """,
    tags=("training", "sampling"),
)
def sample_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    capped = TR.sample_per_group_cap(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id")], cap=15
    )
    return capped.select(
        "doc_id", "source", "n_chars", F.col("rn").cast("long").alias("rn")
    ).orderBy("source", "rn")


# --------------------------------------------------------------------------
# Deterministic stratified sampling: downsample dominant 'en' to 10%, keep
# half of 'de', a quarter of 'zh', all of the rest — the language-balance
# pass of a corpus build, with md5 buckets instead of RNG so any engine
# reproduces the exact sample.
@register(
    "sample_stratified",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents)
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50
                             WHEN 'zh' THEN 25 ELSE 100 END
    ORDER BY doc_id
    """,
    tags=("training", "sampling"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return TR.stratified_sample(
        docs, "lang", {"en": 10, "de": 50, "zh": 25}, default_pct=100
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
@register(
    "sequence_packing",
    checkpointed=True,
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_end
      FROM t)
    SELECT doc_id, n_tokens, CAST(u.chunk AS BIGINT) AS chunk_id
    FROM c, UNNEST(range((cum_end - n_tokens) // 2048,
                         (cum_end - 1) // 2048 + 1)) AS u(chunk)
    WHERE n_tokens > 0
    ORDER BY doc_id, chunk_id
    """,
    tags=("training",),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TR.pack_sequences(docs, budget=2048).orderBy("doc_id", "chunk_id")


# --------------------------------------------------------------------------
# PII redaction: the corpus has no natural PII, so each row synthesizes a
# deterministic contact line (same expression in both engines) and the
# redactor must scrub exactly it.
_PII_RAW_SQL = """
      SELECT doc_id,
             substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@ex' || CAST(doc_id % 7 AS VARCHAR)
               || '.com or call +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
               AS text
      FROM documents
"""


@register(
    "pii_redact",
    oracle=f"""
    WITH raw AS ({_PII_RAW_SQL})
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+1-555-[0-9]{{4}}')) AS BIGINT)
             AS n_phones,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g'),
             '\\+1-555-[0-9]{{4}}', '<PHONE>', 'g') AS redacted
    FROM raw ORDER BY doc_id
    """,
    tags=("training", "text"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.substring(F.col("text"), 1, 40),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@ex"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return (
        TR.redact_pii(raw)
        .select("doc_id", "n_emails", "n_phones", "redacted")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Incremental dedup: the re-keyed copies (doc_id >= 1000000 in the
# augmented corpus) play the NEW increment; originals are the stored lake.
@register(
    "dedup_incremental",
    oracle=f"""
    WITH docs_aug AS ({_AUG_SQL}),
    sh AS ({_SHINGLES_SQL}),
    {_BANDS_SQL}
    SELECT n.doc_id AS new_doc, MIN(o.doc_id) AS dup_of
    FROM bands n
    JOIN bands o ON n.band_id = o.band_id AND n.band_val = o.band_val
    WHERE n.doc_id >= 1000000 AND o.doc_id < 1000000
    GROUP BY n.doc_id
    ORDER BY new_doc
    """,
    tags=("training", "dedup"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented_docs(spark, sf_dir)
    old = aug.where(F.col("doc_id") < 1000000)
    new = aug.where(F.col("doc_id") >= 1000000)
    return TR.incremental_dedup(old, new).orderBy("new_doc")


# --------------------------------------------------------------------------
@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, len(embedding) AS n_dims,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS scale,
             embedding
      FROM embeddings),
    q AS (
      SELECT vec_id, n_dims, scale,
             list_transform(embedding,
               x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((CAST(x AS DOUBLE) / scale) * 127 + 0.5)
                              AS BIGINT) END) AS qv
      FROM s)
    SELECT vec_id, CAST(n_dims AS INT) AS n_dims, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
    FROM q ORDER BY vec_id
    """,
    tags=("training", "similarity"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return TR.quantize_embeddings_int8(emb).orderBy("vec_id")


# --------------------------------------------------------------------------
# Repetition ratio: share of repeated word bigrams — the cheap generation-
# loop / boilerplate detector quality filters use. Exact int/int double.
@register(
    "text_repetition",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1]) AS bigrams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents))
    SELECT doc_id,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct,
           CAST(len(bigrams) - len(list_distinct(bigrams)) AS DOUBLE)
             / len(bigrams) AS rep_ratio
    FROM g WHERE len(bigrams) > 0
    ORDER BY doc_id
    """,
    tags=("training", "text"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import ngram_array, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    g = toked.select("doc_id", ngram_array(F.col("t"), 2).alias("bigrams"))
    n = F.size(F.col("bigrams")).cast("long")
    nd = F.size(F.array_distinct(F.col("bigrams"))).cast("long")
    return (
        g.where(F.size(F.col("bigrams")) > 0)
        .select(
            "doc_id",
            n.alias("n_bigrams"),
            nd.alias("n_distinct"),
            ((n - nd).cast("double") / n).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Token commonness: average document frequency of a doc's tokens — the
# integer-exact stand-in for unigram-LM perplexity scoring (low avg_df =
# rare vocabulary). The df table is vocabulary-sized → broadcast; the
# token postings never shuffle for the join.
@register(
    "doc_commonness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(df.df) AS BIGINT) AS df_sum,
           CAST(SUM(df.df) AS DOUBLE) / COUNT(*) AS avg_df
    FROM tok JOIN df USING (token)
    GROUP BY tok.doc_id
    ORDER BY doc_id
    """,
    tags=("training", "text"),
)
def doc_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    return (
        tok.join(F.broadcast(df), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("df").cast("long").alias("df_sum"),
            (F.sum("df").cast("double") / F.count("*")).alias("avg_df"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Flagship v2: the full pretraining-corpus build as ONE declarative plan —
# quality filter → exact dedup → benchmark decontamination → per-source
# quota. Every stage is a projection, one uniform-key shuffle, or a
# broadcast membership join; nothing holistic, nothing single-partition.
@register(
    "corpus_curation_v2",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, text, lang, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|is|in)\\b')) AS BIGINT) AS n_stop
      FROM documents WHERE doc_id % 10 <> 0),
    quality AS (
      SELECT doc_id, text, lang, source, n_tokens
      FROM feat
      WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.30),
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rn
      FROM quality),
    grams AS ({_GRAMS5_SQL}),
    bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 10 = 0),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (shingle)
      WHERE g.doc_id % 10 <> 0),
    clean AS (
      SELECT d.doc_id, d.lang, d.source, d.n_tokens
      FROM deduped d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
      WHERE d.dup_rn = 1 AND c.doc_id IS NULL),
    capped AS (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rn
      FROM clean)
    SELECT doc_id, lang, source, n_tokens
    FROM capped WHERE rn <= 15
    ORDER BY doc_id
    """,
    tags=("training", "flagship", "bench"),
    bench=True,
)
def corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ftm_datalake_spark.operators.textops import STOPWORD_PATTERN, token_count

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")

    text = F.col("text")
    n_tokens = token_count(text).cast("long")
    n_stop = F.regexp_count(text, F.lit(STOPWORD_PATTERN)).cast("long")
    quality = (
        train.select("doc_id", "text", "lang", "source", n_tokens.alias("n_tokens"),
                     n_stop.alias("n_stop"))
        .where(
            (F.col("n_tokens") >= 20)
            & ((F.col("n_stop").cast("double") / F.col("n_tokens")) < 0.30)
        )
    )
    # r14 (guide §2.3): rn=1 dedup window → groupBy(md5) + min_by, so
    # the exchange moves one candidate row per content hash (map-side
    # partial agg) and the per-group sort disappears.
    deduped = (
        quality.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "source", "n_tokens"),
                F.col("doc_id"),
            ).alias("__w")
        )
        .select("__w.doc_id", "__w.lang", "__w.source", "__w.n_tokens")
    )
    contaminated = TR.decontaminate(
        train.select("doc_id", "text"), bench, k=5, min_hits=1
    ).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    capped = TR.sample_per_group_cap(
        clean.select("doc_id", "lang", "source", "n_tokens"),
        "source",
        [F.col("n_tokens").desc(), F.col("doc_id")],
        cap=15,
    )
    return capped.select("doc_id", "lang", "source", "n_tokens").orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic "reservoir" sample: uniform K-of-N by global md5 order —
# the reproducible replacement for RNG reservoir sampling. TakeOrdered
# (top-k by hash) — no global sort materialization, identical sample on
# any engine or cluster size.
@register(
    "sample_reservoir_k",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT 100
    """,
    tags=("training", "sampling"),
)
def sample_reservoir_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        )
        .orderBy("h", "doc_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Seeded epoch shuffle: the permutation is a pure function of (seed, id) —
# identical across runs/engines/partitionings, one seed per epoch. The
# in-shard position makes the *order* itself oracle-checkable (a plain
# shuffled table would be canonicalized away by the row-sorting compare).
@register(
    "corpus_epoch_shards",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5('epoch0' || '|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents),
    s AS (
      SELECT doc_id, shuffle_key,
             CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT) % 8 AS shard
      FROM k)
    SELECT doc_id, shuffle_key, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY shuffle_key, doc_id) AS INTEGER)
             AS pos
    FROM s
    ORDER BY shard, pos
    """,
    tags=("training", "shuffle"),
)
def corpus_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return TR.epoch_shards(docs, seed="epoch0", n_shards=8).select(
        "doc_id", "shuffle_key", "shard", "pos"
    ).orderBy("shard", "pos")


# --------------------------------------------------------------------------
# Importance sampling: acceptance rate proportional to document length
# (a stand-in for any quality score) — longer docs are kept more often,
# deterministically, with no RNG state anywhere.
@register(
    "sample_importance_weighted",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             LEAST(100, GREATEST(1, n_chars // 5)) AS rate_pct,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents)
    SELECT doc_id, lang, n_chars, rate_pct, bucket
    FROM r WHERE bucket < rate_pct
    ORDER BY doc_id
    """,
    tags=("training", "sampling"),
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    rate = F.least(
        F.lit(100), F.greatest(F.lit(1), (F.col("n_chars") / 5).cast("long"))
    )
    return TR.importance_sample(docs, rate).select(
        "doc_id", "lang", "n_chars", "rate_pct", "bucket"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Data mixing: materialize a training mix with per-source quotas (the
# Pile/Dolma recipe step). Quota_i = weight_i% of that source's docs;
# selection is the md5-rank prefix within each source — deterministic,
# partitioning-independent, and one bounded per-source window (same
# shape as sample_per_group_cap). Output proves the realized mix.
@register(
    "corpus_source_mixing",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0','src1','src2') THEN 80
                  WHEN source IN ('src3','src4','src5') THEN 50
                  ELSE 20 END AS pct,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS source_docs,
           COUNT(*) AS selected,
           CAST(SUM(doc_id) AS BIGINT) AS selected_checksum
    FROM weighted
    WHERE rn * 100 <= pct * n
    GROUP BY source
    ORDER BY source
    """,
    tags=("training", "sampling"),
)
def corpus_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pct = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(80))
        .when(F.col("source").isin("src3", "src4", "src5"), F.lit(50))
        .otherwise(F.lit(20))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    weighted = docs.select(
        "doc_id",
        "source",
        pct.alias("pct"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    return (
        weighted.where(F.col("rn") * 100 <= F.col("pct") * F.col("n"))
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("source_docs"),
            F.count("*").alias("selected"),
            F.sum("doc_id").cast("long").alias("selected_checksum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Sliding-window chunking with overlap: split every doc into
# 32-token windows at stride 24 (8-token overlap) — the context-length
# prep step distinct from packing (packing concatenates, chunking
# splits). sequence+slice construction: zero shuffle; chunk count per
# doc = 1 + max(0, ceil((n-32)/24)).
@register(
    "corpus_sliding_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    chunks AS (
      SELECT doc_id, s.i AS chunk_idx,
             tk[(s.i*24+1):(s.i*24+32)] AS chunk
      FROM toks, LATERAL (
        SELECT unnest(range(0, 1 + greatest(0,
                 CAST(ceil((len(tk) - 32) / 24.0) AS BIGINT)))) AS i) s
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_sig
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    tags=("training", "text"),
)
def corpus_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.textops import tokens

    size, stride = 32, 24
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("tk"))
    # chunk i exists when i == 0 or its window reaches fresh tokens:
    # i*stride + 1 <= n - (size - stride - 1)
    n = F.size("tk")
    max_i = F.greatest(
        F.lit(0),
        F.ceil((n - size) / F.lit(float(stride))).cast("int"),
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), max_i),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(F.col("tk"), i * stride + 1, size).alias("chunk"),
        ),
    )
    exploded = base.select(
        "doc_id", F.explode(chunk_arr).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_sig"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# Point-in-time labeled training set: the feature-store composition the
# as-of family exists for. For every click with at least one prior
# purchase: the latest purchase value AS OF the click (backward as-of —
# no feature leakage from the future), a binary label "next purchase
# within 24h" (forward as-of, inclusive), and a deterministic md5
# train/val fold. Two union-marker windows + one projection — no range
# explosion anywhere; the oracle states both directions as ranked
# inequality joins.
@register(
    "pit_labeled_examples",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, value, ts
      FROM events WHERE event_type = 'purchase'
    ),
    feat AS (
      SELECT c.user_id, c.event_id, c.ts, p.value AS feat_last_value,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts DESC, p.value DESC) AS rn
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id AND p.ts <= c.ts
    ),
    f AS (SELECT user_id, event_id, ts, feat_last_value FROM feat WHERE rn = 1),
    nxt AS (
      SELECT f.event_id, MIN(p.ts) AS next_ts
      FROM f JOIN purchases p
        ON p.user_id = f.user_id AND p.ts >= f.ts
      GROUP BY f.event_id
    )
    SELECT f.user_id, f.event_id, f.ts, f.feat_last_value,
           CAST(CASE WHEN nxt.next_ts IS NOT NULL
                      AND epoch_us(nxt.next_ts) - epoch_us(f.ts)
                          <= 86400000000 THEN 1 ELSE 0 END AS BIGINT)
             AS label,
           CASE WHEN CAST(('0x' || substr(md5(CAST(f.event_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10 < 8 THEN 'train' ELSE 'val' END AS fold
    FROM f LEFT JOIN nxt USING (event_id)
    ORDER BY f.event_id
    """,
    tags=("training", "asof", "composition"),
)
def pit_labeled_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.asof import asof_join, asof_join_forward
    from ftm_datalake_spark.operators.training import hash_bucket

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "value", "ts"
    )
    # features as of the click (inner: examples need a feature history)
    feat = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["value"],
    ).select(
        "user_id", "event_id", "ts",
        F.col("user_id_asof_value").alias("feat_last_value"),
    )
    # label: next purchase (inclusive) within 24h
    labeled = asof_join_forward(
        feat, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["value"], how="left",
    )
    day_us = 86_400_000_000
    label = (
        F.when(
            F.col("user_id_next_ts").isNotNull()
            & (
                F.unix_micros(F.col("user_id_next_ts"))
                - F.unix_micros(F.col("ts"))
                <= day_us
            ),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    fold = F.when(hash_bucket(F.col("event_id"), 10) < 8, "train").otherwise(
        "val"
    )
    return labeled.select(
        "user_id", "event_id", "ts", "feat_last_value",
        label.alias("label"), fold.alias("fold"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Curriculum staging: order the corpus easy -> hard for curriculum
# training. Difficulty proxy = token count (fixed thresholds, like the
# RFM constants: compile-time cutoffs keep this a single agg -> map ->
# agg pipeline with no global quantile pass); each stage reports volume
# and the type-token ratio (lexical diversity) as an exact
# integer-derived double. All per-row work is array expressions in
# whole-stage codegen; the only shuffle is the 3-key stage rollup.
@register(
    "corpus_curriculum_stages",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split_regex(trim(text), '\\s+')))
                  AS BIGINT) AS n_distinct
      FROM documents
    ),
    staged AS (
      SELECT doc_id, n_tok, n_distinct,
             CASE WHEN n_tok <= 50 THEN 1
                  WHEN n_tok <= 150 THEN 2 ELSE 3 END AS stage
      FROM t
    )
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_tok) AS type_token_ratio
    FROM staged GROUP BY stage ORDER BY stage
    """,
    tags=("training", "text"),
)
def corpus_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tok"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct"),
    )
    staged = t.select(
        "n_tok",
        "n_distinct",
        F.when(F.col("n_tok") <= 50, 1)
        .when(F.col("n_tok") <= 150, 2)
        .otherwise(3)
        .alias("stage"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            (F.sum("n_distinct").cast("double") / F.sum("n_tok")).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (integer A-ES): race key =
# md5-prefix(id) div weight — P(key <= t) ∝ weight at the selection
# tail, the exact integer analogue of the u^(1/w) draw (and of holding
# w lottery tickets, at ONE hash + ONE division per row; see
# operators/training._race_key for why the per-ticket form was
# retired). Bit-deterministic: no RNG, no floats past 2^32.
@register(
    "sample_weighted_aes",
    oracle="""
    WITH r AS (
      SELECT l_orderkey, l_linenumber,
             LEAST(64, GREATEST(1, CAST(floor(l_quantity) AS BIGINT))) AS wt,
             CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                   || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, wt, h // wt AS race_key
    FROM r
    ORDER BY race_key, l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("training", "sampling"),
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return TR.weighted_sample_hashrace(
        li,
        F.floor(F.col("l_quantity")),
        k=100,
        id_cols=["l_orderkey", "l_linenumber"],
    ).select("l_orderkey", "l_linenumber", "wt", "race_key")


# --------------------------------------------------------------------------
# Per-group weighted sampling without replacement: the A-ES hash race
# scoped per language — top-20 docs per lang, selection probability
# rising with document length. One bounded row_number window per group
# (parallel across groups, k rows kept each); the ticket list stays
# row-local exactly as in the global sampler.
@register(
    "sample_weighted_per_lang",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             LEAST(64, GREATEST(1, n_chars // 100)) AS wt,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM documents),
    keyed AS (
      SELECT doc_id, lang, wt, h // wt AS race_key
      FROM r),
    ranked AS (
      SELECT doc_id, lang, wt, race_key,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY race_key, doc_id) AS rn
      FROM keyed)
    SELECT doc_id, lang, wt, race_key
    FROM ranked WHERE rn <= 20
    ORDER BY lang, race_key
    """,
    tags=("training", "sampling"),
)
def sample_weighted_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return TR.weighted_sample_per_group(
        docs,
        (F.col("n_chars") / 100).cast("long"),
        k=20,
        id_cols=["doc_id"],
        group_cols=["lang"],
    ).select("doc_id", "lang", "wt", "race_key").orderBy("lang", "race_key")


# --------------------------------------------------------------------------
# Per-shard epoch-order sequence packing (the export-training chunk
# map): each shard's docs laid end-to-end in SHUFFLE order and cut
# every 256 tokens — chunk ids local to the shard, so a per-shard
# loader is self-contained and a new seed is a new epoch. The oracle
# replays the md5 shard fold, the per-shard running token total, and
# the doc→chunk span explosion (constant-bound series + BETWEEN, the
# dedup_common_segments idiom). The series bound 8191 caps the ORACLE
# at 8192 chunks/shard = ~2.1M tokens per shard at budget 256 — safe
# through ~sf10 on this corpus (sf0.1 peaks near chunk 270); raise it
# together with any larger parity scale.
@register(
    "corpus_epoch_packing",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5('epoch0' || '|' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    s AS (
      SELECT doc_id, n_tokens, shuffle_key,
             CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT) % 4 AS shard
      FROM k),
    c AS (
      SELECT shard, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard
               ORDER BY shuffle_key, doc_id) AS BIGINT) AS cum_end
      FROM s)
    SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tokens, cum_end,
           CAST(g.i AS BIGINT) AS chunk_id
    FROM c, LATERAL (SELECT i FROM generate_series(0, 8191) t(i)) g
    WHERE g.i BETWEEN (cum_end - n_tokens) // 256 AND (cum_end - 1) // 256
    ORDER BY shard, cum_end, chunk_id
    """,
    tags=("training", "shuffle", "packing"),
)
def corpus_epoch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = TR.epoch_shards(docs, seed="epoch0", n_shards=4)
    return (
        TR.pack_epoch_shards(sharded, budget=256)
        .select(
            F.col("shard").cast("long").alias("shard"),
            "doc_id",
            "n_tokens",
            "cum_end",
            "chunk_id",
        )
        .orderBy("shard", "cum_end", "chunk_id")
    )


# Scale-honest variant of corpus_epoch_packing (VERDICT r6/r7 carry:
# the 4-shard demo was the one >2x decade ratio in SCALE_PROBE_r06 —
# its per-shard cumsum window held corpus/4 rows per task). n_shards=32
# matches the local[32] test parallelism and stands in for "n_shards >=
# cluster parallelism" at 100 TB: the packing window's per-task state
# shrinks 8x, and the decade ratio should track data growth.
@register(
    "corpus_epoch_packing_wide",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5('epoch0' || '|' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    s AS (
      SELECT doc_id, n_tokens, shuffle_key,
             CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT) % 32 AS shard
      FROM k),
    c AS (
      SELECT shard, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard
               ORDER BY shuffle_key, doc_id) AS BIGINT) AS cum_end
      FROM s)
    SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tokens, cum_end,
           CAST(g.i AS BIGINT) AS chunk_id
    FROM c, LATERAL (SELECT i FROM generate_series(0, 8191) t(i)) g
    WHERE g.i BETWEEN (cum_end - n_tokens) // 256 AND (cum_end - 1) // 256
    ORDER BY shard, cum_end, chunk_id
    """,
    tags=("training", "shuffle", "packing"),
)
def corpus_epoch_packing_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = TR.epoch_shards(docs, seed="epoch0", n_shards=32)
    return (
        TR.pack_epoch_shards(sharded, budget=256)
        .select(
            F.col("shard").cast("long").alias("shard"),
            "doc_id",
            "n_tokens",
            "cum_end",
            "chunk_id",
        )
        .orderBy("shard", "cum_end", "chunk_id")
    )


# --------------------------------------------------------------------------
# DSIR (Xie et al. 2023): hashed-bigram importance weights of a target
# sample vs the raw corpus, integer-exact (operators/dsir.py). Target =
# the 'zh' slice; zh docs must surface at the top of the ranking, which
# makes the query self-validating. Scale shape: the bucket LM is <= 512
# rows (broadcast), totals are 1-row scalars (crossJoin broadcast); the
# only corpus-scale shuffle is the per-doc weight agg.
@register(
    "sample_dsir_weights",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 512 AS bucket
      FROM (
        SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1])) AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
      )
    ),
    tgt AS (
      SELECT f.* FROM feats f
      JOIN (SELECT doc_id FROM documents WHERE lang = 'zh') USING (doc_id)
    ),
    raw_lm AS (SELECT bucket, COUNT(*) AS cnt_r FROM feats GROUP BY bucket),
    tgt_lm AS (SELECT bucket, COUNT(*) AS cnt_t FROM tgt GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM feats) AS t_raw,
                   (SELECT COUNT(*) FROM tgt) AS t_tgt),
    lm AS (
      SELECT r.bucket,
             (length(bin(((COALESCE(t.cnt_t, 0) + 1) * 1048576)
                         // (r.cnt_r + 1))) - 1)
             - (length(bin(((tot.t_tgt + 512) * 1048576)
                           // (tot.t_raw + 512))) - 1) AS llr
      FROM raw_lm r LEFT JOIN tgt_lm t USING (bucket), tot
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lm.llr) AS BIGINT) AS dsir_weight
    FROM feats f JOIN lm USING (bucket)
    GROUP BY f.doc_id
    ORDER BY dsir_weight DESC, doc_id
    LIMIT 100
    """,
    tags=("training", "sampling", "dsir"),
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.dsir import dsir_importance_weights

    docs = load_table(spark, sf_dir, "documents")
    return (
        dsir_importance_weights(docs, F.col("lang") == "zh")
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Shard-balance QA for the seeded epoch shuffle (round 11): per
# (shard, source) observed vs expected doc counts under the corpus
# marginals — the training-export sanity check that a "random" shard
# assignment didn't concentrate a source (a skewed shard trains a
# skewed step). Everything is exact integers: expected_x1e6 =
# shard_total*source_total*1e6 div N (fits: 5e4*5e5*1e6 < 2^63 at
# sf1.0) and deviation_x = obs*N - shard_total*source_total (the
# chi-square numerator, unscaled). Plan: one corpus-scale hash agg to
# (shard, source) counts, then broadcast joins of the two tiny
# marginal frames — no window, no second corpus pass.
@register(
    "corpus_shard_source_balance",
    oracle="""
    WITH assign AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('epoch0' || '|' ||
                    CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
               AS shard
      FROM documents),
    obs AS (SELECT shard, source, COUNT(*) AS n_docs
            FROM assign GROUP BY shard, source),
    st AS (SELECT shard, SUM(n_docs) AS shard_total FROM obs GROUP BY shard),
    so AS (SELECT source, SUM(n_docs) AS source_total FROM obs GROUP BY source),
    tot AS (SELECT SUM(n_docs) AS n FROM obs)
    SELECT CAST(st.shard AS BIGINT) AS shard, so.source,
           CAST(COALESCE(o.n_docs, 0) AS BIGINT) AS n_docs,
           CAST((st.shard_total * so.source_total * 1000000) // tot.n
                AS BIGINT) AS expected_x1e6,
           CAST(COALESCE(o.n_docs, 0) * tot.n
                - st.shard_total * so.source_total AS BIGINT) AS deviation_x
    FROM st CROSS JOIN so CROSS JOIN tot
    LEFT JOIN obs o ON o.shard = st.shard AND o.source = so.source
    ORDER BY st.shard, so.source
    """,
    tags=("training", "shuffle", "quality"),
)
def corpus_shard_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("epoch0"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 8
    ).alias("shard")
    obs = (
        docs.select(shard, "source")
        .groupBy("shard", "source")
        .agg(F.count("*").alias("n_docs"))
    )
    st = obs.groupBy("shard").agg(F.sum("n_docs").alias("shard_total"))
    so = obs.groupBy("source").agg(F.sum("n_docs").alias("source_total"))
    tot = obs.agg(F.sum("n_docs").alias("n"))
    # Complete (shard × source) grid — both marginal frames are tiny —
    # so a source MISSING from a shard (the worst imbalance: obs=0,
    # expected>0) appears in the report instead of vanishing with the
    # absent obs row; also makes Σ deviation_x = 0 per shard/source an
    # exact law (tests/test_round11_ops.py).
    grid = st.crossJoin(F.broadcast(so)).crossJoin(F.broadcast(tot))
    return (
        grid.join(F.broadcast(obs), ["shard", "source"], "left")
        .select(
            F.col("shard").cast("long").alias("shard"),
            "source",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.expr("(shard_total * source_total * 1000000L) div n")
            .cast("long")
            .alias("expected_x1e6"),
            (
                F.coalesce(F.col("n_docs"), F.lit(0)) * F.col("n")
                - F.col("shard_total") * F.col("source_total")
            )
            .cast("long")
            .alias("deviation_x"),
        )
        .orderBy("shard", "source")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split audit (round 12): the md5-bucket
# split every training pipeline needs — engine- and run-independent
# (bucket = md5(doc_id) mod 100: 0-97 train, 98 val, 99 test), so any
# system recomputes the SAME assignment with no RNG state to ship.
# Emits the per-(source, split) census a data card reports: doc count,
# token mass, and the split's exact ppm share of its source.
@register(
    "sample_deterministic_split",
    oracle="""
    WITH d AS (
      SELECT source,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 >= 98
               THEN CASE
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 = 98 THEN 'val' ELSE 'test' END
               ELSE 'train'
             END AS split,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, split, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
      FROM d GROUP BY source, split
    ),
    t AS (SELECT source, SUM(n_docs) AS src_docs FROM c GROUP BY source)
    SELECT c.source, c.split,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST(c.n_docs * 1000000 // t.src_docs AS BIGINT) AS share_ppm
    FROM c JOIN t ON t.source = c.source
    ORDER BY c.source, c.split
    """,
    tags=("training", "sampling"),
)
def sample_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    d = docs.select(
        "source",
        F.when(bucket == 98, F.lit("val"))
        .when(bucket == 99, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    c = d.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    t = c.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    return (
        c.join(F.broadcast(t), "source")
        .select(
            "source",
            "split",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr("(n_docs * 1000000) div src_docs")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("source", "split")
    )


# --------------------------------------------------------------------------
# Token-budget planning table (round 12): token mass by (lang, doc-size
# class) with each cell's exact ppm share of the corpus — the input a
# mixture planner scales its per-language sampling temperatures from.
# Size classes are powers-of-two token-count buckets (integer bit
# length — the zipf/heaps idiom), so the table is stable across
# engines with zero float ops.
@register(
    "corpus_token_budget",
    oracle="""
    WITH d AS (
      SELECT lang,
             length(bin(len(string_split_regex(trim(text), '\\s+')))) - 1
               AS size_class,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT lang, size_class, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
      FROM d GROUP BY lang, size_class
    ),
    t AS (SELECT SUM(n_tokens) AS total FROM c)
    SELECT c.lang, CAST(c.size_class AS BIGINT) AS size_class,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST(c.n_tokens * 1000000 // t.total AS BIGINT) AS token_share_ppm
    FROM c, t
    ORDER BY c.lang, size_class
    """,
    tags=("training", "corpus", "stats"),
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bitlen = (F.length(F.conv(ntok.cast("long"), 10, 2)) - 1).cast("long")
    d = docs.select(
        "lang", bitlen.alias("size_class"), ntok.alias("n_tok")
    )
    c = d.groupBy("lang", "size_class").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    t = c.agg(F.sum("n_tokens").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            F.col("size_class").cast("long").alias("size_class"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr("(n_tokens * 1000000) div total")
            .cast("long")
            .alias("token_share_ppm"),
        )
        .orderBy("lang", "size_class")
    )
