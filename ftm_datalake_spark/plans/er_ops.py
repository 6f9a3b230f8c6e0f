"""Entity-resolution registry queries: rare-token blocking, bounded
candidate generation, and Jaccard-verified cross-source matches over the
documents table (operators/blocking.py).

Cross-engine determinism: tokenization is regexp_split on \\s+ with empty
tokens dropped in both engines; the per-doc rare-token ranking orders by
(document_frequency, token) which is a total order over a doc's distinct
tokens; the match threshold is integer arithmetic; the jaccard double is
exact IEEE division of integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.blocking import (
    candidate_pairs,
    distinct_token_postings,
    entity_match,
    rare_token_block_keys,
)
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

# Shared oracle CTEs mirroring distinct_token_postings +
# rare_token_block_keys (k=2) + the max-block-size purge.
_ORACLE_BLOCK_CTES = """
    WITH tok AS (
      SELECT DISTINCT doc_id, source, t.token
      FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(token)
      WHERE t.token <> ''
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
    ranked AS (
      SELECT tok.doc_id, tok.source, tok.token,
             ROW_NUMBER() OVER (
               PARTITION BY tok.doc_id ORDER BY dfreq.df, tok.token) AS rn
      FROM tok JOIN dfreq USING (token)
    ),
    blockkey AS (
      SELECT doc_id, ANY_VALUE(source) AS source,
             STRING_AGG(token, '|' ORDER BY rn) AS block_key
      FROM ranked WHERE rn <= 2 GROUP BY doc_id
    ),
    okblocks AS (
      SELECT block_key FROM blockkey GROUP BY block_key HAVING COUNT(*) <= 100
    ),
    b AS (SELECT blockkey.* FROM blockkey JOIN okblocks USING (block_key))
"""


@register(
    "er_block_stats",
    oracle=_ORACLE_BLOCK_CTES
    + """
    SELECT block_key, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM b GROUP BY block_key
    ORDER BY n_docs DESC, block_key
    """,
    tags=("er", "blocking", "agg"),
)
def er_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving-block profile: size and source spread per block key."""
    docs = load_table(spark, sf_dir, "documents")
    postings = distinct_token_postings(docs)
    keys = rare_token_block_keys(postings, k=2)
    ok = (
        keys.groupBy("block_key")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") <= 100)
        .select("block_key")
    )
    return (
        keys.join(ok, "block_key")
        .groupBy("block_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy(F.col("n_docs").desc(), "block_key")
    )


@register(
    "er_blocked_matches",
    oracle=_ORACLE_BLOCK_CTES
    + """,
    cand AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             a.source AS source_a, b2.source AS source_b
      FROM b a JOIN b b2 ON a.block_key = b2.block_key
           AND a.doc_id < b2.doc_id AND a.source <> b2.source
    ),
    tsize AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT cand.doc_a, cand.doc_b, cand.source_a, cand.source_b,
             COUNT(*) AS n_inter
      FROM cand
      JOIN tok ta ON ta.doc_id = cand.doc_a
      JOIN tok tb ON tb.doc_id = cand.doc_b AND tb.token = ta.token
      GROUP BY cand.doc_a, cand.doc_b, cand.source_a, cand.source_b
    )
    SELECT doc_a, doc_b, source_a, source_b, n_inter,
           sa.n_tok + sb.n_tok - n_inter AS n_union,
           CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) AS jaccard
    FROM inter
    JOIN tsize sa ON sa.doc_id = doc_a
    JOIN tsize sb ON sb.doc_id = doc_b
    WHERE n_inter * 100 >= (sa.n_tok + sb.n_tok - n_inter) * 80
    ORDER BY doc_a, doc_b
    """,
    tags=("er", "blocking", "join", "bench"),
    bench=True,
    # r14: entity_match materializes the shared postings subtree once
    # (guide §2.4; A/B at sf0.1: 1.485 s → 0.857 s, min of 4
    # interleaved) — the localCheckpoint truncates this plan's lineage.
    checkpointed=True,
)
def er_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source matches: rare-token blocks → bounded candidates →
    integer-exact Jaccard ≥ 0.8."""
    docs = load_table(spark, sf_dir, "documents")
    return entity_match(
        docs, k=2, max_block_size=100, threshold_pct=80
    ).orderBy("doc_a", "doc_b")


@register(
    "er_fuzzy_part_names",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_name <> b.p_name
      AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY key_a, key_b
    """,
    tags=("er", "fuzzy", "join"),
)
def er_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification within brand blocks: candidate pairs
    come from the brand equi-join (bounded block size), the quadratic
    levenshtein only runs inside a block — the same block→verify shape
    as er_blocked_matches, with an integer-exact distance metric."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    # r14 (guide §2.5 + §1; A/B in OPTIMIZATION_r14.md): the brand join
    # key has ~25 distinct values, so the quadratic levenshtein stage —
    # the whole cost of this query, ~19 s at sf0.1 — ran on a handful
    # of byte-light partitions that AQE coalesced further. Salting the
    # probe side + replicating the build side restores parallelism
    # (identical pair set); the explicit repartition on the join key is
    # exempt from AQE's byte-based coalescing. The distance itself is
    # the THRESHOLDED levenshtein (early-abandon at 2; Spark ≥3.5):
    # rows above the threshold return -1 and are dropped by the same
    # predicate that previously dropped their exact distance — for
    # kept rows the value is the exact distance, so results are
    # unchanged. A |len(a)-len(b)| <= 2 prefilter (length difference
    # lower-bounds edit distance) prunes before the O(n·m) work.
    dp = spark.sparkContext.defaultParallelism
    b_factor = max(1, dp // 2)
    n_parts = max(2, 2 * dp)
    a = (
        part.select(
            F.col("p_brand").alias("b"),
            F.col("p_partkey").alias("key_a"),
            F.col("p_name").alias("name_a"),
        )
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("key_a")), F.lit(b_factor))
        )
        .repartition(n_parts, "b", "__salt")
    )
    b = (
        part.select(
            F.col("p_brand").alias("b"),
            F.col("p_partkey").alias("key_b"),
            F.col("p_name").alias("name_b"),
        )
        .withColumn(
            "__salt",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(b_factor - 1))
            ),
        )
        .repartition(n_parts, "b", "__salt")
    )
    return (
        a.join(b, ["b", "__salt"])
        .where(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("name_a") != F.col("name_b"))
            & (
                F.abs(
                    F.length(F.col("name_a")) - F.length(F.col("name_b"))
                )
                <= 2
            )
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("name_a"), F.col("name_b"), 2).cast("long"),
        )
        .where(F.col("dist").between(0, 2))
        .select("key_a", "key_b", "name_a", "name_b", "dist")
        .orderBy("key_a", "key_b")
    )


# --------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage (round 5): within-brand
# candidate pairs scored by the classic likelihood-ratio product —
# per field, m/u if the values agree else (1-m)/(1-u) — with the
# agreement weights as FIXED small-integer rationals, so the product is
# two exact BIGINT products (numerator, denominator) and the match
# score is the integer-ppm quantization of their ratio: bit-exact
# ranking in both engines, no log-space floats anywhere. Blocking keeps
# the pair space bounded (brand blocks, same as er_fuzzy_part_names);
# the quadratic work never leaves a block.
#
# Field weights (m = P(agree | match), u = P(agree | non-match)):
#   type:      m=9/10, u=1/10  -> agree 9/1,  disagree 1/9  (x9, /9)
#   size:      m=4/5,  u=1/4   -> agree 16/5, disagree 4/15
#   name head: m=7/10, u=1/8   -> agree 28/5, disagree 12/35
# (the third field is the leading word of p_name — a name-prefix
# agreement pattern, since the synthetic part table has no container)
_FS_WEIGHTS = {
    "type": ((9, 1), (1, 9)),
    "size": ((16, 5), (4, 15)),
    "name_head": ((28, 5), (12, 35)),
}


@register(
    "er_fellegi_sunter_matches",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS ag_type,
             CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS ag_size,
             CASE WHEN string_split(a.p_name, ' ')[1]
                       = string_split(b.p_name, ' ')[1] THEN 1 ELSE 0 END
               AS ag_cont
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    ),
    scored AS (
      SELECT key_a, key_b, ag_type, ag_size, ag_cont,
             CAST(CASE WHEN ag_type = 1 THEN 9 ELSE 1 END
              * CASE WHEN ag_size = 1 THEN 16 ELSE 4 END
              * CASE WHEN ag_cont = 1 THEN 28 ELSE 12 END AS BIGINT) AS num,
             CAST(CASE WHEN ag_type = 1 THEN 1 ELSE 9 END
              * CASE WHEN ag_size = 1 THEN 5 ELSE 15 END
              * CASE WHEN ag_cont = 1 THEN 5 ELSE 35 END AS BIGINT) AS den
      FROM pairs
    )
    SELECT key_a, key_b,
           CAST(ag_type AS BIGINT) AS ag_type,
           CAST(ag_size AS BIGINT) AS ag_size,
           CAST(ag_cont AS BIGINT) AS ag_cont,
           CAST((num * 1000000 - (num * 1000000) % den) / den AS BIGINT)
             AS score_ppm
    FROM scored
    WHERE num * 1000000 >= den * 5000000  -- LR >= 5: probable match
    ORDER BY score_ppm DESC, key_a, key_b
    """,
    tags=("er", "blocking", "join"),
)
def er_fellegi_sunter_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.split(F.col("p_name"), " ").getItem(0).alias("p_head"),
    )
    # r14 (guide §2.5): the brand block key has ~25 distinct values, so
    # the pair stage ran on a handful of AQE-coalesced partitions — the
    # er_fuzzy_part_names salted-join fix applied verbatim (identical
    # pair set, B× the tasks; B degenerates to 1 on production core
    # counts where brands outnumber cores).
    dp = spark.sparkContext.defaultParallelism
    b_factor = max(1, dp // 2)
    n_parts = max(2, 2 * dp)
    a = (
        part.select(
            F.col("p_brand").alias("b"),
            F.col("p_partkey").alias("key_a"),
            F.col("p_type").alias("ta"),
            F.col("p_size").alias("sa"),
            F.col("p_head").alias("ca"),
        )
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("key_a")), F.lit(b_factor))
        )
        .repartition(n_parts, "b", "__salt")
    )
    b = (
        part.select(
            F.col("p_brand").alias("b"),
            F.col("p_partkey").alias("key_b"),
            F.col("p_type").alias("tb"),
            F.col("p_size").alias("sb"),
            F.col("p_head").alias("cb"),
        )
        .withColumn(
            "__salt",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(b_factor - 1))
            ),
        )
        .repartition(n_parts, "b", "__salt")
    )
    pairs = a.join(b, ["b", "__salt"]).where(F.col("key_a") < F.col("key_b"))
    ag_type = F.when(F.col("ta") == F.col("tb"), 1).otherwise(0)
    ag_size = F.when(F.col("sa") == F.col("sb"), 1).otherwise(0)
    ag_cont = F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)
    num = (
        F.when(ag_type == 1, 9).otherwise(1)
        * F.when(ag_size == 1, 16).otherwise(4)
        * F.when(ag_cont == 1, 28).otherwise(12)
    ).cast("long")
    den = (
        F.when(ag_type == 1, 1).otherwise(9)
        * F.when(ag_size == 1, 5).otherwise(15)
        * F.when(ag_cont == 1, 5).otherwise(35)
    ).cast("long")
    scaled = num * F.lit(1_000_000)
    score = ((scaled - scaled % den) / den).cast("long")
    return (
        pairs.select(
            "key_a",
            "key_b",
            ag_type.cast("long").alias("ag_type"),
            ag_size.cast("long").alias("ag_size"),
            ag_cont.cast("long").alias("ag_cont"),
            score.alias("score_ppm"),
        )
        .where(scaled >= den * F.lit(5_000_000))
        .orderBy(F.col("score_ppm").desc(), "key_a", "key_b")
    )


# --------------------------------------------------------------------------
# Golden-record survivorship: the product end of the ER pipeline —
# verified matches → connected-component families → ONE merged record
# per family under deterministic survivorship rules (most-complete text
# wins ties by min id; modal language wins ties alphabetically; sources
# union sorted). The oracle replays the same rules through windows over
# the recursive-CTE family closure.
@register(
    "er_golden_record",
    checkpointed=True,
    oracle=_ORACLE_BLOCK_CTES.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + """,
    cand AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM b a JOIN b b2 ON a.block_key = b2.block_key
           AND a.doc_id < b2.doc_id AND a.source <> b2.source
    ),
    tsize AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT cand.doc_a, cand.doc_b, COUNT(*) AS n_inter
      FROM cand
      JOIN tok ta ON ta.doc_id = cand.doc_a
      JOIN tok tb ON tb.doc_id = cand.doc_b AND tb.token = ta.token
      GROUP BY cand.doc_a, cand.doc_b
    ),
    m AS (
      SELECT doc_a, doc_b FROM inter
      JOIN tsize sa ON sa.doc_id = doc_a
      JOIN tsize sb ON sb.doc_id = doc_b
      WHERE n_inter * 100 >= (sa.n_tok + sb.n_tok - n_inter) * 80
    ),
    e AS (SELECT doc_a AS a, doc_b AS b2 FROM m
          UNION SELECT doc_b AS a, doc_a AS b2 FROM m),
    reach AS (
      SELECT a AS n, a AS r FROM e
      UNION
      SELECT reach.n, e.b2 AS r FROM reach JOIN e ON reach.r = e.a
    ),
    fam AS (SELECT n AS doc_id, MIN(r) AS family FROM reach GROUP BY n),
    mem AS (
      SELECT fam.family, d.doc_id, d.lang, d.source, d.n_chars
      FROM fam JOIN documents d USING (doc_id)
    ),
    rep AS (
      SELECT family, doc_id AS rep_id, n_chars AS rep_chars,
             ROW_NUMBER() OVER (
               PARTITION BY family ORDER BY n_chars DESC, doc_id) AS rn
      FROM mem
    ),
    lmode AS (
      SELECT family, lang,
             ROW_NUMBER() OVER (
               PARTITION BY family ORDER BY COUNT(*) DESC, lang) AS rn
      FROM mem GROUP BY family, lang
    ),
    base AS (
      SELECT family, COUNT(*) AS n_members,
             STRING_AGG(DISTINCT source, '|' ORDER BY source) AS sources
      FROM mem GROUP BY family
    )
    SELECT CAST(base.family AS BIGINT) AS family,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(rep.rep_id AS BIGINT) AS rep_id,
           CAST(rep.rep_chars AS BIGINT) AS rep_chars,
           lmode.lang AS top_lang,
           base.sources AS sources
    FROM base
    JOIN rep ON rep.family = base.family AND rep.rn = 1
    JOIN lmode ON lmode.family = base.family AND lmode.rn = 1
    ORDER BY family
    """,
    tags=("er", "blocking", "graph"),
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matches → families → one survivor row per family. Family labels
    come from the log-round star CC (operators/components.py); the
    survivorship aggregates are max_by over a total-order struct key
    (longest text, tie min id), a two-level modal-language agg, and a
    sorted collect_set — every rule a deterministic total order, so the
    merged record is engine- and partitioning-independent."""
    from ftm_datalake_spark.operators.components import dedup_families

    docs = load_table(spark, sf_dir, "documents")
    pairs = entity_match(
        docs, k=2, max_block_size=100, threshold_pct=80
    ).select("doc_a", "doc_b")
    fam = dedup_families(pairs)
    mem = fam.join(
        docs.select("doc_id", "lang", "source", "n_chars"), "doc_id"
    )
    # most-complete representative: max (n_chars, -doc_id) struct key
    repkey = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg"))
    base = mem.groupBy("family").agg(
        F.count("*").alias("n_members"),
        F.max_by("doc_id", repkey).alias("rep_id"),
        F.max_by("n_chars", repkey).alias("rep_chars"),
        F.array_join(F.sort_array(F.collect_set("source")), "|").alias(
            "sources"
        ),
    )
    from pyspark.sql import Window

    lang_counts = mem.groupBy("family", "lang").agg(F.count("*").alias("c"))
    lw = Window.partitionBy("family").orderBy(F.col("c").desc(), F.col("lang"))
    top_lang = (
        lang_counts.withColumn("rn", F.row_number().over(lw))
        .where(F.col("rn") == 1)
        .select("family", F.col("lang").alias("top_lang"))
    )
    return (
        base.join(top_lang, "family")
        .select(
            F.col("family").cast("long"),
            F.col("n_members").cast("long"),
            F.col("rep_id").cast("long"),
            F.col("rep_chars").cast("long"),
            "top_lang",
            "sources",
        )
        .orderBy("family")
    )


# --------------------------------------------------------------------------
# Meta-blocking with Weighted Edge Pruning (Papadakis et al., TKDE
# 2014; operators/blocking.meta_blocking_wep): 3-gram shingle blocks
# with df in [2, 20] (purging), comparison edges weighted by
# shared-block count (CBS), edges below the global mean pruned. The
# mean test is integer cross-multiplication; the (n_edges,
# total_weight) scalar ships via crossJoin(broadcast(..)).
@register(
    "er_meta_blocking_wep",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
      )
    ),
    dfreq AS (SELECT g, COUNT(*) AS df FROM tok GROUP BY g),
    ok AS (
      SELECT tok.g, tok.doc_id FROM tok JOIN dfreq USING (g)
      WHERE df BETWEEN 2 AND 20
    ),
    edges AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS cbs
      FROM ok a JOIN ok b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    tot AS (SELECT COUNT(*) AS n_edges, SUM(cbs) AS total_weight
            FROM edges)
    SELECT doc_a, doc_b, CAST(cbs AS BIGINT) AS cbs
    FROM edges, tot
    WHERE cbs * n_edges >= total_weight
    ORDER BY cbs DESC, doc_a, doc_b
    LIMIT 500
    """,
    tags=("er", "blocking", "metablocking"),
)
def er_meta_blocking_wep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEP-pruned comparison graph over documents token blocks."""
    from ftm_datalake_spark.operators.blocking import meta_blocking_wep

    docs = load_table(spark, sf_dir, "documents")
    return (
        meta_blocking_wep(docs, min_df=2, max_df=20)
        .orderBy(F.desc("cbs"), "doc_a", "doc_b")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995;
# operators/blocking.sorted_neighborhood_pairs): global sort by
# (lang, n_chars), compare each record to its 4 successors. The sort
# position comes from the distributed rank helper (range shuffle +
# per-partition windows + P driver offsets — no single-partition
# exchange); neighbor pairing is a bounded-fanout EQUI-join on rank.
# The oracle's ORDER BY pins NULLS FIRST to match Spark's ascending
# null ordering — DuckDB defaults to NULLS LAST, so a NULL lang /
# n_chars would otherwise rank differently per engine (ADVICE r10).
@register(
    "er_sorted_neighborhood",
    oracle="""
    WITH ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY lang NULLS FIRST,
                                         n_chars NULLS FIRST,
                                         doc_id NULLS FIRST) AS rn
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_dist
    FROM ranked a JOIN ranked b ON b.rn BETWEEN a.rn + 1 AND a.rn + 4
    ORDER BY doc_a, doc_b
    """,
    tags=("er", "blocking", "sortedneighborhood"),
    checkpointed=True,
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ftm_datalake_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs, ["lang", "n_chars"], window=5
    ).orderBy("doc_a", "doc_b")
