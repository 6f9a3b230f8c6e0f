"""Training-data pipeline operators beyond the reference surface:
benchmark decontamination, quota/stratified sampling, sequence packing,
PII redaction, incremental (new-vs-old) dedup, int8 embedding
quantization.

These are the passes a pretraining-corpus build runs after crawl +
curation (the reference stops at analyzers, docs/rfc.md:131-140); each is
expressed as built-in Column expressions over one scan so the shapes hold
at 100 TB:

- decontamination: the benchmark n-gram set is small by construction
  (eval suites are MBs, not TBs) → broadcast hash join against the
  exploded train postings; the train side never shuffles for the join,
  only the per-doc count aggregation shuffles (keyed by doc_id, uniform).
- quota sampling: one window per source partition — the only skew risk is
  a mega-source, which AQE skew-split handles since rows within a source
  are never needed on one task beyond the top-K prefix.
- stratified sampling: pure projection + filter on an md5-derived bucket;
  zero shuffle, deterministic across engines/runs (no RNG state).
- sequence packing: the concat-and-chunk scheme (docs laid on one global
  token stream, chunk = token index div B) — the global running sum uses
  the two-phase range-partitioned cumsum (operators/rank.py), so there is
  NO single-partition window at any scale.
- PII redaction: regexp projections, zero shuffle.
- incremental dedup: only NEW docs' MinHash signatures are computed;
  matching is a band-bucket equi-join against the (stored) old signature
  table — the 100 TB shape where re-signaturing the whole lake per
  increment would be the naive quadratic-cost mistake.
- int8 quantization: per-vector projection (abs-max scale), zero shuffle;
  integer checksums keep the output exactly comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.dedup import lsh_bands, minhash_signatures, shingle_postings
from ftm_datalake_spark.operators.rank import with_global_cumsum
from ftm_datalake_spark.operators.textops import token_count

# Word-level n-gram size for decontamination overlap (5-grams: the usual
# 8-13-gram eval-overlap window scaled down to the test corpus' short docs).
DECONTAM_NGRAM = 5

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DECONTAM_NGRAM,
    min_hits: int = 1,
) -> DataFrame:
    """Train docs sharing >= min_hits distinct word k-grams with the
    benchmark corpus: (doc_id, n_hits). The benchmark gram set is
    broadcast — the train postings are never shuffled for the join."""
    train_grams = shingle_postings(train, text_col, id_col, k)
    bench_grams = (
        shingle_postings(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))  # postings are distinct per doc
        .where(F.col("n_hits") >= min_hits)
    )


def exact_substring_matches(
    train: DataFrame,
    bench: DataFrame,
    w: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring contamination report (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", the
    suffix-array exact-match family re-expressed relationally):
    (train_doc, bench_doc, n_matched_blocks) for every train doc sharing
    an exact ``w``-char window with a benchmark doc.

    Block-window scheme — the scale shape:
    - TRAIN side emits only block-ALIGNED windows (stride = w): a 1/w
      row inflation of the corpus, not the all-offsets quadratic-ish
      explosion. Any shared run of length >= 2w-1 necessarily contains
      one fully train-aligned block, so detection of runs >= 2w-1 is
      guaranteed; shorter shared runs (>= w) are detected when aligned.
    - BENCH side emits ALL offsets, distinct-ed — benchmarks are eval
      sets, small by definition, so |bench| x len windows is bounded.
    - One hash equi-join on window content, then a (train, bench) pair
      aggregation with map-side combine. No cartesian anywhere.
    """
    t = F.col(text_col)
    tb = train.where(F.length(t) >= w).select(
        F.col(id_col).alias("train_doc"),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) div {w}),"
                f" j -> substring({text_col}, (j - 1) * {w} + 1, {w}))"
            )
        ).alias("win"),
    )
    bw = (
        bench.where(F.length(t) >= w)
        .select(
            F.col(id_col).alias("bench_doc"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {w} + 1),"
                    f" i -> substring({text_col}, i, {w}))"
                )
            ).alias("win"),
        )
        .distinct()
    )
    return (
        tb.join(bw, "win")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count_distinct("win").alias("n_matched_blocks"))
    )


def sample_per_group_cap(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    cap: int,
) -> DataFrame:
    """Keep at most `cap` rows per group, by the given total order — the
    per-domain quota pass of a corpus build (caps crawl-heavy domains)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
    )


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic engine-portable sampling bucket: first 8 hex chars of
    md5(value) as an int, mod `buckets`. No RNG: re-runs and other engines
    assign identical buckets, so samples are reproducible by construction."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates_pct: dict[str, int],
    default_pct: int, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its hash bucket
    falls under its stratum's percentage quota."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    bucket = hash_bucket(F.col(id_col))
    return df.withColumn("bucket", bucket).where(F.col("bucket") < rate)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_offsets: bool = False,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end on
    one global token stream (ordered by id) and the stream is cut every
    `budget` tokens; a doc belongs to every chunk its token span overlaps
    — (doc_id, n_tokens, chunk_id), one row per (doc, chunk).

    This is the packing most pretraining loaders use (no padding waste,
    docs may straddle chunk boundaries). The global token offsets come
    from the two-phase cumsum, so the plan has no single-partition stage.

    ``with_offsets`` adds ``cum_end`` (the doc's exclusive global token
    end) so a reader can slice each doc's tokens back into its chunks
    (pipelines/training_export.read_training_chunks)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    cum = with_global_cumsum(toks, ["doc_id"], "n_tokens", out_col="cum_end")
    cols = ["doc_id", "n_tokens"] + (["cum_end"] if with_offsets else [])
    return _explode_chunk_spans(cum, budget, cols)


def _explode_chunk_spans(cum, budget: int, out_cols: list) -> DataFrame:
    """Shared doc→chunk span explosion for both packers: a doc whose
    token span is [cum_end - n_tokens, cum_end) overlaps every chunk in
    [span_start div budget, (cum_end - 1) div budget]. Rows with zero
    or null token counts are dropped — explode(sequence(null, ..)) would
    silently drop them anyway, and a 0-count row landing exactly on a
    chunk boundary would emit a DESCENDING phantom span (sequence
    auto-steps -1), corrupting the dense-chunk-id invariant."""
    first_chunk = F.expr(f"(cum_end - n_tokens) div {budget}")
    last_chunk = F.expr(f"(cum_end - 1) div {budget}")
    return cum.where(F.col("n_tokens") > 0).select(
        *out_cols,
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )


def pack_epoch_shards(
    sharded: DataFrame,
    budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Per-shard concat-and-chunk packing in EPOCH order: shard K's
    token stream is its docs laid end-to-end by ``pos`` (the
    :func:`epoch_shards` shuffle order), cut every ``budget`` tokens.
    Chunk ids are LOCAL to the shard, so a per-shard loader is
    self-contained and a new seed (a new epoch) yields new sequences.

    Input: an :func:`epoch_shards` output (shard, pos + the text).
    Output: (shard, doc_id, n_tokens, cum_end, chunk_id), one row per
    (doc, chunk) span. The cumsum window partitions by shard — each
    task holds corpus/n_shards rows, the same scale contract as
    epoch_shards itself."""
    toks = sharded.select(
        "shard",
        "pos",
        "doc_id",
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_end", F.sum("n_tokens").over(w).cast("long"))
    return _explode_chunk_spans(
        cum, budget, ["shard", "doc_id", "n_tokens", "cum_end"]
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails/phones with tagged placeholders and count the hits.
    Pure regexp projection — the patterns are RE2-and-Java-safe so the
    redaction is reproducible on any engine."""
    text = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
            "n_phones": F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
            out_col: F.regexp_replace(
                F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
        }
    )


def incremental_dedup(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    rows_per_band: int = 3,
) -> DataFrame:
    """New-vs-old MinHash-LSH dedup: (new_doc, dup_of) for every new doc
    sharing >= 1 LSH band with an existing doc; dup_of is the minimum
    matching old id (the canonical keeper).

    Incremental shape: in production the old side is the *stored*
    signature table — only the new increment is shingled and hashed, and
    the match is a band-bucket equi-join, never a rescan of the lake."""
    old_bands = lsh_bands(
        minhash_signatures(
            shingle_postings(old_docs, text_col, id_col, k), num_hashes
        ),
        num_hashes,
        rows_per_band,
    )
    new_bands = lsh_bands(
        minhash_signatures(
            shingle_postings(new_docs, text_col, id_col, k), num_hashes
        ),
        num_hashes,
        rows_per_band,
    )
    n = new_bands.alias("n")
    o = old_bands.alias("o")
    return (
        n.join(
            o,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_val") == F.col("o.band_val")),
        )
        .groupBy(F.col("n.doc_id").alias("new_doc"))
        .agg(F.min(F.col("o.doc_id")).alias("dup_of"))
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Abs-max int8 quantization per vector, summarized with exact-integer
    checksums: (vec_id, n_dims, scale, q_sum, q_min, q_max).

    q_i = floor((x_i / scale) * 127 + 0.5) — explicit round-half-up so the
    arithmetic is the same IEEE double sequence on every engine; integer
    outputs (sum/min/max) are order-independent and exactly comparable.
    Zero vectors quantize to all-zero (scale 0 guard).

    r14 (guide §1.2 per-task work): higher-order array functions are
    interpreted — no codegen, no common-subexpression elimination — so
    inlining `absmax` inside the per-element lambda and repeating `q`
    for sum/min/max re-evaluated the abs-max scan per ELEMENT and the
    whole quantize transform per CONSUMER (~12k expression evals per
    64-dim row). Staging scale and q as attributes in intermediate
    projects makes each a single evaluation per row; CollapseProject
    keeps multi-consumer non-cheap aliases staged (SPARK-36718)."""
    emb = F.col(vec_col)
    absmax = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    staged = df.select(
        F.col(id_col),
        F.size(emb).alias("n_dims"),
        absmax.alias("scale"),
        emb.alias("__e"),
    )
    q = F.transform(
        F.col("__e"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0).cast("long")).otherwise(
            F.floor((x.cast("double") / F.col("scale")) * 127 + 0.5).cast(
                "long"
            )
        ),
    )
    staged_q = staged.select(F.col(id_col), "n_dims", "scale", q.alias("__q"))
    return staged_q.select(
        F.col(id_col),
        "n_dims",
        "scale",
        F.aggregate(
            F.col("__q"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_sum"),
        F.array_min("__q").alias("q_min"),
        F.array_max("__q").alias("q_max"),
    )


def seeded_shuffle_key(seed: str, id_col: Column) -> Column:
    """Engine-portable pseudo-random permutation key: md5(seed || '|' || id).

    No RNG state: the permutation is a pure function of (seed, id), so it
    is identical across runs, engines, and partitionings — unlike
    F.rand(seed), whose output depends on row-to-partition placement."""
    return F.md5(F.concat_ws("|", F.lit(seed), id_col.cast("string")))


def seeded_shuffle(
    df: DataFrame, seed: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic seeded global shuffle of a training corpus.

    Sorting by the md5 key is Spark's range-partitioned global sort
    (sampled boundaries, parallel per-range sorts — never one reducer);
    md5 keys are uniform, so ranges are balanced by construction. One seed
    per epoch gives independent reproducible permutations."""
    return df.withColumn(
        "shuffle_key", seeded_shuffle_key(seed, F.col(id_col))
    ).orderBy("shuffle_key", id_col)


def epoch_shards(
    df: DataFrame, seed: str, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Shard assignment + in-shard position for one training epoch.

    shard = integer fold of the shuffle key's first 8 hex chars (uniform
    over shards); pos = row_number within the shard ordered by the key.
    The position window partitions by shard, so it parallelizes across
    shards and each task holds corpus/n_shards rows — pick n_shards ≥
    cluster parallelism at the target scale (a writer would
    repartition("shard") on exactly the same column)."""
    key = seeded_shuffle_key(seed, F.col(id_col))
    shard = (
        F.conv(F.substring(F.col("shuffle_key"), 1, 8), 16, 10).cast("long")
        % n_shards
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.withColumn("shuffle_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
    )


def importance_sample(
    df: DataFrame, rate_pct: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Weighted (importance) sampling without RNG state: keep a row iff
    its md5 hash bucket falls under the row's own acceptance percentage
    (a Column, e.g. derived from a quality score). Pure projection +
    filter — zero shuffle, reproducible on any engine/partitioning, and
    upweights exactly the rows the rate expression favors."""
    return (
        df.withColumn("rate_pct", rate_pct.cast("long"))
        .withColumn("bucket", hash_bucket(F.col(id_col)))
        .where(F.col("bucket") < F.col("rate_pct"))
    )


def _race_key(w: Column, id_cols: list[str]) -> Column:
    """Integer A-ES race key: ONE md5 of the row identity (32-bit hex
    prefix, the portable hash idiom) floor-divided by the weight.

    P(h div w <= t) = |{h < (t+1)·w}| / 2^32 ≈ w·t / 2^32 — linear in w
    at the small-key tail, exactly like P(min of w uniform tickets < t)
    ≈ w·t, so for a top-k selection with k ≪ N the quotient race is
    statistically equivalent to holding w lottery tickets — at ONE hash
    and ONE division per row instead of w string hashes (the old
    md5-per-ticket build was 64 md5s/row at max weight, the dominant
    cost of the whole sampler). Earlier attempt for the record: deriving
    the w tickets from one hash via the LINEAR family (h·(A·j+B)) mod P
    makes the tickets an arithmetic progression in j — correlated draws
    whose minimum barely improves with w, empirically destroying weight
    monotonicity (59/100 heavy winners vs ~98 expected). The quotient
    form has the exact tail law with no per-ticket loop at all.
    DuckDB mirror: `h // wt` on the same md5 prefix."""
    ident = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    h = F.conv(F.substring(F.md5(ident), 1, 8), 16, 10).cast("long")
    # (h - h%w)/w is exact floor division here (h < 2^32 ≪ 2^53, so the
    # double-routed quotient cannot round — the ADVICE-r9 caveat about
    # this idiom applies only beyond 2^53)
    return ((h - (h % w)) / w).cast("long")


def weighted_sample_hashrace(
    df: DataFrame,
    weight: Column,
    k: int,
    id_cols: list[str],
    max_weight: int = 64,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — no RNG state, no floats.

    Efraimidis–Spirakis A-ES draws key u_i^(1/w_i) and keeps the top-k;
    here the continuous draw is replaced by the integer quotient race
    key = md5-prefix(id) div w (see :func:`_race_key` for the tail-law
    argument and why the min-of-w-tickets form was retired), and the k
    smallest race keys across the table win. P(key <= t) is linear in w
    at the selection tail — monotone in w exactly like u^(1/w); ties
    are broken by id_cols in the final order, so the winner set is a
    pure function of the data — identical across runs, engines and
    partitionings.

    Scale shape: ONE md5 + ONE division per row (the old build hashed
    w tickets per row — 64 string md5s at max weight, the dominant cost
    of the whole sampler); the global top-k is orderBy().limit(k) —
    Spark's TakeOrderedAndProject, which keeps a k-row heap per task
    and merges heaps, no global sort. ``max_weight`` floors the
    quotient's granularity; for unbounded weights log-bucket the weight
    first (the race only needs the weight's order of magnitude).
    """
    w = F.least(F.lit(max_weight), F.greatest(F.lit(1), weight.cast("long")))
    return (
        df.withColumn("wt", w)
        .withColumn("race_key", _race_key(w, id_cols))
        .orderBy("race_key", *id_cols)
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    weight: Column,
    k: int,
    id_cols: list[str],
    group_cols: list[str],
    max_weight: int = 64,
) -> DataFrame:
    """Per-group weighted sampling without replacement: the same hashed
    integer lottery as :func:`weighted_sample_hashrace`, but the k
    smallest race keys are taken PER GROUP via one row_number window —
    the per-source quota sampler's shape (one bounded window per group,
    parallel across groups) with A-ES weighting inside each group."""
    w = F.least(F.lit(max_weight), F.greatest(F.lit(1), weight.cast("long")))
    keyed = df.withColumn("wt", w).withColumn(
        "race_key", _race_key(w, id_cols)
    )
    win = Window.partitionBy(*group_cols).orderBy("race_key", *id_cols)
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )
