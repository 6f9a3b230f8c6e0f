"""Unit tests for CCNet-style segment dedup and Gopher quality gates."""

from __future__ import annotations

from ftm_datalake_spark.operators import textops as X


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_dedup_drops_shared_segments_keeps_order(spark):
    boiler = "one two three four"  # a full 4-word segment shared by both docs
    docs = _docs(
        spark,
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in X.segment_dedup(docs, seg_len=4, max_freq=1).collect()
    }
    assert out[1]["n_segs"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["n_segs"] == 2 and out[2]["n_dropped"] == 1
    # the surviving text is exactly the unique tail segment
    assert out[1]["clean_len"] == len("alpha beta gamma delta")
    assert out[1]["clean_sig"] != out[2]["clean_sig"]


def test_segment_dedup_all_dropped_yields_empty_signature(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x y")])
    out = X.segment_dedup(docs, seg_len=4, max_freq=1).collect()
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in out:
        assert r["n_dropped"] == 1 and r["clean_len"] == 0
        assert r["clean_sig"] == empty_md5


def test_segment_dedup_partitioning_independent(spark, sf_dir):
    from ftm_datalake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = X.segment_dedup(docs).orderBy("doc_id").collect()
    b = X.segment_dedup(docs.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_gopher_rules_flags(spark):
    docs = _docs(
        spark,
        [
            # 4 words → fails wordcount; has 2 stopwords
            (1, "the a cat sat"),
            # 35 words incl. stopwords, normal lengths → passes
            (2, " ".join(["the", "a", "of"] + ["word"] * 32)),
            # long words → fails mean length
            (3, " ".join(["the", "a"] + ["extraordinarily"] * 33)),
        ],
    )
    out = {r["doc_id"]: r for r in X.gopher_rules(docs).collect()}
    assert not out[1]["wordcount_ok"] and out[1]["stopword_ok"]
    assert out[2]["passes"]
    assert not out[3]["meanlen_ok"] and not out[3]["passes"]


# ----------------------------------------------------- prefix-filter join
def test_prefix_filter_finds_exact_and_near_duplicates(spark):
    from ftm_datalake_spark.operators.dedup import prefix_filter_pairs

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # identical → Jaccard 1
            (3, "alpha beta gamma delta zeta"),  # 4/6 = 0.67 < 0.8 → out
            (4, "totally different words here now"),
        ],
    )
    out = {(r["doc_a"], r["doc_b"]) for r in prefix_filter_pairs(docs).collect()}
    assert out == {(1, 2)}


def test_prefix_filter_matches_bruteforce_on_small_corpus(spark, sf_dir):
    """No-false-negative guarantee: prefix-filter output == brute-force
    all-pairs Jaccard >= 4/5 on a small real corpus."""
    from ftm_datalake_spark.operators.dedup import prefix_filter_pairs
    from ftm_datalake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_pairs(docs).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    sets = {r["doc_id"]: set(r["text"].split()) for r in rows}
    ids = sorted(sets)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 5 * inter >= 4 * union:
                expected.add((a, b))
    assert got == expected


def test_prefix_filter_bitset_equals_general_path(spark, sf_dir, monkeypatch):
    """r14 small-alphabet bitset form == the general packed-array form,
    pair-for-pair including (common, uni), on a real small-vocab corpus
    (the general path is forced by shrinking the vocabulary gate)."""
    from ftm_datalake_spark.operators import dedup as D
    from ftm_datalake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    bitset = {
        (r["doc_a"], r["doc_b"], r["common"], r["uni"])
        for r in D.prefix_filter_pairs(docs).collect()
    }
    monkeypatch.setattr(D, "_BITSET_VOCAB_MAX", 0)
    general = {
        (r["doc_a"], r["doc_b"], r["common"], r["uni"])
        for r in D.prefix_filter_pairs(docs).collect()
    }
    assert bitset == general
    assert bitset  # the corpus has near-dups: a vacuous pass would hide a bug


def test_prefix_filter_general_path_on_large_vocab(spark):
    """A >64-token vocabulary must route to the general path and still
    match brute force (the bench corpora are all small-vocab, so this
    is the general path's only guard after the r14 bitset split)."""
    from ftm_datalake_spark.operators.dedup import prefix_filter_pairs

    # 70-token vocabulary; doc i holds tokens [i, i+12) of the ring, so
    # adjacent docs overlap 11/13 > 0.8 and distant docs overlap none.
    vocab = [f"w{i:02d}" for i in range(70)]
    rows = [
        (i, " ".join(vocab[j % 70] for j in range(i, i + 12)))
        for i in range(0, 35)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["common"], r["uni"])
        for r in prefix_filter_pairs(docs).collect()
    }
    sets = {i: {vocab[j % 70] for j in range(i, i + 12)} for i, _ in rows}
    ids = sorted(sets)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 5 * inter >= 4 * union:
                expected.add((a, b, inter, union))
    assert got == expected
    assert got  # adjacent ring docs share 11/13 > 0.8 — never vacuous


# --------------------------------------------------------------- sketches
def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from ftm_datalake_spark.operators.sketches import cms_estimates

    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 1
    tok = spark.createDataFrame(rows, "token string")
    keys = tok.distinct()
    est = {
        r["token"]: r["est"]
        for r in cms_estimates(tok, keys, depth=3, width=1024).collect()
    }
    exact = {"a": 10, "b": 5, "c": 1}
    for t, x in exact.items():
        assert est[t] >= x  # CMS guarantee
    # width 1024 with 3 keys → no collisions → exact
    assert est == exact


def test_cms_partitioning_independent(spark, sf_dir):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.sketches import cms_estimates
    from ftm_datalake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    keys = tok.distinct()
    a = sorted(tuple(r) for r in cms_estimates(tok, keys).collect())
    b = sorted(
        tuple(r) for r in cms_estimates(tok.repartition(13), keys).collect()
    )
    assert a == b  # the sketch merge is associative/commutative


def test_hll_estimate_within_expected_error(spark):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.sketches import hll_estimate, hll_registers

    n = 5000
    keys = spark.range(n).select(F.col("id").cast("string").alias("key"))
    est = hll_estimate(hll_registers(keys, m=64), m=64).first()["estimate"]
    # standard error for m=64 is ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - n) / n < 0.40


def test_hll_insensitive_to_duplicates_and_partitioning(spark):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.sketches import hll_estimate, hll_registers

    base = spark.range(1000).select(F.col("id").cast("string").alias("key"))
    dup = base.unionAll(base).unionAll(base).repartition(17)
    e1 = hll_estimate(hll_registers(base, m=64), m=64).first()["estimate"]
    e2 = hll_estimate(hll_registers(dup, m=64), m=64).first()["estimate"]
    assert e1 == e2


def test_bloom_has_no_false_negatives(spark, sf_dir):
    from ftm_datalake_spark.plans import REGISTRY

    rows = REGISTRY["sketch_bloom_decontaminate"].builder(spark, sf_dir).collect()
    for r in rows:
        if r["actually_present"]:
            assert r["maybe_present"]
