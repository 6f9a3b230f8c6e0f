"""BPE trainer/encoder parity against an independent pure-python
implementation (the Sennrich et al. reference algorithm), plus merge-
application semantics unit tests.

The distributed trainer (operators/bpe.py) must produce the IDENTICAL
merge table and the identical per-doc token counts as the sequential
reference on the same corpus — that is the correctness bar for the
rows-only registry entries ``bpe_train_merges`` / ``bpe_encode_trained``.
"""

from __future__ import annotations

import random
from collections import Counter

import pyspark.sql.functions as F
import pytest

from ftm_datalake_spark.operators import bpe as B
from ftm_datalake_spark.sources.tables import load_table

# ---------------------------------------------------------------- reference


def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(
    word_freqs: dict[str, int], num_merges: int
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    vocab = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (left, right), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, freq))
        vocab = {w: _py_merge(s, left, right) for w, s in vocab.items()}
    return merges, vocab


# ---------------------------------------------------------------- unit


def test_merge_adjacent_semantics(spark):
    cases = [
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "a", "b"], ("a", "b"), ["a", "ab"]),
        (["a", "b", "a", "b"], ("a", "b"), ["ab", "ab"]),
        (["x"], ("a", "b"), ["x"]),
        ([], ("a", "b"), []),
        (["b", "a", "n", "a", "n", "a"], ("a", "n"), ["b", "an", "an", "a"]),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "i INT, syms ARRAY<STRING>",
    )
    for i, (syms, (l, r), want) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(B.merge_adjacent(F.col("syms"), l, r).alias("m"))
            .head()["m"]
        )
        assert got == want, f"case {i}: merge({syms},{l},{r}) = {got} != {want}"
        assert _py_merge(syms, l, r) == want  # reference agrees with spec


def test_merge_adjacent_random_words_match_reference(spark):
    rng = random.Random(42)
    words = [
        # length >= 1: the vocab contract (regexp '[a-z]+' words) never
        # yields an empty word, and Spark's split('', '') is [''] not []
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "word STRING").withColumn(
        "syms", F.expr("split(word, '')")
    )
    for left, right in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        got = [
            r["m"]
            for r in df.select(
                B.merge_adjacent(F.col("syms"), left, right).alias("m")
            ).collect()
        ]
        want = [_py_merge(list(w), left, right) for w in words]
        assert got == want


def test_fixed_encode_hand_computed(spark):
    df = spark.createDataFrame(
        [("The tin man, ON the banana era!",)], "text STRING"
    )
    got = df.select(B.apply_fixed_merges(F.col("text")).alias("e")).head()["e"]
    # th→T, Te→E, in→I, tI→Q, an→A, er→R, on→O, re→C applied in rank order
    assert got == "E Q mA O E bAAa Ra"


# ---------------------------------------------------------------- parity


@pytest.fixture(scope="module")
def corpus_words(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = B.word_vocab(docs).collect()
    return {r["word"]: r["freq"] for r in vocab}


def test_train_matches_pure_python(spark, sf_dir, corpus_words):
    docs = load_table(spark, sf_dir, "documents")
    got, _ = B.bpe_train(docs, num_merges=12)
    want, _ = _py_train(corpus_words, 12)
    assert got == want


def test_encode_counts_match_pure_python(spark, sf_dir, corpus_words):
    import re

    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = B.bpe_train(docs, num_merges=8)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.encode_token_counts(docs, vocab).collect()
    }
    _, py_vocab = _py_train(corpus_words, 8)
    tok_len = {w: len(s) for w, s in py_vocab.items()}
    want = {}
    for r in docs.select("doc_id", "text").collect():
        n = sum(tok_len[w] for w in re.findall("[a-z]+", r["text"].lower()))
        if n:
            want[r["doc_id"]] = n
    assert got == want


def test_fixed_encode_equals_pairwise_merge_semantics():
    """The single-char replace chain (bpe_encode_fixed / DuckDB oracle)
    and leftmost-non-overlapping pair merging (merge_adjacent semantics)
    are the same algorithm under a symbol relabeling: applying
    FIXED_MERGES as string replaces must yield exactly as many symbols
    per word as applying the corresponding pair merges to char lists."""
    from ftm_datalake_spark.operators.bpe import FIXED_MERGES

    # the pair-merge view of the fixed table: output symbols spelled out
    expanded = {}  # single-char alias -> multi-char symbol
    pair_merges = []
    for left, right, new in FIXED_MERGES:
        l_sym = expanded.get(left, left)
        r_sym = expanded.get(right, right)
        expanded[new] = l_sym + r_sym
        pair_merges.append((l_sym, r_sym))

    rng = random.Random(7)
    words = ["the", "tin", "ting", "banana", "rere", "theater", "onion",
             "anana", "thth", "tintin"] + [
        "".join(rng.choice("theinaor") for _ in range(rng.randint(1, 14)))
        for _ in range(300)
    ]
    for w in words:
        s = w
        for left, right, new in FIXED_MERGES:
            s = s.replace(left + right, new)
        syms = list(w)
        for l_sym, r_sym in pair_merges:
            syms = _py_merge(syms, l_sym, r_sym)
        assert len(s) == len(syms), (w, s, syms)
        # and the relabeling expands back to the original word
        assert "".join(expanded.get(c, c) for c in s) == w


def test_apply_merges_handles_unseen_words(spark, sf_dir, corpus_words):
    """OOV encode: folding the learned table over words the trainer
    never saw gives exactly the python reference's segmentation."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _ = B.bpe_train(docs, num_merges=8)
    unseen = ["zzzquux", "thequick", "ananab", "xyzzy", "a"]
    assert all(w not in corpus_words for w in unseen[:1])  # genuinely OOV
    df = spark.createDataFrame([(w,) for w in unseen], "word STRING").withColumn(
        "syms", F.expr("split(word, '')")
    )
    got = [
        r["m"]
        for r in df.select(B.apply_merges(F.col("syms"), merges).alias("m")).collect()
    ]
    want = []
    for w in unseen:
        syms = list(w)
        for left, right, _f in merges:
            syms = _py_merge(syms, left, right)
        want.append(syms)
    assert got == want
