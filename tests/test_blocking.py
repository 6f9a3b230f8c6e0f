"""Entity-resolution blocking operator semantics (operators/blocking.py)."""

from __future__ import annotations

from ftm_datalake_spark.operators.blocking import (
    candidate_pairs,
    distinct_token_postings,
    entity_match,
    rare_token_block_keys,
)


def _docs(spark):
    # Five filler docs carry the common vocab (df 7-8 for alpha..epsilon),
    # so zebra (df=4) is the rarest token of docs 1-4 by construction.
    rows = [
        (1, "zebra alpha beta gamma delta", "src0"),
        (2, "zebra alpha beta gamma epsilon", "src1"),
        # shares the rare token but little else: jaccard(1,3) = 2/6
        (3, "zebra epsilon delta", "src1"),
        # same-source near-dup of doc 1 — must NOT match (cross-source only)
        (4, "zebra alpha beta gamma delta", "src0"),
    ] + [
        (i, "alpha beta gamma delta epsilon", "src2") for i in range(5, 10)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_postings_distinct_and_nonempty(spark):
    df = spark.createDataFrame(
        [(1, "a a  b", "s0")], ["doc_id", "text", "source"]
    )
    got = distinct_token_postings(df).collect()
    assert sorted(r.token for r in got) == ["a", "b"]


def test_block_keys_use_rarest_tokens(spark):
    postings = distinct_token_postings(_docs(spark))
    keys = {r.doc_id: r.block_key for r in rare_token_block_keys(postings, k=2).collect()}
    # zebra (df=4) is rarest for docs 1-4; second-rarest differs per doc
    for d in (1, 2, 3, 4):
        assert keys[d].startswith("zebra|")
    for d in range(5, 10):
        assert "zebra" not in keys[d]


def test_candidates_are_cross_source_and_capped(spark):
    postings = distinct_token_postings(_docs(spark))
    keys = rare_token_block_keys(postings, k=2)
    pairs = {
        (r.doc_a, r.doc_b) for r in candidate_pairs(keys, max_block_size=100).collect()
    }
    # all pairs cross-source with doc_a < doc_b; (1,4) same-source excluded
    assert (1, 4) not in pairs
    for a, b in pairs:
        assert a < b
    # purging: cap of 1 kills every block → no candidates
    assert candidate_pairs(keys, max_block_size=1).count() == 0


def test_entity_match_threshold_integer_exact(spark):
    df = _docs(spark)
    # docs 1,2: |inter|=4 (zebra alpha beta gamma), |union|=6 → 4/6 ≈ 0.667
    got = entity_match(df, k=1, max_block_size=100, threshold_pct=66)
    matched = {(r.doc_a, r.doc_b): r for r in got.collect()}
    # cross-source pairs above 4/6: (1,2) and (2,4); (1,3) is 2/6; (1,4)
    # and (2,3) are same-source; fillers are all src2
    assert set(matched) == {(1, 2), (2, 4)}
    assert matched[(1, 2)].n_inter == 4
    assert matched[(1, 2)].n_union == 6
    # raising past 4/6 drops it: 4*100 < 6*67
    strict = entity_match(df, k=1, max_block_size=100, threshold_pct=67)
    assert (1, 2) not in {(r.doc_a, r.doc_b) for r in strict.collect()}
