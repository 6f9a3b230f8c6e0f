"""Round-10 operator laws: the winnowing document-frequency cap
(VERDICT r9 weak #1 / next-round #2) and its skew behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftm_datalake_spark.operators.winnow import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)

# 20 docs; every doc carries the SAME leading 8-token boilerplate run
# in 20% of them (docs 0-3), plus a unique tail. Docs 10 and 11 share a
# genuine long overlap.
_BOILER = "the quick brown fox jumps over the lazy dog indeed"
_OVERLAP = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _docs(spark):
    rows = []
    for i in range(20):
        tail = " ".join(f"tok{i}x{j}" for j in range(12))
        if i < 4:
            rows.append((i, f"{_BOILER} {tail}"))
        elif i in (10, 11):
            rows.append((i, f"{_OVERLAP} {tail}"))
        else:
            rows.append((i, tail))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_capped_pairs_subset_of_uncapped(spark):
    fps = winnow_fingerprints(_docs(spark)).localCheckpoint(eager=True)
    uncapped = _pairs(winnow_candidate_pairs(fps, min_shared=1))
    capped = _pairs(winnow_candidate_pairs(fps, min_shared=1, max_df=3))
    assert capped <= uncapped
    assert capped < uncapped  # the planted boilerplate must be pruned


def test_cap_drops_boilerplate_group_keeps_real_match(spark):
    fps = winnow_fingerprints(_docs(spark)).localCheckpoint(eager=True)
    uncapped = _pairs(winnow_candidate_pairs(fps, min_shared=1))
    capped = _pairs(winnow_candidate_pairs(fps, min_shared=1, max_df=2))
    # uncapped: the 4-doc boilerplate group contributes all C(4,2) pairs
    boiler_pairs = {(a, b) for a in range(4) for b in range(4) if a < b}
    assert boiler_pairs <= uncapped
    # capped at 2: boilerplate hashes (df=4) are gone, the genuine
    # 2-doc overlap (df=2) survives
    assert not (boiler_pairs & capped)
    assert (10, 11) in capped and (10, 11) in uncapped


def test_cap_bounds_quadratic_collision_group(spark):
    # plant one boilerplate run in 20% of a larger corpus: uncapped
    # pre-aggregation work is quadratic in the group (C(n,2) pairs from
    # that hash alone); capped work from it is ZERO rows.
    n, hot = 100, 20
    rows = [
        (
            i,
            (_BOILER if i < hot else " ".join(f"u{i}w{j}" for j in range(9)))
            + " "
            + " ".join(f"t{i}q{j}" for j in range(8)),
        )
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs).localCheckpoint(eager=True)
    uncapped = winnow_candidate_pairs(fps, min_shared=1).count()
    capped = winnow_candidate_pairs(fps, min_shared=1, max_df=5).count()
    assert uncapped >= hot * (hot - 1) // 2  # quadratic group present
    assert capped == 0  # hot hashes pruned, nothing else collides


def test_max_df_none_is_identity(spark):
    fps = winnow_fingerprints(_docs(spark)).localCheckpoint(eager=True)
    a = _pairs(winnow_candidate_pairs(fps, min_shared=1))
    b = _pairs(winnow_candidate_pairs(fps, min_shared=1, max_df=None))
    assert a == b


def test_registry_capped_query_parity(spark):
    from tests.oracle_utils import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "dedup_winnowing_pairs_capped")


# ---------------------------------------------------------------------------
# Entity-xref inverted index (VERDICT r9 next-round #7 / rfc.md:100,180)

def _stmts(spark):
    from ftm_datalake_spark.schemas import STATEMENT_SCHEMA

    rows = [
        ("s1", "e1", "e1", "Ownership", "owner", "e9", "ds1", "ingest", None, None),
        ("s2", "e2", "e2", "Ownership", "owner", "e9", "ds1", "ingest", None, None),
        ("s3", "e2", "e2", "Ownership", "asset", "e7", "ds1", "ingest", None, None),
        # duplicate reference: must count once
        ("s4", "e2", "e2", "Ownership", "asset", "e7", "ds1", "other", None, None),
        # literal prop: excluded when ref_props given
        ("s5", "e1", "e1", "Ownership", "name", "ACME", "ds1", "ingest", None, None),
        # self-reference: dropped
        ("s6", "e9", "e9", "Ownership", "owner", "e9", "ds1", "ingest", None, None),
    ]
    return spark.createDataFrame(rows, STATEMENT_SCHEMA)


def test_entity_xref_inverted_semantics(spark):
    from ftm_datalake_spark.operators.statements import entity_xref_inverted

    inv = {
        r["referenced_id"]: (r["n_referrers"], list(r["referrers"]))
        for r in entity_xref_inverted(
            _stmts(spark), ref_props=["owner", "asset"]
        ).collect()
    }
    assert inv == {"e9": (2, ["e1", "e2"]), "e7": (1, ["e2"])}


def test_entity_xref_without_prop_filter_includes_literals(spark):
    from ftm_datalake_spark.operators.statements import entity_xref_pairs

    pairs = {
        (r["referenced_id"], r["referrer"])
        for r in entity_xref_pairs(_stmts(spark)).collect()
    }
    assert ("ACME", "e1") in pairs  # caller's job to pass ref_props


def test_inverted_idx_sink_roundtrip_and_forms(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import (
        read_inverted_idx,
        write_inverted_idx,
    )

    out = str(tmp_path / "ds")
    target = write_inverted_idx(
        _stmts(spark), out, ref_props=["owner", "asset"]
    )
    assert target.endswith("inverted.idx")
    import os

    assert os.path.isfile(target)
    back = read_inverted_idx(spark, target)
    got = {
        r["referenced_id"]: (r["n_referrers"], list(r["referrers"]))
        for r in back.collect()
    }
    assert got == {"e9": (2, ["e1", "e2"]), "e7": (1, ["e2"])}
    # single file is referenced_id-ordered JSONL
    lines = open(target).read().splitlines()
    ids = [__import__("json").loads(l)["referenced_id"] for l in lines]
    assert ids == sorted(ids)
    # directory form above the row cap, same read-back
    target2 = write_inverted_idx(
        _stmts(spark), str(tmp_path / "big"),
        ref_props=["owner", "asset"], single_file_max_rows=1,
    )
    assert os.path.isdir(target2)
    got2 = {
        r["referenced_id"]: (r["n_referrers"], list(r["referrers"]))
        for r in read_inverted_idx(spark, target2).collect()
    }
    assert got2 == got


def test_inverted_index_cli(spark, tmp_path, capsys):
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch

    src = str(tmp_path / "stmts.parquet")
    _stmts(spark).write.parquet(src)
    out = str(tmp_path / "ds")
    ns = argparse.Namespace(
        cmd="inverted-index", source=src, out=out, props="owner,asset"
    )
    assert _dispatch(spark, ns) in (0, None)
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 2 and res["path"].endswith("inverted.idx")


def test_registry_xref_parity(spark):
    from tests.oracle_utils import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "entities_xref_inverted")


# ---------------------------------------------------------------------------
# Privacy family laws (operators/privacy.py)

def _pdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )


def test_k_anonymity_flags_exactly_small_groups(spark):
    from ftm_datalake_spark.operators.privacy import k_anonymity_groups

    rows = [(i, "a", "en", 100) for i in range(5)] + [
        (10, "a", "de", 100),
        (11, "b", "en", 100),
        (12, "b", "en", 100),
    ]
    out = {
        (r["source"], r["lang"]): (r["n"], r["suppressed"])
        for r in k_anonymity_groups(
            _pdocs(spark, rows), ["source", "lang"], k=3
        ).collect()
    }
    assert out == {
        ("a", "en"): (5, False),
        ("a", "de"): (1, True),
        ("b", "en"): (2, True),
    }


def test_l_diversity_homogeneity_attack_flagged(spark):
    from ftm_datalake_spark.operators.privacy import l_diversity_audit

    rows = [
        (1, "a", "en", 100), (2, "a", "de", 100), (3, "a", "fr", 100),
        # k-anonymous (n=3) but language-homogeneous:
        (4, "b", "en", 100), (5, "b", "en", 100), (6, "b", "en", 100),
    ]
    out = {
        r["source"]: (r["distinct_sensitive"], r["diverse"])
        for r in l_diversity_audit(
            _pdocs(spark, rows), ["source"], "lang", l=2
        ).collect()
    }
    assert out == {"a": (3, True), "b": (1, False)}


def test_generalization_ladder_picks_minimal_level(spark):
    from ftm_datalake_spark.operators.privacy import generalization_ladder

    # source 'fine': 4 docs in one 100-bucket -> level 0 suffices at k=4
    # source 'wide': values straddle 100-buckets (k fails) but share a
    # 1000-bucket -> level 1
    # source 'tiny': 2 docs far apart -> only the all-bucket level
    rows = (
        [(i, "fine", "en", 100 + i) for i in range(4)]
        + [(10 + i, "wide", "en", 100 * i) for i in range(8)]
        + [(20, "tiny", "en", 10), (21, "tiny", "en", 90_000)]
    )
    out = {
        r["source"]: r["chosen_level"]
        for r in generalization_ladder(
            _pdocs(spark, rows), "source", "n_chars", [100, 1000, None], k=2
        ).collect()
    }
    assert out == {"fine": 0, "wide": 1, "tiny": 2}
    # k monotonicity: raising k never picks a finer level
    out_k4 = {
        r["source"]: r["chosen_level"]
        for r in generalization_ladder(
            _pdocs(spark, rows), "source", "n_chars", [100, 1000, None], k=4
        ).collect()
    }
    for src, lvl in out.items():
        if src == "tiny":
            # 2 docs < k=4: no level (even one-bucket) qualifies, so
            # the source is absent — suppress it entirely
            assert "tiny" not in out_k4
        else:
            assert out_k4[src] >= lvl


# ---------------------------------------------------------------------------
# Duplicate-span coverage laws (operators/dedup.duplicate_span_coverage)

_RUN8 = "alpha bravo charlie delta echo foxtrot golf hotel"


def test_span_coverage_zero_without_cross_doc_dups(spark):
    from ftm_datalake_spark.operators.dedup import duplicate_span_coverage

    # letter-only fillers: the [a-z]+ tokenizer drops digits, so tokens
    # must be unique as PURE LETTER strings per doc
    alpha = "abcdefghijkl"
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"u{alpha[i]}w{alpha[j]}" for j in range(12)))
            for i in range(5)
        ],
        "doc_id long, text string",
    )
    rows = duplicate_span_coverage(docs, k=8).collect()
    assert all(r["covered"] == 0 and r["coverage_bp"] == 0 for r in rows)


def test_span_coverage_counts_planted_run_exactly(spark):
    from ftm_datalake_spark.operators.dedup import duplicate_span_coverage

    # docs 0 and 1 share exactly one 8-token run inside unique context;
    # doc 2 is clean. Each carrier: 8 covered positions of 16 tokens.
    rows = [
        (0, _RUN8 + " " + " ".join(f"a{j}" for j in range(8))),
        (1, " ".join(f"b{j}" for j in range(8)) + " " + _RUN8),
        (2, " ".join(f"c{j}" for j in range(16))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["covered"], r["coverage_bp"])
        for r in duplicate_span_coverage(docs, k=8).collect()
    }
    assert out[0] == (16, 8, 5000)
    assert out[1] == (16, 8, 5000)
    assert out[2] == (16, 0, 0)


def test_span_coverage_overlapping_grams_merge(spark):
    from ftm_datalake_spark.operators.dedup import duplicate_span_coverage

    # a shared 9-token run = two overlapping duplicated 8-grams; the
    # covered position set must be the 9-token union, not 16
    run9 = _RUN8 + " india"
    rows = [
        (0, run9 + " " + " ".join(f"a{j}" for j in range(7))),
        (1, run9 + " " + " ".join(f"b{j}" for j in range(7))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["covered"]
        for r in duplicate_span_coverage(docs, k=8).collect()
    }
    assert out == {0: 9, 1: 9}


def test_round10_registry_parity_small(spark):
    from tests.oracle_utils import compare_query

    for name in (
        "privacy_k_anonymity",
        "privacy_l_diversity",
        "privacy_generalization_ladder",
        "dedup_duplicate_span_coverage",
    ):
        compare_query(spark, "/root/testdata/sf0.001", name)
