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
