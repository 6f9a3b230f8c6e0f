"""PQ layer on the persisted IVF index (VERDICT r12 stretch #7).

Laws:
1. enable_pq() re-encodes the postings with code columns; the ADC
   probe holds a recall@10 floor against the exact-L2 golden, and the
   standard refine stage (ADC candidates -> exact re-rank) recovers
   most of the rest — on the driver embeddings fixture.
2. Appends encode against the FROZEN codebooks (schema stays whole,
   re-delivery stays a no-op).
3. rebuild(pq=True) RETRAINS the codebooks from the current postings:
   after a heavy drifted append the frozen quantizer's recall decays,
   the refresh restores it (>= stale, above the floor) — the
   train-once gap the round-12 verdict named.
4. rebuild(pq=False) preserves the existing codes bit-identically
   (codes are cluster-independent; re-clustering must not drop them).

The exact-L2 golden reuses the probe's own refine path with a refine
factor large enough to keep every posting (k * refine >= corpus), so
golden and candidate scoring share one integer arithmetic.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"
NPROBE_ALL = 64  # >= nlist on the fixture: the probe is exact-scope
GOLDEN_REFINE = 400  # k * refine >= corpus size -> exact L2 brute force


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).localCheckpoint()


def _drifted(corpus, id_offset=1000):
    """A distribution the base codebooks never saw: negated and shifted
    embeddings (every subvector lands far from the trained cells)."""
    return corpus.select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.transform(
            "embedding", lambda x: -x + F.lit(3.0).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )


def _topk_ids(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["nid"])
    return out


def _recall(got_df, golden_df):
    got, gold = _topk_ids(got_df), _topk_ids(golden_df)
    assert set(got) == set(gold)
    return sum(
        len(got[q] & gold[q]) / max(len(gold[q]), 1) for q in gold
    ) / len(gold)


@pytest.mark.slow
def test_pq_probe_recall_floor_and_refine_recovery(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        enable_pq,
        ivf_index_topk,
    )

    out = str(tmp_path / "idx")
    build_ivf_index(spark, corpus, out)
    stats = enable_pq(spark, out, n_subspaces=16, codebook_size=32)
    assert stats["pq"] and stats["vectors"] == corpus.count()
    cols = spark.read.parquet(os.path.join(out, "postings")).columns
    assert {f"code{s}" for s in range(16)} <= set(cols)

    queries = corpus.where(F.col("vec_id") < 20)
    golden = ivf_index_topk(
        spark, out, queries, k=10, nprobe=NPROBE_ALL,
        use_pq=True, refine=GOLDEN_REFINE,
    ).localCheckpoint()
    adc = ivf_index_topk(
        spark, out, queries, k=10, nprobe=NPROBE_ALL, use_pq=True
    )
    assert set(adc.columns) == {"qid", "nid", "rank", "adist"}
    adc_recall = _recall(adc, golden)
    assert adc_recall >= 0.3, f"ADC recall@10 collapsed: {adc_recall}"

    refined = ivf_index_topk(
        spark, out, queries, k=10, nprobe=NPROBE_ALL, use_pq=True, refine=5
    )
    refined_recall = _recall(refined, golden)
    assert refined_recall >= adc_recall
    assert refined_recall >= 0.7, (
        f"refine stage failed to recover recall: {refined_recall}"
    )


def test_pq_append_encodes_against_frozen_codebooks(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        enable_pq,
    )

    base = corpus.where(F.col("vec_id") % 10 != 0)
    delta = corpus.where(F.col("vec_id") % 10 == 0)
    out = str(tmp_path / "idx")
    build_ivf_index(spark, base, out)
    enable_pq(spark, out, n_subspaces=8, codebook_size=16)

    stats = append_ivf_index(spark, delta, out)
    assert stats["appended"] == delta.count()
    posted = spark.read.parquet(os.path.join(out, "postings"))
    # every posting (old and appended) carries non-null codes
    assert posted.where(F.col("code0").isNull()).count() == 0
    assert posted.count() == corpus.count()
    # re-delivery stays a no-op with the PQ columns in place
    again = append_ivf_index(spark, delta, out)
    assert again["appended"] == 0


@pytest.mark.slow
def test_pq_rebuild_refresh_restores_recall_after_drift(
    spark, corpus, tmp_path
):
    """The codebook-refresh law: frozen codebooks score a drifted
    append badly; rebuild(pq=True) retrains from the current postings
    and restores recall above the floor."""
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        enable_pq,
        ivf_index_topk,
        rebuild_ivf_index,
    )

    out = str(tmp_path / "idx")
    build_ivf_index(spark, corpus, out)
    enable_pq(spark, out, n_subspaces=16, codebook_size=32)

    drifted = _drifted(corpus).localCheckpoint()
    stats = append_ivf_index(spark, drifted, out)
    assert stats["appended"] == drifted.count()

    queries = drifted.where(F.col("vec_id") < 1020)
    golden = ivf_index_topk(
        spark, out, queries, k=10, nprobe=NPROBE_ALL,
        use_pq=True, refine=GOLDEN_REFINE,
    ).localCheckpoint()
    stale = _recall(
        ivf_index_topk(
            spark, out, queries, k=10, nprobe=NPROBE_ALL, use_pq=True
        ),
        golden,
    )

    res = rebuild_ivf_index(spark, out, pq=True)
    assert res["pq_retrained"] and res["vectors"] == corpus.count() * 2
    golden2 = ivf_index_topk(
        spark, out, queries, k=10, nprobe=NPROBE_ALL,
        use_pq=True, refine=GOLDEN_REFINE,
    ).localCheckpoint()
    fresh = _recall(
        ivf_index_topk(
            spark, out, queries, k=10, nprobe=NPROBE_ALL, use_pq=True
        ),
        golden2,
    )
    assert fresh >= stale, f"refresh regressed recall: {stale} -> {fresh}"
    assert fresh >= 0.25, f"refreshed recall still collapsed: {fresh}"


def test_rebuild_without_pq_flag_preserves_codes(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        _read_pq_meta,
        build_ivf_index,
        enable_pq,
        rebuild_ivf_index,
    )

    out = str(tmp_path / "idx")
    build_ivf_index(spark, corpus, out)
    enable_pq(spark, out, n_subspaces=8, codebook_size=16)
    before = {
        r["vid"]: tuple(r[f"code{s}"] for s in range(8))
        for r in spark.read.parquet(os.path.join(out, "postings")).collect()
    }
    res = rebuild_ivf_index(spark, out)  # re-cluster only
    assert res["rebuilt"] and not res["pq_retrained"]
    after = {
        r["vid"]: tuple(r[f"code{s}"] for s in range(8))
        for r in spark.read.parquet(os.path.join(out, "postings")).collect()
    }
    assert after == before
    # and the pq meta survived the whole-directory swap
    assert _read_pq_meta(spark, out) is not None


def test_pq_flag_requires_enabled_index(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
        rebuild_ivf_index,
    )

    out = str(tmp_path / "idx")
    build_ivf_index(spark, corpus, out)
    with pytest.raises(ValueError):
        rebuild_ivf_index(spark, out, pq=True)
    with pytest.raises(ValueError):
        ivf_index_topk(
            spark, out, corpus.limit(2), k=3, use_pq=True
        ).collect()


def test_cli_pq_lifecycle_roundtrip(spark, corpus, tmp_path, capsys):
    """enable-pq -> probe --pq -> rebuild --pq through the CLI dispatch
    (small codebook: this drives the verbs, the recall laws above drive
    the math)."""
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch

    src = str(tmp_path / "emb.parquet")
    corpus.write.parquet(src)
    idx = str(tmp_path / "idx")

    def ns(action, source=None, **kw):
        return argparse.Namespace(
            cmd="ann-index", action=action, source=source, index=idx,
            k=kw.get("k", 3), nprobe=kw.get("nprobe", 1),
            min_files=2, pq=kw.get("pq", False),
            refine=kw.get("refine", 0),
            subspaces=kw.get("subspaces", 8),
            codebook_size=kw.get("codebook_size", 8),
        )

    assert _dispatch(spark, ns("build", src)) in (0, None)
    capsys.readouterr()
    assert _dispatch(spark, ns("enable-pq")) in (0, None)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pq"] and out["n_subspaces"] == 8

    assert _dispatch(
        spark, ns("probe", src, k=2, nprobe=2, pq=True, refine=3)
    ) in (0, None)
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines and all("adist" in ln for ln in lines)

    assert _dispatch(spark, ns("rebuild", pq=True)) in (0, None)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebuilt"] and out["pq_retrained"]
