"""Persisted incremental IVF index laws (operators/ann_index.py):

1. A freshly built index answers exactly like the inline ivf_topk —
   the persistence layer changes WHERE the lists live, not the math.
2. build(C) + append(Δ) == build(C ∪ Δ under C's frozen codebook) on
   both postings and probe results (FAISS add() semantics).
3. Re-appending the same delta is a no-op (vec_id ledger anti-join).
4. The probe reads ONLY the probed cluster partitions (asserted on
   the physical plan's PartitionFilters).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).localCheckpoint()


def _split(corpus):
    base = corpus.where(F.col("vec_id") % 10 != 0)
    delta = corpus.where(F.col("vec_id") % 10 == 0)
    return base, delta


def _postings_set(spark, out):
    return {
        (r["vid"], int(r["cluster"]))
        for r in spark.read.parquet(os.path.join(out, "postings")).collect()
    }


def _topk_set(df):
    return {
        (r["qid"], r["nid"], r["rank"], r["cosine"]) for r in df.collect()
    }


def test_index_matches_inline_probe(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
    )
    from ftm_datalake_spark.operators.similarity import ivf_topk

    queries = corpus.where(F.col("vec_id") < 5)
    out = str(tmp_path / "idx")
    stats = build_ivf_index(spark, corpus, out)
    assert stats["vectors"] == corpus.count()

    got = ivf_index_topk(spark, out, queries, k=3, nprobe=2)
    want = ivf_topk(corpus, queries, k=3, nprobe=2)
    assert _topk_set(got) == _topk_set(want)


def test_append_equals_rebuild_under_frozen_codebook(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_topk,
    )
    from ftm_datalake_spark.operators.similarity import ivf_centroids

    base, delta = _split(corpus)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")

    build_ivf_index(spark, base, inc)
    stats = append_ivf_index(spark, delta, inc)
    assert stats["appended"] == delta.count()
    assert stats["clusters_touched"]

    build_ivf_index(
        spark, corpus, full, centroids=ivf_centroids(base)
    )
    assert _postings_set(spark, inc) == _postings_set(spark, full)

    queries = corpus.where(F.col("vec_id") < 5)
    assert _topk_set(ivf_index_topk(spark, inc, queries, k=3, nprobe=2)) == (
        _topk_set(ivf_index_topk(spark, full, queries, k=3, nprobe=2))
    )


def test_reappend_is_noop(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
    )

    base, delta = _split(corpus)
    out = str(tmp_path / "idx")
    build_ivf_index(spark, base, out)
    append_ivf_index(spark, delta, out)
    before = _postings_set(spark, out)
    stats = append_ivf_index(spark, delta, out)
    assert stats == {"appended": 0, "clusters_touched": []}
    assert _postings_set(spark, out) == before


def test_probe_reads_only_probed_partitions(spark, corpus, tmp_path):
    """The partition pruning is in the PHYSICAL plan: the postings
    FileScan carries a PartitionFilters equality on the single probed
    cluster, so only that inverted-list directory is read.
    (``inputFiles()`` can't show this — it lists the relation before
    pruning.)"""
    import re

    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
    )

    out = str(tmp_path / "idx")
    stats = build_ivf_index(spark, corpus, out)
    assert stats["clusters"] > 1
    queries = corpus.where(F.col("vec_id") == 0)  # one query, nprobe=1
    probe = ivf_index_topk(spark, out, queries, k=3, nprobe=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    cluster_filters = [f for f in filters if "cluster" in f]
    assert cluster_filters, plan
    # a single probed list -> a single equality predicate, not a scan
    assert any(
        re.search(r"cluster#\d+ = \d+", f) for f in cluster_filters
    ), cluster_filters


def test_ann_index_cli(spark, corpus, tmp_path):
    import argparse

    from ftm_datalake_spark.__main__ import _dispatch

    base, delta = _split(corpus)
    src, dsrc = str(tmp_path / "base.parquet"), str(tmp_path / "delta.parquet")
    base.write.parquet(src)
    delta.write.parquet(dsrc)
    idx = str(tmp_path / "idx")

    def ns(action, source, **kw):
        return argparse.Namespace(
            cmd="ann-index", action=action, source=source, index=idx,
            k=kw.get("k", 3), nprobe=kw.get("nprobe", 1),
        )

    assert _dispatch(spark, ns("build", src)) in (0, None)
    assert _dispatch(spark, ns("append", dsrc)) in (0, None)
    assert _dispatch(spark, ns("probe", src, k=2, nprobe=2)) in (0, None)
    assert os.path.isdir(os.path.join(idx, "postings"))
