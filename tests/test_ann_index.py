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
    """Probes read the probed inverted-list DIRECTORIES explicitly
    (basePath read) — the relation is built from exactly those paths,
    so ``inputFiles()`` is the exact read set: every file sits under a
    ``cluster=`` dir of the probed set, and other lists contribute no
    files at all. (A root read + partition filter would prune the scan
    but still file-list every cluster directory — O(nlist) metadata
    RPCs per probe.)"""
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
    files = [f for f in probe.inputFiles() if "/postings/" in f]
    assert files
    probed = {
        re.search(r"cluster=(\d+)", f).group(1) for f in files
    }
    assert len(probed) == 1  # one query at nprobe=1 -> one list read
    all_files = spark.read.parquet(
        os.path.join(out, "postings")
    ).inputFiles()
    assert len(files) < len(all_files)


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


def test_append_antijoin_reads_only_touched_partitions(spark, corpus, tmp_path):
    """ADVICE r8 #4: the re-delivery anti-join must scan only the
    delta's own cluster partitions, not every inverted list — under a
    frozen codebook a vid can only collide in its assigned cluster.
    The restricted read is an explicit-directory read, so its
    ``inputFiles()`` is the exact set touched."""
    from ftm_datalake_spark.operators.ann_index import (
        _existing_vids,
        build_ivf_index,
    )

    out = str(tmp_path / "idx")
    stats = build_ivf_index(spark, corpus, out)
    assert stats["clusters"] > 1
    postings = os.path.join(out, "postings")
    all_clusters = sorted(
        int(r["cluster"])
        for r in spark.read.parquet(postings).select("cluster").distinct().collect()
    )
    one = all_clusters[:1]
    restricted = _existing_vids(spark, postings, one)
    files = restricted.inputFiles()
    assert files and all(f"cluster={one[0]}/" in f for f in files), files
    # the restricted read returns exactly the one cluster's vids
    posted = spark.read.parquet(postings)
    want = posted.where(F.col("cluster") == one[0]).count()
    assert restricted.count() == want < posted.count()
    # a request for lists that don't exist yet is an empty frame
    ghost = _existing_vids(spark, postings, [max(all_clusters) + 99])
    assert ghost.count() == 0


def test_compact_postings_bit_identical(spark, corpus, tmp_path):
    """Compaction heals small-file decay without changing a single row:
    postings set and probe results are bit-identical, part-file count
    drops, untouched clusters keep their files (VERDICT r8 #3)."""
    from ftm_datalake_spark.operators.ann_index import (
        _cluster_file_counts,
        append_ivf_index,
        build_ivf_index,
        compact_ivf_postings,
        ivf_index_topk,
    )

    base, delta = _split(corpus)
    out = str(tmp_path / "idx")
    build_ivf_index(spark, base, out)
    # several folds -> several part files per touched cluster
    d1 = delta.where(F.col("vec_id") % 20 == 0)
    d2 = delta.where(F.col("vec_id") % 20 != 0)
    append_ivf_index(spark, d1, out)
    append_ivf_index(spark, d2, out)

    postings = os.path.join(out, "postings")
    before_files = _cluster_file_counts(spark, postings)
    assert max(before_files.values()) >= 2, before_files
    before_rows = _postings_set(spark, out)
    queries = corpus.where(F.col("vec_id") < 5)
    before_topk = _topk_set(ivf_index_topk(spark, out, queries, k=3, nprobe=2))

    res = compact_ivf_postings(spark, out, min_files=2)
    assert res["clusters_compacted"]
    assert res["files_after"] < res["files_before"]
    after_files = _cluster_file_counts(spark, postings)
    assert all(after_files[c] == 1 for c in res["clusters_compacted"])
    # untouched partitions still have their original files
    for c, n in before_files.items():
        if c not in res["clusters_compacted"]:
            assert after_files[c] == n

    assert _postings_set(spark, out) == before_rows
    assert (
        _topk_set(ivf_index_topk(spark, out, queries, k=3, nprobe=2))
        == before_topk
    )
    # idempotent: a second compaction finds nothing to do
    res2 = compact_ivf_postings(spark, out, min_files=2)
    assert res2["clusters_compacted"] == []
    assert res2["files_after"] == res["files_after"]


def test_index_stats_reports_drift_and_decay(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_postings,
        ivf_index_stats,
    )

    base, delta = _split(corpus)
    out = str(tmp_path / "idx")
    build_ivf_index(spark, base, out)
    s0 = ivf_index_stats(spark, out)
    assert s0["vectors"] == base.count()
    assert s0["appended_fraction"] == 0.0
    assert s0["max_list"] >= s0["min_list"] > 0
    assert s0["skew"] >= 1.0

    append_ivf_index(spark, delta, out)
    s1 = ivf_index_stats(spark, out)
    assert s1["vectors"] == base.count() + delta.count()
    assert s1["built_vectors"] == base.count()
    assert 0 < s1["appended_fraction"] < 1
    assert s1["max_files_per_cluster"] >= 2  # decay visible

    compact_ivf_postings(spark, out, min_files=2)
    s2 = ivf_index_stats(spark, out)
    assert s2["max_files_per_cluster"] == 1
    assert s2["vectors"] == s1["vectors"]  # stats-only, rows unchanged


def test_ann_index_cli_stats_and_compact(spark, corpus, tmp_path, capsys):
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch

    base, delta = _split(corpus)
    src, dsrc = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(src)
    delta.write.parquet(dsrc)
    idx = str(tmp_path / "idx")

    def ns(action, source=None, **kw):
        return argparse.Namespace(
            cmd="ann-index", action=action, source=source, index=idx,
            k=kw.get("k", 3), nprobe=kw.get("nprobe", 1),
            min_files=kw.get("min_files", 2),
        )

    assert _dispatch(spark, ns("build", src)) in (0, None)
    assert _dispatch(spark, ns("append", dsrc)) in (0, None)
    capsys.readouterr()
    assert _dispatch(spark, ns("stats")) in (0, None)
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["appended_fraction"] > 0
    assert _dispatch(spark, ns("compact")) in (0, None)
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["files_after"] <= res["files_before"]
    # a data action without a source exits loudly
    assert _dispatch(spark, ns("probe")) == 2


def test_rebuild_matches_fresh_build_with_same_codebook(
    spark, corpus, tmp_path
):
    """VERDICT r9 #4 law: rebuilding from the stored postings under a
    given codebook answers bit-exactly like a fresh build_ivf_index on
    the same raw vectors with that codebook — the postings' quantized
    vectors ARE the corpus."""
    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
        rebuild_ivf_index,
    )
    from ftm_datalake_spark.operators.similarity import ivf_centroids

    base, delta = _split(corpus)
    inc = str(tmp_path / "inc")
    build_ivf_index(spark, base, inc)
    # retrained codebook (different partitioning of the label space)
    cents2 = ivf_centroids(
        corpus.withColumn("label", F.col("vec_id") % 7), "label"
    ).localCheckpoint(eager=True)

    from ftm_datalake_spark.operators.ann_index import append_ivf_index

    append_ivf_index(spark, delta, inc)
    res = rebuild_ivf_index(spark, inc, centroids=cents2)
    assert res["rebuilt"] and res["vectors"] == corpus.count()

    fresh = str(tmp_path / "fresh")
    build_ivf_index(spark, corpus, fresh, centroids=cents2)
    assert _postings_set(spark, inc) == _postings_set(spark, fresh)
    queries = corpus.where(F.col("vec_id") < 5)
    got = ivf_index_topk(spark, inc, queries, k=3, nprobe=2)
    want = ivf_index_topk(spark, fresh, queries, k=3, nprobe=2)
    assert _topk_set(got) == _topk_set(want)


def test_rebuild_default_lloyd_resets_drift(spark, corpus, tmp_path):
    from ftm_datalake_spark.operators.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_stats,
        rebuild_ivf_index,
    )

    base, delta = _split(corpus)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, base, idx)
    append_ivf_index(spark, delta, idx)
    before = ivf_index_stats(spark, idx)
    assert before["appended_fraction"] > 0
    vids_before = {v for v, _ in _postings_set(spark, idx)}

    res = rebuild_ivf_index(spark, idx)
    after = ivf_index_stats(spark, idx)
    assert after["appended_fraction"] == 0.0
    assert after["built_vectors"] == res["vectors"] == len(vids_before)
    # no vector lost or duplicated by the remap
    assert {v for v, _ in _postings_set(spark, idx)} == vids_before
    # every vector sits in the list whose centroid it now scores best
    # against (assignment self-consistency under the new codebook)
    from ftm_datalake_spark.operators.similarity import _assign_to_centroid

    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    posted = spark.read.parquet(os.path.join(idx, "postings"))
    want = _assign_to_centroid(
        posted.select("vid", "q", "norm2"), cents.select("cluster", "cq")
    )
    assert {
        (r["vid"], int(r["cluster"])) for r in want.collect()
    } == _postings_set(spark, idx)


def test_rebuild_crash_swap_heals_on_read(spark, corpus, tmp_path):
    """A crash between replace_dir's renames leaves the index only at
    .__old__ — the next reader restores it (fsutil.heal_dir wired into
    every index entry point)."""
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_stats,
        ivf_index_topk,
    )

    idx = str(tmp_path / "idx")
    build_ivf_index(spark, corpus, idx)
    queries = corpus.where(F.col("vec_id") < 3)
    want = _topk_set(ivf_index_topk(spark, idx, queries, k=3))
    # simulate the crash window: target renamed away, swap never landed
    fsutil.rename(spark, idx, idx + ".__old__")
    got = _topk_set(ivf_index_topk(spark, idx, queries, k=3))
    assert got == want
    assert ivf_index_stats(spark, idx)["vectors"] == corpus.count()


def test_ann_index_cli_rebuild(spark, corpus, tmp_path, capsys):
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch

    base, delta = _split(corpus)
    src, dsrc = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(src)
    delta.write.parquet(dsrc)
    idx = str(tmp_path / "idx")

    def ns(action, source=None):
        return argparse.Namespace(
            cmd="ann-index", action=action, source=source, index=idx,
            k=3, nprobe=1, min_files=2,
        )

    assert _dispatch(spark, ns("build", src)) in (0, None)
    assert _dispatch(spark, ns("append", dsrc)) in (0, None)
    capsys.readouterr()
    assert _dispatch(spark, ns("rebuild")) in (0, None)
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rebuilt"] and res["vectors"] == corpus.count()
    assert _dispatch(spark, ns("stats")) in (0, None)
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["appended_fraction"] == 0.0
