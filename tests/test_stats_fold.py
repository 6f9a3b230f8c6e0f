"""Delta-aware stats fold laws (operators/stats_fold.py, VERDICT r12
stretch #8): fold(state, adds, deletes) == build(final corpus),
including the cases a monotone running aggregate gets wrong."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

SCHEMA = (
    "doc_id long, dataset string, schema string, size long, "
    "created_at timestamp, updated_at timestamp"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (
                i,
                ds,
                sc,
                sz,
                datetime(2026, 1, 1 + c),
                datetime(2026, 2, 1 + u),
            )
            for (i, ds, sc, sz, c, u) in rows
        ],
        SCHEMA,
    )


@pytest.fixture()
def corpus(spark):
    rows = [
        (i, f"ds{i % 3}", f"sch{i % 4}", 100 + i, i % 5, i % 7)
        for i in range(60)
    ]
    return _docs(spark, rows)


KW = dict(
    measure_col="size", dim_cols=["schema"],
    ts_cols=["created_at", "updated_at"],
)


def _stats_map(df):
    return {
        r["dataset"]: (
            r["file_count"],
            r["total_file_size"],
            r["coverage_start"],
            r["coverage_end"],
            tuple((s["name"], s["count"]) for s in (r["schemata"] or [])),
        )
        for r in df.collect()
    }


def test_fold_equals_full_recompute(spark, corpus):
    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
        stats_from_state,
    )

    base = corpus.where(F.col("doc_id") % 10 != 0)
    adds = corpus.where(F.col("doc_id") % 10 == 0)
    deletes = corpus.where(F.col("doc_id") % 4 == 0)  # spans base AND adds
    final = corpus.where(F.col("doc_id") % 4 != 0)

    state = build_stats_state(base, **KW)
    state = fold_stats_state(state, adds=adds, **KW)
    state = fold_stats_state(state, deletes=deletes, **KW)

    got = _stats_map(stats_from_state(state))
    want = _stats_map(stats_from_state(build_stats_state(final, **KW)))
    assert got == want

    # and both equal a direct corpus aggregation
    direct = {
        r["dataset"]: (
            r["n"], r["sz"], r["cs"], r["ce"],
        )
        for r in final.groupBy("dataset")
        .agg(
            F.count("*").alias("n"),
            F.sum("size").alias("sz"),
            F.min("created_at").alias("cs"),
            F.max("updated_at").alias("ce"),
        )
        .collect()
    }
    for ds, (n, sz, cs, ce, _) in got.items():
        assert (n, sz, cs, ce) == direct[ds]


def test_deleting_the_newest_doc_moves_coverage_back(spark):
    """The case a monotone running max cannot un-see: remove the doc
    holding max(updated_at) and the derived coverage_end must step
    back to the survivor's timestamp."""
    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
        stats_from_state,
    )

    docs = _docs(
        spark,
        [(1, "ds0", "a", 10, 0, 1), (2, "ds0", "a", 20, 1, 20)],
    )
    state = build_stats_state(docs, **KW)
    newest = docs.where(F.col("doc_id") == 2)
    state = fold_stats_state(state, deletes=newest, **KW)
    row = stats_from_state(state).collect()[0]
    assert row["file_count"] == 1
    assert row["coverage_end"] == datetime(2026, 2, 2)
    assert row["total_file_size"] == 10


def test_fully_deleted_facets_leave_no_tombstones(spark):
    """A schema whose documents all delete must vanish from both the
    schemata list and the state itself (net-zero compaction)."""
    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
        stats_from_state,
    )

    docs = _docs(
        spark,
        [(1, "ds0", "gone", 10, 0, 1), (2, "ds0", "kept", 20, 1, 2)],
    )
    state = build_stats_state(docs, **KW)
    state = fold_stats_state(
        state, deletes=docs.where(F.col("schema") == "gone"), **KW
    )
    assert (
        state.where(
            (F.col("facet") == "schema") & (F.col("key_str") == "gone")
        ).count()
        == 0
    )
    row = stats_from_state(state).collect()[0]
    assert [s["name"] for s in row["schemata"]] == ["kept"]


def test_update_is_delete_plus_add(spark):
    """CDC shape: an update folds as (old row in deletes, new row in
    adds) and the state equals a fresh build over the updated corpus."""
    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
        stats_from_state,
    )

    old = _docs(spark, [(1, "ds0", "a", 10, 0, 1), (2, "ds0", "b", 20, 1, 2)])
    new_row = _docs(spark, [(2, "ds0", "c", 35, 1, 9)])
    updated = old.where(F.col("doc_id") != 2).unionByName(new_row)

    state = build_stats_state(old, **KW)
    state = fold_stats_state(
        state, adds=new_row, deletes=old.where(F.col("doc_id") == 2), **KW
    )
    got = _stats_map(stats_from_state(state))
    want = _stats_map(
        stats_from_state(build_stats_state(updated, **KW))
    )
    assert got == want


@pytest.mark.slow
def test_fold_equals_recompute_randomized(spark):
    """Randomized law over many fold schedules: any partition of a
    random corpus into base + add batches, with a random delete set
    folded in arbitrary interleaving, converges to build(final)."""
    import random

    from ftm_datalake_spark.operators.stats_fold import (
        build_stats_state,
        fold_stats_state,
        stats_from_state,
    )

    rnd = random.Random(29)
    for trial in range(3):
        rows = [
            (
                i,
                f"ds{rnd.randrange(3)}",
                f"sch{rnd.randrange(4)}",
                rnd.randrange(1, 500),
                rnd.randrange(5),
                rnd.randrange(7),
            )
            for i in range(80)
        ]
        corpus = _docs(spark, rows)
        ids = [r[0] for r in rows]
        rnd.shuffle(ids)
        cut1, cut2 = len(ids) // 3, 2 * len(ids) // 3
        base_ids, add1_ids, add2_ids = (
            set(ids[:cut1]), set(ids[cut1:cut2]), set(ids[cut2:]),
        )
        del_ids = set(rnd.sample(ids, k=25))

        state = build_stats_state(
            corpus.where(F.col("doc_id").isin(base_ids)), **KW
        )
        # interleave: add batch 1, delete the part of del_ids already
        # present, add batch 2, delete the rest
        state = fold_stats_state(
            state, adds=corpus.where(F.col("doc_id").isin(add1_ids)), **KW
        )
        first_dels = del_ids & (base_ids | add1_ids)
        state = fold_stats_state(
            state,
            deletes=corpus.where(F.col("doc_id").isin(first_dels)),
            **KW,
        )
        state = fold_stats_state(
            state, adds=corpus.where(F.col("doc_id").isin(add2_ids)), **KW
        )
        state = fold_stats_state(
            state,
            deletes=corpus.where(
                F.col("doc_id").isin(del_ids - first_dels)
            ),
            **KW,
        )
        final = corpus.where(~F.col("doc_id").isin(del_ids))
        got = _stats_map(stats_from_state(state))
        want = _stats_map(stats_from_state(build_stats_state(final, **KW)))
        assert got == want, f"trial {trial} diverged"
