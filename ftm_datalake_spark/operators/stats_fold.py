"""Delta-aware dataset statistics (VERDICT r12 stretch #8): fold a
batch of adds/deletes into a persisted stats STATE instead of
recomputing make_index's aggregates from the whole corpus.

Reference analogue: make_index() recomputes entity_count / facet
counts / total_file_size / coverage per dataset from scratch on every
publish (/root/reference/ftm_datalake/archive/dataset.py:177-196). The
incremental form mirrors the engine's export/classifier ledgers: keep
the aggregation's ALGEBRAIC PARTIALS as a small state frame and merge
each batch's contribution by summation.

State layout — one long-format frame, exactly mergeable under both
adds (+1) and deletes (−1):

    (dataset, facet, key_str, key_ts, n, val)

- facet='doc':       n = net document count, val = net sum of the
                     measure column (file size / char count);
- facet='<dim>':     one row per (dataset, distinct dimension value) —
                     e.g. schema or lang tallies; a value's NET n
                     reaching 0 removes it from the live set, which is
                     what makes DISTINCT-style outputs (schemata
                     facets, language lists) delete-correct;
- facet='ts':        per distinct timestamp tally — max/min over
                     values with net n > 0 gives updated_at/coverage
                     bounds that stay exact when the newest document
                     is deleted (a monotone running max could not).

Scale contract: the fold shuffles O(|Δ| + |state|), and |state| is
aggregate-sized — datasets × (dimension cardinality + distinct
timestamps), not corpus-sized. Dimension facets must therefore be
bounded-cardinality columns (schema, lang, mimetype...); a primary-key
facet would grow the state to corpus size and recomputing would be the
better plan. Counts and sums are exact integers, so
fold(state, adds, deletes) == build(corpus ∪ adds ∖ deletes) is an
EQUALITY, law-tested against the full recompute in
tests/test_stats_fold.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("dataset", "facet", "key_str", "key_ts", "n", "val")


def _contrib(
    docs: DataFrame,
    dataset_col: str,
    measure_col: str | None,
    dim_cols: list[str],
    ts_cols: list[str],
    sign: int,
) -> DataFrame:
    """Per-document state contributions with the given sign (+1 adds,
    −1 deletes) — one explode over a constant-width struct array, so
    the pass stays single-scan whatever the facet count."""
    measure = (
        F.col(measure_col).cast("long")
        if measure_col
        else F.lit(0).cast("long")
    )
    entries = [
        F.struct(
            F.lit("doc").alias("facet"),
            F.lit(None).cast("string").alias("key_str"),
            F.lit(None).cast("timestamp").alias("key_ts"),
            F.lit(sign).cast("long").alias("n"),
            (measure * sign).alias("val"),
        )
    ]
    for c in dim_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("facet"),
                F.col(c).cast("string").alias("key_str"),
                F.lit(None).cast("timestamp").alias("key_ts"),
                F.lit(sign).cast("long").alias("n"),
                F.lit(0).cast("long").alias("val"),
            )
        )
    for c in ts_cols:
        entries.append(
            F.struct(
                F.lit(f"ts:{c}").alias("facet"),
                F.lit(None).cast("string").alias("key_str"),
                F.col(c).cast("timestamp").alias("key_ts"),
                F.lit(sign).cast("long").alias("n"),
                F.lit(0).cast("long").alias("val"),
            )
        )
    return docs.select(
        F.col(dataset_col).alias("dataset"),
        F.explode(F.array(*entries)).alias("x"),
    ).select("dataset", "x.*")


def build_stats_state(
    docs: DataFrame,
    dataset_col: str = "dataset",
    measure_col: str | None = "size",
    dim_cols: list[str] | None = None,
    ts_cols: list[str] | None = None,
) -> DataFrame:
    """The full-build form: state partials from the whole corpus (one
    scan + one hash-agg). ``dim_cols`` are bounded-cardinality facet
    columns (schema, lang); ``ts_cols`` timestamp columns whose
    min/max the derived stats need delete-correctly."""
    contrib = _contrib(
        docs, dataset_col, measure_col, dim_cols or [], ts_cols or [], 1
    )
    return (
        contrib.groupBy("dataset", "facet", "key_str", "key_ts")
        .agg(F.sum("n").alias("n"), F.sum("val").alias("val"))
        .select(*STATE_COLS)
    )


def fold_stats_state(
    state: DataFrame,
    adds: DataFrame | None = None,
    deletes: DataFrame | None = None,
    dataset_col: str = "dataset",
    measure_col: str | None = "size",
    dim_cols: list[str] | None = None,
    ts_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a batch into the state: adds contribute +1/+measure,
    deletes −1/−measure (an UPDATE is its old row in ``deletes`` plus
    its new row in ``adds`` — CDC shape). Rows whose net count AND net
    value reach zero are compacted away, so the state never accretes
    tombstones. Exact: summation is the same algebra the full build
    runs, just reordered."""
    parts = [state.select(*STATE_COLS)]
    if adds is not None:
        parts.append(
            _contrib(
                adds, dataset_col, measure_col, dim_cols or [],
                ts_cols or [], 1,
            )
        )
    if deletes is not None:
        parts.append(
            _contrib(
                deletes, dataset_col, measure_col, dim_cols or [],
                ts_cols or [], -1,
            )
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return (
        merged.groupBy("dataset", "facet", "key_str", "key_ts")
        .agg(F.sum("n").alias("n"), F.sum("val").alias("val"))
        .where((F.col("n") != 0) | (F.col("val") != 0))
        .select(*STATE_COLS)
    )


def stats_from_state(
    state: DataFrame,
    dim_col: str = "schema",
    ts_updated: str = "updated_at",
    ts_created: str = "created_at",
) -> DataFrame:
    """Derive the index.json row per dataset from the state — the same
    output shape as operators/stats.dataset_index computes from the
    corpus: (dataset, file_count, total_file_size, coverage_start,
    coverage_end, schemata list<struct<name,count>>). Deleted-to-zero
    facet values and timestamps are already absent (net n = 0), so
    max/min here are exact."""
    doc = state.where(F.col("facet") == "doc").select(
        "dataset",
        F.col("n").alias("file_count"),
        F.col("val").alias("total_file_size"),
    )
    dims = (
        state.where(
            (F.col("facet") == dim_col) & (F.col("n") > 0)
        )
        .groupBy("dataset")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("key_str").alias("name"), F.col("n").alias("count"))
                )
            ).alias("schemata")
        )
    )
    upd = (
        state.where((F.col("facet") == f"ts:{ts_updated}") & (F.col("n") > 0))
        .groupBy("dataset")
        .agg(F.max("key_ts").alias("coverage_end"))
    )
    crt = (
        state.where((F.col("facet") == f"ts:{ts_created}") & (F.col("n") > 0))
        .groupBy("dataset")
        .agg(F.min("key_ts").alias("coverage_start"))
    )
    return (
        doc.join(dims, "dataset", "full_outer")
        .join(crt, "dataset", "full_outer")
        .join(upd, "dataset", "full_outer")
        .select(
            "dataset",
            "file_count",
            "total_file_size",
            "coverage_start",
            "coverage_end",
            "schemata",
        )
    )
