"""Statement → entity aggregation — the flagship operator (SURVEY §2.4 A6).

The reference RFC (docs/rfc.md:63-73,121-129) specifies: sort all statement
fragments, group by canonical entity id, emit aggregated FTM entities —
explicitly anticipating "a Spark thing that is good at sorting a terabyte"
(docs/rfc.md:125).

Spark-first: no global sort at all. ``groupBy(canonical_id)`` hash-
aggregates with map-side partial aggregation; per-entity property maps are
built with collect_list + map_from_entries. Order stability inside value
arrays comes from sort_array, not from input order (SURVEY §7.3 hard-part
#2) — so the result is deterministic without the O(n log n) total sort the
reference performs. One shuffle on canonical_id, which AQE splits if an
entity id is skew-hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


AUTO_SALT_BUCKETS = 64
AUTO_HOT_KEY_SHARE = 0.05
AUTO_SAMPLE_FRACTION = 0.01


def _auto_salt_buckets(
    statements: DataFrame,
    threshold: float = AUTO_HOT_KEY_SHARE,
    sample_fraction: float = AUTO_SAMPLE_FRACTION,
    buckets: int = AUTO_SALT_BUCKETS,
    seed: int = 13,
) -> int | None:
    """Cheap skew probe for ``salt_buckets="auto"`` (VERDICT r12
    next-round #5): sample ~1% of (canonical_id, prop) keys, measure
    the hottest key's share of sampled rows, and salt only when it
    exceeds ``threshold``. Deterministic (fixed seed) and metadata-
    cheap — one sampled hash-agg, columns pruned to the two key
    columns; at 100 TB the sample is still millions of rows, plenty to
    detect a >5% celebrity. When the sample is too small to resolve
    the threshold at all (< 2/threshold rows — a hot key could hide in
    integer-count noise), the probe re-counts the FULL frame: that
    only happens on corpora so small the full agg is as cheap as the
    sample."""
    sample = statements.select("canonical_id", "prop").sample(
        fraction=sample_fraction, seed=seed
    )
    probe = (
        sample.groupBy("canonical_id", "prop")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .first()
    )
    tot = probe["tot"] or 0
    if tot < 2.0 / threshold:
        probe = (
            statements.select("canonical_id", "prop")
            .groupBy("canonical_id", "prop")
            .agg(F.count("*").alias("c"))
            .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
            .first()
        )
        tot = probe["tot"] or 0
    if not tot:
        return None
    return buckets if probe["mx"] / tot > threshold else None


def aggregate_statements(
    statements: DataFrame, salt_buckets: int | str | None = None
) -> DataFrame:
    """Aggregate long-format statements into FTM entity rows.

    Output schema matches ENTITY_SCHEMA: id, schema, properties
    MAP<STRING, ARRAY<STRING>>, datasets ARRAY<STRING>.

    ``salt_buckets`` (VERDICT r11 next-round #4): a celebrity entity at
    100 TB concentrates a large share of statements on one
    (canonical_id, prop) key, and a single-key collect_set cannot be
    split by AQE — one reducer unions the hot key's values while the
    rest idle. With salt_buckets set, the set union runs in two exact
    phases: phase 1 groups by (canonical_id, prop, hash(value) % salt)
    — duplicates of the same value land in the same salt bucket, so
    partial dedup keeps working — and phase 2 merges the per-salt
    partial arrays with flatten + array_distinct. Set union is
    associative/commutative/idempotent, so the result is bit-identical
    to the unsalted plan (law-tested); the price is one extra shuffle
    over the collapsed partials. Leave None for uniform data (one
    fewer shuffle); set ~32-128 when hot entities are possible.

    ``salt_buckets="auto"`` (VERDICT r12 next-round #5): a 100 TB
    operator won't know to flip the flag, so auto runs the sampled
    skew probe (:func:`_auto_salt_buckets` — one eager sampling job at
    plan-construction time) and picks the salted plan only when a hot
    key exceeds :data:`AUTO_HOT_KEY_SHARE` of rows. The uniform case
    keeps the exact single-shuffle-per-phase plan — no salt column, no
    extra exchange — and either branch is bit-identical output.
    """
    if salt_buckets == "auto":
        salt_buckets = _auto_salt_buckets(statements)
    if salt_buckets:
        salt = F.pmod(F.xxhash64("value"), F.lit(salt_buckets))
        partial = statements.groupBy(
            "canonical_id", "prop", salt.alias("__salt")
        ).agg(
            F.collect_set("value").alias("__pvals"),
            F.min("schema").alias("schema"),
        )
        per_prop = partial.groupBy("canonical_id", "prop").agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("__pvals")))
            ).alias("values"),
            F.min("schema").alias("schema"),
        )
    else:
        per_prop = statements.groupBy("canonical_id", "prop").agg(
            F.sort_array(F.collect_set("value")).alias("values"),
            # first() under groupBy is nondeterministic; min() is not.
            F.min("schema").alias("schema"),
        )
    per_entity = per_prop.groupBy("canonical_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("prop", "values")))
        ).alias("properties"),
        F.min("schema").alias("schema"),
    )
    datasets = statements.groupBy("canonical_id").agg(
        F.sort_array(F.collect_set("dataset")).alias("datasets")
    )
    return (
        per_entity.join(datasets, "canonical_id")
        .select(
            F.col("canonical_id").alias("id"),
            "schema",
            "properties",
            "datasets",
        )
    )


def sorted_statements(statements: DataFrame) -> DataFrame:
    """O3: the spec's "complete sorted statements.csv" export.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives a globally
    sorted file set without funneling through one task — Spark's external
    shuffle sort IS the terabyte sorter the RFC asks for (docs/rfc.md:125).
    """
    return statements.repartitionByRange(
        "canonical_id", "prop", "value"
    ).sortWithinPartitions("canonical_id", "prop", "value")


def merge_entity_increment(
    existing: DataFrame, new_statements: DataFrame
) -> DataFrame:
    """Merge a statement increment into already-aggregated entities
    WITHOUT rescanning old statements — the incremental-ingest shape.

    Entity aggregation is algebraic: per-prop value sets, datasets, and
    the min-schema all merge associatively. So an increment aggregates
    alone (small), then full-outer joins the existing entity table on id:
    property maps merge via map_zip_with (union of keys, distinct-sorted
    union of value arrays), datasets union, schema = least. At 100 TB the
    existing side is read once and shuffled on id only — no statement
    re-scan, no growth in work with lake age.

    merge(aggregate(A), B) == aggregate(A ∪ B) exactly (asserted in
    tests), because every combiner here is idempotent/commutative/
    associative on sorted-distinct arrays.
    """
    delta = aggregate_statements(new_statements)
    empty_map = F.expr("map()").cast("map<string,array<string>>")
    empty_arr = F.expr("array()").cast("array<string>")
    e = existing.select(
        F.col("id"),
        F.col("schema").alias("__es"),
        F.col("properties").alias("__ep"),
        F.col("datasets").alias("__ed"),
    )
    d = delta.select(
        F.col("id"),
        F.col("schema").alias("__ds"),
        F.col("properties").alias("__dp"),
        F.col("datasets").alias("__dd"),
    )
    merged_props = F.map_zip_with(
        F.coalesce(F.col("__ep"), empty_map),
        F.coalesce(F.col("__dp"), empty_map),
        lambda _k, v1, v2: F.sort_array(
            F.array_distinct(
                F.concat(
                    F.coalesce(v1, empty_arr), F.coalesce(v2, empty_arr)
                )
            )
        ),
    )
    return e.join(d, "id", "full_outer").select(
        "id",
        F.least(F.col("__es"), F.col("__ds")).alias("schema"),
        merged_props.alias("properties"),
        F.sort_array(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("__ed"), empty_arr),
                    F.coalesce(F.col("__dd"), empty_arr),
                )
            )
        ).alias("datasets"),
    )


def entity_xref_pairs(
    statements: DataFrame, ref_props: list[str] | None = None
) -> DataFrame:
    """(referenced_id, referrer) distinct pairs — the scale form of the
    RFC's entity-xref ``inverted.idx`` ("what entity IDs point to
    entity X", /root/reference/docs/rfc.md:100,180; theoretical in the
    reference, realized here). Entity-reference statements carry the
    referenced entity id in ``value``; ``ref_props`` restricts to the
    schema's entity-typed properties when the frame mixes literal
    values in.

    Kept as pair ROWS, not arrays: a hub entity referenced by 10⁷
    others stays row-distributed through the (referenced_id) shuffle —
    the array-aggregated view (:func:`entity_xref_inverted`) is for
    bounded fan-in / the single-file export form only."""
    refs = statements
    if ref_props is not None:
        refs = refs.where(F.col("prop").isin(list(ref_props)))
    return (
        refs.where(F.col("value").isNotNull())
        .select(
            F.col("value").alias("referenced_id"),
            F.col("canonical_id").alias("referrer"),
        )
        .where(F.col("referenced_id") != F.col("referrer"))
        .distinct()
    )


def entity_xref_inverted(
    statements: DataFrame, ref_props: list[str] | None = None
) -> DataFrame:
    """(referenced_id, n_referrers, referrers): the inverted xref table
    with each entity's referrer set sorted — one distinct + one
    hash-agg on referenced_id. See :func:`entity_xref_pairs` for the
    unaggregated scale form."""
    return (
        entity_xref_pairs(statements, ref_props)
        .groupBy("referenced_id")
        .agg(
            F.count("*").cast("long").alias("n_referrers"),
            F.sort_array(F.collect_list("referrer")).alias("referrers"),
        )
    )
