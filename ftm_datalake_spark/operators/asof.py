"""As-of join — an operator Spark's DataFrame API lacks natively.

Semantics: for every left row, attach the latest right row with the same
key and right_ts <= left_ts (inclusive). Implemented as the union-marker
pattern, which is the scale-correct formulation:

    union(left-tagged, right-tagged)
      -> single shuffle on key
      -> sort within partition by (ts, tag)   [right sorts before left at ties]
      -> last(right_cols, ignoreNulls) over the running window
      -> keep left rows

One shuffle + one window; no range-explosion, no per-row probes. The same
shape handles point-in-time feature lookup (the training-pipeline "join
features as of example timestamp" step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left rows + latest right row per key with right_ts <= left_ts.

    how='inner' drops left rows with no prior right row (DuckDB ASOF JOIN
    default); how='left' keeps them with nulls. tolerance_us (pandas
    merge_asof parity) voids matches older than the window — a stale
    feature value is as bad as none in point-in-time lookups."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows order BEFORE left rows at equal ts → inclusive <=
    # semantics. Among right rows tied on (key, ts), the tuple of carried
    # columns is the final tiebreak, so WHICH right row wins is defined
    # (the greatest tuple) — not partition-order-dependent, identical
    # across runs and engines (latest_wins defines explicit tiebreaks the
    # same way).
    r_tiebreak = F.struct(*[F.col(f"__r_{c}") for c in right_cols])
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left", r_tiebreak.asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).where(F.col("__is_left") == 1)

    if tolerance_us is not None:
        # a match older than the tolerance window is no match: null out
        # every carried column (the union-marker row keeps its left half)
        fresh = (
            F.unix_micros(F.col("__left").getField(left_ts))
            - F.unix_micros(F.col("__c_ts"))
        ) <= F.lit(int(tolerance_us))
        carried = carried.select(
            "__is_left",
            "__left",
            *[
                F.when(fresh, F.col(f"__c_{c}")).alias(f"__c_{c}")
                for c in right_cols
            ],
            F.when(fresh, F.col("__c_ts")).alias("__c_ts"),
        )

    out = carried.select(
        F.col("__left.*"),
        *[F.col(f"__c_{c}").alias(f"{on}_asof_{c}") for c in right_cols],
        F.col("__c_ts").alias(f"{on}_asof_{right_ts}"),
    )
    if how == "inner":
        out = out.where(F.col(f"{on}_asof_{right_ts}").isNotNull())
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Forward as-of: left rows + EARLIEST right row per key with
    right_ts >= left_ts (inclusive) — the label-assignment twin of the
    backward join ("next purchase after this click"). Same union-marker
    shape: one shuffle, one window, no range explosion.

    Determinism at ties: among right rows tied on (key, ts), the
    SMALLEST tuple of carried columns wins (mirror of the backward
    join's greatest-tuple rule)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Left rows order BEFORE right rows at equal ts (desc on the marker)
    # so the forward frame [current, following] includes same-ts right
    # rows → inclusive >= semantics; tied right rows order ascending by
    # carried tuple so first() picks the smallest.
    r_tiebreak = F.struct(*[F.col(f"__r_{c}") for c in right_cols])
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", F.desc("__is_left"), r_tiebreak.asc_nulls_last())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "__is_left",
        "__left",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
        F.first("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).where(F.col("__is_left") == 1)

    out = carried.select(
        F.col("__left.*"),
        *[F.col(f"__c_{c}").alias(f"{on}_next_{c}") for c in right_cols],
        F.col("__c_ts").alias(f"{on}_next_{right_ts}"),
    )
    if how == "inner":
        out = out.where(F.col(f"{on}_next_{right_ts}").isNotNull())
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest as-of (pandas merge_asof direction='nearest' parity):
    whichever of the latest-before / earliest-after right rows is closer
    in time wins; ties prefer the earlier (backward) match, pandas-style.

    Composed from the two union-marker passes (two shuffles total —
    still no range explosion); tolerance applies to |Δt| on both sides.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    back = asof_join(
        left, right, on, left_ts, right_ts, right_cols, how="left"
    )
    fwd = asof_join_forward(
        left, right, on, left_ts, right_ts, right_cols, how="left"
    )
    join_keys = list(left.columns)
    both = back.join(fwd, join_keys)

    lts = F.unix_micros(F.col(left_ts))
    bts = F.unix_micros(F.col(f"{on}_asof_{right_ts}"))
    fts = F.unix_micros(F.col(f"{on}_next_{right_ts}"))
    bdelta = lts - bts  # >= 0 when present
    fdelta = fts - lts  # >= 0 when present
    if tolerance_us is not None:
        tol = F.lit(int(tolerance_us))
        bok = bts.isNotNull() & (bdelta <= tol)
        fok = fts.isNotNull() & (fdelta <= tol)
    else:
        bok = bts.isNotNull()
        fok = fts.isNotNull()
    # backward wins ties (<=), pandas-style
    use_back = bok & (~fok | (bdelta <= fdelta))
    use_fwd = fok & ~use_back

    out = both.select(
        *join_keys,
        *[
            F.when(use_back, F.col(f"{on}_asof_{c}"))
            .when(use_fwd, F.col(f"{on}_next_{c}"))
            .alias(f"{on}_nearest_{c}")
            for c in right_cols
        ],
        F.when(use_back, F.col(f"{on}_asof_{right_ts}"))
        .when(use_fwd, F.col(f"{on}_next_{right_ts}"))
        .alias(f"{on}_nearest_{right_ts}"),
    )
    if how == "inner":
        out = out.where(F.col(f"{on}_nearest_{right_ts}").isNotNull())
    return out
