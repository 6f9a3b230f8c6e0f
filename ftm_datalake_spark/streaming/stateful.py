"""Custom stateful streaming operators via applyInPandasWithState.

The built-in stateful ops (dropDuplicates, session_window) cover the
reference's incremental semantics; this module is the extension point for
operators that need arbitrary per-key state — e.g. a running ingest
counter per dataset, or a first-seen registry that emits only novel keys
(the streaming form of the skip-existing anti-join).

State is per grouping key, Arrow-batched, with GroupStateTimeout handling
for eviction — bounded memory at any key cardinality that fits the
cluster (state lives in the state store, spillable/checkpointed)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("total_rows", T.LongType()),
    ]
)

STATE_SCHEMA = "total LONG"


def running_totals(
    grouped,  # GroupedData from df.groupBy(key)
) -> DataFrame:
    """Per-key running row counts across micro-batches.

    Emits (key, batch_rows, total_rows) per key per batch; `total_rows`
    accumulates in the state store across availableNow drains because the
    checkpoint persists state."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_rows = 0
        for pdf in batches:
            batch_rows += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch_rows
        state.update((total,))
        yield pd.DataFrame(
            [{"key": key[0], "batch_rows": batch_rows, "total_rows": total}]
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONIZE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

SESSIONIZE_STATE_SCHEMA = "sid LONG, n LONG, start_us LONG, end_us LONG"


def sessionize_stateful(
    grouped,  # GroupedData from events.groupBy("user_id")
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Custom stateful streaming sessionization: the applyInPandasWithState
    twin of the batch `events_sessionize` (plans/reference_ops.py) with
    identical semantics — same 30-min gap, same per-user 1-based session
    numbering — so CLOSED sessions from the stream are row-identical to
    the batch result (the per-user tail session stays open in the state
    store until a later event's gap closes it).

    Unlike the built-in `session_window` aggregation, the state here is
    arbitrary (session counter + open-session accumulator), which is the
    extension point the built-in cannot express: monotone session ids
    assigned across micro-batches and restarts (4 longs per user in the
    checkpointed state store — bounded at any user cardinality).

    Contract: per-user event-time order ACROSS micro-batches (the sorted
    file-drop ingestion pattern); disorder WITHIN a batch is sorted away
    here. Full out-of-order tolerance needs a watermark buffer upstream.
    """
    import numpy as np

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = []
        for pdf in batches:
            if len(pdf):
                parts.append(
                    pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                )
        new_ts = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, "int64")
        )
        if state.exists:
            sid, n, start_us, end_us = state.get
        else:
            sid, n, start_us, end_us = 0, 0, 0, 0
        closed = []
        for t in map(int, new_ts):
            if n == 0:
                sid, n, start_us, end_us = sid + 1, 1, t, t
            elif t - end_us > gap_us:
                closed.append((sid, n, start_us, end_us))
                sid, n, start_us, end_us = sid + 1, 1, t, t
            else:
                n, end_us = n + 1, t
        if n:
            state.update((int(sid), int(n), int(start_us), int(end_us)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_id": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "session_start": pd.to_datetime(
                    [c[2] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime([c[3] for c in closed], unit="us"),
            }
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=SESSIONIZE_OUT_SCHEMA,
        stateStructType=SESSIONIZE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
