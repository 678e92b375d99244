"""Custom stateful streaming operator via applyInPandasWithState.

The brief names applyInPandasWithState as the tool for stateful semantics
Structured Streaming's built-ins can't express. Demo operator: per-user
running profile (event count, value sum, last event type) maintained in
explicit GroupState and emitted every micro-batch (Update mode). The state
is a single small tuple per key — bounded, checkpointable, and partitioned
by the group key exactly like any keyed state at cluster scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_type", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, vsum, last = state.get if state.exists else (0, 0.0, None)
    for batch in batches:
        if len(batch):
            ordered = batch.sort_values(["ts", "event_id"])
            n += len(ordered)
            vsum += float(ordered["value"].sum())
            last = str(ordered["event_type"].iloc[-1])
    state.update((n, vsum, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [vsum], "last_type": [last]}
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """events stream -> per-user running profile (Update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_update_to_memory(stream_df: DataFrame, name: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
