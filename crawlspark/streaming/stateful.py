"""Custom stateful streaming operator — gap sessionization with
``applyInPandasWithState`` (the task brief's pattern for stateful ops
Structured Streaming lacks natively).

Semantics match the batch ``sessionize`` query (lag-window + cumulative
sum) exactly when each user's events arrive in event-time order across
micro-batches: per-group state carries (last event epoch, sessions so
far, events so far); a gap > ``gap_s`` opens a new session. Every
micro-batch emits the group's CURRENT totals (update mode) — the final
update per user equals the batch answer over the same rows.

State is Spark-managed (checkpointed, recoverable); the pandas function
sees one group per call with Arrow-batched rows — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_epoch", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events(user_id, ts, event_id, …) stream → running
    (user_id, n_sessions, n_events) updates."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                epoch = t.timestamp()
                if last_epoch is None or epoch - last_epoch > gap_s:
                    n_sessions += 1
                last_epoch = epoch
                n_events += 1
        state.update((last_epoch, int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            [(int(user), int(n_sessions), int(n_events))],
            columns=["user_id", "n_sessions", "n_events"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
