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
    DoubleType, LongType, StringType, StructField, StructType,
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


KEEP_FIRST_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("doc_id", LongType()),
    ]
)

KEEP_FIRST_STATE = StructType([StructField("kept_doc", LongType())])


def keep_first_stream(docs: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming incremental dedup: keep the FIRST document seen per key
    across all micro-batches (ties within a batch broken by min doc_id),
    emit it once, and drop every later arrival — the incremental form of
    batch `keep-min-id` dedup for a corpus that grows as crawl batches
    land. When batches arrive in doc_id order, the drained output equals
    the batch answer `row_number() over (partition by key order by
    doc_id) = 1`, so the operator carries a full value-hash SQL twin.

    Scale: state is ONE long per distinct key, Spark-managed
    (checkpointed, RocksDB-backed on a real cluster); each micro-batch
    shuffles only its own rows on the key and emits only newly-kept
    docs, so steady-state output is O(new content), not O(corpus).
    """

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if state.exists or best is None:
            return  # key already owned by an earlier batch — drop silently
        state.update((best,))
        yield pd.DataFrame([(k, best)], columns=["key", "doc_id"])

    return docs.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=KEEP_FIRST_OUTPUT,
        stateStructType=KEEP_FIRST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
