"""Custom stateful streaming operators via `applyInPandasWithState`
(the escape hatch for operators Structured Streaming lacks as
built-ins — arbitrary per-key state with timeout-driven emission).

Provided operator: streaming gap-based session windows — the streaming
twin of `operators.analytics.sessionize_events`. State per user holds
the open session; events extend it; a processing-time timeout (or a
gap-exceeding event) closes and emits it.

Scale notes: state is partitioned by key across executors (RocksDB/HDFS
state store in production); each micro-batch touches only keys with new
events; emission is append-mode so downstream sinks (including our
LakehouseTable via foreachBatch) get closed sessions exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
STATE_SCHEMA = "start_us long, end_us long, n long"


def make_session_fn(gap_us: int, timeout_ms: int = 30_000):
    """Build the per-key state function (gap in event-time µs)."""

    def update_sessions(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(int(t) for t in pdf["ts_us"])
            ts_list.sort()
            if state.exists:
                start, end, n = state.get
            else:
                start = end = n = None
            for t in ts_list:
                if start is None:
                    start, end, n = t, t, 1
                elif t - end > gap_us:
                    closed.append((start, end, n))
                    start, end, n = t, t, 1
                else:
                    end = t
                    n += 1
            if start is not None:
                state.update((start, end, n))
                state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return update_sessions


def streaming_sessionize(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """`events` needs columns (user_id long, ts_us long). Emits CLOSED
    sessions (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_us, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
