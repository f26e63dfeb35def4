"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the pattern for operators Spark's built-in
windows can't express (session windows with per-key custom state and
timeout-driven emission).

Per user: events within ``gap`` of each other belong to one session;
a session closes when the watermark passes last_event + gap (event-time
timeout), emitting (user_id, session_start, session_end, n_events,
total_value). State per key is five scalars — bounded by active users
within the gap horizon, evicted by timeout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, "
                 "session_end timestamp, n_events long, total_value double")
STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               ts_col: str = "ts", user_col: str = "user_id",
               value_col: str = "value",
               watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization. Input must be a streaming
    DataFrame; output appends one row per CLOSED session."""
    gap_ms = gap_seconds * 1000

    def fn(key: Tuple[Any, ...],
           batches: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(last, unit="ms")],
                "n_events": [n], "total_value": [total]})
            return

        rows = pd.concat(list(batches), ignore_index=True)
        ts_ms = (rows[ts_col].astype("int64") // 1_000_000).sort_values()
        values = rows.loc[ts_ms.index, value_col]

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0

        closed = []
        for t, v in zip(ts_ms, values):
            t = int(t)
            # null values arrive from Arrow as NaN, which is truthy —
            # `v or 0.0` would NaN-poison the running total, so test
            # with isna (covers None and NaN both)
            v = 0.0 if pd.isna(v) else float(v)
            if start is None:
                start, last, n, total = t, t, 1, v
            elif t - last <= gap_ms:
                last, n, total = max(last, t), n + 1, total + v
            else:
                closed.append((start, last, n, total))
                start, last, n, total = t, t, 1, v

        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last + gap_ms)

        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed]})

    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
