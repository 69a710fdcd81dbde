"""Stateful streaming sessionization (SURVEY §2.10 additive path;
``applyInPandasWithState`` keyed by user).

Semantics match the batch gap formulation in queries/streaming_q.py
(q_sessionization): a session closes after ``gap`` of inactivity; emitted
rows are (user_id, session_id, n_events, session_start, session_end) with
session ids numbered in event-time order per user.

State per user: the running session's id, bounds, and count.  Sessions are
emitted when a new event arrives past the gap, and flushed at state timeout
(or end-of-stream for availableNow runs via the final timeout pass).

Scale: state is O(active users); the gap bound plus ProcessingTimeTimeout
keeps it from growing monotonically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "session_id bigint, n_events bigint, start_us bigint, end_us bigint"

_US = 1_000_000


def _sessionize(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_minutes: int = 30,
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    gap_us = gap_minutes * 60 * _US
    user_id = key[0]
    out = []
    if state.hasTimedOut:
        if state.exists:
            sid, n, start_us, end_us = state.get
            out.append((user_id, sid, n, start_us, end_us))
            state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        # normalize to microseconds regardless of pandas datetime unit
        ts_us = rows.ts.astype("datetime64[us]").astype("int64").tolist()
        if state.exists:
            sid, n, start_us, end_us = state.get
        else:
            sid, n, start_us, end_us = 0, 0, None, None
        for t in ts_us:
            if start_us is None:
                sid, n, start_us, end_us = sid + 1, 1, t, t
            elif t - end_us > gap_us:
                out.append((user_id, sid, n, start_us, end_us))
                sid, n, start_us, end_us = sid + 1, 1, t, t
            else:
                n += 1
                end_us = t
        state.update((sid, n, start_us, end_us))
        if use_timeout:
            state.setTimeoutDuration(gap_us // 1000)  # ms
    yield pd.DataFrame(
        [
            (u, s, n, pd.Timestamp(st, unit="us"), pd.Timestamp(en, unit="us"))
            for u, s, n, st, en in out
        ],
        columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming sessionization over an events stream with (event_id, ts,
    user_id, ...) columns.

    ``timeout``: NoTimeout for bounded drains (availableNow) — each user's
    final open session intentionally stays in state; ProcessingTimeTimeout
    for live streams, where the gap elapsing flushes the open session.
    """

    use_timeout = timeout != GroupStateTimeout.NoTimeout

    def fn(key, pdfs, state):
        return _sessionize(key, pdfs, state, gap_minutes, use_timeout)

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
