"""Sessionization on Spark 4's ``transformWithStateInPandas`` API — the
successor to ``applyInPandasWithState`` (streaming/sessions.py keeps the
classic formulation; semantics are identical and both share the batch
lag-gap oracle).

transformWithState runs on the RocksDB state store (required by the API),
which is also the right engine choice at scale: state lives off-heap with
incremental-snapshot checkpointing, so per-user session state survives
100×-more keys than the default HDFS-backed in-memory store.

Emission contract (same as sessions.py): a session row is emitted when a
later event arrives past the 30-minute gap; each user's final session
intentionally stays open in state for a bounded (availableNow) drain —
deterministic regardless of micro-batch boundaries, hence fully
oracle-checkable as "all sessions but each user's last".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "session_start timestamp, session_end timestamp"
)
_STATE_SCHEMA = "session_id bigint, n_events bigint, start_us bigint, end_us bigint"
_US = 1_000_000


class SessionProcessor(StatefulProcessor):
    """Per-user gap sessionizer: value state holds the open session."""

    def __init__(self, gap_minutes: int = 30) -> None:
        self._gap_us = gap_minutes * 60 * _US

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(["ts", "event_id"])
        ts_us = pdf.ts.astype("datetime64[us]").astype("int64").tolist()
        if self._session.exists():
            sid, n, start_us, end_us = self._session.get()
        else:
            sid, n, start_us, end_us = 0, 0, None, None
        out = []
        for t in ts_us:
            if start_us is None:
                sid, n, start_us, end_us = sid + 1, 1, t, t
            elif t - end_us > self._gap_us:
                out.append((user_id, sid, n, start_us, end_us))
                sid, n, start_us, end_us = sid + 1, 1, t, t
            else:
                n += 1
                end_us = t
        self._session.update((sid, n, start_us, end_us))
        yield pd.DataFrame(
            [
                (u, s, n_, pd.Timestamp(st, unit="us"), pd.Timestamp(en, unit="us"))
                for u, s, n_, st, en in out
            ],
            columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
        )

    def close(self) -> None:
        pass


def sessionize_stream_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via transformWithStateInPandas (timeMode
    none: bounded-drain contract, open sessions stay in state)."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_minutes),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
