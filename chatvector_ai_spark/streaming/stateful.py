"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch suite's ``ev_sessionize`` assigns events to sessions separated by
>30-minute gaps with one partitioned window pass; this is its streaming
twin, and the repo's example of the Spark extension point for operators
whose state machine the built-in windowed aggregations cannot express
(reference analog: the per-session chat history accumulation,
/root/reference/backend/services/chat_service.py:169-199, which folds
events into an open session until inactivity closes it).

State per user: the open session (start ts, last ts, event count, value
cents). An event farther than the gap from the last event CLOSES the open
session (emitted downstream) and opens a new one; the final open session
stays in state until more data or a timeout closes it — exactly-once via
the checkpoint like every other streaming sink here.

Scale posture: state is one tiny tuple per active user key, partitioned by
user hash; no global state, no driver participation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_cents long"
)
STATE_SCHEMA = "start_us long, last_us long, n_events long, value_cents long"


def _cents(v: float) -> int:
    import math

    return int(math.floor(v * 100.0 + 0.5))


def sessionize_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open-session
    state; emit every session CLOSED by a >gap jump (or by state timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(last_us, unit="us"),
                        "n_events": n,
                        "value_cents": cents,
                    }
                ]
            )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
    open_session = list(state.get) if state.exists else None
    closed: list[dict] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = int(pd.Timestamp(ts).value // 1_000)
        if open_session is None:
            open_session = [ts_us, ts_us, 1, _cents(value)]
        elif ts_us - open_session[1] > SESSION_GAP_SECONDS * 1_000_000:
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(open_session[0], unit="us"),
                    "session_end": pd.Timestamp(open_session[1], unit="us"),
                    "n_events": open_session[2],
                    "value_cents": open_session[3],
                }
            )
            open_session = [ts_us, ts_us, 1, _cents(value)]
        else:
            open_session[1] = ts_us
            open_session[2] += 1
            open_session[3] += _cents(value)
    if open_session is not None:
        state.update(tuple(open_session))
    if closed:
        yield pd.DataFrame(closed)


def stream_sessionize(events):
    """events(ts timestamp, user_id long, event_id long, value double) →
    closed sessions, one state machine per user key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
