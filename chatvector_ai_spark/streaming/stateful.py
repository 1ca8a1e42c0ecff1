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
is flushed by a processing-time timeout (``ProcessingTimeTimeout`` +
``setTimeoutDuration``) when the user goes idle — exactly-once via the
checkpoint like every other streaming sink here.

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


def make_sessionizer(
    gap_seconds: int = SESSION_GAP_SECONDS,
    timeout_ms: int | None = None,
):
    """Build the per-user state function with a pinned gap/timeout.

    A closure (not a module global) so the values serialize with the
    function to executors — a test or deployment overriding the gap can't
    be betrayed by workers re-importing the module default.
    """
    timeout_ms = timeout_ms if timeout_ms is not None else gap_seconds * 1000

    def sessionize_user(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        return _sessionize_user(key, pdfs, state, gap_seconds, timeout_ms)

    return sessionize_user


def _sessionize_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
    gap_seconds: int,
    timeout_ms: int,
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
        elif ts_us - open_session[1] > gap_seconds * 1_000_000:
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
            # cross-batch disorder: an event may land earlier than the
            # stored bounds — extend with min/max, never move end backwards
            open_session[0] = min(open_session[0], ts_us)
            open_session[1] = max(open_session[1], ts_us)
            open_session[2] += 1
            open_session[3] += _cents(value)
    if open_session is not None:
        state.update(tuple(open_session))
        # arm the idle flush: if no event for this user arrives within the
        # timeout (processing time), the hasTimedOut branch above emits the
        # open session and evicts the state
        state.setTimeoutDuration(timeout_ms)
    if closed:
        yield pd.DataFrame(closed)


# default-configured state function (module-level for pickling by name)
sessionize_user = make_sessionizer()


def stream_sessionize(
    events,
    gap_seconds: int = SESSION_GAP_SECONDS,
    timeout_ms: int | None = None,
):
    """events(ts timestamp, user_id long, event_id long, value double) →
    closed sessions, one state machine per user key. ``timeout_ms``
    (default = the gap) is the processing-time idle flush for a user who
    stops sending events."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
