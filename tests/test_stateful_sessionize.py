"""applyInPandasWithState sessionization: closed sessions from the
streaming state machine must equal the batch window-pass sessionization
(ev_sessionize semantics) for every session the stream has closed."""

import pandas as pd
from pyspark.sql import functions as F

from chatvector_ai_spark.streaming.stateful import stream_sessionize


def _batch_sessions(spark, src):
    """All sessions via the batch window pass; the stream can only have
    closed the non-final ones per user (the last stays open in state)."""
    ev = spark.read.parquet(src)
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    return spark.sql(
        f"""
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER ({w}) IS NULL
                             OR unix_seconds(CAST(ts AS TIMESTAMP))
                                - unix_seconds(CAST(lag(ts) OVER ({w}) AS TIMESTAMP)) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM {{ev}}
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS session_no
            FROM gaps
        )
        SELECT user_id, session_no,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS value_cents
        FROM sess GROUP BY user_id, session_no
        """,
        ev=ev,
    ).toPandas()


def test_stateful_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "events")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 40)
        .select("ts", "user_id", "event_id", "value")
        .coalesce(1)
        .write.parquet(src)
    )

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_id long, value double"
    ).parquet(src)
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sessions_test").toPandas()
    assert len(got) > 0

    batch = _batch_sessions(spark, src)
    # the stream closes every session except each user's final (open) one
    last_start = batch.groupby("user_id")["session_start"].transform("max")
    expect = batch[batch["session_start"] != last_start]

    cols = ["user_id", "session_start", "session_end", "n_events", "value_cents"]
    got_s = got[cols].sort_values(cols).reset_index(drop=True)
    exp_s = expect[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, exp_s.astype(got_s.dtypes.to_dict()), check_dtype=False
    )


def test_idle_session_flushes_on_processing_timeout(spark, tmp_path):
    """A user who goes quiet must have their open session emitted by the
    ProcessingTimeTimeout flush — no further events for that user needed
    (reference analog: inactivity closing a chat session,
    backend/services/chat_service.py:169-199). The event-time gap is huge,
    so ONLY the processing-time idle timer can close the session."""
    import time

    src = str(tmp_path / "events_idle")
    out = str(tmp_path / "out_idle")
    ckpt = str(tmp_path / "ckpt_idle")

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, user_id long, event_id long, value double"
        ).selectExpr(
            "CAST(ts AS TIMESTAMP) ts", "user_id", "event_id", "value"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, value double"
        ).parquet(src)
        q = (
            stream_sessionize(stream, gap_seconds=86400, timeout_ms=300)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # short timer → flush fires, state drains, query self-terminates;
        # stop defensively if it is still spinning when patience runs out
        if not q.awaitTermination(150):
            q.stop()
            q.awaitTermination(60)

    write([("2024-01-01 10:00:00", 1, 1, 1.0), ("2024-01-01 10:00:10", 1, 2, 2.5)])
    run_once()
    # the availableNow run keeps firing micro-batches while timers are
    # pending, so the flush usually lands in the first run; if it stopped
    # early, a later batch (forced by an unrelated user's event) fires it
    for attempt in range(3):
        try:
            got = spark.read.parquet(out).where("user_id = 1").toPandas()
        except Exception:
            got = []
        if len(got):
            break
        time.sleep(1.0)
        write([("2024-01-01 11:00:00", 100 + attempt, 50 + attempt, 9.9)])
        run_once()
    assert len(got) == 1
    assert got.loc[0, "n_events"] == 2
    assert got.loc[0, "value_cents"] == 350
    assert str(got.loc[0, "session_start"]).startswith("2024-01-01 10:00:00")
    assert str(got.loc[0, "session_end"]).startswith("2024-01-01 10:00:10")


def test_out_of_order_event_never_moves_session_end_backwards(spark, tmp_path):
    """A late event in a later micro-batch with ts earlier than the stored
    session bounds must extend with min/max, not drag session_end back.

    Each intermediate run uses ``trigger(once=True)`` — exactly one batch,
    then clean self-termination. availableNow would keep spinning no-data
    micro-batches while the (deliberately long) idle timers are pending,
    so it never self-terminates and a hard stop races the next run on the
    same checkpoint. The merged session is finally CLOSED by the event-time
    gap branch (an event past the 1-day gap), not a timer — the idle-timer
    flush is covered by the test above."""
    src = str(tmp_path / "events_ooo")
    out = str(tmp_path / "out_ooo")
    ckpt = str(tmp_path / "ckpt_ooo")

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, user_id long, event_id long, value double"
        ).selectExpr(
            "CAST(ts AS TIMESTAMP) ts", "user_id", "event_id", "value"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, value double"
        ).parquet(src)
        q = (
            stream_sessionize(stream, gap_seconds=86400, timeout_ms=3_600_000)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(once=True)
            .start()
        )
        assert q.awaitTermination(180)

    # batch 1: an in-order pair; the 1h idle timer never fires in-test
    write([("2024-01-01 10:00:00", 7, 1, 1.0), ("2024-01-01 10:30:00", 7, 2, 1.0)])
    run_once()
    # batch 2: an out-of-order event BEFORE the stored start arrives late
    write([("2024-01-01 09:55:00", 7, 3, 1.0)])
    run_once()
    # batch 3: an event past the gap closes the merged session (gap branch)
    write([("2024-01-03 12:00:00", 7, 4, 1.0)])
    run_once()
    got = (
        spark.read.parquet(out)
        .where("user_id = 7 AND session_start < '2024-01-02'")
        .toPandas()
    )
    assert len(got) == 1
    # min/max bounds: start extended back to 09:55, end stays at 10:30
    assert str(got.loc[0, "session_start"]).startswith("2024-01-01 09:55:00")
    assert str(got.loc[0, "session_end"]).startswith("2024-01-01 10:30:00")
    assert got.loc[0, "n_events"] == 3
