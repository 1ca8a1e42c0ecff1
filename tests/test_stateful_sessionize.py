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
