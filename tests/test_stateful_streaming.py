"""Stateful streaming sessionization: per-key state machine across
micro-batches via applyInPandasWithState."""

from __future__ import annotations

from datetime import datetime

from fn_rq_report_etl_dev_spark.streaming.stateful import sessionize_with_state


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_sessionize_with_state_closes_gap_sessions(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        # user 1: two sessions separated by a 2-hour gap, third one open
        (1, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-01 10:10:00")),
        (1, _ts("2024-01-01 12:30:00")),
        (1, _ts("2024-01-01 12:40:00")),
        (1, _ts("2024-01-01 23:00:00")),
        # user 2: one session only → never closed within the batch
        (2, _ts("2024-01-01 09:00:00")),
        (2, _ts("2024-01-01 09:05:00")),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize_with_state(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_start"
    ).collect()
    got = [
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
    ]
    # user 1's first two sessions closed by gaps; the 23:00 session and all
    # of user 2 remain open in the state store.
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 12:30:00", "2024-01-01 12:40:00", 2),
    ]
