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


def test_running_totals_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas (state-v2): drain 1 folds the first
    batch into ValueState; a second file lands; drain 2 (same checkpoint)
    emits updated running totals that include BOTH batches — state
    survives across restarts via the checkpoint."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs protobuf (state-v2 wire protocol); "
        "not installed here — the gate itself is tested below",
    )

    from fn_rq_report_etl_dev_spark.streaming.stateful import (
        running_totals_with_state,
    )

    src = tmp_path / "events"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(rows, name):
        spark.createDataFrame(rows, "user_id long, value double").coalesce(
            1
        ).write.mode("append").parquet(str(src / name))

    def drain(query_name):
        # transformWithState requires the RocksDB state store provider
        # (bundled in Spark 4; the HDFS-backed default is rejected).
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            running_totals_with_state(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
        return {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql(f"SELECT * FROM {query_name}").collect()
        }

    land([(1, 10.0), (1, 5.0), (2, 1.0)], "b1")
    got1 = drain("totals1")
    assert got1 == {1: (2, 15.0), 2: (1, 1.0)}

    land([(1, 2.5), (3, 7.0)], "b2")
    got2 = drain("totals2")
    # only keys touched by batch 2 re-emit; user 1's total includes batch 1
    assert got2 == {1: (3, 17.5), 3: (1, 7.0)}


def test_transform_with_state_gate_raises_clearly(spark):
    """Without protobuf the state-v2 operator must fail fast at build
    time with a pointer to the applyInPandasWithState alternative — not
    crash the streaming driver worker mid-query (which is what happens
    if the gate is bypassed: STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE from the protobuf import inside the TWS driver worker)."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf installed; gate not applicable")
    except ImportError:
        pass

    from fn_rq_report_etl_dev_spark.streaming.stateful import (
        running_totals_with_state,
    )

    stream = spark.readStream.format("rate").load()
    with pytest.raises(ImportError, match="sessionize_with_state"):
        running_totals_with_state(stream)
