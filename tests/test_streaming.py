"""Structured Streaming micro-batch pipeline tests: exactly-once file
ingestion through the merge, and watermarked windowed aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.catalog import STAGING_TABLE, TARGET_TABLE, Warehouse
from fn_rq_report_etl_dev_spark.pipeline import normalize_batch
from fn_rq_report_etl_dev_spark.sources.json_api import batch_to_dataframe
from fn_rq_report_etl_dev_spark.streaming.micro_batch import (
    stream_merge_pipeline,
    stream_windowed_counts,
)


def _now():
    return F.to_timestamp(F.lit("2024-03-15 12:00:00"))


def _write_batch(spark, rows, path):
    batch_to_dataframe(spark, rows).write.mode("append").parquet(path)


def test_stream_merge_pipeline_end_to_end(spark, tmp_path):
    source = str(tmp_path / "landing")
    wh = Warehouse(str(tmp_path / "wh"))
    cp = str(tmp_path / "cp")

    _write_batch(spark, [
        {"SaleInvoiceID": "1", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z", "TradeInAmount": "1.00"},
        {"SaleInvoiceID": "2", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-15T02:00:00Z", "TradeInAmount": "2.00"},
    ], source)

    q = stream_merge_pipeline(spark, source, wh, cp, now=_now())
    q.awaitTermination(120)
    assert wh.read(spark, TARGET_TABLE).count() == 2

    # New file lands → only the delta is processed (checkpointed source),
    # merge updates key 2 and inserts key 3.
    _write_batch(spark, [
        {"SaleInvoiceID": "2", "TradeInTransactionID": "3",
         "TradeInDate": "2024-03-15T03:00:00Z", "TradeInAmount": "20.00"},
        {"SaleInvoiceID": "3", "TradeInTransactionID": "4",
         "TradeInDate": "2024-03-15T04:00:00Z", "TradeInAmount": "3.00"},
    ], source)
    q2 = stream_merge_pipeline(spark, source, wh, cp, now=_now())
    q2.awaitTermination(120)

    target = {r["SaleInvoiceID"]: r for r in wh.read(spark, TARGET_TABLE).collect()}
    assert sorted(target) == [1, 2, 3]
    assert str(target[2]["TradeInAmount"]) == "20.00"
    assert target[2]["ETLRowUpdatedEST"] is not None


def test_stream_windowed_counts(spark, tmp_path, sf_dir):
    # Feed the fixture events through the streaming windowed aggregation.
    events_dir = str(tmp_path / "events_stream")
    from fn_rq_report_etl_dev_spark.workloads import load

    load(spark, sf_dir, "events").limit(500).write.parquet(events_dir)
    q = stream_windowed_counts(spark, events_dir, "win_counts", "6 hours", "1 hour")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM win_counts")
    rows = out.collect()
    assert len(rows) > 0
    assert {"window", "event_type", "n_events", "total_value"} <= set(out.columns)
    # Batch equivalence: total streamed counts == plain batch count
    assert sum(r["n_events"] for r in rows) == 500


def test_stream_dedup_drops_redelivery(spark, tmp_path):
    """At-least-once source: duplicate keys inside one batch AND across
    micro-batches (within the watermark) are dropped; first arrival wins."""
    import os

    from pyspark.sql import types as T

    from fn_rq_report_etl_dev_spark.streaming.micro_batch import stream_dedup

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("payload", T.StringType(), True),
    ])
    source = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(source)

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(source)

    from datetime import datetime

    t = datetime(2024, 3, 15, 12, 0, 0)
    write_file("b1", [(1, t, "first-1"), (1, t, "dup-in-batch"), (2, t, "first-2")])
    q = stream_dedup(spark, source, schema, ["doc_id"], "ts", out, cp)
    q.awaitTermination(120)

    write_file("b2", [(2, t, "redelivered-2"), (3, t, "first-3")])
    q2 = stream_dedup(spark, source, schema, ["doc_id"], "ts", out, cp)
    q2.awaitTermination(120)

    got = {r["doc_id"]: r["payload"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == "first-2"  # cross-batch redelivery dropped
    assert got[1] in ("first-1", "dup-in-batch") and len(got) == 3


def test_stream_window_counts_drops_late_below_watermark(spark, tmp_path):
    """Update-mode windowed agg with a 1-hour watermark: an event arriving
    in a later micro-batch with ts below (max_seen - 1h) is DROPPED; an
    in-watermark late event still updates its window. This pins the
    late-data semantics the streaming_window_counts oracle can't express
    (its corpus has no cross-batch late rows by construction)."""
    import os
    from datetime import datetime

    from pyspark.sql import types as T

    from fn_rq_report_etl_dev_spark.catalog import Warehouse
    from fn_rq_report_etl_dev_spark.workloads.streaming_equiv import (
        _WINDOW_TARGET,
        run_stream_window_counts,
    )

    schema = T.StructType([
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    landing = str(tmp_path / "landing")
    cp = str(tmp_path / "cp")
    wh = Warehouse(str(tmp_path / "wh"))
    os.makedirs(landing)

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    d = datetime
    # Batch 1: events in the 12:00 and 18:00 6-hour windows.
    land([(1, d(2024, 3, 15, 12, 30)), (2, d(2024, 3, 15, 18, 10))])
    run_stream_window_counts(
        spark, landing, cp, wh, schema, watermark_delay="1 hour"
    )
    # Watermark is now 18:10 - 1h = 17:10.
    # Batch 2: one event far below the watermark (dropped), one within the
    # current window (counted).
    land([(3, d(2024, 3, 15, 6, 0)), (4, d(2024, 3, 15, 18, 40))])
    run_stream_window_counts(
        spark, landing, cp, wh, schema, watermark_delay="1 hour"
    )

    got = {
        r["window_start"]: r["n_events"]
        for r in wh.read(spark, _WINDOW_TARGET).collect()
    }
    assert got[d(2024, 3, 15, 18, 0)] == 2  # late-but-in-window event counted
    assert got[d(2024, 3, 15, 12, 0)] == 1
    assert d(2024, 3, 15, 6, 0) not in got  # below watermark: dropped
