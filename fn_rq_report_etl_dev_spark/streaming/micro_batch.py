"""Structured Streaming form of the ETL: the reference's daily timer +
1-day re-scan window (function.json:8, __init__.py:12-20) is exactly an
incremental micro-batch source feeding an idempotent keyed merge — so the
streaming pipeline is ``readStream → foreachBatch(normalize + stage +
merge)``, where the merge's key-idempotence absorbs re-deliveries the same
way the daily re-scan does.

``Trigger.AvailableNow`` gives the scheduled-batch semantics (process all
pending input, then stop) with checkpointed exactly-once source tracking —
on a cluster this replaces the external cron + manual date-window
bookkeeping. Watermarked windowed aggregation is provided for the
continuous-metrics side channel (the reference's audit counts, O18/O20).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..catalog import STAGING_PARTITION_COL, STAGING_TABLE, Warehouse, ensure_tables
from ..pipeline import merge_to_target, normalize_batch
from ..schemas import DEDUP_ORDER_COLUMN, STAGING_SCHEMA


def stream_merge_pipeline(
    spark: SparkSession,
    source_dir: str,
    wh: Warehouse,
    checkpoint_dir: str,
    source_format: str = "parquet",
    now: Column | None = None,
) -> StreamingQuery:
    """Incremental ingest: new batch files under ``source_dir`` flow through
    the same normalize → stage → dedup → merge pipeline, exactly once per
    file (checkpointed), one merge per micro-batch."""
    reader = spark.readStream.schema(STAGING_SCHEMA).format(source_format)
    stream = reader.load(source_dir)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        ensure_tables(spark, wh)
        staged = normalize_batch(batch_df, now).withColumn(
            STAGING_PARTITION_COL, F.to_date(F.col(DEDUP_ORDER_COLUMN))
        )
        wh.append_partitioned(staged, STAGING_TABLE, STAGING_PARTITION_COL)
        merge_to_target(spark, wh, now)

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    key_cols: list[str],
    ts_col: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    source_format: str = "parquet",
) -> StreamingQuery:
    """Streaming exact-dedup for at-least-once sources: the first arrival
    of each key wins; re-deliveries within the watermark horizon are
    dropped. ``dropDuplicatesWithinWatermark`` keeps per-key state only
    until the watermark passes its event time — bounded state, unlike
    plain ``dropDuplicates`` on a stream whose state grows forever. The
    streaming face of ``operators.dedup`` for ingestion feeds (training
    corpora re-delivering documents, webhook retries)."""
    stream = spark.readStream.schema(schema).format(source_format).load(source_dir)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — late rows beyond
    the watermark are dropped; state is bounded (the streaming analog of the
    reference's date-bucketed audit metrics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


# Single source of truth for the events shape (schemas.EVENTS_SCHEMA).
from ..schemas import EVENTS_SCHEMA as EVENTS_STREAM_SCHEMA  # noqa: E402


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    query_name: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """File-source streaming windowed aggregation into an in-memory sink
    (complete mode) — the smoke/test harness for the windowed operator."""
    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(events_dir)
    agg = windowed_event_counts(stream, window_duration, watermark)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
