"""Oracle-checked streaming/batch equivalence.

The reference's schedule is a daily timer re-scanning a 1-day window
(rq_tradein_report/__init__.py:12-20); our streaming form is a checkpointed
file source feeding ``foreachBatch`` (streaming/micro_batch.py). This
workload proves the two converge: events land as two files (pre/post the
flagship CUTOFF), flow through TWO real checkpointed micro-batches — each
doing window-dedup + keyed merge-upsert exactly like the batch pipeline —
and the final target table must hash-match the one-shot batch merge SQL
(the same oracle as ``flagship_dedup_merge``).

Exactly-once matters here: if the second micro-batch re-processed file 1,
the merge actions would flip ('insert' rows would report 'update') and the
value hash would diverge — so a green driver row certifies the checkpointed
source tracking, not just the merge algebra.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Warehouse
from ..operators.dedup import latest_per_key
from ..operators.merge import MERGE_ACTION, merge_upsert
from . import load, workload
from .parity import _DEDUP_SQL, CUTOFF, EVENT_COLS

_TARGET = "stream_target"

# Identical to the flagship_dedup_merge oracle: the streaming path must
# converge to the exact batch-merge result.
_ORACLE = f"""
    WITH old_batch AS ({_DEDUP_SQL.format(where=f"WHERE ts < TIMESTAMP '{CUTOFF}'")}),
         new_batch AS ({_DEDUP_SQL.format(where=f"WHERE ts >= TIMESTAMP '{CUTOFF}'")})
    SELECT
        COALESCE(n.user_id, o.user_id) AS user_id,
        CASE WHEN n.user_id IS NOT NULL THEN n.event_id ELSE o.event_id END AS event_id,
        CASE WHEN n.user_id IS NOT NULL THEN n.ts ELSE o.ts END AS ts,
        CASE WHEN n.user_id IS NOT NULL THEN n.event_type ELSE o.event_type END AS event_type,
        CASE WHEN n.user_id IS NOT NULL THEN n.value ELSE o.value END AS value,
        CASE WHEN n.user_id IS NOT NULL AND o.user_id IS NOT NULL THEN 'update'
             WHEN n.user_id IS NOT NULL THEN 'insert'
             ELSE 'keep' END AS merge_action
    FROM old_batch o FULL OUTER JOIN new_batch n ON o.user_id = n.user_id
    """


def _merge_micro_batch(spark: SparkSession, wh: Warehouse, batch_df: DataFrame) -> None:
    """One micro-batch: dedup latest-per-user, merge-upsert into the target
    (read-modify-swap, same shape as pipeline.merge_to_target)."""
    batch = latest_per_key(batch_df, ["user_id"], ["ts", "event_id"]).select(*EVENT_COLS)
    if wh.exists(_TARGET):
        target = wh.read(spark, _TARGET).select(*EVENT_COLS)
    else:
        target = spark.createDataFrame([], batch.schema)
    merged = merge_upsert(target, batch, "user_id", keep_action=True)
    wh.overwrite_atomic(
        merged.withColumnRenamed(MERGE_ACTION, "merge_action"), _TARGET
    )


def run_stream_merge(
    spark: SparkSession, landing: str, checkpoint: str, wh: Warehouse, schema
) -> None:
    """Drain all currently-available files through the checkpointed merge
    (Trigger.AvailableNow), then stop — the scheduled-batch semantics."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_micro_batch(spark, wh, batch_df)

    query = (
        spark.readStream.schema(schema)
        .parquet(landing)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if query.exception() is not None:
        raise query.exception()


@workload("streaming_merge_equivalence", oracle=_ORACLE)
def streaming_merge_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two checkpointed micro-batches (events split at CUTOFF) through the
    foreachBatch dedup+merge; returns the final target table, which must
    equal the batch flagship merge bit-for-bit."""
    events = load(spark, sf_dir, "events").select(*EVENT_COLS)
    root = tempfile.mkdtemp(prefix="rq_stream_equiv_")
    landing = os.path.join(root, "landing")
    checkpoint = os.path.join(root, "checkpoint")
    wh = Warehouse(os.path.join(root, "wh"))

    # File 1 lands → first micro-batch (all inserts).
    events.filter(F.col("ts") < F.lit(CUTOFF)).write.mode("append").parquet(landing)
    run_stream_merge(spark, landing, checkpoint, wh, events.schema)
    # File 2 lands → second micro-batch sees ONLY the delta (checkpoint).
    events.filter(F.col("ts") >= F.lit(CUTOFF)).write.mode("append").parquet(landing)
    run_stream_merge(spark, landing, checkpoint, wh, events.schema)

    # NOTE: the temp dir is left in place — the returned DataFrame reads
    # from it lazily and the caller collects after we return.
    return wh.read(spark, _TARGET)
