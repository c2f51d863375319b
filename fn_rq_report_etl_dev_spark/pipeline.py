"""End-to-end ETL orchestration — the reference's ``run_etl`` shape
(rqtradein_etl.py:13-24) as one lazy DataFrame graph per stage:

    fetch (driver) → normalize (casts + timestamps + EST) → stage (append)
    → dedup (latest per key) → merge upsert → audit counts → retention

Each relational stage is declarative; Catalyst fuses normalize+dedup+merge
into ~2 jobs (stage break at the dedup/merge shuffle). The merge shuffle is
keyed on ``SaleInvoiceID``, the same key the dedup window partitions by, so
the exchange is reused — one shuffle of the source batch total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import (
    STAGING_PARTITION_COL,
    STAGING_PARTITIONED_SCHEMA,
    STAGING_TABLE,
    TARGET_TABLE,
    Warehouse,
    ensure_tables,
)
from .functions.casts import apply_type_map
from .functions.timestamps import parse_timestamp_multi, utc_to_est, with_fallback_now
from .operators.dedup import latest_per_key
from .operators.merge import MERGE_ACTION, merge_upsert
from .schemas import (
    AUDIT_INSERTED,
    AUDIT_UPDATED,
    DEDUP_ORDER_COLUMN,
    DEDUP_TIEBREAKER,
    EST_DERIVED_PAIRS,
    MERGE_KEY,
    RAW_TIMESTAMP_COLUMNS,
    TARGET_TYPE_MAP,
    TRADEIN_COLUMNS,
)


def normalize_batch(df: DataFrame, now: Column | None = None) -> DataFrame:
    """Timestamp normalization + EST derivation on a raw (all-string) batch.

    ≙ the reference's per-row Python loop (rqtradein_etl.py:313-338):
    - parse the 3 raw timestamp columns with the lenient multi-format chain;
      present-but-unparseable values fall back to "now" (:319-322);
    - derive the 3 ``*EST`` shadows via UTC→US/Eastern at second precision
      (:325-337);
    - render everything back to strings (staging stays uniformly VARCHAR).
    """
    # Two batched withColumns calls, not six chained withColumn calls:
    # each withColumn re-analyzes the whole 44-column plan on the driver
    # (r11, guide §7.3). Level 1 rewrites the three raw timestamp
    # columns; level 2 derives the EST shadows FROM the level-1 output
    # (the reference derives EST from the already-normalized strings, so
    # the dependency is real and the two levels cannot fuse).
    parsed = {
        c: F.date_format(
            with_fallback_now(parse_timestamp_multi(F.col(c)), F.col(c), now),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        )
        for c in RAW_TIMESTAMP_COLUMNS
    }
    out = df.withColumns(parsed)
    est = {
        est_col: F.date_format(
            utc_to_est(F.to_timestamp(F.col(src_col))), "yyyy-MM-dd HH:mm:ss"
        )
        for est_col, src_col in EST_DERIVED_PAIRS
    }
    return out.withColumns(est).select(*TRADEIN_COLUMNS)


def _today_value(spark: SparkSession, now: Column | None) -> str:
    """Render the pipeline's 'today' as the partition value string."""
    expr = F.to_date(now) if now is not None else F.current_date()
    return str(spark.range(1).select(expr.alias("d")).collect()[0]["d"])


def _deduped_staging(
    spark: SparkSession, wh: Warehouse, dedup_salts: int | None = None
) -> DataFrame:
    """Shared merge input: read date-partitioned staging, lenient-cast to
    target types, window-dedup to one row per merge key.

    ``dedup_salts`` switches the dedup to the salted two-phase window for
    batches with pathological merge-key skew (one key owning a large slice
    of the batch) — same result, bounded task sizes. Off by default: the
    single window shares its exchange with the merge join, which is the
    better plan when keys are well-distributed."""
    staging = wh.read(spark, STAGING_TABLE, STAGING_PARTITIONED_SCHEMA).drop(
        STAGING_PARTITION_COL
    )
    typed = apply_type_map(staging, TARGET_TYPE_MAP)
    return latest_per_key(
        typed,
        [MERGE_KEY],
        [DEDUP_ORDER_COLUMN, DEDUP_TIEBREAKER],
        n_salts=dedup_salts,
    )


def _purge_stale_staging(spark: SparkSession, wh: Warehouse, now: Column | None) -> None:
    """Staging retention (rqtradein_etl.py:192): drop every partition whose
    date differs from today — a metadata-only directory drop, no data
    rewrite. NULL dates are kept: in the reference, `CONVERT(date,
    TradeInDate) <> CONVERT(date, GETDATE())` is UNKNOWN for NULL, so those
    rows survive the DELETE."""
    today = _today_value(spark, now)
    stale = [
        v
        for v in wh.partition_values(STAGING_TABLE, STAGING_PARTITION_COL)
        if v is not None and v != today
    ]
    wh.drop_partitions(STAGING_TABLE, STAGING_PARTITION_COL, stale)


def merge_to_target(
    spark: SparkSession,
    wh: Warehouse,
    now: Column | None = None,
    dedup_salts: int | None = None,
) -> dict[str, int]:
    """Dedup staging, lenient-cast to target types, upsert into target,
    return {"inserted": n, "updated": n} (rqtradein_etl.py:150-194).

    Staging is date-partitioned; at scale, pass a date window filter before
    the dedup so the scan prunes to the affected partitions (the
    reference's own 1-day-window trick, SURVEY.md §7 item 10 — here the
    retention policy already keeps staging to ~1 day, so the merge reads
    everything present).
    """
    deduped = _deduped_staging(spark, wh, dedup_salts)
    target = wh.read(spark, TARGET_TABLE)
    merged = merge_upsert(
        target,
        deduped,
        MERGE_KEY,
        audit_inserted=AUDIT_INSERTED,
        audit_updated=AUDIT_UPDATED,
        now=now,
        keep_action=True,
    )
    # Audit tallies ride along the write via observed metrics — ONE pass
    # over the merge, no cache, no second aggregation job.
    from pyspark.sql import Observation

    obs = Observation("merge_counts")
    merged = merged.observe(
        obs,
        F.count(F.when(F.col(MERGE_ACTION) == "insert", 1)).alias("inserted"),
        F.count(F.when(F.col(MERGE_ACTION) == "update", 1)).alias("updated"),
    )
    wh.overwrite_atomic(merged.drop(MERGE_ACTION), TARGET_TABLE)
    counts_row = obs.get

    _purge_stale_staging(spark, wh, now)
    return {"inserted": counts_row["inserted"], "updated": counts_row["updated"]}


def _staged_batch(batch: DataFrame, now: Column | None) -> DataFrame:
    """Normalize a raw batch and shape it for the partitioned staging
    append (r11, guide §2.6/§6): the multi-format timestamp parse is the
    batch's CPU-bound stage, so fan the input across the cluster first
    when its own split count is below the parallelism (a single-file
    batch otherwise parses on ONE core — measured 3.4 s vs 1.0 s at
    sf0.1); then REBALANCE by the partition date before the write so
    each task holds whole dates (one file per date instead of
    tasks × dates small files) while AQE still SPLITS an oversized date —
    the production daily batch is mostly one date, which a plain
    repartition(dt) would serialize onto one straggler task."""
    from .operators.multimodal import spread_for_decode

    staged = normalize_batch(spread_for_decode(batch), now).withColumn(
        STAGING_PARTITION_COL, F.to_date(F.col(DEDUP_ORDER_COLUMN))
    )
    return staged.hint("rebalance", STAGING_PARTITION_COL)


def run_etl(
    spark: SparkSession,
    wh: Warehouse,
    batch: DataFrame,
    now: Column | None = None,
) -> dict[str, int]:
    """Full pipeline for one (already-fetched) batch: bootstrap tables,
    normalize, append to date-partitioned staging, merge, retention,
    return audit counts."""
    ensure_tables(spark, wh)
    wh.append_partitioned(
        _staged_batch(batch, now), STAGING_TABLE, STAGING_PARTITION_COL
    )
    return merge_to_target(spark, wh, now)


BUCKETED_TARGET_TABLE = "rq_tradein_report_bucketed"


def merge_to_target_bucketed(
    spark: SparkSession,
    wh: Warehouse,
    now: Column | None = None,
    n_buckets: int = 64,
) -> dict[str, int]:
    """The 100 TB form of merge_to_target: the target is hash-bucket-
    partitioned on the merge key, so the daily merge reads and rewrites
    only the buckets the batch touches (operators.merge_partitioned)
    instead of full-outer-joining the whole table."""
    from .operators.merge_partitioned import ensure_bucketed_target, merge_into_bucketed_target
    from .schemas import TARGET_SCHEMA

    ensure_bucketed_target(spark, wh, BUCKETED_TARGET_TABLE, TARGET_SCHEMA, n_buckets)
    deduped = _deduped_staging(spark, wh)
    counts = merge_into_bucketed_target(
        spark,
        wh,
        BUCKETED_TARGET_TABLE,
        deduped,
        MERGE_KEY,
        n_buckets=n_buckets,
        audit_inserted=AUDIT_INSERTED,
        audit_updated=AUDIT_UPDATED,
        now=now,
    )
    _purge_stale_staging(spark, wh, now)
    return counts


def run_etl_bucketed(
    spark: SparkSession,
    wh: Warehouse,
    batch: DataFrame,
    now: Column | None = None,
    n_buckets: int = 64,
) -> dict[str, int]:
    """run_etl against the bucket-partitioned target."""
    ensure_tables(spark, wh)
    wh.append_partitioned(
        _staged_batch(batch, now), STAGING_TABLE, STAGING_PARTITION_COL
    )
    return merge_to_target_bucketed(spark, wh, now, n_buckets)
