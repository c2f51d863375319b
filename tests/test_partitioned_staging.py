"""Date-partitioned staging: partition pruning on incremental reads,
metadata-only retention (NULL-date rows survive, matching the reference's
three-valued DELETE predicate), and the one-time flat→partitioned upgrade."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.catalog import (
    STAGING_PARTITION_COL,
    STAGING_PARTITIONED_SCHEMA,
    STAGING_TABLE,
    TARGET_TABLE,
    Warehouse,
    ensure_tables,
    upgrade_staging_layout,
)
from fn_rq_report_etl_dev_spark.pipeline import run_etl
from fn_rq_report_etl_dev_spark.sources.json_api import batch_to_dataframe


def _now():
    return F.to_timestamp(F.lit("2024-03-15 12:00:00"))


def test_retention_is_partition_drop_and_keeps_null_dates(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    rows = [
        {"SaleInvoiceID": "1", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z"},       # today → kept
        {"SaleInvoiceID": "2", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-01T01:00:00Z"},       # stale → dropped
        {"SaleInvoiceID": "3", "TradeInTransactionID": "3"},  # NULL date → kept
    ]
    run_etl(spark, wh, batch_to_dataframe(spark, rows), now=_now())

    # Reference NULL semantics: CONVERT(date, NULL) <> today is UNKNOWN →
    # the DELETE leaves NULL-date rows in place.
    staged = wh.read(spark, STAGING_TABLE, STAGING_PARTITIONED_SCHEMA)
    keys = sorted(r["SaleInvoiceID"] for r in staged.collect())
    assert keys == ["1", "3"]
    # and the stale partition directory is physically gone
    assert sorted(
        str(v) for v in wh.partition_values(STAGING_TABLE, STAGING_PARTITION_COL)
    ) == ["2024-03-15", "None"]
    # target got all three keys regardless of retention
    assert wh.read(spark, TARGET_TABLE).count() == 3


def test_staging_scan_prunes_partitions(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    rows = [
        {"SaleInvoiceID": "1", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z"},
        {"SaleInvoiceID": "2", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-14T01:00:00Z"},
    ]
    from fn_rq_report_etl_dev_spark.catalog import ensure_tables
    from fn_rq_report_etl_dev_spark.pipeline import normalize_batch

    ensure_tables(spark, wh)
    staged = normalize_batch(batch_to_dataframe(spark, rows), now=_now()).withColumn(
        STAGING_PARTITION_COL, F.to_date(F.col("TradeInDate"))
    )
    wh.append_partitioned(staged, STAGING_TABLE, STAGING_PARTITION_COL)

    pruned = wh.read(spark, STAGING_TABLE, STAGING_PARTITIONED_SCHEMA).filter(
        F.col(STAGING_PARTITION_COL) == "2024-03-15"
    )
    from fn_rq_report_etl_dev_spark.plans.inspect import formatted_plan

    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "dt" in plan
    assert pruned.count() == 1  # only today's partition is read


def test_flat_layout_upgrade(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    # Simulate a pre-partitioning warehouse: flat parquet staging files.
    from fn_rq_report_etl_dev_spark.schemas import STAGING_SCHEMA

    flat = batch_to_dataframe(
        spark,
        [{"SaleInvoiceID": "9", "TradeInTransactionID": "9",
          "TradeInDate": "2024-03-10 00:00:00"}],
    )
    flat.write.parquet(wh.path(STAGING_TABLE))
    assert upgrade_staging_layout(spark, wh)
    assert wh.partition_values(STAGING_TABLE, STAGING_PARTITION_COL) == ["2024-03-10"]
    assert not upgrade_staging_layout(spark, wh)  # idempotent
    ensure_tables(spark, wh)  # and bootstrap-safe afterwards
    assert wh.read(spark, STAGING_TABLE, STAGING_PARTITIONED_SCHEMA).count() == 1


def test_compact_preserves_partitioned_layout(spark, tmp_path):
    from fn_rq_report_etl_dev_spark.catalog import Warehouse, compact_table

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"v{i}", f"2024-03-{10 + i % 3:02d}") for i in range(300)],
        "k long, v string, dt string",
    ).withColumn("dt", F.to_date("dt"))
    for _ in range(3):  # repeated appends → many files per partition
        wh.append_partitioned(df.repartition(8), "t", "dt")
    assert len(wh.partition_values("t", "dt")) == 3

    compact_table(spark, wh, "t", target_files=3)
    # layout preserved: same partitions, data intact, fewer files
    assert sorted(wh.partition_values("t", "dt")) == [
        "2024-03-10", "2024-03-11", "2024-03-12"]
    assert wh.read(spark, "t").count() == 900
    import os

    files = [
        f for _, _, fs in os.walk(wh.path("t")) for f in fs if f.endswith(".parquet")
    ]
    assert len(files) <= 6  # was ≥ 24 before compaction
