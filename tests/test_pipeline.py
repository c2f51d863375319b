"""End-to-end pipeline tests (SURVEY.md §5.2, FIXTURES.md §4): synthetic
trade-in batches with planted duplicates, format zoo, garbage values,
re-delivered records; idempotence; retention; catalog bootstrap."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.catalog import (
    LEGACY_STAGING_TABLE,
    STAGING_TABLE,
    TARGET_TABLE,
    Warehouse,
    ensure_tables,
    migrate_legacy_staging,
)
from fn_rq_report_etl_dev_spark.pipeline import normalize_batch, run_etl
from fn_rq_report_etl_dev_spark.schemas import STAGING_SCHEMA, TRADEIN_COLUMNS
from fn_rq_report_etl_dev_spark.sources.json_api import batch_to_dataframe, daily_window


def _batch(spark, rows: list[dict]):
    return batch_to_dataframe(spark, rows)


def _now():
    return F.to_timestamp(F.lit("2024-03-15 12:00:00"))


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "warehouse"))


def test_bootstrap_and_legacy_migration(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    # Plant a legacy-named staging table; bootstrap must rename, not recreate.
    legacy = spark.createDataFrame(
        [tuple(str(i) for i in range(len(TRADEIN_COLUMNS)))], STAGING_SCHEMA
    )
    legacy.write.parquet(wh.path(LEGACY_STAGING_TABLE))
    assert migrate_legacy_staging(wh)
    assert wh.exists(STAGING_TABLE) and not wh.exists(LEGACY_STAGING_TABLE)
    ensure_tables(spark, wh)
    assert wh.read(spark, STAGING_TABLE).count() == 1  # preserved, not clobbered
    assert wh.read(spark, TARGET_TABLE).count() == 0
    ensure_tables(spark, wh)  # idempotent


def test_pipeline_duplicates_garbage_and_types(spark, wh):
    rows = [
        # dup key 100: later TradeInDate must win
        {"SaleInvoiceID": "100", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z", "TradeInAmount": "10.50",
         "TradeInStatus": "Submitted"},
        {"SaleInvoiceID": "100", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-15T02:00:00.5Z", "TradeInAmount": "99.99",
         "TradeInStatus": "Completed"},
        # garbage decimal + unparseable date (fallback-to-now) + missing keys
        {"SaleInvoiceID": "200", "TradeInTransactionID": "3",
         "TradeInDate": "not a date", "TradeInAmount": "garbage"},
        # different format, missing TradeInAmount entirely
        {"SaleInvoiceID": "300", "TradeInTransactionID": "4",
         "TradeInDate": "2024-03-15 03:00:00"},
    ]
    counts = run_etl(spark, wh, _batch(spark, rows), now=_now())
    assert counts == {"inserted": 3, "updated": 0}

    target = {r["SaleInvoiceID"]: r for r in wh.read(spark, TARGET_TABLE).collect()}
    assert set(target) == {100, 200, 300}
    assert target[100]["TradeInAmount"] == Decimal("99.99")  # latest dup won
    assert target[100]["TradeInStatus"] == "Completed"
    assert target[200]["TradeInAmount"] is None  # lenient cast
    assert str(target[200]["TradeInDate"]) == "2024-03-15 12:00:00"  # fallback now
    assert target[300]["TradeInAmount"] is None  # missing key → NULL
    # EST derivation: 2024-03-15 is EDT (UTC-4)
    assert str(target[100]["TradeInDateEST"]) == "2024-03-14 22:00:00.500000"[:10] + " 22:00:00"
    assert target[100]["ETLRowInsertedEST"] is not None
    assert target[100]["ETLRowUpdatedEST"] is None


def test_pipeline_idempotent_and_updates(spark, wh):
    day1 = [{"SaleInvoiceID": "1", "TradeInTransactionID": "1",
             "TradeInDate": "2024-03-15T01:00:00Z", "TradeInAmount": "1.00"}]
    run_etl(spark, wh, _batch(spark, day1), now=_now())
    # Idempotence is on data columns; the matched-update branch stamps
    # ETLRowUpdatedEST even when values are unchanged (rqtradein_etl.py:161).
    data = wh.read(spark, TARGET_TABLE).drop("ETLRowUpdatedEST")
    before = sorted(map(str, data.collect()))

    # Same batch again → 0 inserts, 1 update, identical data columns.
    counts = run_etl(spark, wh, _batch(spark, day1), now=_now())
    assert counts == {"inserted": 0, "updated": 1}
    data = wh.read(spark, TARGET_TABLE).drop("ETLRowUpdatedEST")
    after = sorted(map(str, data.collect()))
    assert before == after

    # Day-2 re-delivery with updated values → update, not duplicate.
    day2 = [{"SaleInvoiceID": "1", "TradeInTransactionID": "2",
             "TradeInDate": "2024-03-16T01:00:00Z", "TradeInAmount": "2.00"},
            {"SaleInvoiceID": "2", "TradeInTransactionID": "3",
             "TradeInDate": "2024-03-16T01:00:00Z", "TradeInAmount": "3.00"}]
    counts = run_etl(spark, wh, _batch(spark, day2),
                     now=F.to_timestamp(F.lit("2024-03-16 12:00:00")))
    assert counts == {"inserted": 1, "updated": 1}
    target = {r["SaleInvoiceID"]: r for r in wh.read(spark, TARGET_TABLE).collect()}
    assert len(target) == 2
    assert target[1]["TradeInAmount"] == Decimal("2.00")
    assert target[1]["ETLRowUpdatedEST"] is not None


def test_retention_keeps_only_todays_rows(spark, wh):
    rows = [
        {"SaleInvoiceID": "1", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z"},  # "today" wrt _now()
        {"SaleInvoiceID": "2", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-01T01:00:00Z"},  # old → purged
    ]
    run_etl(spark, wh, _batch(spark, rows), now=_now())
    staged = wh.read(spark, STAGING_TABLE).collect()
    assert [r["SaleInvoiceID"] for r in staged] == ["1"]


def test_normalize_renders_strings(spark):
    df = _batch(spark, [{"SaleInvoiceID": "1", "TradeInTransactionID": "1",
                         "TradeInDate": "2024-03-15T01:00:00Z"}])
    out = normalize_batch(df, now=_now()).collect()[0]
    assert out["TradeInDate"] == "2024-03-15 01:00:00.000000"
    assert out["TradeInDateEST"] == "2024-03-14 21:00:00"  # EDT
    assert out["PostTime"] is None


def test_daily_window_shape():
    from datetime import date

    w = daily_window(date(2024, 3, 15))
    assert w == {"StartDate": "2024-03-14", "StopDate": "2024-03-15"}


def test_compact_table_reduces_file_count(spark, tmp_path):
    from fn_rq_report_etl_dev_spark.catalog import Warehouse, compact_table

    import os

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.range(1000).withColumnRenamed("id", "k")
    for _ in range(3):  # several appends → many small files
        wh.append(df.repartition(8), "t")
    before = sum(f.endswith(".parquet") for f in os.listdir(wh.path("t")))
    assert before == 24
    n = compact_table(spark, wh, "t", target_files=4)
    assert n == 4
    assert wh.read(spark, "t").count() == 3000


def test_unique_key_violations(spark):
    from fn_rq_report_etl_dev_spark.operators.quality import unique_key_violations

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    out = unique_key_violations(df, ["k"]).collect()
    assert [(r["k"], r["n_occurrences"]) for r in out] == [(1, 2)]


def test_quality_rules_null_policy(spark):
    """Only not_null counts NULL rows; shape rules (in_range / matches /
    accepted_values) exempt NULLs, so composing them never double-counts."""
    from fn_rq_report_etl_dev_spark.operators.quality import (
        accepted_values,
        constraint_report,
        in_range,
        matches,
        not_null,
    )

    df = spark.createDataFrame(
        [(None, None, None), (5, "ab", "x"), (99, "!!", "z")],
        "num int, txt string, cat string",
    )
    rules = [
        not_null("num"),
        in_range("num", 0, 10),
        matches("txt", "[a-z]+"),
        accepted_values("cat", ["x", "y"]),
    ]
    got = {r["rule"]: r["n_violations"] for r in constraint_report(df, rules).collect()}
    assert got == {
        "num_not_null": 1,   # the NULL row, counted exactly once
        "num_in_range": 1,   # 99 only — NULL exempt
        "txt_matches": 1,    # "!!" only — NULL exempt
        "cat_accepted": 1,   # "z" only — NULL exempt
    }


@pytest.mark.perf
def test_daily_batch_envelope_sf01(spark):
    """Committed performance envelope for the reference-parity pipeline
    (VERDICT r02 item 5): one warm sf0.1 daily batch — the number that
    maps to the reference's 90-minute budget — must stay under 15 s, so
    suite growth can't silently erode it. The first run is a JIT/codegen
    warm-up (cold-start cost is session overhead, not pipeline cost —
    bench.py warms the same way); the second run is the SLO measurement.
    Measured baseline on this machine: ~8.2 s warm at local[32].

    Marked ``perf`` (ADVICE r03): a wall-clock bound is machine-dependent;
    exclude it from correctness-only runs with ``-m "not perf"``. It stays
    in the default run on this box, where ~1.8x headroom is real signal."""
    import bench

    sf_dir = "/root/testdata/sf0.1"
    bench.time_pipeline_daily_batch(spark, sf_dir)  # warm-up
    sec = bench.time_pipeline_daily_batch(spark, sf_dir)
    assert sec < 15.0, f"daily batch envelope blown: {sec:.1f}s >= 15s"
