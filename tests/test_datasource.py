"""Spark 4 Python DataSource for the trade-in API (sources/datasource.py):
date-sliced partition parallelism, fixed-column projection semantics, and
pipeline integration through run_etl."""

from __future__ import annotations

import json

import pytest

from fn_rq_report_etl_dev_spark.schemas import TRADEIN_COLUMNS
from fn_rq_report_etl_dev_spark.sources.datasource import (
    FORMAT_NAME,
    TradeInApiDataSource,
    _date_range,
)


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "2026-08-01.json").write_text(
        json.dumps(
            [
                {
                    "SaleInvoiceID": "1",
                    "TradeInTransactionID": "100",
                    "TradeInStatus": "OK",
                    "UnknownExtraKey": "dropped",
                },
                {"SaleInvoiceID": "2"},
            ]
        )
    )
    (d / "2026-08-02.json").write_text(
        json.dumps([{"SaleInvoiceID": "3", "TradeInAmount": "19.99"}])
    )
    # 2026-08-03 has no file: a day with no landed batch yields no rows.
    return str(d)


def _load(spark, landing, start, stop):
    spark.dataSource.register(TradeInApiDataSource)
    return (
        spark.read.format(FORMAT_NAME)
        .option("landing", landing)
        .option("start_date", start)
        .option("stop_date", stop)
        .load()
    )


def test_reads_day_slices_with_fixed_projection(spark, landing):
    df = _load(spark, landing, "2026-08-01", "2026-08-03")
    rows = {r["SaleInvoiceID"]: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3"}
    assert df.columns == list(TRADEIN_COLUMNS)
    # absent keys project to NULL; unknown keys are dropped (O7 semantics)
    assert rows["2"]["TradeInTransactionID"] is None
    assert rows["3"]["TradeInAmount"] == "19.99"
    assert rows["1"]["TradeInStatus"] == "OK"


def test_one_partition_per_day(spark, landing):
    df = _load(spark, landing, "2026-08-01", "2026-08-03")
    # day slices are the parallelism unit: 3 days -> 3 input partitions
    assert df.rdd.getNumPartitions() == 3


def test_date_range_validation():
    assert _date_range("2026-08-01", "2026-08-01") == ["2026-08-01"]
    with pytest.raises(ValueError):
        _date_range("2026-08-02", "2026-08-01")


def test_datasource_feeds_pipeline(spark, landing, tmp_path):
    from fn_rq_report_etl_dev_spark.catalog import TARGET_TABLE, Warehouse
    from fn_rq_report_etl_dev_spark.pipeline import run_etl

    batch = _load(spark, landing, "2026-08-01", "2026-08-02")
    wh = Warehouse(str(tmp_path / "wh"))
    metrics = run_etl(spark, wh, batch)
    assert metrics["inserted"] == 3
    assert wh.read(spark, TARGET_TABLE).count() == 3


def test_stream_reader_drains_new_days_exactly_once(spark, landing, tmp_path):
    """availableNow drain 1 sees days 1-2; a day-3 file lands; drain 2
    (same checkpoint) emits ONLY day 3 — the engine's offset log replaces
    the reference's re-scan-and-absorb idempotence."""
    import json as _json

    spark.dataSource.register(TradeInApiDataSource)
    checkpoint = str(tmp_path / "ckpt")
    target = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("landing", landing)
            .option("start_date", "2026-08-01")
            .load()
            .writeStream.format("parquet")
            .option("path", target)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.exception() is None

    drain()
    got = spark.read.parquet(target)
    assert sorted(r["SaleInvoiceID"] for r in got.collect()) == ["1", "2", "3"]

    (tmp_path / "landing" / "2026-08-03.json").write_text(
        _json.dumps([{"SaleInvoiceID": "4"}])
    )
    drain()
    got = spark.read.parquet(target)
    # exactly once: day-1/2 rows not re-emitted, day-3 row present
    assert sorted(r["SaleInvoiceID"] for r in got.collect()) == ["1", "2", "3", "4"]
