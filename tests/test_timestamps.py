"""Lenient multi-format timestamp parsing (SURVEY.md §2 O8-O11) — the
"timestamp zoo" scenario from FIXTURES.md §4.4."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.functions.timestamps import (
    normalize_fraction,
    parse_timestamp_multi,
    utc_to_est,
    with_fallback_now,
)


def _parse_one(spark, raw: str | None):
    df = spark.createDataFrame([(raw,)], "raw string")
    return df.select(parse_timestamp_multi(F.col("raw")).alias("ts")).collect()[0]["ts"]


def test_all_reference_formats_parse(spark):
    cases = {
        "2024-03-10T06:59:59.123456Z": datetime(2024, 3, 10, 6, 59, 59, 123456),
        "2024-03-10T06:59:59Z": datetime(2024, 3, 10, 6, 59, 59),
        "2024-03-10T06:59:59": datetime(2024, 3, 10, 6, 59, 59),
        "2024-03-10 06:59:59": datetime(2024, 3, 10, 6, 59, 59),
        "2024-03-10 06:59:59.500000": datetime(2024, 3, 10, 6, 59, 59, 500000),
        # fromisoformat fallback shapes
        "2024-03-10": datetime(2024, 3, 10),
    }
    for raw, expected in cases.items():
        assert _parse_one(spark, raw) == expected, raw


def test_ragged_fraction_digits(spark):
    # 1-9 fractional digits are padded/truncated to microseconds
    assert _parse_one(spark, "2024-01-02T03:04:05.1Z") == datetime(2024, 1, 2, 3, 4, 5, 100000)
    assert _parse_one(spark, "2024-01-02T03:04:05.123456789") == datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert _parse_one(spark, "2024-01-02 03:04:05.12") == datetime(2024, 1, 2, 3, 4, 5, 120000)


def test_unparseable_and_empty_yield_null(spark):
    assert _parse_one(spark, "not-a-date") is None
    assert _parse_one(spark, "") is None
    assert _parse_one(spark, None) is None


def test_normalize_fraction_preserves_plain_strings(spark):
    df = spark.createDataFrame([("2024-01-02T03:04:05Z",), ("abc",)], "raw string")
    got = [r[0] for r in df.select(normalize_fraction(F.col("raw"))).collect()]
    assert got == ["2024-01-02T03:04:05Z", "abc"]


def test_fallback_now_only_for_present_garbage(spark):
    now = F.to_timestamp(F.lit("2024-06-01 12:00:00"))
    df = spark.createDataFrame(
        [("garbage",), ("",), (None,), ("2024-01-01T00:00:00Z",)], "raw string"
    )
    out = df.select(
        with_fallback_now(parse_timestamp_multi(F.col("raw")), F.col("raw"), now).alias("ts")
    ).collect()
    assert out[0]["ts"] == datetime(2024, 6, 1, 12, 0, 0)  # garbage → now
    assert out[1]["ts"] is None  # empty → null
    assert out[2]["ts"] is None  # null → null
    assert out[3]["ts"] == datetime(2024, 1, 1, 0, 0, 0)


def test_est_conversion_handles_dst_boundaries(spark):
    # 2024 DST: starts 2024-03-10 07:00 UTC, ends 2024-11-03 06:00 UTC.
    cases = {
        "2024-03-10 06:59:59": datetime(2024, 3, 10, 1, 59, 59),  # EST (-5)
        "2024-03-10 07:00:00": datetime(2024, 3, 10, 3, 0, 0),  # EDT (-4), spring-forward skips 2am
        "2024-11-03 05:59:59": datetime(2024, 11, 3, 1, 59, 59),  # EDT (-4)
        "2024-11-03 06:00:00": datetime(2024, 11, 3, 1, 0, 0),  # EST (-5), fall-back repeats 1am
        "2024-07-04 16:30:00.750000": datetime(2024, 7, 4, 12, 30, 0),  # seconds precision
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    out = df.select(
        F.col("raw"), utc_to_est(F.to_timestamp(F.col("raw"))).alias("est")
    ).collect()
    for row in out:
        assert row["est"] == cases[row["raw"]], row["raw"]
