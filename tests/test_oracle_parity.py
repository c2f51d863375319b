"""Pre-verification of the driver's correctness gate: run every registered
workload on sf0.001 Spark-side AND DuckDB-side and compare row count, column
names, and an order-insensitive value comparison — a local mirror of
CORRECTNESS_r{N}.json so mismatches surface before the driver runs."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from fn_rq_report_etl_dev_spark.workloads import EAGER_SCHEMAS, ORACLES, QUERIES
from tests.conftest import duck_connection as _duck


def _norm(v):
    """Engine-neutral value rendering (mirrors an order-insensitive hash)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_norm(row[i]) for i in order) for row in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb_oracle(name, spark, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    if name in EAGER_SCHEMAS:
        # schema lints trust the declaration instead of executing eager
        # builders (ADVICE r03) — verify declared == actual here, where
        # the query executes anyway. Name+dtype comparison (nullability is
        # irrelevant to the driver's hash and differs for literal columns).
        assert _name_dtypes(sdf.schema) == _declared_name_dtypes(name), (
            f"{name}: EAGER_SCHEMAS declaration stale"
        )
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [c[0].lower() for c in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    spark_canon = _canon(spark_rows, spark_cols)
    duck_canon = _canon(duck_rows, duck_cols)
    mismatches = [
        (s, d) for s, d in zip(spark_canon, duck_canon) if s != d
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_every_query_runs_and_entry_smokes(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def _name_dtypes(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def _declared_name_dtypes(name):
    from pyspark.sql import types as T

    return _name_dtypes(T.StructType.fromDDL(EAGER_SCHEMAS[name]))


def test_eager_schema_declarations_for_no_oracle_queries(spark, sf_dir):
    """EAGER_SCHEMAS entries without a DuckDB oracle aren't covered by the
    parametrized parity check above — verify the declaration against the
    actual schema here. (Empty since r05: ann_ivf_topk, the last no-oracle
    row, gained a codebook-replay oracle; the loop stays as a guard.)"""
    for name in set(EAGER_SCHEMAS) - set(ORACLES):
        actual = QUERIES[name](spark, sf_dir).schema
        assert _name_dtypes(actual) == _declared_name_dtypes(name), name


def test_sessionize_gap_is_microsecond_exact(spark):
    """Regression: a 1800.8s gap (> 30 min by 0.8s) must open a new
    session — second-truncated arithmetic would call it 1800s and miss."""
    from datetime import datetime, timedelta

    from fn_rq_report_etl_dev_spark.workloads.relational import sessionize_events

    base = datetime(2024, 1, 1, 0, 0, 0, 100000)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (1, base + timedelta(seconds=1800, microseconds=800000), 2, "click", 0.0, "{}"),
        (2, base, 3, "click", 0.0, "{}"),
        (2, base + timedelta(seconds=1800), 4, "click", 0.0, "{}"),  # exactly 30 min: same session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.parquet(f"{d}/events.parquet")
    out = {r["user_id"]: r["n_sessions"] for r in sessionize_events(spark, d).collect()}
    assert out == {1: 2, 2: 1}
