"""Dtype alignment between every Spark workload and its DuckDB oracle —
the driver's schema comparison must never see int-vs-bigint (or worse,
HUGEINT) divergence. DuckDB's integer-returning functions (row_number,
length, levenshtein, year, sum-of-int → HUGEINT...) are wider than
Spark's; workloads cast to BIGINT where needed."""

from __future__ import annotations

import pytest

from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES
from tests.conftest import duck_connection

EQUIV = {
    ("bigint", "BIGINT"), ("int", "INTEGER"), ("double", "DOUBLE"),
    ("string", "VARCHAR"), ("timestamp", "TIMESTAMP"), ("date", "DATE"),
    ("boolean", "BOOLEAN"), ("float", "FLOAT"),
    # parquet TIMESTAMP(isAdjustedToUTC=false) reads as NTZ in Spark; the
    # naive instants are identical to DuckDB's TIMESTAMP.
    ("timestamp_ntz", "TIMESTAMP"),
    ("array<int>", "INTEGER[]"), ("array<bigint>", "BIGINT[]"),
    ("array<double>", "DOUBLE[]"), ("array<string>", "VARCHAR[]"),
    ("array<float>", "FLOAT[]"),
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_output_dtypes_align(name, spark, sf_dir, duck):
    st = {
        f.name.lower(): f.dataType.simpleString()
        for f in QUERIES[name](spark, sf_dir).schema.fields
    }
    dt = {r[0].lower(): r[1] for r in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()}
    mismatches = []
    for col, s in st.items():
        d = dt.get(col, "MISSING")
        if s.startswith("decimal") and d.startswith("DECIMAL"):
            continue
        if (s, d) not in EQUIV:
            mismatches.append((col, s, d))
    assert not mismatches, f"{name}: {mismatches}"
