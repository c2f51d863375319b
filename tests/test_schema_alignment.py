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


def test_registry_rotation_prioritizes_unverified():
    """Dict order = recheck, then never-green-in-any-driver-report, then
    settled-green — so a 50-entry driver cap always lands on the queries
    that still need a verdict. Derived from the CORRECTNESS_r*.json files
    at import time (no per-round list maintenance)."""
    import json

    from fn_rq_report_etl_dev_spark.workloads import _RECHECK, QUERIES

    names = list(QUERIES)
    assert len(names) == len(set(names))
    r01 = json.load(open("CORRECTNESS_r01.json"))
    green = {
        k
        for k, v in r01.items()
        if v.get("hash_match") is True or v.get("err") == "no_oracle"
    }
    # recheck first, in order
    assert names[: len(_RECHECK)] == [n for n in _RECHECK if n in QUERIES]
    # red cells (reported but not green) are NOT settled: o17 was red in r01
    assert "o17_lenient_cast" in names[:2]
    # every settled-green query sorts after every fresh query
    settled_pos = [names.index(n) for n in green if n in QUERIES and n not in _RECHECK]
    fresh_pos = [
        names.index(n)
        for n in names
        if n not in green and n not in _RECHECK
    ]
    assert min(settled_pos) > max(fresh_pos)
