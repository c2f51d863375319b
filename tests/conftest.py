from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fn_rq_report_etl_dev_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        'perf: wall-clock envelope tests (machine-dependent; exclude from '
        'correctness-only runs with -m "not perf")',
    )
    config.addinivalue_line(
        "markers",
        "audit: opt-in adversarial sweeps (empty-corpus, NULL-injection, "
        "varied-parallelism determinism) — deselected by default via "
        "pytest.ini addopts; run with `pytest -m audit`",
    )


@pytest.fixture(scope="session")
def spark():
    # Fewer shuffle partitions than prod default: tiny test data.
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


CORPUS_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    """DuckDB connection with the corpus registered as views — the same
    setup the driver's oracle runner uses."""
    import duckdb

    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con
