"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (window dedup + merge upsert — the
reference's relational core, SURVEY.md §3.2) on the sf0.001 fixtures.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extension operators; the driver compares
each against its DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_dedup_merge"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted only for ops whose
    semantics aren't SQL-expressible — the driver then checks rows-only)."""
    return dict(ORACLES)
