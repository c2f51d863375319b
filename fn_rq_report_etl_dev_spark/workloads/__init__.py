"""Workload registry: every implemented operator/query exposed as a
``(spark, sf_dir) -> DataFrame`` builder plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables.

This is the driver contract surface (``__spark_entry__.py``): each
SURVEY.md §2 operator appears here at least once, and the extension
operators (dedup family, similarity search, text analysis, multimodal) are
first-class entries.

Determinism rules for oracle-checked outputs (value-hash must match DuckDB):
- no wall-clock (`now` injected as literals), no nondeterministic ordering
  (windows always carry a unique tiebreaker);
- double arithmetic goes through DECIMAL(18,2) inputs (exact in both
  engines), divisions happen in double on already-identical values;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def workload(name: str, oracle: str | None = None):
    """Register a workload builder (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long via
# spark.sql.legacy.parquet.nanosAsLong; convert to microsecond timestamps
# (floor division — matching DuckDB/Arrow's ns→us truncation).
_NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table in _NANO_TS_COLUMNS:
        # Runtime-settable; required for any session the caller hands us —
        # the driver builds its own SparkSession without our factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in _NANO_TS_COLUMNS.get(table, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# Importing the submodules populates the registry.
from . import llmops, parity, relational  # noqa: E402,F401
