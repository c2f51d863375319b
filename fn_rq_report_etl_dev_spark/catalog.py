"""Idempotent warehouse bootstrap + schema migration.

≙ the reference's ``create_tables_if_not_exist`` (rqtradein_etl.py:25-149):
probe-for-existence, conditional create, and the one legacy rename
(``sp_rename 'api.RQTradeinReport_staging' → 'RQTradeinReportStaging'``,
rqtradein_etl.py:28-36).

Tables are directories of Parquet files under a warehouse root. A real
deployment would swap this for a metastore catalog (``CREATE TABLE IF NOT
EXISTS ... USING PARQUET``) or a Delta/Iceberg table — the API is the same.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import STAGING_SCHEMA, TARGET_SCHEMA

STAGING_TABLE = "rq_tradein_report_staging"
TARGET_TABLE = "rq_tradein_report"
LEGACY_STAGING_TABLE = "rq_tradein_report__staging"  # pre-migration name


class Warehouse:
    """Parquet-directory warehouse with atomic overwrite semantics."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and bool(os.listdir(p))

    def read(self, spark: SparkSession, table: str, schema: T.StructType | None = None) -> DataFrame:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite_atomic(self, df: DataFrame, table: str) -> None:
        """Write to a temp dir, then swap — safe when ``df`` reads from the
        table being replaced (the merge reads target and rewrites it)."""
        final = self.path(table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        old = f"{final}.old-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old, ignore_errors=True)

    def rename(self, old: str, new: str) -> None:
        os.rename(self.path(old), self.path(new))

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)


def migrate_legacy_staging(wh: Warehouse) -> bool:
    """Rename the legacy staging table if (and only if) the old exists and
    the new does not — the reference's exact guard (rqtradein_etl.py:30-34)."""
    if wh.exists(LEGACY_STAGING_TABLE) and not wh.exists(STAGING_TABLE):
        wh.rename(LEGACY_STAGING_TABLE, STAGING_TABLE)
        return True
    return False


def ensure_tables(spark: SparkSession, wh: Warehouse) -> None:
    """Idempotent bootstrap: migrate the legacy name, then create any
    missing table as an empty Parquet dataset with the declared schema."""
    migrate_legacy_staging(wh)
    for table, schema in ((STAGING_TABLE, STAGING_SCHEMA), (TARGET_TABLE, TARGET_SCHEMA)):
        if not wh.exists(table):
            empty = spark.createDataFrame([], schema)
            empty.write.mode("overwrite").parquet(wh.path(table))
