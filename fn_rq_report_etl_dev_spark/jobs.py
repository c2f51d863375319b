"""Batch job entrypoint — what an external scheduler (cron / Airflow /
Databricks Jobs) invokes via spark-submit, replacing the reference's Azure
Functions timer trigger (O4, function.json:8):

    spark-submit fn_rq_report_etl_dev_spark/jobs.py \
        --warehouse /data/wh --landing /data/landing/2024-03-15 \
        [--date 2024-03-15]

Reads one day's JSON batch from the landing directory (distributed,
schema-on-read with the declared StructType), runs the full pipeline, and
prints the audit-count JSON the reference returns (rqtradein_etl.py:194).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):
    # spark-submit runs this file as __main__ with no parent package;
    # bootstrap the repo root so absolute imports resolve.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict[str, int]:
    parser = argparse.ArgumentParser(description="Daily trade-in ETL batch")
    parser.add_argument("--warehouse", required=True, help="warehouse root dir")
    parser.add_argument("--landing", required=True, help="landing dir of JSON batches")
    parser.add_argument(
        "--date", default=None,
        help="pipeline 'today' (YYYY-MM-DD); defaults to the wall clock",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.catalog import Warehouse
    from fn_rq_report_etl_dev_spark.pipeline import run_etl
    from fn_rq_report_etl_dev_spark.session import get_spark
    from fn_rq_report_etl_dev_spark.sources.json_api import read_json_landing

    spark = get_spark(app_name="daily_tradein_etl")
    now = (
        F.to_timestamp(F.lit(f"{args.date} 00:00:00")) if args.date else None
    )
    batch = read_json_landing(spark, args.landing)
    counts = run_etl(spark, Warehouse(args.warehouse), batch, now=now)
    print(json.dumps(counts))
    return counts


if __name__ == "__main__":
    main(sys.argv[1:])
