#!/usr/bin/env python
"""Benchmark harness: run every registered workload at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect). The reference's only published envelope is "one daily
batch inside 90 minutes" (BASELINE.md); the flagship pipeline here is the
comparable number — everything else is the engine's broader surface.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.workloads import QUERIES


def force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}

    # Warm the JVM/codegen once on the flagship so first-query JIT noise
    # doesn't land on an arbitrary workload.
    force(QUERIES["flagship_dedup_merge"](spark, sf_dir))

    for name in sorted(QUERIES):
        start = time.perf_counter()
        force(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "workload_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
