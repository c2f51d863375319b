"""Empty-corpus robustness audit: run EVERY registered query against a
zero-row copy of the fixture schema and report any crash. At 100 TB,
empty partitions / empty days / empty filter results are routine — an
operator that works at sf0.1 but throws on zero rows is a production
incident waiting in an overnight job.

Run: python scripts_empty_audit.py   (exit code = number of failures)
Round-4 result: 0 failures across 129 queries — final registry, incl.
the TPC-H partsupp adaptations and the mergeSchema evolution read over
zero-row generations (after guarding the IVF k-means trainer against a
0-vector sample).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.workloads import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    spark = get_spark(app_name="empty-audit", shuffle_partitions=4)
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="sf-empty-")
    for t in TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    bad: list[tuple[str, str]] = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, d).count()
            print(f"{name}: OK")
        except Exception as exc:  # noqa: BLE001 — audit reports, not raises
            bad.append((name, str(exc).split("\n")[0][:160]))
            print(f"{name}: FAIL {bad[-1][1]}")
    print(f"\nempty-corpus audit: {len(bad)} failures / {len(QUERIES)} queries")
    for name, msg in bad:
        print(f"  {name}: {msg}")
    return len(bad)


if __name__ == "__main__":
    sys.exit(main())
