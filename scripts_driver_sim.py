"""Driver-sim: run every __spark_entry__ query with a VANILLA SparkSession
at sf0.01 and compare against its DuckDB oracle exactly like the driver does
(row count + column names + order-insensitive value comparison). Prints one
summary line per query and a final JSON tally. This is the /verify step-2
recipe as a script (tests/test_oracle_parity.py covers the same at sf0.001
through the project session factory)."""

from __future__ import annotations

import json
import math
import os
import sys
import traceback
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
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
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import os

    # Overridable parallelism/partitioning: the driver's session config is
    # unknown, so determinism must hold under ANY task split — re-running
    # with e.g. SPARK_SIM_MASTER=local[3] SPARK_SIM_SHUFFLE=7 is the
    # cheap audit that no result depends on shuffle/partition order.
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_SIM_MASTER", "local[8]"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_SIM_SHUFFLE", "8"),
        )
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    report: dict[str, dict] = {}
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        row: dict = {}
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(s_rows)
            if name not in oracles:
                row["err"] = "no_oracle"
                print(f"{name}: rows={len(s_rows)} (no oracle)")
                report[name] = row
                continue
            res = con.execute(oracles[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
            row["oracle_rows"] = len(d_rows)
            row["rows_match"] = len(s_rows) == len(d_rows)
            row["schema_match"] = sorted(s_cols) == sorted(d_cols)
            row["hash_match"] = (
                row["rows_match"]
                and row["schema_match"]
                and _canon(s_rows, s_cols) == _canon(d_rows, d_cols)
            )
            ok = row["hash_match"]
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"
            traceback.print_exc(limit=2)
            ok = False
        if not ok:
            n_bad += 1
        status = "OK" if ok else "BAD"
        print(f"{name}: {status} {row}")
        report[name] = row

    print(json.dumps({"n": len(report), "bad": n_bad}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
