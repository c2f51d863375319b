"""Extreme-date robustness audit (round-5 sweep #7): deterministically
replace a fraction of the relational date/timestamp predicate columns
(`orders.o_orderdate`, `lineitem.l_shipdate`) with calendar boundary
values — proleptic year 1, the pre-Gregorian cutover, the last second of
the negative epoch, a leap day, the last representable Spark timestamp
(year 9999) — then run EVERY registered query on the mutated corpus in
BOTH engines and compare hashes exactly like the driver.

Why this sweep exists: a 100 TB feed always contains sentinel and
garbage dates (0001-01-01 placeholders, 9999-12-31 "never expires",
pre-epoch birthdays). The engines differ at the calendar corners:
ANSI Spark RAISES on date/timestamp + INTERVAL arithmetic that leaves
[0001-01-01, 9999-12-31] while DuckDB's wider date range sails past;
week truncation alignment in the proleptic far past; epoch conversions
of pre-1970 instants. A date predicate written as `ship + INTERVAL 45
DAY > order` works on clean fixtures and detonates on the first
9999-12-31 — the engine-neutral, overflow-free form is integer
`datediff`.

events.ts is deliberately NOT mutated: it drives watermarks, session
gaps and micro-batch cutoffs whose fixtures pin a concrete time range —
sentinel timestamps there are a data-quality reject (quality gate), not
a parity target.

Run: python scripts_date_audit.py [query ...]   (exit = #failures)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_DATE_SF_DIR", "/root/testdata/sf0.001")
RATE = 20  # 5% of rows per column

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ROW_KEY: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

EDGE_TS = [
    "0001-01-01 00:00:00",  # proleptic minimum (Spark's floor)
    "1582-10-04 12:00:00",  # eve of the Gregorian cutover (proleptic zone)
    "1969-12-31 23:59:59",  # last pre-epoch second
    "2000-02-29 12:34:56",  # leap day
    "9999-12-31 23:59:59",  # Spark's timestamp ceiling ("never expires")
    "1900-01-01 00:00:00",  # classic sentinel
]

MUTATE: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def main() -> int:
    import duckdb

    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.session import get_spark
    from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES, load
    from scripts_driver_sim import _canon

    spark = get_spark(app_name="date-audit", shuffle_partitions=8)
    out = tempfile.mkdtemp(prefix="date-audit-")
    edge = F.array(*[F.lit(t).cast("timestamp_ntz") for t in EDGE_TS])
    for t in TABLES:
        df = load(spark, SRC, t)
        if t == "events":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        key = [F.col(k).cast("string") for k in ROW_KEY[t]]
        for c in MUTATE.get(t, []):
            bucket = F.pmod(F.hash(F.concat_ws("|", F.lit(c), *key)), F.lit(RATE))
            pick = F.element_at(
                edge,
                F.pmod(
                    F.hash(F.concat_ws("#", F.lit(c), *key)), F.lit(len(EDGE_TS))
                )
                + 1,
            )
            # keep the column's NTZ reading byte-compatible with the clean
            # fixture (see scripts_null_audit.py on events.ts)
            df = df.withColumn(
                c,
                F.when(F.col(c).isNull(), F.col(c))
                .when(bucket == 0, pick)
                .otherwise(F.col(c).cast("timestamp_ntz")),
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    print(f"mutated dataset at {out} ({len(EDGE_TS)} calendar edge values)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet/*.parquet'")

    only = set(sys.argv[1:])
    n_bad = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, out)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                print(f"{name}: rows={len(s_rows)} (no oracle)")
                continue
            res = con.execute(ORACLES[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
            ok = (
                len(s_rows) == len(d_rows)
                and sorted(s_cols) == sorted(d_cols)
                and _canon(s_rows, s_cols) == _canon(d_rows, d_cols)
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: CRASH {type(ex).__name__}: {str(ex)[:160]}")
            n_bad += 1
            continue
        if not ok:
            n_bad += 1
            print(f"{name}: MISMATCH spark={len(s_rows)} oracle={len(d_rows)}")
        else:
            print(f"{name}: OK ({len(s_rows)} rows)")
    print(f"date audit: {n_bad} failures")
    return n_bad


if __name__ == "__main__":
    raise SystemExit(main())
