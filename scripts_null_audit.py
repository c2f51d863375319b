"""NULL-injection robustness audit, generalized (round-4 sweep #2 made
repeatable): deterministically null out a fraction of chosen columns,
materialize the dirtied tables once, then run EVERY registered query on
them in BOTH engines and compare hashes exactly like the driver.

At 100 TB, NULLs are not an edge case — they are the steady state of any
real feed. A query that hash-matches its oracle on clean fixtures but
diverges (or crashes) under NULLs has a 3-valued-logic bug waiting in
production. The earlier sweep dirtied the LLM-side tables (documents /
embeddings / events) and found 4 real bugs; this script also dirties the
relational star (lineitem / orders / part / supplier / customer) —
predicate columns, join keys, money columns — so the TPC-H family's
filters, joins and DECIMAL aggregates face the same 3VL scrutiny.

Nulling is hash-deterministic over a stable PER-ROW key (the table's
primary key + a per-column salt), so both engines see the identical
dirty dataset, re-runs are reproducible, and every column — including
low-cardinality ones like l_returnflag — really loses ~10% of rows.
(Hashing the column's own value instead would null all-or-none of each
distinct value: a 3-value column would usually lose nothing at all.)

Run: python scripts_null_audit.py [query ...]   (exit = #failures)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_NULL_SF_DIR", "/root/testdata/sf0.001")
RATE = 10  # null out rows where the row-key hash bucket % RATE == 0 (10%)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Stable per-row key per table — the hash input that picks the nulled 10%.
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

# table -> columns to dirty. Different salts per column so the same row
# rarely loses every field.
DIRTY: dict[str, list[str]] = {
    "lineitem": ["l_shipdate", "l_discount", "l_quantity", "l_returnflag",
                 "l_extendedprice"],
    "orders": ["o_orderdate", "o_orderpriority", "o_totalprice",
               "o_orderstatus"],
    "part": ["p_type", "p_size", "p_name", "p_brand", "p_retailprice"],
    "supplier": ["s_acctbal"],
    "customer": ["c_acctbal"],
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
    "events": ["event_type", "value", "props"],
}

# SPARK_NULL_KEYS=1 additionally dirties JOIN KEYS — the harshest 3VL
# surface: NULL keys match nothing in equi-joins (both engines), vanish
# from COUNT(col), and form their own GROUP BY bucket. Kept behind a knob
# because several operators' contracts legitimately assume non-null keys
# (the merge key gate raises by design).
if os.environ.get("SPARK_NULL_KEYS") == "1":
    DIRTY["lineitem"] = DIRTY["lineitem"] + ["l_partkey", "l_suppkey"]
    DIRTY["orders"] = DIRTY["orders"] + ["o_custkey"]


def main() -> int:
    import duckdb

    from fn_rq_report_etl_dev_spark.session import get_spark
    from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES
    from pyspark.sql import functions as F

    from scripts_driver_sim import _canon

    from fn_rq_report_etl_dev_spark.workloads import load

    spark = get_spark(app_name="null-audit", shuffle_partitions=8)
    out = tempfile.mkdtemp(prefix="null-audit-")
    for t in TABLES:
        # load() applies the events nano-ts normalization; ts is re-written
        # as NTZ so DuckDB reads the dirty copy as naive TIMESTAMP exactly
        # like the original fixture (TIMESTAMPTZ would isoformat with an
        # offset and falsely hash-diverge).
        df = load(spark, SRC, t)
        if t == "events":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        key = [F.col(k).cast("string") for k in ROW_KEY[t]]
        for c in DIRTY.get(t, []):
            # 10% of ROWS, chosen by a hash over the row key + a
            # per-column salt: deterministic, engine-independent,
            # decorrelated across columns, and value-independent (a
            # low-cardinality column still loses ~10% of its rows).
            # pmod, not abs()%: abs(Int.MinValue) stays negative in
            # non-ANSI Spark, so that row's bucket could never hit 0
            # (ADVICE r04 — a one-in-2^32 deterministic draw skew).
            bucket = F.pmod(F.hash(F.concat_ws("|", F.lit(c), *key)), F.lit(RATE))
            df = df.withColumn(c, F.when(bucket == 0, F.lit(None)).otherwise(F.col(c)))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    print(f"dirty dataset at {out} (10% NULLs via deterministic hash)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet/*.parquet'")

    # Oracle columns that encode CLEAN-fixture expected values (closed-
    # form recall thresholds) rather than recomputable semantics: the
    # dirty corpus legitimately changes the expectation (measured:
    # n_probe=4 recall drops below the clean-fixture 0.70 bound). The
    # named columns are excluded from the value hash; rows, schema, and
    # every OTHER column (e.g. bf_pairs — the NULL-drop contract) are
    # still compared.
    EXPECTATION_COLUMNS: dict[str, set[str]] = {"ann_ivf_recall": {"recall_ok"}}

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
            skip = EXPECTATION_COLUMNS.get(name, set())
            if skip:
                keep_s = [i for i, c in enumerate(s_cols) if c not in skip]
                keep_d = [i for i, c in enumerate(d_cols) if c not in skip]
                s_rows_h = [tuple(r[i] for i in keep_s) for r in s_rows]
                d_rows_h = [tuple(r[i] for i in keep_d) for r in d_rows]
                s_cols_h = [s_cols[i] for i in keep_s]
                d_cols_h = [d_cols[i] for i in keep_d]
            else:
                s_rows_h, d_rows_h, s_cols_h, d_cols_h = s_rows, d_rows, s_cols, d_cols
            ok = (
                len(s_rows) == len(d_rows)
                and sorted(s_cols) == sorted(d_cols)
                and _canon(s_rows_h, s_cols_h) == _canon(d_rows_h, d_cols_h)
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
    print(f"null audit: {n_bad} failures")
    return n_bad


if __name__ == "__main__":
    raise SystemExit(main())
