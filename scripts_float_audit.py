"""Adversarial-float robustness audit (round-5 sweep #5): deterministically
replace a fraction of the DOUBLE-bearing columns with the IEEE-754 edge
values — NaN, +/-Infinity, negative zero, +/-1.7e308 (one addition away
from overflow), and the smallest subnormal — then run EVERY registered
query on the mutated corpus in BOTH engines and compare hashes exactly
like the driver.

Why this sweep exists: at 100 TB, NaN and Inf are not hypothetical — they
arrive in every real telemetry/embedding feed. The engines' float
machinery differs at exactly these corners: NaN ordering and equality
classes, -0.0 normalization in grouping keys, silent-NULL vs error on
float->DECIMAL casts (Spark's non-ANSI cast returns NULL where DuckDB's
CAST raises — oracles must say TRY_CAST), and overflow behavior of
sum/avg. A query that hash-matches on finite fixtures can silently
diverge (or crash its oracle) on the first NaN.

Mutation is hash-deterministic over the table's primary key + a
per-column salt (same discipline as scripts_null_audit.py): 10% of rows
get their value replaced by one of the edge values (which one also
derives from the row key); embedding vectors get their FIRST element
replaced (a partially-poisoned vector, the realistic failure) on 5% of
rows. SPARK_FLOAT_MONEY=1 escalates to the relational money columns
(l_extendedprice/l_discount/o_totalprice) — kept behind a knob because
money arrives from DECIMAL upstreams in practice and several TPC-H
oracles assume finite money by construction.

Run: python scripts_float_audit.py [query ...]   (exit = #failures)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_FLOAT_SF_DIR", "/root/testdata/sf0.001")
RATE = 10

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

EDGE = [
    float("nan"),
    float("inf"),
    float("-inf"),
    -0.0,
    1.7e308,
    -1.7e308,
    5e-324,
]

MUTATE: dict[str, list[str]] = {
    "events": ["value"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
}
if os.environ.get("SPARK_FLOAT_MONEY") == "1":
    MUTATE["lineitem"] = ["l_extendedprice", "l_discount"]
    MUTATE["orders"] = ["o_totalprice"]


def main() -> int:
    import duckdb

    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.session import get_spark
    from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES, load
    from scripts_driver_sim import _canon

    spark = get_spark(app_name="float-audit", shuffle_partitions=8)
    out = tempfile.mkdtemp(prefix="float-audit-")
    edge = F.array(*[F.lit(v).cast("double") for v in EDGE])
    for t in TABLES:
        df = load(spark, SRC, t)
        if t == "events":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        key = [F.col(k).cast("string") for k in ROW_KEY[t]]
        for c in MUTATE.get(t, []):
            bucket = F.pmod(F.hash(F.concat_ws("|", F.lit(c), *key)), F.lit(RATE))
            pick = F.element_at(
                edge,
                F.pmod(F.hash(F.concat_ws("#", F.lit(c), *key)), F.lit(len(EDGE))) + 1,
            )
            df = df.withColumn(
                c,
                F.when(F.col(c).isNull(), F.col(c))
                .when(bucket == 0, pick)
                .otherwise(F.col(c)),
            )
        if t == "embeddings":
            # poison the FIRST element of 5% of vectors (NaN) and another
            # 5% (+inf): partially-bad vectors, not NULL ones — the case
            # the NULL-drop contract does NOT cover.
            key = [F.col("vec_id").cast("string")]
            bucket = F.pmod(F.hash(F.concat_ws("|", F.lit("emb"), *key)), F.lit(20))
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("embedding").isNull(), F.col("embedding")
                )
                .when(
                    bucket == 0,
                    F.concat(
                        F.array(F.lit(float("nan")).cast("float")),
                        F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
                    ),
                )
                .when(
                    bucket == 1,
                    F.concat(
                        F.array(F.lit(float("inf")).cast("float")),
                        F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
                    ),
                )
                .otherwise(F.col("embedding")),
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    print(f"mutated dataset at {out} ({len(EDGE)} IEEE edge values)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet/*.parquet'")

    # Oracle columns encoding CLEAN-fixture expectations (recall bounds):
    # poisoned vectors legitimately change recall — excluded from the
    # value hash, rows/schema/other columns still compared (same rule as
    # scripts_null_audit.py).
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
    print(f"float audit: {n_bad} failures")
    return n_bad


if __name__ == "__main__":
    raise SystemExit(main())
