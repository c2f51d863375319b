"""Adversarial-Unicode robustness audit (round-5 sweep #4): deterministically
replace or suffix a fraction of the string-bearing columns with hostile
Unicode — combining-mark Zalgo, CJK, RTL with directional marks, ZWJ emoji
sequences, Turkish dotted/dotless I, full-width forms, zero-width characters,
exotic whitespace, control characters, NUL bytes, astral-plane letters — then
run EVERY registered query on the mutated corpus in BOTH engines and compare
hashes exactly like the driver.

Why this sweep exists: a 100 TB web-scale corpus contains every one of these
strings millions of times over, and the Spark and DuckDB sides of each oracle
pair run DIFFERENT Unicode machinery (JVM UTF8String + java.util.regex vs
utf8proc + RE2). Case mapping (lower('İ')), codepoint counting, \\s/\\w
character classes and collation are exactly the seams where a query can
hash-match on ASCII fixtures while silently diverging in production. The
NULL audit proved the 3VL seams; this proves the encoding seams.

Mutation is hash-deterministic over the table's primary key + a per-column
salt (same discipline as scripts_null_audit.py): 5% of rows get their value
REPLACED by an adversarial string, a disjoint 5% get one APPENDED, and which
adversarial string is used also derives from the row key — both engines see
the identical mutated dataset and re-runs are reproducible.

Run: python scripts_unicode_audit.py [query ...]   (exit = #failures)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_UNI_SF_DIR", "/root/testdata/sf0.001")
RATE = 20  # bucket 0 of 20 -> replace (5%); bucket 1 -> append (5%)

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

# String columns that feed text processing, LIKE/regex predicates, and
# group keys. events.props is deliberately NOT mutated: it must stay valid
# JSON, because the malformed-input contract differs by design (Spark's
# get_json_object returns NULL, DuckDB's json_extract raises) — that seam
# is documented, not a parity target.
MUTATE: dict[str, list[str]] = {
    "documents": ["text", "source"],
    "part": ["p_name"],
    "events": ["event_type"],
}

ADV = [
    "café née mixed normalization",        # NFC vs NFD composed/decomposed
    "źâl̃ḡo̅ combining stack",
    "日本語テキスト 中文文本 한국어",  # CJK
    "\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645\u200f \u05e2\u05d1\u05e8\u05d9\u05ea",  # RTL + RLM
    "\U0001f469‍\U0001f469‍\U0001f467‍\U0001f466\U0001f1fa\U0001f1f8",  # ZWJ family + flag
    "İstanbul ıI productıon",          # Turkish dotted/dotless I
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",  # full-width
    "ß ẞ Straße STRASSE",              # sharp s / capital sharp s
    "zero\u200bwidth\u200cjoin\u200der",              # ZWSP ZWNJ ZWJ
    "nbsp and thin line seps",    # exotic whitespace
    "tab\tnewline\nreturn\rmix",                      # control whitespace
    "null\x00byte payload",                           # embedded NUL
    "\U0001d52a\U0001d51e\U0001d531\U0001d525 \U0001d487\U0001d48e astral",  # math alphanumerics
]


def main() -> int:
    import duckdb

    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.session import get_spark
    from fn_rq_report_etl_dev_spark.workloads import ORACLES, QUERIES, load
    from scripts_driver_sim import _canon

    spark = get_spark(app_name="unicode-audit", shuffle_partitions=8)
    out = tempfile.mkdtemp(prefix="unicode-audit-")
    adv = F.array(*[F.lit(s) for s in ADV])
    for t in TABLES:
        df = load(spark, SRC, t)
        if t == "events":
            # keep the dirty copy byte-compatible with the clean fixture's
            # naive-timestamp reading in DuckDB (see scripts_null_audit.py)
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        key = [F.col(k).cast("string") for k in ROW_KEY[t]]
        for c in MUTATE.get(t, []):
            bucket = F.pmod(F.hash(F.concat_ws("|", F.lit(c), *key)), F.lit(RATE))
            pick = F.element_at(
                adv,
                F.pmod(F.hash(F.concat_ws("#", F.lit(c), *key)), F.lit(len(ADV))) + 1,
            )
            df = df.withColumn(
                c,
                F.when(F.col(c).isNull(), F.col(c))
                .when(bucket == 0, pick)
                .when(bucket == 1, F.concat(F.col(c), F.lit(" "), pick))
                .otherwise(F.col(c)),
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    print(f"mutated dataset at {out} (5% replaced + 5% suffixed, {len(ADV)} probes)")

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
    print(f"unicode audit: {n_bad} failures")
    return n_bad


if __name__ == "__main__":
    raise SystemExit(main())
