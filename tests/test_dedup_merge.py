"""Window dedup (O15) + merge upsert (O16/O14) unit tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.operators.dedup import latest_per_key
from fn_rq_report_etl_dev_spark.operators.merge import MERGE_ACTION, merge_counts, merge_upsert


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_latest_per_key_keeps_max_order_col(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "a"),
            (1, _ts("2024-01-03 00:00:00"), "b"),
            (1, _ts("2024-01-02 00:00:00"), "c"),
            (2, _ts("2024-01-01 00:00:00"), "d"),
        ],
        "k long, ts timestamp, v string",
    )
    out = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], ["ts"]).collect()}
    assert out == {1: "b", 2: "d"}


def test_latest_per_key_deterministic_tiebreak(spark):
    # Equal ts → highest tiebreaker wins, every time.
    rows = [(1, _ts("2024-01-01 00:00:00"), i, f"v{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tid long, v string")
    for _ in range(3):
        out = latest_per_key(df, ["k"], ["ts", "tid"]).collect()
        assert len(out) == 1 and out[0]["v"] == "v19"


def test_latest_per_key_nulls_sort_last(spark):
    df = spark.createDataFrame(
        [(1, None, 0, "null-ts"), (1, _ts("2020-01-01 00:00:00"), 1, "real-ts")],
        "k long, ts timestamp, tid long, v string",
    )
    out = latest_per_key(df, ["k"], ["ts", "tid"]).collect()
    assert out[0]["v"] == "real-ts"


def test_merge_upsert_insert_update_keep(spark):
    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    target = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2")], "k long, v string"
    ).withColumn("ins", t0).withColumn("upd", F.lit(None).cast("timestamp"))
    source = spark.createDataFrame([(2, "new-2"), (3, "new-3")], "k long, v string")

    merged = merge_upsert(
        target, source, "k",
        audit_inserted="ins", audit_updated="upd", now=now, keep_action=True,
    )
    rows = {r["k"]: r for r in merged.collect()}
    assert rows[1]["v"] == "old-1" and rows[1][MERGE_ACTION] == "keep"
    assert rows[2]["v"] == "new-2" and rows[2][MERGE_ACTION] == "update"
    assert rows[3]["v"] == "new-3" and rows[3][MERGE_ACTION] == "insert"
    # audit semantics (rqtradein_etl.py:161,164)
    assert rows[1]["ins"] == _ts("2024-01-01 00:00:00") and rows[1]["upd"] is None
    assert rows[2]["ins"] == _ts("2024-01-01 00:00:00") and rows[2]["upd"] == _ts("2024-06-01 00:00:00")
    assert rows[3]["ins"] == _ts("2024-06-01 00:00:00") and rows[3]["upd"] is None

    assert merge_counts(merged) == {"inserted": 1, "updated": 1}


def test_merge_preserves_key_uniqueness(spark):
    target = spark.createDataFrame([(i, "t") for i in range(50)], "k long, v string")
    source = spark.createDataFrame([(i, "s") for i in range(25, 75)], "k long, v string")
    merged = merge_upsert(target, source, "k")
    assert merged.count() == 75
    assert merged.select("k").distinct().count() == 75


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    source = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
    once = merge_upsert(target, source, "k")
    twice = merge_upsert(once, source, "k")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_merge_preserves_target_only_columns(spark):
    # Target has a column the batch lacks: kept on matched/target rows,
    # NULL on inserts, never dropped from the table.
    target = spark.createDataFrame(
        [(1, "a", "legacy1"), (2, "b", "legacy2")], "k long, v string, legacy string"
    )
    source = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
    rows = {r["k"]: r for r in merge_upsert(target, source, "k").collect()}
    assert set(rows[1].asDict()) == {"k", "v", "legacy"}
    assert rows[1]["legacy"] == "legacy1"  # untouched target row
    assert rows[2]["legacy"] == "legacy2"  # update keeps unlisted column
    assert rows[3]["legacy"] is None  # insert has no value for it


def test_merge_source_only_column_null_for_target_rows(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame([(2, "b", "extra")], "k long, v string, s_only string")
    rows = {r["k"]: r for r in merge_upsert(target, source, "k").collect()}
    assert rows[2]["s_only"] == "extra"
    assert rows[1]["s_only"] is None


def test_latest_per_key_salted_equals_plain(spark):
    """Planted skew: one key owns ~60% of rows. The two-phase salted dedup
    returns exactly the single-window result, and phase 1 windows by
    (key, salt) so no reducer sees the whole hot key."""
    rows = [("hot", _ts("2024-01-01 00:00:00"), i, f"h{i}") for i in range(3000)]
    rows += [
        (f"k{k}", _ts("2024-01-01 00:00:00"), i, f"v{k}_{i}")
        for k in range(100)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, tid long, v string")
    plain = sorted(map(tuple, latest_per_key(df, ["k"], ["ts", "tid"]).collect()))
    salted = latest_per_key(df, ["k"], ["ts", "tid"], n_salts=16)
    assert sorted(map(tuple, salted.collect())) == plain
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    first_window = plan[plan.rindex("Window") :]  # bottom-most = phase 1
    assert "__salt" in first_window  # phase 1 partitions by (key, salt)


def test_merge_null_keys_spread_matches_plain_join(spark):
    """NULL merge keys bypass the join (spread_null_keys): output must be
    row-for-row identical to the plain outer-join form, and the bypass
    adds no exchanges beyond the join's two."""
    from fn_rq_report_etl_dev_spark.plans.inspect import exchange_count

    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    target = spark.createDataFrame(
        [("a", "old-a"), (None, "null-t-1"), (None, "null-t-2")],
        "k string, v string",
    ).withColumn("ins", t0).withColumn("upd", F.lit(None).cast("timestamp"))
    source = spark.createDataFrame(
        [("a", "new-a"), ("b", "new-b"), (None, "null-s")], "k string, v string"
    )

    kwargs = dict(
        audit_inserted="ins", audit_updated="upd", now=now, keep_action=True
    )
    spread = merge_upsert(target, source, "k", spread_null_keys=True, **kwargs)
    plain = merge_upsert(target, source, "k", spread_null_keys=False, **kwargs)
    def norm(rows):
        return sorted(tuple("\0" if x is None else str(x) for x in r) for r in rows)

    assert norm(spread.collect()) == norm(plain.collect())

    out = {(r["k"], r["v"]): r for r in spread.collect()}
    assert out[(None, "null-t-1")][MERGE_ACTION] == "keep"
    assert out[(None, "null-s")][MERGE_ACTION] == "insert"
    assert out[(None, "null-s")]["ins"] is not None  # insert audit stamped
    assert out[("a", "new-a")][MERGE_ACTION] == "update"
    assert exchange_count(spread) == exchange_count(plain)


def test_merge_scd2_branches(spark):
    """All four SCD2 branches: changed (close+open), unchanged (keep),
    source-only (first version), target-only (stay current); closed
    history passes through untouched."""
    from fn_rq_report_etl_dev_spark.operators.scd import merge_scd2

    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    history = spark.createDataFrame(
        [
            ("a", "open", 1.0, "2024-01-01 00:00:00", None, True),
            ("a", "init", 0.5, "2023-01-01 00:00:00", "2024-01-01 00:00:00", False),
            ("b", "open", 2.0, "2024-01-01 00:00:00", None, True),
            ("d", "open", 4.0, "2024-01-01 00:00:00", None, True),
        ],
        "k string, status string, amount double, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "status", "amount",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    source = spark.createDataFrame(
        [("a", "closed", 9.0), ("b", "open", 2.0), ("c", "new", 3.0)],
        "k string, status string, amount double",
    )
    out = merge_scd2(history, source, "k", ["status", "amount"], now=now)
    rows = {(r["k"], r["status"], r["is_current"]): r for r in out.collect()}
    assert len(rows) == 6
    # a: old version closed at now, new current opened
    assert rows[("a", "open", False)]["valid_to"] is not None
    assert rows[("a", "closed", True)]["valid_to"] is None
    # a's pre-existing closed row untouched
    assert ("a", "init", False) in rows
    # b unchanged: current kept with original valid_from
    b = rows[("b", "open", True)]
    assert b["valid_to"] is None and str(b["valid_from"]).startswith("2024-01-01")
    # c: first version opened at now
    assert str(rows[("c", "new", True)]["valid_from"]).startswith("2024-06-01")
    # d absent from snapshot: stays current
    assert rows[("d", "open", True)]["valid_to"] is None


def test_delta_backend_gate_raises_clearly(spark, tmp_path):
    """delta-spark is not installed in this container (COVERAGE.md: env
    constraint) — the Delta MERGE backend must fail fast with a pointer to
    the join-rewrite backend, not an opaque ModuleNotFoundError mid-job."""
    import pytest

    from fn_rq_report_etl_dev_spark.operators.merge import merge_upsert_delta

    src = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ImportError, match="merge_upsert"):
        merge_upsert_delta(spark, str(tmp_path / "t"), src, key="k")
