"""Bucketed incremental merge: only affected partitions are rewritten,
results match the full-table merge, NULL keys insert into the null bucket."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fn_rq_report_etl_dev_spark.catalog import Warehouse
from fn_rq_report_etl_dev_spark.operators.merge import merge_upsert
from fn_rq_report_etl_dev_spark.operators.merge_partitioned import (
    BUCKET_COL,
    ensure_bucketed_target,
    merge_into_bucketed_target,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), True),
    T.StructField("v", T.StringType(), True),
])

N_BUCKETS = 8


def _files(wh, table):
    out = {}
    root = wh.path(table)
    for d in os.listdir(root):
        if d.startswith(f"{BUCKET_COL}="):
            out[d] = sorted(os.listdir(os.path.join(root, d)))
    return out


def test_bucketed_merge_rewrites_only_affected_buckets(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    table = "tgt"
    ensure_bucketed_target(spark, wh, table, SCHEMA, N_BUCKETS)

    # Seed: keys 0..31 → all 8 buckets populated.
    seed = spark.createDataFrame([(i, f"t{i}") for i in range(32)], SCHEMA)
    counts = merge_into_bucketed_target(spark, wh, table, seed, "k", N_BUCKETS)
    assert counts == {"inserted": 32, "updated": 0}
    before = _files(wh, table)
    assert len(before) == N_BUCKETS

    # Batch touches only buckets {0, 1}: keys ≡ 0/1 (mod 8).
    batch = spark.createDataFrame([(0, "s0"), (8, "s8"), (1, "s1"), (33, "s33")], SCHEMA)
    counts = merge_into_bucketed_target(spark, wh, table, batch, "k", N_BUCKETS)
    assert counts == {"inserted": 1, "updated": 3}

    after = _files(wh, table)
    changed = {d for d in before if before[d] != after[d]}
    assert changed == {f"{BUCKET_COL}=0", f"{BUCKET_COL}=1"}  # 6 buckets untouched

    got = {r["k"]: r["v"] for r in wh.read(spark, table).collect()}
    assert got[0] == "s0" and got[8] == "s8" and got[1] == "s1" and got[33] == "s33"
    assert got[2] == "t2" and len(got) == 33


def test_bucketed_merge_matches_plain_merge(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    ensure_bucketed_target(spark, wh, "tgt", SCHEMA, N_BUCKETS)
    target = spark.createDataFrame([(i, f"t{i}") for i in range(0, 20, 2)], SCHEMA)
    source = spark.createDataFrame([(i, f"s{i}") for i in range(0, 15, 3)], SCHEMA)
    merge_into_bucketed_target(spark, wh, "tgt", target, "k", N_BUCKETS)
    merge_into_bucketed_target(spark, wh, "tgt", source, "k", N_BUCKETS)

    expected = {
        (r["k"], r["v"])
        for r in merge_upsert(target, source, "k").collect()
    }
    got = {(r["k"], r["v"]) for r in wh.read(spark, "tgt").drop(BUCKET_COL).collect()}
    assert got == expected


def test_null_keys_insert_into_null_bucket(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    ensure_bucketed_target(spark, wh, "tgt", SCHEMA, N_BUCKETS)
    b1 = spark.createDataFrame([(None, "n1"), (1, "a")], SCHEMA)
    counts = merge_into_bucketed_target(spark, wh, "tgt", b1, "k", N_BUCKETS)
    assert counts == {"inserted": 2, "updated": 0}
    # NULL never equi-matches: a second null-key row inserts again
    b2 = spark.createDataFrame([(None, "n2")], SCHEMA)
    counts = merge_into_bucketed_target(spark, wh, "tgt", b2, "k", N_BUCKETS)
    assert counts["inserted"] == 1
    rows = wh.read(spark, "tgt").collect()
    assert sorted(r["v"] for r in rows if r["k"] is None) == ["n1", "n2"]


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    from fn_rq_report_etl_dev_spark.plans.inspect import formatted_plan

    wh = Warehouse(str(tmp_path / "wh"))
    ensure_bucketed_target(spark, wh, "tgt", SCHEMA, N_BUCKETS)
    seed = spark.createDataFrame([(i, f"t{i}") for i in range(32)], SCHEMA)
    merge_into_bucketed_target(spark, wh, "tgt", seed, "k", N_BUCKETS)

    pruned = wh.read(spark, "tgt").filter(F.col(BUCKET_COL).isin([0, 1]))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and BUCKET_COL in plan
    assert pruned.count() == 8  # 2 of 8 buckets → 8 of 32 rows


def test_bucketed_pipeline_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.pipeline import BUCKETED_TARGET_TABLE, run_etl_bucketed
    from fn_rq_report_etl_dev_spark.sources.json_api import batch_to_dataframe

    wh = Warehouse(str(tmp_path / "wh"))
    now = F.to_timestamp(F.lit("2024-03-15 12:00:00"))
    day1 = [{"SaleInvoiceID": str(i), "TradeInTransactionID": str(i),
             "TradeInDate": "2024-03-15T01:00:00Z", "TradeInAmount": f"{i}.00"}
            for i in range(20)]
    counts = run_etl_bucketed(spark, wh, batch_to_dataframe(spark, day1), now=now, n_buckets=8)
    assert counts == {"inserted": 20, "updated": 0}

    # Same-day staging rows are retained and re-merge (reference semantics:
    # staging accumulates within a day) → all 20 keys update, key 0 takes
    # the intra-day-later value.
    day2 = [{"SaleInvoiceID": "0", "TradeInTransactionID": "99",
             "TradeInDate": "2024-03-15T09:00:00Z", "TradeInAmount": "77.00"}]
    counts = run_etl_bucketed(spark, wh, batch_to_dataframe(spark, day2), now=now, n_buckets=8)
    assert counts == {"inserted": 0, "updated": 20}

    tgt = wh.read(spark, BUCKETED_TARGET_TABLE)
    rows = {r["SaleInvoiceID"]: r for r in tgt.collect()}
    assert len(rows) == 20
    assert str(rows[0]["TradeInAmount"]) == "77.00"
    assert rows[0]["ETLRowUpdatedEST"] is not None


def test_crashed_swap_rolls_forward(spark, tmp_path, monkeypatch):
    """A merge that dies between bucket swaps leaves a commit manifest; the
    next merge (or recover_pending_swap) rolls it forward to exactly the
    post-merge table."""
    import json

    import pytest

    import fn_rq_report_etl_dev_spark.operators.merge_partitioned as mp

    wh = Warehouse(str(tmp_path / "wh"))
    table = "tgt"
    ensure_bucketed_target(spark, wh, table, SCHEMA, N_BUCKETS)
    seed = spark.createDataFrame([(i, f"t{i}") for i in range(32)], SCHEMA)
    merge_into_bucketed_target(spark, wh, table, seed, "k", N_BUCKETS)

    # Crash injection: publish the manifest, swap ONE bucket, die mid-loop
    # (tmp survives with the un-swapped bucket, exactly like a real crash).
    def crashing_swap(wh_, table_, tmp_, buckets_):
        dirnames = [mp._dirname(b) for b in buckets_]
        mpath = mp._manifest_path(wh_, table_)
        with open(mpath + ".tmp", "w") as f:
            json.dump({"tmp": tmp_, "dirs": dirnames}, f)
        os.replace(mpath + ".tmp", mpath)
        d = dirnames[0]
        dst = os.path.join(wh_.path(table_), d)
        os.rename(dst, dst + ".old")
        os.rename(os.path.join(tmp_, d), dst)
        # die before rm .old / remaining buckets / tmp cleanup
        raise RuntimeError("simulated crash mid-commit")

    batch = spark.createDataFrame([(0, "s0"), (8, "s8"), (1, "s1"), (33, "s33")], SCHEMA)
    monkeypatch.setattr(mp, "_swap_partitions", crashing_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_into_bucketed_target(spark, wh, table, batch, "k", N_BUCKETS)
    monkeypatch.undo()

    assert os.path.exists(mp._manifest_path(wh, table))  # detectable

    # The next merge auto-heals first; an empty batch works as "repair only".
    assert mp.recover_pending_swap(wh, table) is True
    assert not os.path.exists(mp._manifest_path(wh, table))
    assert not os.path.isdir(wh.path(table) + ".merge-tmp")

    got = {r["k"]: r["v"] for r in wh.read(spark, table).collect()}
    assert got[0] == "s0" and got[8] == "s8" and got[1] == "s1" and got[33] == "s33"
    assert got[2] == "t2" and len(got) == 33
