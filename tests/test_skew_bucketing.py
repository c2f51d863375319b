"""Salting (algebraic equivalence) and bucketing (shuffle-free join plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.operators.bucketing import read_table, write_bucketed
from fn_rq_report_etl_dev_spark.operators.skew import salted_join, salted_sum_count
from fn_rq_report_etl_dev_spark.plans.inspect import exchange_count
from fn_rq_report_etl_dev_spark.workloads import load


def test_salted_aggregate_equals_plain(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (round(r["total"], 6), r["n_rows"])
        for r in events.groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    salted = {
        r["event_type"]: (round(r["total"], 6), r["n_rows"])
        for r in salted_sum_count(events, ["event_type"], "value", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "event_id"
    )
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(200)], "k long, name string"
    )
    plain = sorted(
        (r["event_id"], r["name"]) for r in events.join(dim, "k").collect()
    )
    salted = sorted(
        (r["event_id"], r["name"])
        for r in salted_join(events, dim, "k", n_salts=4).collect()
    )
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    # disable broadcast so the join strategy decision is about distribution
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_target")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "b_target", "o_orderkey", 8
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_target"), "o_orderkey"
        )
        assert exchange_count(joined) == 0  # bucket-aligned: no shuffle
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_target")


def test_salted_join_rejects_outer_semantics(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="full"):
        salted_join(df, df, "k", how="full_outer")
