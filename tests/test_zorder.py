"""Z-order clustering: Morton-code correctness vs a Python reference, and
the data-skipping property — after zorder_repartition on two independent
columns, every partition's min/max range is a small slice of the global
range on BOTH columns (a single-column sort leaves the other column's
per-partition range at ~100%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.operators.zorder import (
    zorder_repartition,
    zorder_value,
)


def _morton_ref(a: int, b: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        out |= ((a >> j) & 1) << (2 * j)
        out |= ((b >> j) & 1) << (2 * j + 1)
    return out


def test_zorder_value_matches_reference(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = df.select(
        "a", "b", zorder_value([F.col("a"), F.col("b")], 3).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"], 3), (r["a"], r["b"])


def _partition_ranges(df, col):
    """Per-partition (max-min) spans via the partition id."""
    spans = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg((F.max(col) - F.min(col)).alias("span"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    return [r["span"] for r in spans]


def test_zorder_tightens_both_dimensions(spark):
    # Two independent uniform dimensions, 10k rows, global range ~10k.
    rows = [((i * 7919) % 10007, (i * 104729) % 10007) for i in range(10000)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    clustered = zorder_repartition(df, ["x", "y"], n_partitions=16, bits=10)
    global_span = 10007
    for col in ("x", "y"):
        spans = _partition_ranges(clustered, col)
        avg = sum(spans) / len(spans)
        # 16 partitions on a 2-D Z-curve ≈ 4×4 grid → per-partition span
        # around global/4 per dimension; allow generous slack.
        assert avg < 0.55 * global_span, (col, avg)
    # Contrast: sorting by x alone leaves y's per-partition span ~global.
    single = (
        df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x")
    )
    y_spans = _partition_ranges(single, "y")
    assert sum(y_spans) / len(y_spans) > 0.9 * global_span
