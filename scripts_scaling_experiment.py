"""Scaling evidence for SCALING.md: full-table merge vs bucketed
incremental merge as target size grows while the daily batch stays fixed.
Run: python scripts_scaling_experiment.py"""
import sys, os, time, tempfile, json
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F
from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.catalog import Warehouse
from fn_rq_report_etl_dev_spark.operators.merge import merge_upsert
from fn_rq_report_etl_dev_spark.operators.merge_partitioned import (
    ensure_bucketed_target, merge_into_bucketed_target)
from pyspark.sql import types as T

spark = get_spark(app_name="scaling")
SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), True),
    T.StructField("v", T.StringType(), True),
    T.StructField("amount", T.DoubleType(), True),
])

def synth(n, tag):
    return (spark.range(n).withColumnRenamed("id", "k")
            .withColumn("v", F.concat(F.lit(tag), F.col("k")))
            .withColumn("amount", (F.col("k") % 1000).cast("double")))

BATCH = 40_000  # fixed daily batch
results = []
for target_rows in (500_000, 2_000_000, 8_000_000):
    # half the batch updates existing keys (contiguous range inside the
    # target keyspace), half inserts brand-new keys beyond it — both merge
    # branches are exercised at every target size.
    lo = target_rows // 2
    batch = synth(BATCH, "s").withColumn(
        "k",
        F.when(F.col("k") < BATCH // 2, F.col("k") + lo)
        .otherwise(F.col("k") - BATCH // 2 + target_rows),
    )

    # full-table merge: read whole target, full-outer join, rewrite all
    wh = Warehouse(tempfile.mkdtemp(prefix="scale-flat-"))
    synth(target_rows, "t").write.parquet(wh.path("tgt"))
    t0 = time.perf_counter()
    merged = merge_upsert(wh.read(spark, "tgt", SCHEMA), batch, "k")
    wh.overwrite_atomic(merged, "tgt")
    flat_s = round(time.perf_counter() - t0, 2)

    # bucketed merge: 64 buckets, batch touches all buckets here (uniform
    # keys) -> worst case for bucketing; also try a bucket-aligned batch
    wh2 = Warehouse(tempfile.mkdtemp(prefix="scale-bkt-"))
    ensure_bucketed_target(spark, wh2, "tgt", SCHEMA, 64)
    merge_into_bucketed_target(spark, wh2, "tgt", synth(target_rows, "t"), "k", 64)
    t0 = time.perf_counter()
    merge_into_bucketed_target(spark, wh2, "tgt", batch, "k", 64)
    bkt_uniform_s = round(time.perf_counter() - t0, 2)

    # bucket-aligned batch (keys ≡ 0 mod 64 → touches 1 of 64 buckets)
    aligned = synth(BATCH, "s").withColumn("k", F.col("k") * 64)
    t0 = time.perf_counter()
    merge_into_bucketed_target(spark, wh2, "tgt", aligned, "k", 64)
    bkt_aligned_s = round(time.perf_counter() - t0, 2)

    results.append({"target_rows": target_rows, "batch_rows": BATCH,
                    "full_table_merge_s": flat_s,
                    "bucketed_uniform_batch_s": bkt_uniform_s,
                    "bucketed_aligned_batch_s": bkt_aligned_s})
    print(json.dumps(results[-1]))
