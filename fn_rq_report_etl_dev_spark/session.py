"""SparkSession factory with scale-aware defaults.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply (AQE, UTC session timezone, Arrow). Shuffle partitions
default to the core count locally — on a 1000-executor cluster raise it (or
rely on AQE coalescing, which is enabled here).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "fn_rq_report_etl_dev_spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults chosen for scale:
    - AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
    - Session timezone pinned to UTC (matches the reference's treat-naive-
      timestamps-as-UTC semantics, rqtradein_etl.py:309-310, and the DuckDB
      oracle's naive timestamps).
    - Arrow enabled for the few pandas-UDF paths (vector/multimodal ops).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The fixture corpus stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark's reader rejects; read as long (ns since epoch) and
        # convert at load (workloads.load / sources.readers).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_intermediates(spark: SparkSession) -> int:
    """Free every persisted intermediate in the session: CacheManager
    entries (DataFrame.persist) and loose persisted RDDs (localCheckpoint
    blocks live outside the CacheManager, so clearCache alone misses
    them). Returns the number of loose RDD entries released.

    Library operators persist fan-out intermediates whose useful lifetime
    is the consumption of the DataFrame they return —
    ``unigram_frequency_scores`` (per-doc token counts feed the frequency
    table, the corpus total, and the scoring join),
    ``incremental_lsh_candidates`` (the banded signature table feeds both
    sides of the asymmetric join), ``corpus_prep_pipeline`` (fan-out
    points shared by the mixing and sharding branches),
    ``build_ivf_index`` (the cell assignment, deliberately long-lived).
    Spark's CacheManager holds those entries until an explicit unpersist
    even after the last reference is dropped, so a long-lived session
    interleaving many pipeline runs should call this between runs (it is
    what ``bench.py``'s per-query isolation uses). Rebuild the IVF index
    (or re-persist ``IvfIndex.assigned``) after calling this if you still
    need it."""
    spark.catalog.clearCache()
    n = 0
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
        n += 1
    return n


@contextmanager
def released(spark: SparkSession):
    """Scope persisted intermediates to a block (VERDICT r03 #6): run any
    workloads — including ones whose operators persist fan-out
    intermediates (``q21_waiting_suppliers``, ``corpus_prep_pipeline``,
    ``unigram_frequency_scores``, ``incremental_lsh_candidates``, the IVF
    index build) — and free every cache entry and loose persisted RDD on
    exit, success or failure::

        with released(spark):
            force(QUERIES["q21_waiting_suppliers"](spark, sf_dir))
        # CacheManager is empty again here

    The release is session-wide (Spark's CacheManager has no per-scope
    accounting), so don't wrap a block whose caller still needs an earlier
    persist — re-persist (e.g. ``IvfIndex.assigned``) after the block."""
    try:
        yield spark
    finally:
        release_intermediates(spark)
