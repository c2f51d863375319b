"""Unpersist discipline (VERDICT r03 #6): every registered workload that
persists fan-out intermediates must leave ZERO CacheManager entries and
zero loose persisted RDDs behind once its result is consumed and
``release_intermediates`` (or the ``released`` context) runs — the
accounting bench.py relies on for per-query isolation."""

from __future__ import annotations

import pytest

from fn_rq_report_etl_dev_spark.session import release_intermediates, released
from fn_rq_report_etl_dev_spark.workloads import QUERIES

# Registered workloads whose plans persist() or localCheckpoint() —
# keep in sync with `grep -rn "persist()\|localCheckpoint" workloads/ operators/`.
PERSISTING = [
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q15_top_supplier",
    "nation_trade_volume",
    "corpus_prep_pipeline",
    "text_unigram_logprob",
    "dedup_incremental_lsh",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "tfidf_top_terms",
]


def _cache_entries(spark) -> int:
    n = 0
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()
        n += 1
    return n


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", [n for n in PERSISTING if n in QUERIES])
def test_workload_releases_all_intermediates(name, spark, sf_dir):
    release_intermediates(spark)  # clean slate (other tests may leak)
    with released(spark):
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert _cache_entries(spark) == 0, f"{name}: loose persisted RDDs remain"
    assert _cache_manager_empty(spark), f"{name}: CacheManager entries remain"


def test_released_frees_on_exception(spark, sf_dir):
    release_intermediates(spark)
    with pytest.raises(RuntimeError):
        with released(spark):
            df = QUERIES["q21_waiting_suppliers"](spark, sf_dir)
            df.count()
            raise RuntimeError("boom")
    assert _cache_entries(spark) == 0
    assert _cache_manager_empty(spark)
