"""fn_rq_report_etl_dev_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference ETL (``Priyankavictra/fn-rq-report-etl-dev``), re-expressed as
idiomatic Spark: DataFrame/SQL logical plans optimized by Catalyst, columnar
Parquet storage, and (optionally) Structured Streaming micro-batches.

Layout
------
- ``session``    — SparkSession factory with scale-aware defaults (AQE, UTC).
- ``schemas``    — typed StructTypes for the trade-in data model + fixtures.
- ``functions``  — column-level building blocks (timestamps, lenient casts,
                   text analysis, vector math). All JVM-side built-ins; no
                   row-at-a-time Python UDFs in any hot path.
- ``operators``  — relational/composite operators (window dedup, merge
                   upsert, retention, dedup family, similarity search).
- ``sources``    — ingestion (HTTP JSON batch w/ retry, parquet readers).
- ``plans``      — plan inspection helpers (pushdown/broadcast assertions).
- ``streaming``  — Structured Streaming micro-batch pipeline (foreachBatch).
- ``catalog``    — idempotent table bootstrap + rename migration.
- ``pipeline``   — end-to-end orchestration (the reference's run_etl shape).
"""

__version__ = "0.1.0"
