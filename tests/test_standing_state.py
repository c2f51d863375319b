"""Standing corpus state (VERDICT r10 ask #1): the refresh job that
materializes corpus LSH band signatures + the NB weight table as
warehouse tables, and the state-READING daily flagship that must be
bit-exactly equivalent to the recompute form on the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.catalog import Warehouse
from fn_rq_report_etl_dev_spark.state import (
    CORPUS_NB_WEIGHTS,
    CORPUS_SIGNATURES,
    read_corpus_state,
    refresh_corpus_state,
)


def _planted_corpus_dir(spark, tmp_path) -> str:
    """The SAME planted fixture test_corpus_incremental_pipeline_planted
    uses (gate drop, blocklist drop, within-increment exact dup,
    corpus near-dup, two true accepts) — written as a documents.parquet
    dir so both flagship forms can load it."""
    dup_of_corpus = "the cat and the dog sat on that mat in peace"
    fresh = "the bird and the fish swam on that reef in quiet"
    rows = [
        (0, "web", dup_of_corpus),
        (7, "web", fresh),
        (14, "web", fresh),
        (21, "web", "zz xx qq"),
        (28, "web", "dup dup dup the and is slow dup"),
        (35, "books", "the cow and the hen sat on that barn in light"),
        (1, "web", dup_of_corpus),
        (2, "web", "the and of to in is for with on that filler words"),
        (3, "web", "one two three four five six seven eight nine ten"),
        (4, "web", "the quick brown fox jumps over that lazy dog today"),
        (5, "books", "alpha beta gamma delta epsilon zeta eta theta"),
        (6, "books", "the library keeps the old books on that top shelf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = str(tmp_path / "corpus")
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_refresh_writes_both_tables_with_counts(spark, tmp_path):
    """The refresh job materializes both standing tables and reports the
    rows written (O20 metrics convention); a re-run OVERWRITES atomically
    (same counts, no append creep — the idempotence a crashed-then-
    retried refresh needs)."""
    docs = spark.createDataFrame(
        [(i, f"alpha{i} bravo{i % 3} charlie delta echo") for i in range(20)],
        "doc_id long, text string",
    )
    wh = Warehouse(str(tmp_path / "wh"))
    counts = refresh_corpus_state(docs, wh)
    assert wh.exists(CORPUS_SIGNATURES) and wh.exists(CORPUS_NB_WEIGHTS)
    # bands rows per doc (default 3 bands), full 1024-bucket weight domain
    assert counts[CORPUS_SIGNATURES] == 20 * 3
    assert counts[CORPUS_NB_WEIGHTS] == 1024
    assert refresh_corpus_state(docs, wh) == counts

    sig, wtab = read_corpus_state(spark, wh)
    assert set(sig.columns) == {"doc_id", "band", "band_hash"}
    assert {"bucket", "w0", "w1", "w2", "p0", "p1", "p2"} <= set(wtab.columns)


def test_read_corpus_state_missing_raises(spark, tmp_path):
    """A daily query must not silently screen against an absent (empty)
    signature table — it would accept every near-dup."""
    with pytest.raises(FileNotFoundError, match="refresh_corpus_state"):
        read_corpus_state(spark, Warehouse(str(tmp_path / "nowhere")))


def test_standing_candidates_equal_recompute(spark, tmp_path):
    """The state seam itself: candidates from the stored signature table
    == candidates from the per-run union recompute, row for row."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        incremental_lsh_candidates,
        incremental_lsh_candidates_standing,
    )

    base = "the cat and the dog sat on that mat in peace today"
    rows = [(i, base if i % 4 == 0 else f"doc {i} " + " ".join(
        f"w{(i * 7 + j) % 13}" for j in range(10))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter(F.col("doc_id") % 5 == 0)
    corpus = df.filter(F.col("doc_id") % 5 != 0)

    wh = Warehouse(str(tmp_path / "wh"))
    refresh_corpus_state(corpus, wh)
    sig, _ = read_corpus_state(spark, wh)
    standing = sorted(
        map(tuple, incremental_lsh_candidates_standing(
            new, sig, "doc_id", "text").collect())
    )
    union = corpus.select("doc_id", "text").withColumn(
        "__new", F.lit(False)
    ).unionByName(
        new.select("doc_id", "text").withColumn("__new", F.lit(True))
    )
    recompute = sorted(
        map(tuple, incremental_lsh_candidates(
            union, "doc_id", "text", is_new=F.col("__new")).collect())
    )
    assert standing == recompute and len(standing) > 0


def test_standing_flagship_equals_recompute_planted(spark, tmp_path):
    """Bit-exact equivalence of the two flagship forms on the planted
    end-to-end fixture — every gate/dedup/screen/label/pack decision
    identical, plus the fixture's known accept set."""
    from fn_rq_report_etl_dev_spark.workloads.curation import (
        pipeline_corpus_incremental,
        pipeline_corpus_incremental_standing,
    )

    d = _planted_corpus_dir(spark, tmp_path)
    recompute = sorted(
        map(tuple, pipeline_corpus_incremental(spark, d).collect())
    )
    standing = sorted(
        map(tuple, pipeline_corpus_incremental_standing(spark, d).collect())
    )
    assert standing == recompute
    assert [r[1] for r in standing] == [35, 7]  # books, web accepts


def test_standing_flagship_equals_recompute_sf(spark, sf_dir):
    """Same equivalence on the real sf0.001 corpus (non-trivial row
    count, real near-dup collisions) — the shared-oracle claim the
    driver checks at sf0.01 rests on this being exact, not approximate."""
    from fn_rq_report_etl_dev_spark.workloads import QUERIES

    recompute = sorted(
        map(tuple, QUERIES["pipeline_corpus_incremental"](spark, sf_dir).collect())
    )
    standing = sorted(
        map(
            tuple,
            QUERIES["pipeline_corpus_incremental_standing"](spark, sf_dir).collect(),
        )
    )
    assert standing == recompute and len(standing) > 0


def test_standing_state_built_once_per_corpus(spark, tmp_path):
    """The amortization is real: two invocations over the same corpus
    share ONE warehouse (the refresh job ran once); a different corpus
    path gets its own state."""
    from fn_rq_report_etl_dev_spark.workloads.curation import (
        _standing_state_warehouse,
        pipeline_corpus_incremental_standing,
    )

    d = _planted_corpus_dir(spark, tmp_path)
    pipeline_corpus_incremental_standing(spark, d).collect()
    wh1 = _standing_state_warehouse(spark, d)
    pipeline_corpus_incremental_standing(spark, d).collect()
    assert _standing_state_warehouse(spark, d) is wh1
