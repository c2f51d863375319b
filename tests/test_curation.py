"""Unit tests for corpus-curation operators (contamination, repetition,
quality gate) and the Rademacher random-hyperplane LSH — exact expected
values on hand-built inputs, plus the plan properties the 100 TB shape
depends on (broadcast benchmark side, shuffle-free gate projection)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.operators.curation import (
    contamination_scores,
    quality_gate,
    repetition_scores,
)
from fn_rq_report_etl_dev_spark.operators.similarity import (
    rademacher_bucket,
    rademacher_bucket_sql,
    rademacher_planes,
    rademacher_topk,
)
from fn_rq_report_etl_dev_spark.plans.inspect import (
    exchange_count,
    formatted_plan,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_contamination_exact_overlap(spark):
    corpus = _docs(
        spark,
        [
            # shares both of its 2 shingles with the benchmark -> flagged
            (1, "alpha beta gamma delta"),
            # 'x y z' is nowhere in the benchmark -> absent from output
            (2, "x y z"),
            # 1 of 3 shingles overlaps -> contamination 1/3, not flagged
            (3, "alpha beta gamma zeta eta"),
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    out = {
        r["doc_id"]: r
        for r in contamination_scores(corpus, bench, "doc_id", "text").collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_shingles"] == 2 and out[1]["n_overlap"] == 2
    assert out[1]["flagged"] is True
    assert out[3]["n_shingles"] == 3 and out[3]["n_overlap"] == 1
    assert out[3]["flagged"] is False
    assert abs(out[3]["contamination"] - round(1 / 3, 6)) < 1e-12


def test_contamination_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(1, "a b c d")])
    bench = _docs(spark, [(2, "a b c")])
    plan = formatted_plan(contamination_scores(corpus, bench, "doc_id", "text"))
    assert "BroadcastHashJoin" in plan  # benchmark shingle set is the small side


def test_repetition_counts(spark):
    # "spam ham eggs" x3 back to back: 7 total 3-grams, 3 distinct, the
    # wrap-around grams each appear twice except the seam variants.
    df = _docs(
        spark,
        [
            (1, "spam ham eggs spam ham eggs spam ham eggs"),
            (2, "one two"),  # under 3 words -> no grams -> absent
            (3, "all words distinct here"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_scores(df, "doc_id", "text").collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_grams"] == 7
    assert out[1]["n_distinct"] == 3
    assert out[1]["top_gram_n"] == 3  # 'spam ham eggs' occurs 3x
    assert out[3]["n_grams"] == 2 and out[3]["rep_ratio"] == 0.0


def test_quality_gate_rules_and_reasons(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog sat on that mat in peace"),  # clean
            (2, "word " * 3),  # too few words (3) + no stopwords
            (3, "!!! ??? $$$ %%% ^^^ &&& *** ((( ))) ###"),  # alpha + stopwords
        ],
    )
    out = {r["doc_id"]: r for r in quality_gate(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True and out[1]["reasons"] == ""
    assert out[2]["keep"] is False
    assert "n_words" in out[2]["reasons"] and "stopwords" in out[2]["reasons"]
    assert out[3]["keep"] is False
    assert "alpha" in out[3]["reasons"] and "stopwords" in out[3]["reasons"]
    # fixed rule order: reasons concatenate in declaration order
    assert out[3]["reasons"].index("alpha") < out[3]["reasons"].index("stopwords")


def test_quality_gate_is_shuffle_free(spark):
    df = _docs(spark, [(1, "a b c")])
    assert exchange_count(quality_gate(df, "doc_id", "text")) == 0


def test_rademacher_planes_deterministic_and_balanced():
    p1 = rademacher_planes(6, 64)
    p2 = rademacher_planes(6, 64)
    assert p1 == p2
    for signs in p1:
        assert len(signs) == 64
        assert set(signs) <= {1, -1}
        # md5 parity is a fair coin: neither side should be degenerate
        assert 16 <= signs.count(1) <= 48
    # spot-check one component against the definition
    nibble = hashlib.md5(b"0:0").hexdigest()[0]
    assert (p1[0][0] == 1) == (nibble < "8")


def test_rademacher_bucket_matches_manual_projection(spark):
    planes = rademacher_planes(4, 4)
    vec = [1.0, -2.0, 0.5, 3.0]
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    bucket = df.select(
        rademacher_bucket(F.col("embedding"), planes).alias("b")
    ).first()["b"]
    expected = ""
    for signs in planes:
        proj = sum(x * s for x, s in zip(vec, signs))
        expected += "1" if proj >= 0 else "0"
    assert bucket == expected
    # identical vectors always collide
    df2 = spark.createDataFrame([(vec,), (vec,)], "embedding array<float>")
    assert (
        df2.select(rademacher_bucket(F.col("embedding"), planes).alias("b"))
        .distinct()
        .count()
        == 1
    )


def test_rademacher_sql_mirrors_column(spark, sf_dir):
    """The DuckDB rendering and the Spark column produce identical bucket
    strings on real embeddings (the exact-oracle precondition)."""
    import duckdb

    planes = rademacher_planes(4, 64)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    spark_buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", rademacher_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    sql = rademacher_bucket_sql("embedding", planes)
    duck = duckdb.connect().execute(
        f"SELECT vec_id, {sql} AS b FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    assert {vid: b for vid, b in duck} == spark_buckets


def test_rademacher_topk_recall_vs_bruteforce(spark, sf_dir):
    """Bucketed top-k is a subset of the corpus ranked identically; with
    label-clustered embeddings the top-1 neighbor usually shares the
    query's bucket — require non-trivial recall, not an exact match."""
    from fn_rq_report_etl_dev_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(q, emb, k=3, exclude_self=True).collect()
    approx = rademacher_topk(
        q, emb, k=3, n_bits=4, dim=64, n_tables=4, exclude_self=True
    ).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert approx_pairs, "no bucket collisions at all — planes degenerate"
    assert len(exact_pairs & approx_pairs) / len(exact_pairs) >= 0.25


def test_snapshot_diff_actions(spark):
    from fn_rq_report_etl_dev_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (5, 50.0, None)],
        "k bigint, price double, tag string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 21.0, "b"), (4, 40.0, "d"), (5, 50.0, None)],
        "k bigint, price double, tag string",
    )
    out = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["price", "tag"]).collect()
    }
    # unchanged rows (1, and 5 with null-safe-equal NULL tags) are omitted
    assert set(out) == {2, 3, 4}
    assert out[2]["cdc_action"] == "update"
    assert out[2]["changed_columns"] == ["price"]
    assert out[2]["new_price"] == 21.0
    assert out[3]["cdc_action"] == "delete"
    assert out[3]["changed_columns"] == []
    assert out[3]["new_price"] is None
    assert out[4]["cdc_action"] == "insert"
    assert out[4]["new_tag"] == "d"


def test_snapshot_diff_identical_is_empty(spark):
    from fn_rq_report_etl_dev_spark.operators.cdc import snapshot_diff

    df = spark.createDataFrame([(1, "x"), (2, None)], "k bigint, v string")
    assert snapshot_diff(df, df, ["k"], ["v"]).count() == 0


def test_normalize_text_strips_and_folds(spark):
    from fn_rq_report_etl_dev_spark.operators.curation import normalize_text

    df = _docs(
        spark,
        [(1, "<p>Hello   “world”</p>\n<b>it’s</b>\t a — test"), (2, "plain")],
    )
    out = {r["doc_id"]: r for r in normalize_text(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] == 'Hello "world" it\'s a - test'
    assert out[1]["n_tags"] == 4
    assert out[1]["n_chars_clean"] == len(out[1]["text_clean"])
    assert out[2]["text_clean"] == "plain" and out[2]["n_tags"] == 0
    assert exchange_count(normalize_text(df, "doc_id", "text")) == 0


def test_merge_partial_aggregates_equals_full_recompute(spark):
    from fn_rq_report_etl_dev_spark.operators.incremental import (
        merge_partial_aggregates,
    )

    rows = [("a", 1, 10), ("a", 2, 20), ("b", 3, 5), (None, 4, 7), ("a", 5, 1)]
    df = spark.createDataFrame(rows, "k string, id bigint, v bigint")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sv"),
            F.min("id").alias("mn"),
            F.max("id").alias("mx"),
        )

    combined = merge_partial_aggregates(
        agg(df.filter(F.col("id") <= 2)),
        agg(df.filter(F.col("id") > 2)),
        keys=["k"],
        add_cols=["cnt", "sv"],
        min_cols=["mn"],
        max_cols=["mx"],
    )
    full = {r["k"]: r for r in agg(df).collect()}
    got = {r["k"]: r for r in combined.collect()}
    assert set(got) == set(full)  # includes the NULL key (eqNullSafe join)
    for k, r in full.items():
        g = got[k]
        assert (g["cnt"], g["sv"], g["mn"], g["mx"]) == (
            r["cnt"], r["sv"], r["mn"], r["mx"]
        ), k
    # key present in only one side: passes through untouched
    only = merge_partial_aggregates(
        agg(df.filter(F.col("k") == "b")),
        agg(df.filter(F.col("k") == "zzz")),
        keys=["k"], add_cols=["cnt", "sv"], min_cols=["mn"], max_cols=["mx"],
    ).collect()
    assert len(only) == 1 and only[0]["k"] == "b" and only[0]["cnt"] == 1


# ---------------------------------------------------------------------------
# round-2 additions: unigram logprob, source cap, incremental LSH, shuffle


def test_unigram_frequency_rare_vs_common(spark):
    from fn_rq_report_etl_dev_spark.operators.curation import (
        unigram_frequency_scores,
    )

    # 'the' appears 29x (bits=4); the qqq/zzz/jjj tokens once each (bits=0).
    rows = [
        (1, " ".join(["the"] * 29)),
        (2, "qqq zzz jjj"),
    ]
    out = {
        r["__id"]: r
        for r in unigram_frequency_scores(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert out[1]["n_tokens"] == 29 and out[1]["sum_bits"] == 29 * 4
    assert out[2]["n_tokens"] == 3 and out[2]["sum_bits"] == 0
    # corpus total = 32 tokens -> corpus_bits = 5
    assert out[1]["corpus_bits"] == out[2]["corpus_bits"] == 5
    # doc 2's mean token is >2^3 rarer than the corpus ceiling (0 < 5-3);
    # doc 1's is not (4 >= 5-3)
    assert out[2]["rare_heavy"] and not out[1]["rare_heavy"]


def test_cap_per_group_bounds_hot_group(spark):
    from fn_rq_report_etl_dev_spark.operators.curation import cap_per_group

    rows = [(i, "hot" if i < 90 else "cold", i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, src string, score int")
    capped = cap_per_group(
        df, "src", [F.col("score").desc(), F.col("id")], cap=5
    )
    counts = {
        r["src"]: r["n"]
        for r in capped.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"hot": 5, "cold": 5}
    # deterministic winners: highest score, id ascending tiebreak
    hot_ids = sorted(
        r["id"] for r in capped.filter(F.col("src") == "hot").collect()
    )
    # score = id % 7; max score 6 at ids 6,13,20,27,34 -> cap 5 keeps those
    assert hot_ids == [6, 13, 20, 27, 34]


def test_incremental_lsh_finds_cross_pairs_only(spark):
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        incremental_lsh_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (7, base),            # new batch (id % 7 == 0)
        (14, base + " zz"),   # new batch near-dup of 7 — must NOT pair
        (3, base),            # corpus exact text of 7 — must pair with both
        (5, "completely different words everywhere nothing shared here"),
    ]
    pairs = {
        (r["id_new"], r["id_old"])
        for r in incremental_lsh_candidates(
            _docs(spark, rows), "doc_id", "text",
            is_new=F.col("doc_id") % 7 == 0,
        ).collect()
    }
    assert (7, 3) in pairs
    assert all(old == 3 for _, old in pairs)  # 5 shares nothing
    assert (7, 14) not in pairs and (14, 7) not in pairs  # new×new excluded


def test_shuffle_shards_deterministic_partition(spark):
    from fn_rq_report_etl_dev_spark.operators.curation import shuffle_shards

    df = spark.range(0, 256).withColumnRenamed("id", "doc_id")
    a = shuffle_shards(df, "doc_id", seed="42", n_shards=16).collect()
    b = shuffle_shards(df, "doc_id", seed="42", n_shards=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(16)) and len(by_shard) > 8
    for shard, rs in by_shard.items():
        # positions are contiguous ranks 1..n within the shard
        assert sorted(r["pos"] for r in rs) == list(range(1, len(rs) + 1))
        # shard really is the first md5 nibble of the seeded key
        for r in rs:
            assert int(hashlib.md5(f"42|{r['doc_id']}".encode()).hexdigest()[0], 16) == shard
    # a different seed yields a different permutation
    c = shuffle_shards(df, "doc_id", seed="43", n_shards=16).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_temperature_allocation_invariants(spark):
    from fn_rq_report_etl_dev_spark.operators.curation import (
        temperature_allocation,
    )

    # head lang 160 docs, mid 40, tail 10: sqrt weighting gives the tail
    # a larger share than proportional allocation would
    rows = (
        [(i, "en") for i in range(160)]
        + [(1000 + i, "de") for i in range(40)]
        + [(2000 + i, "yo") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_allocation(df, "lang", total_budget=100, id_col="doc_id")
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    allocs = {
        r["lang"]: r["group_alloc"] for r in out.select("lang", "group_alloc").distinct().collect()
    }
    # every group fills min(its allocation, its population) — sqrt
    # up-weighting can allocate a tiny tail more than it has
    sizes = {"en": 160, "de": 40, "yo": 10}
    assert counts == {k: min(v, sizes[k]) for k, v in allocs.items()}
    # total within budget (floor rounding may undershoot, never overshoot)
    assert sum(allocs.values()) <= 100
    # sqrt temperature: tail share > proportional share (10/210 ≈ 4.8%)
    assert counts["yo"] / sum(counts.values()) > 10 / 210
    # proportional head share shrinks under sqrt weighting
    assert counts["en"] / sum(counts.values()) < 160 / 210
    # deterministic: same seed, same selection
    again = temperature_allocation(df, "lang", total_budget=100, id_col="doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_release_intermediates_frees_operator_persists(spark):
    """Library persist lifetime contract: operators persist fan-out
    intermediates (unigram doc_word, banded LSH tables, pipeline fan-out
    points); release_intermediates drops them ALL — CacheManager entries
    and loose persisted RDDs — so a long-lived session doesn't accumulate
    executor cache across pipeline runs."""
    from fn_rq_report_etl_dev_spark.operators.curation import (
        unigram_frequency_scores,
    )
    from fn_rq_report_etl_dev_spark.session import release_intermediates

    release_intermediates(spark)  # clean slate (other tests may persist)
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "c d e f")], "doc_id long, text string"
    )
    unigram_frequency_scores(docs, "doc_id", "text").count()

    def n_persisted() -> int:
        sc = spark.sparkContext
        n = 0
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()
            n += 1
        return n

    assert n_persisted() > 0  # the operator did persist something
    release_intermediates(spark)
    assert n_persisted() == 0


def test_boilerplate_segments_flags_planted_template(spark):
    """A 10-word template planted in 3 docs is flagged in each; unique
    tails are not; a short doc (< 10 words) yields zero segments but
    keeps its word count."""
    from fn_rq_report_etl_dev_spark.operators.curation import boilerplate_segments

    template = "one two three four five six seven eight nine ten"
    rows = [
        (1, template + " unique alpha beta gamma delta epsilon zeta eta theta iota"),
        (2, template + " other words entirely different from the first document tail indeed"),
        (3, template),
        (4, "completely unrelated words that appear nowhere else in this corpus here"),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           boilerplate_segments(df, "doc_id", "text", seg_words=10, min_docs=2).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_boiler"] == 1
    assert out[2]["n_segments"] == 2 and out[2]["n_boiler"] == 1
    assert out[3]["n_segments"] == 1 and out[3]["n_boiler"] == 1
    assert out[4]["n_boiler"] == 0
    assert out[5]["n_segments"] == 0 and out[5]["clean_n_words"] == 2
    assert out[1]["clean_n_words"] == 20 - 10


def test_blocklist_gate_phrase_and_ratio(spark):
    """blocklist_metrics: exact bigram phrase containment, the 2%% ratio
    rule, NULL-text neutrality, and composition into quality_gate as a
    sixth rule. Doc 0: one 'slow query' phrase in a long doc -> hits
    recorded but under 2%% -> not blocked, keep governed by the other
    rules. Doc 1: dense hits -> blocked, 'blocklist' in reasons, not
    kept. Doc 2: 'slow' and 'query' present but never adjacent -> the
    phrase does NOT match (unigram 'slow' still does). Doc 3: NULL text
    -> zero hits, not blocked, fails only no_text."""
    from fn_rq_report_etl_dev_spark.operators.curation import (
        quality_gate,
        with_blocklist_metrics,
    )

    filler = "the data is in the table and the order is for the row " * 9
    rows = [
        (0, filler + "one slow query appeared in the log of the stream"),
        (1, "dup dup slow query the end of it is on that table for now"),
        (2, "a slow scan then a query ran with the data on the table today"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    aug, n_hits, hit_terms, blocked = with_blocklist_metrics(
        df, "text", ("big table", "dup", "slow", "slow query"), hit_pct=2
    )
    out = {
        r.doc_id: r
        for r in quality_gate(
            aug,
            "doc_id",
            "text",
            extra_rules=[(blocked, "blocklist")],
            extra_cols=[
                n_hits.alias("n_hits"),
                hit_terms.alias("hit_terms"),
                blocked.alias("blocked"),
            ],
        ).collect()
    }
    # doc 0: 'slow query' phrase + its 'slow' unigram = 2 hits over 127
    # words = 1.6% < 2% -> not blocked
    assert out[0].n_hits == 2
    assert out[0].hit_terms == "slow,slow query"
    assert out[0].blocked is False
    assert "blocklist" not in out[0].reasons
    # doc 1: dup x2 + slow + 'slow query' = 4 hits over 14 words -> blocked
    assert out[1].n_hits == 4
    assert out[1].hit_terms == "dup,slow,slow query"
    assert out[1].blocked is True
    assert "blocklist" in out[1].reasons and out[1].keep is False
    # doc 2: non-adjacent 'slow' ... 'query' -> phrase absent
    assert out[2].n_hits == 1
    assert out[2].hit_terms == "slow"
    # doc 3: NULL text is the no_text rule's job, not the blocklist's
    assert out[3].n_hits == 0
    assert out[3].hit_terms == ""
    assert out[3].blocked is False
    assert out[3].reasons == "no_text"


def test_blocklist_terms_colliding_after_canonicalization(spark):
    """Terms that canonicalize to the same string ('Slow', 'slow',
    ' slow  ') count each occurrence ONCE (ADVICE r07: the canon list
    kept duplicates, the per-term column map collided, and n_hits added
    the same staged count twice while hit_terms repeated the term)."""
    from fn_rq_report_etl_dev_spark.operators.curation import (
        with_blocklist_metrics,
    )

    df = spark.createDataFrame(
        [(0, "a slow day with one slow query")], "doc_id long, text string"
    )
    aug, n_hits, hit_terms, blocked = with_blocklist_metrics(
        df, "text", ("Slow", "slow", "  slow ", "Slow  Query"), hit_pct=2
    )
    row = aug.select(
        n_hits.alias("n"), hit_terms.alias("t"), blocked.alias("b")
    ).collect()[0]
    # 'slow' x2 + 'slow query' x1 = 3 hits; each term listed once
    assert row.n == 3
    assert row.t == "slow,slow query"
    assert row.b is True


def test_corpus_curation_pipeline_planted(spark, tmp_path):
    """pipeline_corpus_curation e2e on a planted corpus: the gate drops
    the garbage doc, exact dedup keeps the lowest-id copy of the
    verbatim duplicate, the keep-first clip strips the repeated passage
    from the later doc only, and packing splits each source shard when
    the cleaned running total crosses the budget."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.workloads.curation import (
        pipeline_corpus_curation,
    )

    # 5-gram-disjoint fixtures: the only duplicated 5-gram across the
    # survivor corpus is `passage` itself (each doc's framing words
    # differ within every 5-token window).
    passage = "alpha beta gamma delta epsilon"
    rows = [
        (0, "web", f"the cat and the dog sat on that mat in peace {passage}"),
        (1, "web", f"the cat and the dog sat on that mat in peace {passage}"),
        # ^ exact dup of doc 0 -> deduped
        (2, "web", f"{passage} the bird and the fish swam on that reef in quiet"),
        (3, "web", "zzzz xxxx qqqq"),             # fails n_words/stopwords gate
        (4, "books", None),                        # no_text -> dropped
        (5, "books", "the cow and the hen sat on that barn in light"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = str(tmp_path / "corpus")
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in pipeline_corpus_curation(spark, d).collect()}
    # survivors: 0 (canonical of {0,1}), 2, 5 — 1 deduped, 3/4 gated out
    assert sorted(out) == [0, 2, 5]
    n0 = len(rows[0][2].split(" "))
    # doc 0 holds the passage's canonical sites -> nothing clipped
    assert out[0].n_removed == 0 and out[0].n_tokens_clean == n0
    # doc 2 repeats the passage -> exactly those 5 tokens clipped
    assert out[2].n_removed == 5
    assert out[2].n_tokens_clean == len(rows[2][2].split(" ")) - 5
    # packing: cleaned totals are far under the 2000 budget -> pack 0,
    # per source shard
    assert out[0].pack_id == 0 and out[2].pack_id == 0 and out[5].pack_id == 0
    assert out[5].source == "books"


def test_bigram_backoff_planted_branches(spark):
    """All three Stupid-Backoff branches on a hand-computed corpus:
    seen bigram (log count ratio), unseen bigram with a KNOWN unigram,
    and unseen bigram with an UNSEEN unigram (pure 1/N mass). Train =
    ids 1,2 (id%5!=0); held = ids 0,5."""
    from fn_rq_report_etl_dev_spark.operators.curation import (
        bigram_backoff_scores,
    )

    rows = [
        (0, "a b x"),        # held: (a,b) seen; (b,x) unseen, x OOV
        (5, "c a b b a"),    # held: 3 seen bigrams + (b,b) unseen with b known
        (1, "a b a b a c"),  # train
        (2, "c a b"),        # train
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["__id"]: r for r in bigram_backoff_scores(df, "doc_id", "text").collect()}
    # train: N=9; uni a:4 b:3 c:2; big (a,b):3 (b,a):2 (a,c):1 (c,a):1
    d0 = out[0]
    # (a,b): lb(4)-lb(3) = 2-1 = 1; (b,x): 2 + lb(9) - 0 = 5
    assert (d0.n_bigrams, d0.n_unseen, d0.sum_bits) == (2, 1, 6)
    assert d0.avg_bits == 3.0 and d0.oov_heavy
    d5 = out[5]
    # (c,a): lb(2)-lb(1) = 1; (a,b): 1; (b,b): 2 + lb(9) - lb(3) = 4;
    # (b,a): lb(3)-lb(2) = 0 → sum 6 over 4 bigrams, 1 unseen = exactly 25%
    assert (d5.n_bigrams, d5.n_unseen, d5.sum_bits) == (4, 1, 6)
    assert d5.avg_bits == 1.5 and not d5.oov_heavy
    # train docs never scored
    assert set(out) == {0, 5}


def test_hash_classifier_planted_scores(spark):
    """text_hash_classifier's integer dot products and argmax on
    hand-computed buckets/weights: bucket(w) = int(md5(w)[:8], 16) % 64,
    w(c,b) = ((2654435761*(64c+b+1)) % 4093) % 17 - 8. Docs chosen so
    each class wins once (incl. the CASE ELSE class-2 branch) and the
    smallest-class tiebreak is exercised by repetition counts."""
    import hashlib

    from fn_rq_report_etl_dev_spark.workloads import QUERIES, load
    from fn_rq_report_etl_dev_spark.workloads.curation import (
        text_hash_classifier,
    )

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64

    def wgt(c, b):
        return ((2654435761 * (64 * c + b + 1)) % 4093) % 17 - 8

    rows = [
        (0, "Alpha alpha GAMMA"),   # fold to lower; class 0 wins
        (1, "beta beta beta"),      # class 1 wins
        (2, "phi phi kappa"),       # class 2 wins (ELSE branch)
        (3, "  "),                  # whitespace-only: no tokens, no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile

    d = tempfile.mkdtemp(prefix="hc-test-")
    df.write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in text_hash_classifier(spark, d).collect()}
    assert set(out) == {0, 1, 2}
    for doc_id, text in rows[:3]:
        toks = text.lower().split()
        exp = [sum(wgt(c, bucket(w)) for w in toks) for c in range(3)]
        r = out[doc_id]
        assert (r.s0, r.s1, r.s2) == tuple(exp), (doc_id, exp)
        assert r.n_tokens == len(toks)
        want = 0 if exp[0] >= exp[1] and exp[0] >= exp[2] else (1 if exp[1] >= exp[2] else 2)
        assert r.label == want
    assert [out[i].label for i in (0, 1, 2)] == [0, 1, 2]


def test_nb_train_apply_integer_scores(spark):
    """nb_train_apply replayed against an independent pure-Python NB on a
    planted corpus: md5 hash buckets, 1/64-bit (6-fractional-bit) Laplace ratio weights,
    doc priors, stopword-density tier labels, argmax-with-smallest-tie —
    and the holdout split (id % 5 == 0 scored, others trained; NULL ids
    in neither; token-less docs in neither)."""
    import hashlib

    from fn_rq_report_etl_dev_spark.operators.curation import nb_train_apply

    STOP = ("the", "and", "of", "to", "in", "is", "for", "with", "on", "that")
    rows = [
        (0, "the and of aa"),        # held out; 3/4 stopwords -> tier 0
        (1, "aa the cc dd ee ff ga gb gc gd"),  # train; 1/10 -> tier 0 (1*20 >= 10)
        (2, "bb bb bb dd"),          # train; 0 stop -> tier 2
        (3, "aa cc cc"),             # train; tier 2
        (4, "the aa" + " xx" * 48),  # train; 1/50 -> tier 1 (1*50 >= 50)
        (5, "Aa   bb"),              # held out, case-folds; tier 2
        (None, "aa bb"),             # NULL id: in neither split
        (10, ""),                    # held out but token-less: no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["__id"]: r.asDict()
        for r in nb_train_apply(docs, "doc_id", "text").collect()
    }

    B, C = 1024, 3
    bkt = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B  # noqa: E731

    def lb64(num, den):
        # the operator's 1/64-bit shift-and-square integer log (with the
        # defensive den pre-shift), replayed with Python bigints
        sh = max((den.bit_length() - 1) - 32, 0)
        r = max(((num >> sh) * (1 << 30)) // max(den >> sh, 1), 1)
        t = r.bit_length() - 1
        u = r << (30 - t)
        frac = 0
        for _ in range(6):
            u2 = u * u
            b = (u2.bit_length() - 1) - 60
            u = u2 >> (30 + b)
            frac = (frac << 1) | b
        return (t << 6) + frac

    def tier(ws):
        n = len(ws)
        s = sum(w in STOP for w in ws)
        return 0 if s * 20 >= n else (1 if s * 50 >= n else 2)

    cnt: dict[tuple[int, int], int] = {}
    D = [0] * C
    Dt = 0
    for did, text in rows:
        ws = [w for w in text.lower().split() if w] if text else []
        if did is None or did % 5 == 0 or not ws:
            continue
        lab = tier(ws)
        D[lab] += 1
        Dt += 1
        for w in ws:
            key = (lab, bkt(w))
            cnt[key] = cnt.get(key, 0) + 1
    N = [sum(v for (c, _), v in cnt.items() if c == ci) for ci in range(C)]
    expected = {}
    for did, text in rows:
        if did is None or did % 5 != 0:
            continue
        ws = [w for w in text.lower().split() if w]
        if not ws:
            continue
        s = [
            lb64(D[c] + 1, Dt + C)
            + sum(lb64(cnt.get((c, bkt(w)), 0) + 1, N[c] + B) for w in ws)
            for c in range(C)
        ]
        lab = max(range(C), key=lambda c: (s[c], -c))
        lt = tier(ws)
        expected[did] = {
            "__id": did, "n_tokens": len(ws),
            "s0": s[0], "s1": s[1], "s2": s[2],
            "label": lab, "label_true": lt,
            "correct": int(lab == lt),
        }
    assert got == expected
    assert 0 in got and 5 in got and 10 not in got and None not in got


def test_nb_train_apply_planted_separable_accuracy(spark):
    """Accuracy floor on a SEPARABLE planted corpus (VERDICT r10 ask #3:
    with real labels, `correct` must measure actual learning): three
    stopword-density tiers built from disjoint content vocabularies —
    tier 0 docs are stopword-dense, tier 2 stopword-free, and each tier
    additionally carries its own content words, so the hashed bucket
    distributions are well separated. NB trained on the id % 5 != 0
    slice must score >= 90% on the held-out fifth (it achieves 100%
    here; the floor leaves headroom for hash-collision noise if the
    fixture drifts)."""
    from fn_rq_report_etl_dev_spark.operators.curation import nb_train_apply

    rows = []
    for i in range(120):
        if i % 3 == 0:   # tier 0: 2/8 stopwords (2*20 >= 16... n=8: 2*20=40>=8)
            text = f"the and alpha{i % 7} bravo{i % 5} alpha{i % 7} bravo{i % 3} alpha0 bravo0"
        elif i % 3 == 1:  # tier 1: 1/30 stopwords (1*50 >= 30, 1*20 < 30)
            text = "the " + " ".join(f"mid{j % 11}" for j in range(i, i + 29))
        else:            # tier 2: no stopwords
            text = " ".join(f"tail{j % 13}" for j in range(i, i + 12))
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = nb_train_apply(docs, "doc_id", "text").collect()
    assert len(out) == 24  # 120 / 5 held out
    # labels really are the three tiers on this fixture
    assert {r.label_true for r in out} == {0, 1, 2}
    acc = sum(r.correct for r in out) / len(out)
    assert acc >= 0.9, f"planted separable accuracy {acc:.2f} < 0.9"


def test_corpus_incremental_pipeline_planted(spark, tmp_path):
    """pipeline_corpus_incremental e2e on a planted corpus: increment =
    doc_id % 7 == 0. The gate drops the garbage and blocklisted new
    docs, exact dedup keeps the lowest-id copy of the within-increment
    duplicate, the asymmetric LSH screen drops the new doc whose text
    already exists in the standing corpus (identical text -> identical
    signatures -> collides on every band, deterministically), and the
    two genuinely new docs come out labeled and packed per source."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.workloads.curation import (
        pipeline_corpus_incremental,
    )

    dup_of_corpus = "the cat and the dog sat on that mat in peace"
    fresh = "the bird and the fish swam on that reef in quiet"
    rows = [
        # increment (id % 7 == 0)
        (0, "web", dup_of_corpus),     # near-dup of corpus id 1 -> dropped
        (7, "web", fresh),             # accepted
        (14, "web", fresh),            # exact dup of id 7 -> deduped
        (21, "web", "zz xx qq"),       # fails n_words/stopwords gate
        (28, "web", "dup dup dup the and is slow dup"),  # blocklisted
        (35, "books", "the cow and the hen sat on that barn in light"),
        # standing corpus (id % 7 != 0)
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
    out = {r.doc_id: r for r in pipeline_corpus_incremental(spark, d).collect()}
    assert sorted(out) == [7, 35]
    assert out[7].source == "web" and out[35].source == "books"
    assert out[7].n_tokens == len(fresh.split())
    assert out[35].n_tokens == len(rows[5][2].split())
    # labels are NB argmax over the corpus-trained model: valid classes
    assert {out[7].label, out[35].label} <= {0, 1, 2}
    # far under the 2000 budget -> first pack of each source shard
    assert out[7].pack_id == 0 and out[35].pack_id == 0


def test_corpus_incremental_pipeline_run_twice_identical(spark, sf_dir):
    """Determinism pin (the daily-refresh flagship is re-runnable): two
    independent builds over the same input collect IDENTICAL rows —
    every tiebreak (dedup window, pack order, NB argmax) is total, so
    a re-run of the day's refresh reproduces the day's output."""
    from fn_rq_report_etl_dev_spark.workloads import QUERIES

    a = sorted(
        map(tuple, QUERIES["pipeline_corpus_incremental"](spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, QUERIES["pipeline_corpus_incremental"](spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


def test_corpus_mixture_shares_consistent(spark, sf_dir):
    """pipeline_corpus_mixture (r11): per-source doc shares must equal
    min(group_size, group_alloc) — the temperature cut selects exactly
    rk <= alloc of each source's accepted docs — and every selected
    doc's split must be the SAME 90/5/5 hash split dataset_split_assign
    hands out (one formula, no drift). Exactness vs the SQL replay is
    the driver's hash check; this pins the composition invariants."""
    from collections import defaultdict

    from fn_rq_report_etl_dev_spark.workloads import QUERIES

    rows = QUERIES["pipeline_corpus_mixture"](spark, sf_dir).collect()
    assert rows and {r.split for r in rows} <= {"train", "val", "test"}
    per_source = defaultdict(int)
    meta = {}
    for r in rows:
        per_source[r.source] += r.n_docs
        meta[r.source] = (r.group_size, r.group_alloc)
        assert r.sum_tokens > 0 and r.n_docs > 0
    for src, n in per_source.items():
        size, alloc = meta[src]
        assert n == min(size, alloc), (src, n, size, alloc)
    # determinism: a rerun reproduces the mixture table exactly
    again = QUERIES["pipeline_corpus_mixture"](spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
