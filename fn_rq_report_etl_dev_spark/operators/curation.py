"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, intra-document repetition scoring, and a composite
quality gate (Gopher-style rule filter).

Scale shape (100 TB corpus):

- **Contamination** joins corpus shingles against the DISTINCT shingle set
  of the benchmark/eval side. Benchmark suites are fixed-size (thousands of
  documents) regardless of corpus size, so the benchmark shingle set is
  broadcast — the corpus streams through one scan + one partial-aggregated
  groupBy, no shuffle of the big side for the join itself.
- **Repetition** is two chained aggregations on (doc, shingle) then (doc):
  both partial-aggregate map-side; the only shuffle key is the doc id, and
  the shingle explode shares the per-doc partitioning with the window that
  builds the n-grams.
- **Quality gate** is a single projection over per-row expressions — no
  shuffle at all; every rule is a built-in-function column so the whole
  thing stays inside whole-stage codegen.

All rule thresholds use integer-derived arithmetic (counts, integer-scaled
comparisons) so results are engine-exact for the DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..functions.text import ascii_lower
from .text_dedup import _exploded_shingles, word_ngrams


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Benchmark-overlap decontamination: for each corpus document, the
    fraction of its distinct word-3-gram shingles that also occur anywhere
    in the benchmark set. Returns only documents with ≥1 overlapping
    shingle: (doc_id, n_shingles, n_overlap, contamination, flagged) where
    ``flagged`` means ≥ half the document's shingles appear in the
    benchmark (integer comparison — no float threshold).

    The benchmark shingle set is distinct-reduced then broadcast: eval
    suites stay small while the corpus grows, so the corpus-side join is
    shuffle-free.
    """
    # Two consumers (totals + the hit join) — persist one shingle set.
    corpus_sh = _exploded_shingles(corpus, id_col, text_col, distinct=True).persist()
    bench_sh = (
        _exploded_shingles(benchmark, id_col, text_col, distinct=True)
        .select("sh")
        .distinct()
    )
    totals = corpus_sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return totals.join(hits, "__id").select(
        F.col("__id").alias(id_col),
        "n_shingles",
        "n_overlap",
        F.round(F.col("n_overlap") * F.lit(1.0) / F.col("n_shingles"), 6).alias(
            "contamination"
        ),
        (F.col("n_overlap") * 2 >= F.col("n_shingles")).alias("flagged"),
    )


def repetition_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Intra-document repetition (the Gopher duplicate-n-gram filter):
    per document, total vs distinct word-3-gram counts and the count of
    the single most repeated n-gram. ``rep_ratio`` = fraction of n-gram
    occurrences that are repeats; ``top_ratio`` = share of the most
    frequent n-gram. Documents under 3 words have no n-grams and are
    absent (same domain as the Jaccard family)."""
    grams = _exploded_shingles(df, id_col, text_col, distinct=False)
    per_gram = grams.groupBy("__id", "sh").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("__id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_gram_n"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) * F.lit(1.0) / F.sum("c"), 6
        ).alias("rep_ratio"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 6).alias("top_ratio"),
    ).withColumnRenamed("__id", id_col)


def normalize_text(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Boilerplate/markup normalization — the first pass a web-scraped
    corpus gets: strip HTML/XML tags, normalize curly quotes and dashes
    to ASCII, collapse all whitespace runs to single spaces, trim.
    Pure per-row projection (zero shuffles, whole-stage codegen); at
    100 TB this runs at scan speed. Returns the cleaned text plus
    before/after char counts and the stripped-tag count."""
    t = F.col(text_col)
    n_tags = F.regexp_count(t, F.lit(r"<[^>]+>"))
    cleaned = F.regexp_replace(t, r"<[^>]+>", " ")
    for frm, to in (("’", "'"), ("‘", "'"), ("“", '"'),
                    ("”", '"'), ("—", "-"), ("–", "-")):
        cleaned = F.replace(cleaned, F.lit(frm), F.lit(to))
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars_raw"),
        n_tags.cast("bigint").alias("n_tags"),
        cleaned.alias("text_clean"),
        F.length(cleaned).cast("bigint").alias("n_chars_clean"),
    )


def _rule(cond: Column, name: str) -> Column:
    """NULL unless the rule FAILS — concat_ws drops the NULLs."""
    return F.when(cond, F.lit(name))


def with_blocklist_metrics(
    df: DataFrame, text_col: str, terms: Sequence[str], hit_pct: int = 2
) -> tuple[DataFrame, Column, Column, Column]:
    """Gopher/C4-style bad-words gate metrics over a plan-literal term
    list: returns ``(augmented_df, n_hits, hit_terms, blocked)`` where
    the three metric columns reference STAGED ``__bl_*`` projections
    appended to ``df``. Multi-word terms match as exact token n-grams
    (shingle containment); canonicalization is the text family's
    ASCII-fold. ``blocked`` is the integer-exact ratio rule
    ``100·n_hits ≥ hit_pct·n_words`` (and ≥1 hit) — bit-identical
    cross-engine, no float division. NULL text yields n_hits = 0,
    hit_terms = '', blocked = false (the quality gate's ``no_text``
    rule owns that case). Zero shuffles; at 100 TB this runs at scan
    speed inside one whole-stage-codegen stage.

    Staging is load-bearing, not style: the first version returned pure
    column expressions, so every occurrence subtree was re-inlined into
    n_hits AND hit_terms AND blocked AND the gate's reasons AND keep —
    the expression tree doubled per composition layer and the generated
    code blew past the codegen method budget (measured 22.5 s for 5k
    docs at sf0.1; 0.5 s staged). Materialized multi-referenced aliases
    survive CollapseProject, so each n-gram array and per-term count is
    evaluated exactly once per row."""
    t = F.col(text_col)
    # Set-dedupe during canonicalization: terms that canonicalize to the
    # same string ('Slow' and 'slow') would otherwise collide in the
    # per-term column map and double-count every occurrence (ADVICE r07).
    canon = sorted({" ".join(term.lower().split()) for term in terms})
    words = F.split(F.trim(ascii_lower(t)), r"\s+")
    # stage 1: one n-gram array column per distinct term length (the
    # 1-gram column doubles as the tokenization for the ratio rule).
    lens = sorted({len(term.split()) for term in canon} | {1})
    gname = {n: f"__bl_g{n}" for n in lens}
    stage1: dict[str, Column] = {}
    for n in lens:
        if n == 1:
            stage1[gname[n]] = words
        else:
            stage1[gname[n]] = word_ngrams(words, n)
    out = df.withColumns(stage1)
    # stage 2: one occurrence count per term, each reading its staged
    # n-gram column once.
    oname = {term: f"__bl_occ{i}" for i, term in enumerate(canon)}

    def _occ(term: str) -> Column:
        # single-arg lambda only (pyspark reads a 2-arg lambda as
        # (element, index)); F.filter builds the expression now, so the
        # closure binding is per-call correct.
        grams = F.col(gname[len(term.split())])
        return F.coalesce(
            F.size(F.filter(grams, lambda x: x == term)), F.lit(0)
        )

    out = out.withColumns({oname[term]: _occ(term) for term in canon})
    # stage 3: totals + decision from the staged counts (attribute
    # references only — cheap to re-reference downstream).
    zero = F.lit(0).cast("bigint")
    n_hits_expr = zero
    for term in canon:
        n_hits_expr = n_hits_expr + F.col(oname[term])
    n_words0 = F.coalesce(
        F.when(t.isNotNull(), F.size(F.col(gname[1]))), F.lit(0)
    ).cast("bigint")
    out = out.withColumns(
        {
            "__bl_n_hits": n_hits_expr.cast("bigint"),
            "__bl_hit_terms": F.array_join(
                F.filter(
                    F.array(
                        *[
                            F.when(F.col(oname[term]) > 0, F.lit(term))
                            for term in canon
                        ]
                    ),
                    lambda x: x.isNotNull(),
                ),
                ",",
            ),
        }
    )
    nh = F.col("__bl_n_hits")
    out = out.withColumn(
        "__bl_blocked",
        (nh > 0) & (nh * 100 >= F.lit(hit_pct) * n_words0),
    )
    return (
        out,
        F.col("__bl_n_hits"),
        F.col("__bl_hit_terms"),
        F.col("__bl_blocked"),
    )


def quality_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 5000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_ratio: float = 0.55,
    min_stop_hits: int = 2,
    extra_rules: Sequence[tuple[Column, str]] = (),
    extra_cols: Sequence[Column] = (),
) -> DataFrame:
    """Composite keep/drop decision per document with the failed-rule list
    (Gopher-style): word-count bounds, mean word length bounds, alphabetic
    character ratio, and an English stopword floor. One projection, all
    built-in expressions; ``reasons`` concatenates failed rule names in a
    fixed order and ``keep`` = no rule failed.

    NULL text fails explicitly (reason ``no_text``): every metric rule is
    3VL-vacuous on NULL, so without this rule an absent document would
    pass the gate untouched — a training pipeline must never ship it
    (null-audit finding; the metric rules stay NULL and fire nothing, so
    ``reasons`` is exactly ``no_text``).

    ``extra_rules`` appends (condition, name) pairs to the failure list
    (composition point for the blocklist gate et al. — one projection,
    no re-scan or join) and ``extra_cols`` surfaces their metric columns
    in the output; defaults leave the original shape untouched."""
    t = F.col(text_col)
    n_words = TXT.whitespace_token_count(t).cast("bigint")
    nonspace_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_word_len = F.round(nonspace_chars * F.lit(1.0) / n_words, 6)
    alpha_ratio = TXT.alpha_char_count(t) * F.lit(1.0) / F.length(t)
    stop_hits = TXT.stopword_hits(t, "en").cast("bigint")
    reasons = F.concat_ws(
        ",",
        _rule(t.isNull(), "no_text"),
        _rule((n_words < min_words) | (n_words > max_words), "n_words"),
        _rule(
            (mean_word_len < min_mean_word_len)
            | (mean_word_len > max_mean_word_len),
            "word_len",
        ),
        _rule(alpha_ratio < min_alpha_ratio, "alpha"),
        _rule(stop_hits < min_stop_hits, "stopwords"),
        *[_rule(cond, name) for cond, name in extra_rules],
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        *extra_cols,
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per whitespace token (lowercased), empty tokens dropped."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(TXT.ascii_lower(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")


def unigram_frequency_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Unigram-frequency document quality proxy (the SQL-expressible core
    of a CCNet-style LM-perplexity filter): rare-token-heavy documents —
    OCR noise, codes, boilerplate mangling — score low.

    Per token the corpus frequency ``c_w`` is reduced to its integer
    log2 floor (``length(bin(c_w)) - 1``), so every aggregate is
    integer-exact and engine-portable — no float ``ln`` whose last-ulp
    behavior differs between libm implementations (a real ``ln``-based
    logprob belongs in a prod variant where bit-exact oracles aren't
    required; the ranking this proxy induces is the same Zipf-tail
    ordering at ~1/ln2 resolution).

    Scale shape: tokenize (narrow) → per-(doc, word) counts FIRST — the
    (doc, word) key has no hot values, and map-side partial aggregation
    collapses each doc's repeats before any shuffle. The word-frequency
    table and the scoring join then operate on distinct (doc, word) rows:
    for a Zipf-head word like 'the' (~7% of ALL tokens at corpus scale)
    the join ships one row per DOCUMENT instead of one per OCCURRENCE —
    the difference between a reducer receiving ~7% of the corpus and
    receiving ~1 row per doc. Occurrence weighting is recovered exactly
    as sum(k_w · bits_w). The corpus-total row is a broadcast scalar.

    Lifetime: the persisted (doc, word) table lives until the session
    releases it — long-lived sessions call
    ``session.release_intermediates`` after consuming the result.
    """
    doc_word = (
        _tokens(df, id_col, text_col)
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    freq = doc_word.groupBy("w").agg(F.sum("k").alias("c"))
    total = doc_word.agg(F.sum("k").alias("n_total"))
    bits = F.length(F.bin(F.col("c"))) - 1
    scored = doc_word.join(freq, "w").select(
        "__id", "k", (F.col("k") * bits).alias("kbits")
    )
    per_doc = scored.groupBy("__id").agg(
        F.sum("k").alias("n_tokens"),
        F.sum("kbits").alias("sum_bits"),
    )
    corpus_bits = F.length(F.bin(F.col("n_total"))) - 1
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            F.col("__id"),
            "n_tokens",
            "sum_bits",
            F.round(F.col("sum_bits") * 1.0 / F.col("n_tokens"), 6).alias(
                "avg_freq_bits"
            ),
            corpus_bits.cast("bigint").alias("corpus_bits"),
            # mean token is >2^3 rarer than the corpus-frequency ceiling →
            # integer form of avg_freq_bits < corpus_bits - 3
            (
                F.col("sum_bits") + (3 * F.col("n_tokens"))
                < corpus_bits * F.col("n_tokens")
            ).alias("rare_heavy"),
        )
        .drop("n_total")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    cap: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Keep at most ``cap`` rows per group (domain/source balancing — the
    standard guard against one crawl domain dominating a training mix).

    row_number + filter compiles to a single hash-partitioned sort with
    WindowGroupLimit pushdown (Spark ≥3.5): each task keeps a cap-sized
    heap per group instead of fully sorting groups, so a pathologically
    hot source costs O(n log cap), not O(n log n), and nothing ever
    collects more than ``cap`` rows per group downstream."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn(rank_name, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_name) <= cap)
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    seed: str = "42",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic training-data shuffle: md5-keyed shard assignment +
    within-shard position. The export shape for "globally shuffled" corpus
    files: shard = first md5 nibble (uniform 16-way; n_shards must divide
    16 for exactness here — prod generalizes with more nibbles), position
    = rank of the md5 key inside the shard.

    At scale this is repartition(shard) + sortWithinPartitions(key): no
    global total-order sort, one shuffle, each shard written as one sorted
    file. The md5 key makes the permutation reproducible across runs AND
    engines (seed folded into the digest input).
    """
    assert 16 % n_shards == 0, "n_shards must divide 16 (single-nibble shard)"
    from pyspark.sql import Window

    skey = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), skey.alias("skey"))
    nibble = F.expr("position(substring(skey, 1, 1), '0123456789abcdef')") - 1
    sharded = keyed.withColumn("shard", (nibble % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("skey", id_col)
    return sharded.withColumn("pos", F.row_number().over(w).cast("bigint"))


def temperature_allocation(
    df: DataFrame,
    group_col: str,
    total_budget: int,
    id_col: str,
    seed: str = "42",
) -> DataFrame:
    """Temperature-resampled group allocation (multilingual mixing à la
    UniMax / T=2 sampling): each group's share of ``total_budget`` is
    proportional to sqrt(group_size) — up-weighting tail languages
    relative to head ones — and the allocated rows per group are taken in
    seeded md5-hash order (reproducible across runs and engines).

    Engine-exact arithmetic: sqrt is IEEE correctly-rounded (identical in
    every engine), so ``floor(sqrt(c) * 1000)`` is a deterministic integer
    weight; allocations use integer multiply-divide only. Scale shape:
    group sizes are one partial-aggregated groupBy (tiny result,
    broadcast); per-group selection is one WindowGroupLimit-style
    row_number cut over the hash order — no global sort, no collect.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    w = F.floor(F.sqrt(F.col("__c")) * 1000).cast("bigint")
    weights = counts.select(group_col, "__c", w.alias("__w"))
    tot = weights.agg(F.sum("__w").alias("__tw"))
    alloc = (
        weights.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "__c",
            # integer division (div), NOT double-divide-then-cast: Spark's
            # double→bigint cast truncates while other engines round, and
            # a last-ulp double difference could move a floor boundary —
            # integer ops are identical everywhere.
            F.expr(f"(__w * {int(total_budget)}) div __tw").alias("__alloc"),
        )
    )
    skey = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    ranked = df.join(F.broadcast(alloc), group_col).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(skey, F.col(id_col))
        ),
    )
    return (
        ranked.filter(F.col("__rk") <= F.col("__alloc"))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("__c").alias("group_size"),
            F.col("__alloc").alias("group_alloc"),
        )
    )


def boilerplate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate detection — the scalable form of exact
    substring dedup (cf. "Deduplicating Training Data Makes Language
    Models Better": exact duplicated spans dominate web corpora). Text is
    cut into NON-overlapping ``seg_words``-word segments; a segment whose
    md5 occurs in ≥ ``min_docs`` DISTINCT documents is boilerplate
    (navigation chrome, license headers, templated spans).

    Returns one row per document: ``(id, n_segments, n_boiler,
    clean_n_words)`` where ``clean_n_words`` counts words in non-boiler
    segments (the tail shorter than ``seg_words`` is never flagged).

    Scale shape: one explode to |segments| rows, one groupBy on the
    segment hash (Zipf-headed but bounded per hash by ``count distinct
    id`` partial aggregation), one hash-join back — all shuffles keyed by
    md5, no quadratic pair space anywhere.
    """
    words = F.split(F.trim(TXT.ascii_lower(F.col(text_col))), r"\s+")
    n_words = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.size(words))
    n_segs = F.floor(n_words / seg_words).cast("bigint")
    # guard the empty case: Spark's sequence(0, -1) produces a DESCENDING
    # [0, -1] (implicit step sign), which would mint bogus segments for
    # sub-seg_words docs — caught by the planted-template unit test.
    seg_hashes = F.when(
        n_segs > 0,
        F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(words, i * seg_words + 1, seg_words))
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    # ONE tokenize+hash pass (r11, guide §1.2/§2.3): the hashed projection
    # is persisted and fans out to all three consumers — the boiler
    # aggregate, the per-doc join side, and the zero-segment restore
    # (``base``). Unpersisted, the split+md5 pipeline executed THREE
    # times (segs twice + a third tokenize for base's word count); the
    # cached relation is (id, n_words, hashes) — hashes are ~3.2 bytes
    # per word vs the raw text's full payload, so the cache is strictly
    # smaller than the input at any scale.
    proj = df.select(
        F.col(id_col).alias("__id"),
        n_words.alias("__n_words"),
        seg_hashes.alias("__hashes"),
    ).persist()
    segs = proj.select(
        "__id", F.posexplode("__hashes").alias("seg_idx", "seg_hash")
    )
    boiler = (
        segs.groupBy("seg_hash")
        .agg(F.countDistinct("__id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg_hash", F.lit(1).alias("__is_boiler"))
    )
    per_doc = (
        segs.join(boiler, "seg_hash", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.coalesce(F.col("__is_boiler"), F.lit(0))).alias("n_boiler"),
        )
    )
    # documents with fewer than seg_words words have zero segments and
    # never reach per_doc via the explode — restore them with zeros.
    base = proj.select("__id", "__n_words")
    out = base.join(per_doc, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_segments"), F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("bigint").alias("n_boiler"),
        (
            F.col("__n_words")
            - F.coalesce(F.col("n_boiler"), F.lit(0)) * seg_words
        ).cast("bigint").alias("clean_n_words"),
    )
    return out


def greedy_token_cover(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, ngram: int = 2
) -> DataFrame:
    """Greedy maximum-coverage document selection: pick ``k`` documents,
    each round choosing the one covering the most NOT-YET-COVERED
    distinct tokens (ties → smallest id) — the classic (1−1/e)-
    approximation for submodular coverage, i.e. "which k docs teach the
    model the most vocabulary", the core primitive of coverage-driven
    corpus selection.

    Greedy is inherently sequential in k, so each of the ≤k rounds is one
    distributed aggregate (marginal gains) + one anti-join (retire the
    winner's tokens from EVERY document's remaining set). Driver traffic
    is ONE row per round (the argmax) — bounded scalars, never data; the
    shrinking remaining-tokens relation is localCheckpoint'ed per round
    with the superseded blocks unpersisted (the
    ``cluster_components_min_label`` discipline). Returns
    DataFrame[rank, doc_id, new_tokens] with ≤ k rows; stops early when
    every token is covered. NULL ids are dropped (an argmax over NULL is
    meaningless and the anti-join would retire nothing).
    """

    def _checkpoint_rdd(frame: DataFrame):
        plan = frame._jdf.queryExecution().analyzed()
        return plan.rdd() if plan.getClass().getSimpleName() == "LogicalRDD" else None

    docs = df.filter(F.col(id_col).isNotNull())
    if ngram == 1:
        toks = _tokens(docs, id_col, text_col)
    else:
        # word n-grams via the posexplode + window-lead pipeline
        # (_exploded_shingles' shape, parameterized) — a unigram basis is
        # often degenerate (tiny vocab, one doc covers everything).
        from pyspark.sql import Window

        ws = docs.select(
            F.col(id_col).alias("__id"),
            F.posexplode(TXT.words(F.col(text_col))).alias("pos", "w0"),
        )
        wnd = Window.partitionBy("__id").orderBy("pos")
        parts = [F.col("w0")] + [
            F.lead("w0", j).over(wnd) for j in range(1, ngram)
        ]
        toks = (
            ws.withColumn("w", F.concat_ws(" ", *parts))
            .withColumn("__last", parts[-1])
            .filter(F.col("__last").isNotNull() & (F.col("w0") != ""))
            .select("__id", "w")
        )
    remaining = toks.distinct().localCheckpoint(eager=True)
    prev_rdd = _checkpoint_rdd(remaining)
    picked: list[tuple[int, int, int]] = []
    for rank in range(1, k + 1):
        top = (
            remaining.groupBy("__id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("__id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        picked.append((rank, top[0]["__id"], top[0]["gain"]))
        winner_tokens = remaining.filter(F.col("__id") == top[0]["__id"]).select("w")
        remaining = remaining.join(winner_tokens, "w", "left_anti").localCheckpoint(
            eager=True
        )
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
        prev_rdd = _checkpoint_rdd(remaining)
    # The result lives in `picked` (≤ k driver rows); the last remaining-
    # tokens checkpoint is dead weight — free it before returning.
    if prev_rdd is not None:
        prev_rdd.unpersist(False)
    return df.sparkSession.createDataFrame(
        picked, "rank bigint, doc_id bigint, new_tokens bigint"
    )


def bigram_backoff_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    holdout_mod: int = 5,
    backoff_bits: int = 2,
) -> DataFrame:
    """Held-out bigram language-model scoring with Stupid Backoff (Brants
    et al. 2007) in integer-log2 form — the train/score shape of a
    CCNet/KenLM perplexity quality filter: train counts on the corpus
    slice ``id % holdout_mod != 0``, score the held-out slice
    ``id % holdout_mod == 0``, so unseen bigrams/unigrams actually occur
    and the backoff path is live (an in-sample bigram model never backs
    off — every bigram trivially has count ≥ 1).

    Per held-out bigram (w1, w2), surprisal in integer bits:
      - seen:   lb(c(w1)) − lb(c(w1,w2))      (the log count ratio)
      - unseen: backoff_bits + lb(N) − lb(c(w2))   (unigram backoff,
        α = 2^-backoff_bits; an unseen w2 contributes lb(N) — prob 1/N)
    where lb(x) = floor(log2 x) = length(bin(x)) − 1 — every aggregate is
    integer-exact and engine-portable (the `unigram_frequency_scores`
    discipline; no libm `ln`).

    Scale shape: bigrams are built MAP-SIDE per row (zip_with over two
    array slices — no posexplode+window shuffle); the held (doc, bigram)
    table collapses repeats per doc BEFORE joining the model, so a
    Zipf-head bigram ships one row per document, not per occurrence; the
    two model tables are map-side-combinable groupBys and the train-total
    is a broadcast scalar. Scoring is three equi-joins, all on
    word-shaped keys.

    Output: one row per held-out doc with ≥1 bigram — (doc_id, n_bigrams,
    n_unseen, sum_bits, avg_bits, oov_heavy = unseen > 25% of bigrams).
    """
    from ..functions import text as TXT

    ws = F.filter(TXT.words(F.col(text_col)), lambda t: t != "")
    base = df.select(F.col(id_col).alias("__id"), ws.alias("ws"))
    pair_len = F.greatest(F.size(F.col("ws")) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("ws"), 1, pair_len),
        F.slice(F.col("ws"), 2, pair_len),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = base.select("__id", F.explode(pairs).alias("p")).select(
        "__id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    toks = base.select("__id", F.explode("ws").alias("w"))
    held_pred = (F.col("__id") % holdout_mod) == 0
    train_big = (
        big.filter(~held_pred).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    )
    train_uni = (
        toks.filter(~held_pred).groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    )
    total = train_uni.agg(F.sum("cu").alias("n_train"))
    held = (
        big.filter(held_pred)
        .groupBy("__id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
    )

    def lb(c: Column) -> Column:
        return F.length(F.bin(c)) - 1

    scored = (
        held.join(train_big, ["w1", "w2"], "left")
        .join(
            train_uni.select(F.col("w").alias("w1"), F.col("cu").alias("c_ctx")),
            "w1",
            "left",
        )
        .join(
            train_uni.select(F.col("w").alias("w2"), F.col("cu").alias("c_w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "__id",
            "k",
            F.col("cb").isNull().cast("bigint").alias("unseen"),
            F.when(F.col("cb").isNotNull(), lb(F.col("c_ctx")) - lb(F.col("cb")))
            .otherwise(
                F.lit(backoff_bits)
                + lb(F.col("n_train"))
                - F.coalesce(lb(F.col("c_w2")), F.lit(0))
            )
            .alias("bits"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("unseen")).alias("n_unseen"),
            F.sum(F.col("k") * F.col("bits")).alias("sum_bits"),
        )
        .select(
            "__id",
            "n_bigrams",
            "n_unseen",
            "sum_bits",
            F.round(F.col("sum_bits") * 1.0 / F.col("n_bigrams"), 6).alias(
                "avg_bits"
            ),
            (4 * F.col("n_unseen") > F.col("n_bigrams")).alias("oov_heavy"),
        )
    )


def _with_w64_batch(
    tbl: DataFrame, specs: list[tuple[str, str, str]]
) -> DataFrame:
    """1/64-bit integer logs of ratios <= 1 (see `nb_train_apply`) for
    ALL ``(out, num_sql, den_sql)`` specs at once: staged as chained
    columns on the (tiny, <= n_buckets-row) weight table so each
    intermediate evaluates once. SQL fragments because exact integer DIV
    has no DataFrame-API form ((num·2^30) exceeds 2^53, so
    double-rounding float division is not an option).

    LEVEL-SYNCHRONOUS batching (r11, guide §7.3 — planning time as the
    bottleneck): every PySpark ``withColumn`` call re-analyzes the whole
    growing plan on the driver, so the former per-output chain (17 calls
    × 6 outputs = 102 analysis rounds on an ever-deeper plan) spent
    seconds of pure driver time per weight table — more than the
    distributed work itself at bench scale. One ``withColumns`` per
    DEPENDENCY LEVEL with all six outputs' columns in it preserves the
    exact same expressions and names (bit-identical results, same
    executed plan) in 16 analysis rounds total."""
    s = {out: f"__s_{out}" for out, _, _ in specs}
    r = {out: f"__r_{out}" for out, _, _ in specs}
    t = {out: f"__t_{out}" for out, _, _ in specs}
    u = {out: f"__u_{out}" for out, _, _ in specs}
    tbl = tbl.withColumns(
        {
            s[out]: F.expr(
                f"greatest(CAST(length(bin({den})) - 1 AS INT) - 32, 0)"
            )
            for out, _, den in specs
        }
    )
    tbl = tbl.withColumns(
        {
            r[out]: F.expr(
                f"greatest(CAST((shiftright(CAST({num} AS BIGINT), {s[out]})"
                f" * 1073741824) div"
                f" greatest(shiftright(CAST({den} AS BIGINT), {s[out]}), 1)"
                f" AS BIGINT), 1)"
            )
            for out, num, den in specs
        }
    )
    tbl = tbl.withColumns(
        {
            t[out]: F.expr(f"CAST(length(bin({r[out]})) - 1 AS INT)")
            for out, _, _ in specs
        }
    )
    tbl = tbl.withColumns(
        {
            u[out]: F.expr(f"shiftleft({r[out]}, 30 - {t[out]})")
            for out, _, _ in specs
        }
    )
    bs: dict[str, list[str]] = {out: [] for out, _, _ in specs}
    for i in range(6):
        # u ∈ [2^30, 2^31) ⇒ u² ∈ [2^60, 2^62): b = lb(u²) − 60 ∈ {0,1}
        tbl = tbl.withColumns(
            {
                f"__b{i}_{out}": F.expr(
                    f"CAST(length(bin({u[out]} * {u[out]})) - 1 AS INT) - 60"
                )
                for out, _, _ in specs
            }
        )
        tbl = tbl.withColumns(
            {
                u[out]: F.expr(
                    f"shiftright({u[out]} * {u[out]}, 30 + __b{i}_{out})"
                )
                for out, _, _ in specs
            }
        )
        for out, _, _ in specs:
            bs[out].append(f"__b{i}_{out}")
    tbl = tbl.withColumns(
        {
            out: F.expr(
                f"CAST({t[out]} * 64 + "
                + " + ".join(
                    f"{b} * {1 << (5 - i)}" for i, b in enumerate(bs[out])
                )
                + " AS BIGINT)"
            )
            for out, _, _ in specs
        }
    )
    drop = []
    for out, _, _ in specs:
        drop += [s[out], r[out], t[out], u[out], *bs[out]]
    return tbl.drop(*drop)


def _with_w64(tbl: DataFrame, out: str, num_sql: str, den_sql: str) -> DataFrame:
    """Single-spec form of :func:`_with_w64_batch` (kept for callers
    deriving one ratio column at a time)."""
    return _with_w64_batch(tbl, [(out, num_sql, den_sql)])


def nb_bucketize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    tier_mults: tuple[int, ...] = (20, 50),
    stop_words: tuple[str, ...] = None,
    persist: bool = True,
) -> DataFrame:
    """The shared NB feature pass: collapse each document to its hashed
    (bucket, count) rows and attach the stopword-density tier label —
    returns a ``(__id, bucket, k, label_true)`` relation
    (<= n_buckets rows per doc, map-side combinable, left hash-
    partitioned by __id so downstream per-doc aggregates reuse the
    exchange).

    ``persist`` (default True) caches the relation for the multi-consumer
    case (weight training + apply read the same pass in
    ``nb_train_apply`` — persisting makes the corpus-sized
    tokenize+explode run once; released by
    ``session.release_intermediates``, the convention every fan-out
    persist in this package follows). Single-consumer callers — a
    pipeline training on one relation and applying on another, each read
    exactly once — pass ``persist=False``: caching a one-reader relation
    is pure store/evict overhead (ADVICE r10)."""
    from pyspark.sql import Window

    from ..functions.text import LANG_STOPWORDS, ascii_lower

    if stop_words is None:
        stop_words = LANG_STOPWORDS["en"]
    n_classes = len(tier_mults) + 1
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.trim(ascii_lower(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    tb = (
        toks.withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
            % n_buckets,
        )
        .groupBy("__id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.col("w").isin(*stop_words).cast("bigint")).alias("s"),
        )
    )
    wdoc = Window.partitionBy("__id")
    n_tot = F.sum("k").over(wdoc)
    s_tot = F.sum("s").over(wdoc)
    label_true = F.lit(n_classes - 1)
    for i in range(len(tier_mults) - 1, -1, -1):
        label_true = F.when(
            s_tot * tier_mults[i] >= n_tot, F.lit(i)
        ).otherwise(label_true)
    # __fst marks exactly one row per doc (its min bucket — from the
    # SAME window, no extra exchange): doc-level counts downstream become
    # plain conditional sums instead of count_distinct expands.
    out = tb.select(
        "__id",
        "bucket",
        "k",
        label_true.cast("int").alias("label_true"),
        (F.col("bucket") == F.min("bucket").over(wdoc)).alias("__fst"),
    )
    return out.persist() if persist else out


def nb_weight_table(
    train: DataFrame, n_buckets: int = 1024, n_classes: int = 3
) -> DataFrame:
    """NB training over a `nb_bucketize` relation: per-(class, bucket)
    token counts padded over the full ``spark.range(n_buckets)`` bucket
    domain; class token totals and doc priors are 1-row relations that
    attach as broadcast builds (Catalyst's scalar-subquery shape).
    Returns the <= n_buckets-row ``(bucket, w0.., p0..)`` weight table
    in the 1/64-bit integer-log discipline (see `nb_train_apply`)."""
    cnt = train.groupBy("label_true", "bucket").agg(F.sum("k").alias("n"))
    wm = cnt.groupBy("bucket").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("label_true") == c, F.col("n"))), F.lit(0)
            ).alias(f"m{c}")
            for c in range(n_classes)
        ]
    )
    # ONE pass over the train relation for all class constants: token
    # totals as conditional sums of k, doc counts via the __fst flag
    # (one marked row per doc) — no count_distinct Expand, no second
    # aggregate, no crossJoin of 1-row relations.
    consts = train.groupBy().agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("label_true") == c, F.col("k"))),
                F.lit(0),
            ).alias(f"N{c}")
            for c in range(n_classes)
        ],
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("label_true") == c) & F.col("__fst"), F.lit(1)
                    )
                ),
                F.lit(0),
            ).alias(f"D{c}")
            for c in range(n_classes)
        ],
        F.coalesce(
            F.sum(F.when(F.col("__fst"), F.lit(1))), F.lit(0)
        ).alias("Dt"),
    )
    return _nb_w64_tail(train.sparkSession, wm, consts, n_buckets, n_classes)


def _nb_w64_tail(
    spark: SparkSession,
    wm: DataFrame,
    consts: DataFrame,
    n_buckets: int,
    n_classes: int,
) -> DataFrame:
    """The shared weight-derivation tail: (per-bucket m{c} pivot, 1-row
    class constants) → the padded ``(bucket, w0.., p0..)`` table in the
    1/64-bit integer-log discipline. One definition feeds both training
    forms — `nb_weight_table` (from a bucketize relation) and
    `nb_weights_from_counts` (from stored additive counts) — so their
    bit-exact equivalence holds by construction, not by parallel
    maintenance."""
    wtab = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(wm, "bucket", "left")
        .crossJoin(F.broadcast(consts))
    )
    # all 2·n_classes ratio columns derived level-synchronously in ONE
    # batched pass — see _with_w64_batch (r11 driver-planning fix)
    specs = []
    for c in range(n_classes):
        specs.append((f"w{c}", f"coalesce(m{c}, 0) + 1", f"N{c} + {n_buckets}"))
        specs.append((f"p{c}", f"D{c} + 1", f"Dt + {n_classes}"))
    wtab = _with_w64_batch(wtab, specs)
    return wtab.select(
        "bucket",
        *[f"w{c}" for c in range(n_classes)],
        *[f"p{c}" for c in range(n_classes)],
    )


def nb_counts(rel: DataFrame, n_classes: int = 3) -> DataFrame:
    """ADDITIVE NB training state from a `nb_bucketize` relation: one row
    per (label_true, bucket) carrying that cell's token count ``n`` and
    doc count ``d`` (sum of the one-per-doc ``__fst`` marks). Every
    statistic `nb_weight_table` derives — per-bucket class counts m{c},
    class token totals N{c}, class doc counts D{c}, total docs Dt — is a
    plain SUM of these rows, so increments can APPEND their counts and
    the union stays exact: this is the mergeable-state form that lets
    the NB model be maintained incrementally (streamed per increment,
    weights re-derived from ≤ classes×buckets rows) instead of
    re-tokenizing the corpus per refresh. ``n_classes`` is accepted for
    signature symmetry; the relation already carries label_true."""
    return rel.groupBy("label_true", "bucket").agg(
        F.sum("k").cast("bigint").alias("n"),
        F.sum(F.col("__fst").cast("bigint")).alias("d"),
    )


def nb_weights_from_counts(
    counts: DataFrame, n_buckets: int = 1024, n_classes: int = 3
) -> DataFrame:
    """Derive the NB weight table from stored ADDITIVE counts (the
    `nb_counts` schema, possibly many appended increments per cell —
    sums merge them). Input is ≤ increments×classes×buckets tiny rows,
    so both aggregate passes here are metadata-cheap; the expensive
    corpus tokenize happened once per increment at append time. The w64
    tail is the SAME code path `nb_weight_table` runs — bit-exact
    equivalence pinned in tests/test_standing_state.py."""
    wm = counts.groupBy("bucket").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("label_true") == c, F.col("n"))), F.lit(0)
            ).alias(f"m{c}")
            for c in range(n_classes)
        ]
    )
    consts = counts.groupBy().agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("label_true") == c, F.col("n"))), F.lit(0)
            ).alias(f"N{c}")
            for c in range(n_classes)
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col("label_true") == c, F.col("d"))), F.lit(0)
            ).alias(f"D{c}")
            for c in range(n_classes)
        ],
        F.coalesce(F.sum("d"), F.lit(0)).alias("Dt"),
    )
    return _nb_w64_tail(
        counts.sparkSession, wm, consts, n_buckets, n_classes
    )


def nb_apply(
    apply_rel: DataFrame, wtab: DataFrame, n_classes: int = 3
) -> DataFrame:
    """NB scoring of a `nb_bucketize` relation against a
    `nb_weight_table`: the hash-classifier apply plan with the weight
    expression swapped for a BROADCAST lookup on the bucket id; the
    per-doc aggregate reuses the bucketize window's hash partitioning
    (zero extra exchanges on the apply side). Returns
    ``(__id, n_tokens, s0.., label, label_true, correct)``."""
    import functools
    import operator

    scored = apply_rel.join(F.broadcast(wtab), "bucket")
    agg = scored.groupBy("__id").agg(
        F.sum("k").cast("bigint").alias("n_tokens"),
        F.min("label_true").alias("label_true"),
        *[
            (F.sum(F.col("k") * F.col(f"w{c}")) + F.min(F.col(f"p{c}")))
            .cast("bigint")
            .alias(f"s{c}")
            for c in range(n_classes)
        ],
    )
    # Argmax with smallest-index tie-break as a when-chain: branch c
    # tests s_c >= every LATER class only; the first branch to succeed
    # is provably the global argmax (if an earlier class held the max,
    # its own branch would have succeeded first).
    label = F.lit(n_classes - 1)
    for c in range(n_classes - 2, -1, -1):
        cond = functools.reduce(
            operator.and_,
            [
                F.col(f"s{c}") >= F.col(f"s{j}")
                for j in range(c + 1, n_classes)
            ],
        )
        label = F.when(cond, F.lit(c)).otherwise(label)
    return agg.select(
        "__id",
        "n_tokens",
        *[f"s{c}" for c in range(n_classes)],
        label.cast("int").alias("label"),
        F.col("label_true").cast("int").alias("label_true"),
        (label.cast("int") == F.col("label_true"))
        .cast("bigint")
        .alias("correct"),
    )


def nb_train_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    tier_mults: tuple[int, ...] = (20, 50),
    holdout_mod: int = 5,
    stop_words: tuple[str, ...] = None,
) -> DataFrame:
    """Multinomial Naive Bayes quality classifier — TRAIN and APPLY in
    one Catalyst DAG, trained on SEMANTICALLY REAL labels (VERDICT r10
    ask #3: the r09 version proved the train/apply plumbing under
    ``id % n_classes`` stand-in labels; accuracy against those was
    definitionally noise).

    **Labels** are stopword-density quality tiers — the
    quality-gate-style rule a production pipeline distills into a cheap
    hashed classifier (the CCNet/fastText pattern: train a fast model to
    mimic an expensive heuristic): with n = a doc's token count and
    s = its stopword-token count, ``label = first i where
    s·tier_mults[i] >= n, else len(tier_mults)`` — defaults (20, 50)
    give class 0 = stopword-dense (>= 5%), 1 = mid (>= 2%), 2 = sparse.
    The label derives from the SAME token stream the classifier
    consumes, but the classifier sees only hashed bucket counts (word
    identity destroyed), so held-out accuracy measures real
    separability of the rule through the hashing trick.

    **1/64-bit integer scoring** (exactly SQL-replayable — upgraded
    from the r09 floor-log2 whole-bit discipline, whose 1-bit
    granularity on the class-total term ``n_tokens·lb(N_c)`` collapsed
    under imbalanced real classes; a 1/4-bit intermediate still
    underflowed the ~1e-5 rare-bucket ratios at sf0.1 and degenerated
    to all-majority): every log is the classic shift-and-square
    integer log2 (6 fractional bits) over a 30-bit-quantized ratio:
      r  = max((x·2^30) div y, 1) <= 2^30      (x <= y always here)
      t  = lb(r);  u = r << (30 − t)  ∈ [2^30, 2^31)
      6×: b_i = lb(u²) − 60;  u = u² >> (30 + b_i);  frac = 2·frac+b_i
      W(x/y) = (t << 6) + frac  ≈ floor(64·log2(r)) − 1920 + const
    (lb(v) = length(bin(v)) − 1). Every step is 64-bit-safe in both
    engines (u² < 2^62); the truncating renormalization makes W a
    deterministic integer recurrence computed IDENTICALLY by Spark and
    DuckDB — cross-engine equality holds by construction, not by float
    luck. A defensive pre-shift (den >> max(0, lb(den) − 32), num
    shifted alike) keeps x·2^30 in bigint for class totals beyond 2^32
    tokens, so the ARITHMETIC is scale-unbounded (no overflow at any
    corpus size). Score RESOLUTION saturates earlier (ADVICE r10): the
    30-bit ratio quantization clamps any ratio below 2^-30 to r=1 →
    W=0, so once a class's token total N_c exceeds ~2^30 (~10^9 tokens)
    every unseen-bucket Laplace ratio (m+1)/(N_c+B) quantizes to the
    same W=0 and differing N_c no longer separate classes on unseen
    buckets (seen buckets, where m ≫ 0, keep full resolution).
    Billion-token-per-class deployments should raise the quantization
    scale (2^30 → 2^40 with a matching pre-shift widening) — a
    constant change to ``_with_w64``; not done here because the
    driver-checked corpora are far below the bound and the wider shift
    costs one more renormalization stage per weight.
      s(doc, c) = W(q_c) + Σ_b k_b · W(r_cb)
      r_cb = (n_cb + 1) / (N_c + B)     (Laplace token weight)
      q_c  = (D_c + 1) / (D + C)        (doc prior)
    Predicted label = argmax, ties to the smallest class index.

    **Scale shape**: ONE tokenize pass feeds everything via the shared
    (doc, bucket, k, stop_hits) collapse (map-side combinable,
    <= n_buckets rows per doc). Per-doc totals (and so labels) attach
    by a WINDOW over the doc id — no doc-keyed shuffle join. The train
    side reduces to <= n_classes·n_buckets weight rows padded over the
    full ``spark.range(n_buckets)`` bucket domain with the class
    constants broadcast; the apply side is the hash-classifier plan
    with a BROADCAST lookup on the bucket id, and its final per-doc
    aggregate reuses the window's hash partitioning (zero extra
    exchanges). No shuffle join anywhere. NULL ids fall out of both
    splits (3-valued ``%``); token-less docs produce no row."""
    n_classes = len(tier_mults) + 1
    windowed = nb_bucketize(
        df, id_col, text_col, n_buckets, tier_mults, stop_words
    )
    is_train = F.col("__id") % holdout_mod != 0
    wtab = nb_weight_table(
        windowed.filter(is_train), n_buckets, n_classes
    )
    return nb_apply(
        windowed.filter(F.col("__id") % holdout_mod == 0), wtab, n_classes
    )
