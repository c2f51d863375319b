"""Text-analysis building blocks for large-scale training-data pipelines:
tokenization, shingling, language-ID heuristics, quality scoring, and
document fingerprinting.

All pure column expressions (regexp/array built-ins — JVM-side, codegen'd);
the patterns are kept to the regex subset Java and RE2 share so the DuckDB
oracles evaluate the identical language.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = r"\s+"

# Tiny per-language stopword profiles for the n-gram/stopword lang-ID
# heuristic. Word-boundary alternation — same semantics in Java regex (Spark)
# and RE2 (DuckDB).
LANG_STOPWORD_PATTERNS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|for|with|on|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|für)\b",
    "fr": r"\b(le|la|les|et|est|une|dans|pour|que|vous)\b",
    "es": r"\b(el|los|las|es|una|para|con|por|del|como)\b",
}
# CJK detection by codepoint range (language without word boundaries).
CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"

# BPE-ish token pattern: alphanumeric runs OR single non-space symbols —
# the classic pre-tokenizer split shape.
SUBWORD_TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def words(col: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.trim(F.lower(col)), WORD_RE)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of word n-grams (the unit for MinHash / Jaccard near-dedup)."""
    ws = words(col)
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)])
    )
    # Short docs (< n words) have no shingles — and sequence(1, k) would
    # count DOWN for k < 1, so guard explicitly.
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))


def stopword_hits(col: Column, lang: str) -> Column:
    return F.regexp_count(F.lower(col), F.lit(LANG_STOPWORD_PATTERNS[lang]))


def cjk_chars(col: Column) -> Column:
    return F.regexp_count(col, F.lit(CJK_PATTERN))


def predicted_lang(en: Column, de: Column, fr: Column, es: Column, zh: Column) -> Column:
    """Deterministic argmax with fixed priority order en>de>fr>es>zh —
    identical tie-breaks in any engine."""
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en >= zh), "en")
        .when((de >= fr) & (de >= es) & (de >= zh), "de")
        .when((fr >= es) & (fr >= zh), "fr")
        .when(es >= zh, "es")
        .otherwise("zh")
    )


def subword_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(SUBWORD_TOKEN_PATTERN))


def whitespace_token_count(col: Column) -> Column:
    return F.size(words(col))


def alpha_char_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^A-Za-z]", ""))


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(r"[.,;:!?]"))


def fingerprint(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    word set — collapses word-order shuffles and duplications to one key.
    (The distributable analog of a rolling-hash document fingerprint.)"""
    canon = F.array_join(F.array_sort(F.array_distinct(words(col))), " ")
    return F.md5(canon)
