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


# NOTE: word n-gram shingling deliberately lives in operators/text_dedup.py
# as a posexplode + window-lead pipeline, NOT as an array higher-order
# function here — HOFs are interpreted and re-evaluate the regex split per
# element (measured 2-3× slower end-to-end).


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


# PII patterns kept to the regex subset Java and RE2 share.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_count(col: Column) -> Column:
    """Total PII-pattern hits in a text column (one regexp pass per kind)."""
    total = F.lit(0)
    for pat in PII_PATTERNS.values():
        total = total + F.regexp_count(col, F.lit(pat))
    return total


def pii_redact(col: Column, replacement: str = "[REDACTED]") -> Column:
    """Replace every PII-pattern occurrence; chained regexp_replace stays
    a single projection in the plan (no extra passes over rows)."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out
