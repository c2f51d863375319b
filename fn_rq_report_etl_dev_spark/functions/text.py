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

# Engine-wide case-fold policy: ASCII-ONLY, via translate(). Full Unicode
# lower() is engine-dependent at exactly the corners a web corpus hits —
# the JVM maps İ (U+0130) to "i" + combining dot (full case mapping) while
# utf8proc (DuckDB) maps it to plain "i" (simple mapping) — so any oracle
# built on lower() silently diverges on Turkish/ligature/astral inputs
# (found by scripts_unicode_audit.py, round 5). translate() is identical
# byte-for-byte in both engines; non-ASCII case variants stay distinct
# tokens, which is the right call for ASCII-stopword heuristics anyway.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWERC = "abcdefghijklmnopqrstuvwxyz"
# DuckDB-side fragment of the same fold: .format(expr)
SQL_FOLD = "translate({}, '" + ASCII_UPPER + "', '" + ASCII_LOWERC + "')"

# Tiny per-language stopword profiles for the stopword lang-ID heuristic.
# Counted as TOKEN-SET MEMBERSHIP over ASCII word runs ([a-z0-9_]+ of the
# folded text), NOT \b-delimited regex: Java's \b is Unicode-aware (ı is a
# word char) while RE2's is ASCII-only, so "productıon" contains \bon\b in
# DuckDB but not in Spark — same audit finding as the fold.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with", "on", "that"),
    # all-ASCII profiles only ("für" would never be an ASCII token run)
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "vous"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por", "del", "como"),
}
TOKEN_RUN = r"[a-z0-9_]+"
# CJK detection by codepoint range (language without word boundaries).
CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"

# BPE-ish token pattern: alphanumeric runs OR single non-space symbols —
# the classic pre-tokenizer split shape.
SUBWORD_TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def ascii_lower(col: Column) -> Column:
    """The engine's canonical case fold (see ASCII_UPPER note)."""
    return F.translate(col, ASCII_UPPER, ASCII_LOWERC)


def sql_fold(expr: str) -> str:
    """DuckDB fragment computing the identical fold."""
    return SQL_FOLD.format(expr)


def words(col: Column) -> Column:
    """ASCII-folded whitespace tokens."""
    return F.split(F.trim(ascii_lower(col)), WORD_RE)


# NOTE: word n-gram shingling deliberately lives in operators/text_dedup.py
# as a posexplode + window-lead pipeline, NOT as an array higher-order
# function here — HOFs are interpreted and re-evaluate the regex split per
# element (measured 2-3× slower end-to-end).


def stopword_hits(col: Column, lang: str) -> Column:
    """Stopword occurrences as token-set membership: extract the ASCII
    word runs of the folded text once, then count members. The regex runs
    once per row (extract_all); the array filter is cheap literal IN."""
    toks = F.regexp_extract_all(ascii_lower(col), F.lit(TOKEN_RUN), 0)
    sw = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*sw)))


def sql_stopword_hits(expr: str, lang: str) -> str:
    """DuckDB fragment computing the identical stopword count."""
    in_list = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_extract_all({sql_fold(expr)}, "
        f"'{TOKEN_RUN}'), t -> t IN ({in_list})))"
    )


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
