"""Lenient multi-format timestamp parsing and timezone derivation.

Reproduces the reference's driver-side, row-at-a-time Python parsing
(``rqtradein_etl.py:249-311``) as pure column expressions:

- ``normalize_fraction``  ≙ ``truncate_microseconds`` (:249-258): pad or
  truncate ragged fractional seconds to exactly 6 digits, preserving a
  trailing ``Z``.
- ``parse_timestamp_multi`` ≙ ``to_datetime`` (:260-284): try a fixed list
  of formats, fall back to ISO, yield NULL on failure (never raise) — the
  semantics of ``try_to_timestamp``.
- ``with_fallback_now`` ≙ the present-but-unparseable → ``datetime.now()``
  policy (:316-323), with the "now" injectable for deterministic tests.
- ``utc_to_est`` ≙ ``to_est`` (:286-311): naive timestamps are treated as
  UTC and converted to US Eastern (DST-aware via the IANA tzdb — identical
  instants to pytz for all post-1970 values). The reference renders EST
  values at second precision (``strftime('%Y-%m-%d %H:%M:%S')``, :311), so
  the conversion truncates to seconds.

All of this is expressed with built-ins (regexp, coalesce, try_to_timestamp,
from_utc_timestamp); at scale it whole-stage-codegens into the scan's
projection with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's strptime formats (rqtradein_etl.py:265-271), translated to
# Spark datetime patterns. The reference strips 'Z' before matching, so the
# 'Z'-suffixed variants collapse onto the plain ones after normalization.
SPARK_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    # datetime.fromisoformat fallback (rqtradein_etl.py:279) also accepts a
    # bare date.
    "yyyy-MM-dd",
]

_FRACTION_RE = r"^(.*?\.)(\d+)(Z?)$"

EASTERN_TZ = "America/New_York"


def normalize_fraction(col: Column) -> Column:
    """Pad/truncate fractional seconds to exactly 6 digits, preserving 'Z'.

    Mirrors ``truncate_microseconds`` (rqtradein_etl.py:249-258): strings
    without a fractional part pass through unchanged.
    """
    prefix = F.regexp_extract(col, _FRACTION_RE, 1)
    frac = F.regexp_extract(col, _FRACTION_RE, 2)
    z = F.regexp_extract(col, _FRACTION_RE, 3)
    fixed = F.concat(prefix, F.rpad(F.substring(frac, 1, 6), 6, "0"), z)
    return F.when(frac != "", fixed).otherwise(col)


def parse_timestamp_multi(col: Column) -> Column:
    """Lenient multi-format parse: first matching format wins, else NULL.

    ≙ ``to_datetime`` (rqtradein_etl.py:260-284). Empty strings parse to
    NULL (the reference treats '' as falsy → None). ``try_to_timestamp``
    returns NULL on mismatch instead of raising, so ANSI mode stays on.
    """
    cleaned = F.regexp_replace(normalize_fraction(col), "Z$", "")
    attempts = [F.try_to_timestamp(cleaned, F.lit(fmt)) for fmt in SPARK_TS_FORMATS]
    # Final fallback ≙ datetime.fromisoformat: Spark's default parser accepts
    # ISO-8601 shapes the fixed list misses (e.g. 'yyyy-MM-dd HH:mm').
    attempts.append(F.try_to_timestamp(cleaned))
    return F.coalesce(*attempts)


def with_fallback_now(parsed: Column, raw: Column, now: Column | None = None) -> Column:
    """Present-but-unparseable → "now" (rqtradein_etl.py:316-323).

    ``raw`` empty/NULL stays NULL; ``raw`` non-empty but unparseable becomes
    ``now`` (injectable for deterministic tests; defaults to
    ``current_timestamp()`` like the reference's ``datetime.now()``).
    """
    if now is None:
        now = F.current_timestamp()
    present = raw.isNotNull() & (raw != F.lit(""))
    return F.when(present & parsed.isNull(), now).otherwise(parsed)


def utc_to_est(col: Column) -> Column:
    """Treat a (naive, UTC) timestamp as UTC and convert to US Eastern,
    truncated to whole seconds (rqtradein_etl.py:286-311)."""
    return F.date_trunc("second", F.from_utc_timestamp(col, EASTERN_TZ))
