"""Count-min sketch: mergeable frequency estimation for heavy hitters.

The 100 TB motivation: an exact token-frequency table shuffles |vocab|
keys (Zipf-long tail, billions of rows of which almost all are noise); a
count-min table is a FIXED d×w grid whose partial counts combine
map-side, so the shuffle carries at most d·w rows no matter the corpus.
Point-lookup estimates then never underestimate (est ≥ true), with
overestimate bounded by ~N/w per row with high probability.

Hashing is md5-derived (first 8 hex chars → int, mod width) so any engine
reproduces the identical grid — the DuckDB oracle replays the sketch
bit-for-bit rather than trusting a bound (same portability rule as the
MinHash/SimHash family in text_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 4096
DEFAULT_DEPTH = 4


def cm_bucket(value: Column, d: int, width: int = DEFAULT_WIDTH) -> Column:
    """Row d's bucket for ``value``: ``int(md5(d || ':' || value)[:8], 16)
    % width`` — portable, deterministic, uniform-enough per row."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), value)), 1, 8), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def countmin_table(
    items: DataFrame,
    value_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Build the d×w count grid from an item-occurrence relation (one row
    per occurrence). One explode (×depth) + one groupBy over at most
    depth·width keys — the partial aggregation collapses each map task's
    contribution to ≤ d·w rows before the shuffle."""
    v = F.col(value_col).cast("string")
    rows = items.select(
        F.posexplode(
            F.array(*[cm_bucket(v, d, width) for d in range(depth)])
        ).alias("d", "bucket")
    )
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    value_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-frequency estimates for ``candidates``: min over the depth
    rows of each candidate's bucket count. The candidate set is small by
    construction (heavy-hitter shortlist), so the lookup join broadcasts
    it against the bounded grid."""
    probes = candidates.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    cm_bucket(F.col(value_col).cast("string"), d, width)
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    joined = probes.join(cms, ["d", "bucket"], "left").fillna({"cnt": 0})
    return joined.groupBy(*candidates.columns).agg(
        F.min("cnt").alias("cms_est")
    )
