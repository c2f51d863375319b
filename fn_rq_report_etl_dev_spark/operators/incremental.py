"""Incremental aggregate maintenance (materialized-view pattern): keep a
running summary table current by merging each batch's PARTIAL aggregates
instead of recomputing over all history.

Only algebraic/distributive aggregates participate (count, sum, min, max —
the same classes Spark's own partial aggregation pushes map-side): they
combine associatively, so `combine(running, agg(batch)) == agg(history ∪
batch)` exactly. At 100 TB this is the difference between scanning one
day's partition and scanning years of history: the batch aggregation is
partial-aggregated at scan, and the combine is one full-outer join on the
group keys against a summary table that is orders of magnitude smaller
than the fact history. Holistic aggregates (exact percentiles, distinct
counts) need sketches instead (HLL / quantile digests — see the approx_*
workloads) and are deliberately not expressible here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggregates(
    running: DataFrame,
    delta: DataFrame,
    keys: list[str],
    add_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Combine two partial-aggregate frames with identical schemas:
    full-outer join on ``keys``; ``add_cols`` sum null-safely,
    ``min_cols``/``max_cols`` take the null-skipping extreme. Both inputs
    must be aggregates over DISJOINT row sets of the same underlying data
    (the caller's batching contract) — then the result equals the
    aggregate over the union."""
    add_cols = add_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    value_cols = add_cols + min_cols + max_cols

    r = running.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    d = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in value_cols],
    )
    cond = [F.col(f"__rk_{k}").eqNullSafe(F.col(f"__dk_{k}")) for k in keys]
    joined = r.join(d, cond, "full_outer")

    def _combined(c: str, how: str) -> F.Column:
        a, b = F.col(f"__r_{c}"), F.col(f"__d_{c}")
        if how == "add":
            # SQL sum over zero non-NULL inputs is NULL, not 0 — a group
            # whose partials are NULL on BOTH sides must stay NULL or the
            # maintained view diverges from a full recompute (null-audit
            # finding). One NULL partial combines as identity (0).
            out = F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
                F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
            )
        elif how == "min":
            out = F.coalesce(F.least(a, b), a, b)
        else:
            out = F.coalesce(F.greatest(a, b), a, b)
        return out.alias(c)

    return joined.select(
        *[
            F.coalesce(F.col(f"__rk_{k}"), F.col(f"__dk_{k}")).alias(k)
            for k in keys
        ],
        *[_combined(c, "add") for c in add_cols],
        *[_combined(c, "min") for c in min_cols],
        *[_combined(c, "max") for c in max_cols],
    )
