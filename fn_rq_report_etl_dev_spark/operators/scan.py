"""Distributed prefix scan: a global running SUM over a total order
WITHOUT a single-task window.

``sum(v) OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
relation into ONE window partition — the same textbook scale-killer as a
global ``row_number`` (see ``operators/ranking.py``). But unlike ranking,
a running SUM doesn't need partition-count scalars on the driver at all:
because addition is associative, the carry-in for each range of the order
key is just the SUM of everything before it. So the scan decomposes into
pure DataFrame ops, no ``collect()``, no persist-the-shuffle discipline:

1. bucket rows by a caller-supplied expression that is NONDECREASING in
   the global order (fixed-width ranges of the leading order key:
   ``day div 32``, ``k div 10000``, a month number, ...);
2. running sum WITHIN each bucket — an ordinary partitioned window, fully
   parallel;
3. per-bucket totals (one map-side-combinable aggregate → |buckets| rows)
   flow through ONE tiny ordered window to produce each bucket's
   exclusive carry-in, broadcast-joined back.

The only global ordering happens over the bucket summary — 3–5 orders of
magnitude smaller than the data when the bucket width is sized so the
summary stays single-task-scale (recurse the same decomposition once more
if it doesn't). Same two-level shape as the distributed lag/lead in
``workloads/relational.py::gaps_missing_event_ids``.

Determinism contract: the per-row ordering must be TOTAL within a bucket
(caller appends a unique tiebreaker) and ``value`` must be non-NULL —
SQL's window SUM carries NULL until the first non-NULL value, while the
bucket decomposition would coalesce a later bucket's carry-in to a
number; filtering/coalescing NULL values at the call site keeps the two
semantics identical. Integer-typed values make the result
order-insensitive across engines (float addition would re-associate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    value: Column,
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = SUM(``value``) OVER (ORDER BY ``bucket``,
    *``order_by`` ROWS UNBOUNDED PRECEDING) — the global running sum —
    computed with a per-bucket window plus a bucket-summary carry-in
    instead of a one-task global window.

    ``bucket`` must be nondecreasing in the intended global order (it
    becomes the leading sort key), ``order_by`` must make rows unique
    within a bucket, and ``value`` must be non-NULL (module docstring).
    """
    return bucketed_running_sums(df, bucket, order_by, {out_col: value})


def bucketed_running_sums(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    values: dict[str, Column],
) -> DataFrame:
    """N simultaneous global running sums over ONE bucket decomposition:
    every output column in ``values`` (out_col → value expression) shares
    the same per-bucket window sort, the same bucket-totals aggregate,
    and the same broadcast carry join — running K scans costs ONE
    exchange set, not K (a two-ECDF Kolmogorov–Smirnov needs both sample
    cumulatives; calling the single-column scan twice would re-shuffle
    the relation and re-aggregate the summary per column). Contracts as
    in :func:`bucketed_running_sum`."""
    b = df.withColumn("__bkt", bucket)
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b
    for i, (_, val) in enumerate(values.items()):
        local = local.withColumn(f"__cum_in_{i}", F.sum(val).over(w_in))
    totals = b.groupBy("__bkt").agg(
        *[F.sum(val).alias(f"__tot_{i}") for i, val in enumerate(values.values())]
    )
    w_pre = (
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__tot_{i}").over(w_pre), F.lit(0)).alias(
                f"__off_{i}"
            )
            for i in range(len(values))
        ],
    )
    out = local.join(F.broadcast(carry), "__bkt")
    for i, out_col in enumerate(values):
        out = out.withColumn(
            out_col,
            (F.col(f"__cum_in_{i}") + F.col(f"__off_{i}")).cast("bigint"),
        )
    return out.drop(
        "__bkt",
        *[f"__cum_in_{i}" for i in range(len(values))],
        *[f"__off_{i}" for i in range(len(values))],
    )
