"""Distributed global ranking: NTILE(k) over a total order WITHOUT a
single-task window.

``ntile(k) OVER (ORDER BY ...)`` with no PARTITION BY collapses the whole
relation into ONE window partition — one task sorts everything, which is
the textbook 100 TB scale-killer. The distributed equivalent is the
classic zipWithIndex shape:

1. ``repartitionByRange`` on the ordering key — Spark's range partitioner
   gives globally ordered partitions (partition i's rows all sort before
   partition i+1's);
2. per-partition ``row_number`` (window partitioned by
   ``spark_partition_id()`` — every task sorts only its own slice);
3. per-partition row counts → cumulative offsets. Since r12 this is a
   LAZY branch of the same DAG — a tiny aggregate over the persisted
   frame, offsets via a window cumsum over the ≤ #partitions count rows,
   broadcast-joined back — instead of a driver ``collect()`` baked into
   a chained-``when`` literal column. Same math, but the whole ranking
   (and anything chained after it, e.g. three NTILEs in a row) is ONE
   Spark action with zero Python-side blocking jobs: no driver
   round-trip per call, no 2×#partitions-deep CASE tree for the
   optimizer to chew (guide §5 "no collect()/driver loops in query
   paths", §7.3 driver time);
4. ``global_rank = offset + local_rank`` and the SQL-standard NTILE
   closed form on (global_rank, n) — first ``n mod k`` buckets get
   ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — with n/q/r now lazy
   1-row aggregates instead of driver literals.

The range-partitioned frame is persisted BEFORE fan-out: the range
partitioner derives split points from a sample, so independently
re-executing the shuffle for the counts branch and the output branch
could re-draw boundaries and desynchronize the offsets. The cache makes
both branches read the SAME shuffle output — the first consumer (the
offsets broadcast build, inside the action) populates it. (A production
run on a cluster would ``localCheckpoint`` for the same reason.)

Determinism contract: the ordering must be TOTAL (caller appends a unique
tiebreaker) and the ordering keys non-NULL (Spark sorts NULLS FIRST on
ASC where most SQL engines default NULLS LAST — coalesce or filter at the
call site).

Persist lifetime: the range-partitioned frame MUST stay cached for as long
as the returned DataFrame may be re-evaluated (offsets pair with that
exact shuffle output — see above), so these functions cannot unpersist it
themselves. The cache is a regular ``persist()`` entry in Spark's
CacheManager: per-query harnesses reclaim it wholesale via
``session.release_intermediates`` / ``spark.catalog.clearCache()``, and
library callers that keep the session alive can unpersist precisely via
the handle attached to the result as ``<result>._graft_persisted`` once
they have materialized (written/collected) the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranked_with_offsets(
    df: DataFrame,
    order_by: list[Column],
    num_partitions: int | None,
    with_total: bool,
) -> DataFrame:
    """Range-partition ``df`` on ``order_by`` and append ``__grn`` (global
    rank, bigint) — plus ``__n`` (total row count) when ``with_total`` —
    as a single lazy DAG over ONE persisted shuffle output (module
    docstring, steps 1–3)."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__local_rn",
            F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
        )
        .persist()
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # ≤ #partitions rows: the single-task cumsum window is trivially small,
    # and the result broadcasts.
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0))
        .cast("bigint")
        .alias("__offset"),
        *(
            [
                F.sum("__cnt")
                .over(
                    Window.partitionBy().rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .cast("bigint")
                .alias("__n")
            ]
            if with_total
            else []
        ),
    )
    out = ranged.join(F.broadcast(offsets), "__pid").withColumn(
        "__grn", (F.col("__offset") + F.col("__local_rn")).cast("bigint")
    )
    out._graft_persisted = ranged  # unpersist hook (module docstring)
    return out


def distributed_ntile(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = NTILE(``k``) over the global ``order_by``
    total order, computed with range partitioning + per-partition ranks
    instead of a one-task global window. Exactly matches
    ``ntile(k) OVER (ORDER BY ...)`` for a total, non-NULL ordering."""
    ranked = _ranked_with_offsets(df, order_by, num_partitions, with_total=True)
    grn, n = F.col("__grn"), F.col("__n")

    # SQL-standard NTILE closed form, on lazy (grn, n) columns. q == 0
    # (k > n) leaves every row in the first branch (threshold == n), so
    # the q-divisor below is unreachable; greatest(q, 1) keeps the
    # unreached division well-defined under ANSI. Integer division is
    # spelled (a - pmod(a, b)) / b: the numerator is exactly divisible,
    # so the double division is exact for any n < 2^53 (a bare truncating
    # a/b can be off by one ulp near huge quotients).
    def _idiv(a: Column, b: Column) -> Column:
        return ((a - F.pmod(a, b)) / b).cast("bigint")

    q = _idiv(n, F.lit(k))
    r = F.pmod(n, F.lit(k))
    threshold = r * (q + 1)
    q_safe = F.greatest(q, F.lit(1))
    bucket = F.when(grn <= threshold, _idiv(grn - 1, q + 1) + 1).otherwise(
        r + _idiv(grn - threshold - 1, q_safe) + 1
    )
    out = ranked.withColumn(out_col, bucket.cast("int")).drop(
        "__pid", "__local_rn", "__offset", "__grn", "__n"
    )
    out._graft_persisted = ranked._graft_persisted
    return out


def pareto_frontier_2d(
    points: DataFrame, x: str, y: str, buckets: int = 32
) -> DataFrame:
    """2-D skyline: the DISTINCT ``(x, y)`` points not strictly dominated
    by any other (``x' >= x AND y' >= y`` with at least one strict).

    The quadratic dominance definition collapses to one sorted sweep:
    ordering points by ``(x DESC, y DESC)``, a point is dominated iff the
    running max of ``y`` over STRICTLY preceding points reaches ``y`` —
    every preceding point has larger x, or equal x with larger y, so the
    covering max witness is always a true dominator (and equal (x,y)
    pairs are collapsed by the distinct beforehand).

    Scale shape: the sweep needs a global order, which would be a
    one-task window — so a LOCAL frontier prunes first, partitioned by a
    hash bucket of x: dominance within ANY subset implies global
    dominance, so pruning is sound, and local survivors are at most
    (frontier ∪ per-bucket frontier overlap), typically orders of
    magnitude smaller than n. Only the survivors hit the global window.
    Same two-phase shape as ``distributed_ntile``'s per-partition
    pre-pass. Callers must ensure x/y are non-NULL (NULL orders by
    engine-specific rules).
    """
    pts = points.select(x, y).distinct()
    prev_max = lambda w: F.max(y).over(  # noqa: E731
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    wb = Window.partitionBy("__b").orderBy(F.col(x).desc(), F.col(y).desc())
    local = (
        pts.withColumn("__b", F.pmod(F.hash(F.col(x)), F.lit(buckets)))
        .withColumn("__pm", prev_max(wb))
        .filter(F.col("__pm").isNull() | (F.col("__pm") < F.col(y)))
        .drop("__b", "__pm")
    )
    wg = Window.orderBy(F.col(x).desc(), F.col(y).desc())
    return (
        local.withColumn("__pm", prev_max(wg))
        .filter(F.col("__pm").isNull() | (F.col("__pm") < F.col(y)))
        .drop("__pm")
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = ROW_NUMBER() over the global ``order_by``
    total order — distributed sequential ID assignment (document IDs,
    export line numbers) via the same zipWithIndex shape as
    :func:`distributed_ntile`, steps 1–3: range partition, per-partition
    row_number, lazy per-partition-count offsets (≤ #partitions rows,
    broadcast). No ``Exchange SinglePartition`` on the data path and no
    driver collect; the caller's ordering must be total and non-NULL
    (module docstring contract)."""
    ranked = _ranked_with_offsets(df, order_by, num_partitions, with_total=False)
    out = ranked.withColumn(out_col, F.col("__grn")).drop(
        "__pid", "__local_rn", "__offset", "__grn"
    )
    out._graft_persisted = ranked._graft_persisted
    return out
