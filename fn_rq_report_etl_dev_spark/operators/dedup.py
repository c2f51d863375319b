"""Window dedup: keep the latest row per key.

≙ the reference's ``DedupedSource`` CTE (``rqtradein_etl.py:166-171``):
``ROW_NUMBER() OVER (PARTITION BY SaleInvoiceID ORDER BY TradeInDate DESC)``
filtered to ``rn = 1``. The reference's ordering is nondeterministic on
``TradeInDate`` ties; this implementation requires explicit tiebreakers so
output is reproducible (SURVEY.md §2 O15 note).

Physical shape: one hash exchange on the keys + per-partition sort + a
single-pass window — the minimal plan for top-1-per-key. At scale, if the
downstream merge joins on the same key, Catalyst reuses this exchange (the
join's required distribution is already satisfied), so dedup+merge costs one
shuffle of the source, not two.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    descending: bool = True,
    n_salts: int | None = None,
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    ``order_by`` entries given as strings are ordered descending-nulls-last
    when ``descending`` (the "latest wins" policy); pass Columns for custom
    ordering. Supply at least one unique column (e.g. a transaction id) for
    deterministic ties.

    ``n_salts`` enables the skew-safe two-phase form: phase 1 takes the
    top-1 per (keys, salt) — a hot key's rows spread over ``n_salts``
    window partitions instead of one reducer — and phase 2 re-ranks the
    ≤ ``n_salts`` phase-1 winners per key. Because phase 2 re-applies the
    SAME total order over every phase-1 winner and the true top-1 row wins
    its salt group no matter which salt it drew, the result is identical
    to the unsalted form for any salt assignment (asserted in tests).
    Phase 2's input is ~|keys| × n_salts rows, so its shuffle is noise.

    When to salt (measured, SCALING.md §skew): on Spark ≥3.5 the default
    ``InferWindowGroupLimit`` rule already pre-reduces the rn=1 filter
    map-side, making the unsalted form skew-safe — leave ``n_salts=None``.
    Salting wins (5.4× on a 90%-one-key table) only where that rule can't
    fire: older engines, or window shapes needing more than a top-N prefix.
    """
    ordering = [
        (F.col(c).desc_nulls_last() if descending else F.col(c).asc_nulls_first())
        if isinstance(c, str) else c
        for c in order_by
    ]
    if n_salts is not None and n_salts > 1:
        salt = (F.rand(seed=0) * n_salts).cast("int")
        w1 = Window.partitionBy(*[F.col(k) for k in keys], F.col("__salt")).orderBy(
            *ordering
        )
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__salt")
        )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
