"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew; salting is the explicit fallback for pathological key
distributions — e.g. a null-heavy merge key or one customer owning 30% of
events — where a single reducer would otherwise receive the whole hot key.

Both helpers are algebraic rewrites: results are identical to the unsalted
form (asserted in tests), only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase decomposable aggregation: partial sums over (keys, salt)
    spread a hot key across ``n_salts`` reducers, then the tiny partial
    table re-aggregates. Returns (keys..., total, n_rows)."""
    salted = df.withColumn(SALT_COL, (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.sum(value_col).alias("__psum"), F.count(F.lit(1)).alias("__pn")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("total"), F.sum("__pn").alias("n_rows")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a random
    salt; the (smaller) right side is replicated once per salt value, so
    every salted partition can satisfy the join locally. Output equals the
    plain join on ``key``; right-side rows are replicated ``n_salts``×, so
    keep the right side the smaller input.

    Only inner/left_semi/left/cross preserve plain-join semantics: for
    right/full outer joins an unmatched right row would surface once per
    replica, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            "are replicated n_salts times under right/full outer semantics"
        )
    salted_left = left.withColumn(SALT_COL, (F.rand(seed=0) * n_salts).cast("int"))
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)
