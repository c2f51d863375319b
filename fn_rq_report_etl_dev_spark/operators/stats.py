"""Distributed two-sample statistics over a (value, is_current) relation —
the drift tests that classically need a GLOBAL sort (ECDFs, ranks) built
on the bucketed prefix-scan instead of a one-task window.

Both statistics are integer-exact end to end: the KS numerator is
max |cum_ref·N_cur − cum_cur·N_ref| and the rank sum uses DOUBLED average
ranks (2·avg_rank of a tie group = 2·preceding_count + group_size + 1),
so DuckDB oracles replay them bit-for-bit and float association never
matters. Inputs: ``pts`` with a value column (non-NULL, non-NaN — callers
guard) and an indicator column that is 1 for the "current" sample, 0 for
the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scan import bucketed_running_sum, bucketed_running_sums


def ks_statistic(
    pts: DataFrame, v_col: str, cur_col: str, bucket: Column
) -> DataFrame:
    """One row: (n_ref, n_cur, d_num, ks_d) for the two-sample
    Kolmogorov–Smirnov statistic D = max_x |ECDF_ref(x) − ECDF_cur(x)|,
    evaluated at every observed value (ECDFs are step functions, so step
    points suffice). ``d_num`` = the exact integer numerator D·N_ref·N_cur;
    ``ks_d`` is the one boundary division. ``bucket`` must be
    nondecreasing in ``v_col`` (the prefix-scan contract). Both sample
    cumulatives ride ONE ``bucketed_running_sums`` pass — one window
    sort, one summary aggregate, one carry join for the pair."""
    g = pts.groupBy(F.col(v_col).alias("v")).agg(
        F.count(F.when(F.col(cur_col) == 0, 1)).alias("nr"),
        F.count(F.when(F.col(cur_col) == 1, 1)).alias("ncur"),
    )
    c = bucketed_running_sums(
        g, bucket, [F.col("v")], {"cr": F.col("nr"), "cc": F.col("ncur")}
    )
    totals = g.agg(F.sum("nr").alias("tr"), F.sum("ncur").alias("tc"))
    return (
        c.crossJoin(F.broadcast(totals))
        .groupBy("tr", "tc")
        .agg(
            F.max(
                F.abs(F.col("cr") * F.col("tc") - F.col("cc") * F.col("tr"))
            ).alias("d_num")
        )
        .select(
            F.col("tr").cast("bigint").alias("n_ref"),
            F.col("tc").cast("bigint").alias("n_cur"),
            F.col("d_num").cast("bigint").alias("d_num"),
            (
                F.col("d_num").cast("double")
                / (F.col("tr").cast("double") * F.col("tc").cast("double"))
            ).alias("ks_d"),
        )
    )


def chi2_2x2_significant_95(
    n_a: Column, x_a: Column, n_b: Column, x_b: Column
) -> Column:
    """Exact 95% significance bit for a 2×2 Pearson chi-square
    (two-proportion test): χ² ≥ 3.84146 restated without ever computing
    a float —

        χ² = N·(x_a·n_b − x_b·n_a)² / (n_a·n_b·X·(N−X))
        ⟺ 100000·N·D² ≥ 384146·n_a·n_b·X·(N−X)

    with every product in DECIMAL(19/38,0) (exact to 38 digits; DuckDB
    replays the same comparison in auto-promoted HUGEINT). Degenerate
    margins (empty variant, zero or total conversion) are defined as NOT
    significant. Property-tested against a Fraction-exact Python replica
    including counts on both sides of the critical value."""
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    d = dec(x_a) * dec(n_b) - dec(x_b) * dec(n_a)
    x_tot = dec(x_a) + dec(x_b)
    n_tot = dec(n_a) + dec(n_b)
    lhs = F.lit(100000).cast("decimal(19,0)") * n_tot * d * d
    rhs = (
        F.lit(384146).cast("decimal(19,0)")
        * dec(n_a)
        * dec(n_b)
        * x_tot
        * (n_tot - x_tot)
    )
    return (
        F.when(
            (n_a > 0) & (n_b > 0) & (x_tot > 0) & (n_tot - x_tot > 0) & (lhs >= rhs),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )


def mannwhitney_2u(
    pts: DataFrame, v_col: str, cur_col: str, bucket: Column
) -> DataFrame:
    """One row: (n_ref, n_cur, two_ranksum_cur, two_u_cur) for the
    Mann–Whitney U test with average-rank ties, everything doubled to
    stay in integers: a tie group of size cnt whose values follow b
    earlier observations has 2·avg_rank = 2b + cnt + 1, and
    two_u_cur = 2·ranksum_cur − n_cur·(n_cur + 1) = 2·U_cur."""
    g = pts.groupBy(F.col(v_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.when(F.col(cur_col) == 1, 1)).alias("ncur"),
    )
    c = bucketed_running_sum(g, bucket, [F.col("v")], F.col("cnt"), "cum")
    totals = g.agg(
        (F.sum("cnt") - F.sum("ncur")).alias("tr"), F.sum("ncur").alias("tc")
    )
    return (
        c.crossJoin(F.broadcast(totals))
        .groupBy("tr", "tc")
        .agg(
            F.sum(
                F.col("ncur")
                * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
            ).alias("two_ranksum_cur")
        )
        .select(
            F.col("tr").cast("bigint").alias("n_ref"),
            F.col("tc").cast("bigint").alias("n_cur"),
            F.col("two_ranksum_cur").cast("bigint").alias("two_ranksum_cur"),
            (
                F.col("two_ranksum_cur") - F.col("tc") * (F.col("tc") + 1)
            ).cast("bigint").alias("two_u_cur"),
        )
    )
