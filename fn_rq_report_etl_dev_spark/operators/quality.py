"""Data-quality constraint checking — the validation gate between pipeline
stages (the reference has only implicit quality handling: lenient casts +
parse-failure warnings; a real pipeline needs explicit, queryable checks).

``constraint_report`` evaluates all rules in ONE aggregation pass over the
data (each rule is a conditional count — no per-rule scans), so the cost at
100 TB is one scan + a scalar result regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column  # boolean column: True = row violates the rule


# NULL policy (uniform): only ``not_null`` counts NULL as a violation.
# Every value-shape rule (in_range / matches / accepted_values) exempts
# NULLs, so composing not_null + a shape rule on the same column never
# double-counts a NULL row — each rule reports one distinct defect.


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"{col}_in_range", F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"{col}_matches",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"{col}_accepted",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def constraint_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows, violation_rate).
    Single scan, map-side partial aggregation."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.count(F.when(r.violation, 1)).alias(r.name) for r in rules
    ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "__n",
        "stack({n}, {pairs}) AS (rule, n_violations)".format(
            n=len(rules),
            pairs=", ".join(f"'{r.name}', {r.name}" for r in rules),
        ),
    )
    return stacked.select(
        "rule",
        "n_violations",
        F.col("__n").alias("n_rows"),
        (F.col("n_violations").cast("double") / F.col("__n")).alias("violation_rate"),
    )


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once: (keys..., n_occurrences)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )
