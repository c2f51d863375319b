"""Physical-plan assertions — make "did the filter push down?" testable.

The 100 TB design rules (SURVEY.md §4) only hold if the plans actually have
the right shape; these helpers let tests pin that shape so regressions are
caught at sf0.001, not on the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan reports at least one pushed filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the scan actually reads (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            struct = line.split("struct<", 1)
            if len(struct) == 2:
                body = struct[1].rsplit(">", 1)[0]
                cols.extend(f.split(":")[0] for f in body.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = better).
    Formatted explain lists operators as '(n) Exchange' with arguments in
    the footer, so match the operator line."""
    import re

    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))
