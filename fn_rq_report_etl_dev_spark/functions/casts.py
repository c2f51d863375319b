"""Lenient (null-on-error) cast layer for the staging→target boundary.

The reference relies on SQL Server's implicit VARCHAR→INT/DECIMAL/DATETIME
coercion inside its MERGE (``rqtradein_etl.py:165-184`` against the DDL at
``:98-146``). Spark 4 runs ANSI mode by default, where a bad cast throws —
so the engine uses ``try_cast`` explicitly: garbage input becomes NULL, the
row survives, matching the reference's lenient behavior (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timestamps import parse_timestamp_multi


def lenient_cast(col: Column, sql_type: str) -> Column:
    """try_cast to ``sql_type``; timestamps go through the multi-format
    lenient parser instead of the single-format ANSI cast."""
    if sql_type == "timestamp":
        return parse_timestamp_multi(col.cast("string"))
    return col.cast("string").try_cast(sql_type)


def apply_type_map(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    """Project ``df`` onto ``type_map``'s columns with lenient casts.

    Columns absent from ``df`` become typed NULLs (the reference's
    ``row.get(col, None)`` projection contract, rqtradein_etl.py:338).
    """
    cols = []
    for name, sql_type in type_map.items():
        if name in df.columns:
            cols.append(lenient_cast(F.col(name), sql_type).alias(name))
        else:
            cols.append(F.lit(None).cast(sql_type).alias(name))
    return df.select(*cols)
