"""Slowly-changing-dimension Type-2 merge: versioned history with
``valid_from`` / ``valid_to`` / ``is_current`` columns.

The reference's MERGE (rqtradein_etl.py:160-184) overwrites matched rows,
losing prior attribute values; the SCD2 variant is the standard warehouse
answer when history must be queryable ("what was this trade-in's status
last week?"). Semantics per source row against the CURRENT version:

- attribute change → close the old version (``valid_to = now``,
  ``is_current = false``) AND insert a new current version;
- no change       → keep the current version untouched;
- no current row  → insert the first version;
- current rows absent from the source stay current (a snapshot source
  only asserts what it contains).

Plan shape: ONE full-outer join of current versions with the (key-unique)
source; each joined row conditionally emits 1-2 output rows through an
``explode`` of a conditional struct array — no per-branch re-joins, no
persist, a single pass. Closed history rows pass through a disjoint
filter union. At 100 TB this is the same single-shuffle profile as
``merge_upsert``, and the history table partitions naturally by
``is_current`` (current slice stays merge-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD_FROM = "valid_from"
SCD_TO = "valid_to"
SCD_CURRENT = "is_current"

_S_MARK = "__scd_src"
_T_MARK = "__scd_tgt"


def merge_scd2(
    history: DataFrame,
    source: DataFrame,
    key: str,
    change_cols: list[str],
    now: Column,
    effective: Column | None = None,
) -> DataFrame:
    """Merge a key-unique ``source`` snapshot into an SCD2 ``history``.

    ``history`` columns: ``key``, the attribute columns, ``valid_from``
    (timestamp), ``valid_to`` (timestamp, NULL while current),
    ``is_current`` (boolean). ``source``: ``key`` + attribute columns.
    ``now`` stamps ``valid_to`` on closed versions; ``effective``
    (default ``now``) stamps ``valid_from`` on new versions. Attribute
    comparison is null-safe (NULL → NULL is "no change").
    """
    if effective is None:
        effective = now
    attrs = [c for c in source.columns if c != key]

    cur = history.filter(F.col(SCD_CURRENT)).withColumn(_T_MARK, F.lit(True))
    past = history.filter(~F.col(SCD_CURRENT))

    s = source.withColumn(_S_MARK, F.lit(True))
    j = cur.alias("t").join(s.alias("s"), on=key, how="full_outer")
    t_present = F.col(_T_MARK).isNotNull()
    s_present = F.col(_S_MARK).isNotNull()
    changed = F.lit(False)
    for c in change_cols:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))

    def _row(
        side: str, valid_from: Column, valid_to: Column, is_current: Column
    ) -> Column:
        cols = [F.col(key).alias(key)]
        cols += [F.col(f"{side}.{c}").alias(c) for c in attrs]
        cols += [
            valid_from.alias(SCD_FROM),
            valid_to.alias(SCD_TO),
            is_current.alias(SCD_CURRENT),
        ]
        return F.struct(*cols)

    kept = _row("t", F.col(f"t.{SCD_FROM}"), F.col(f"t.{SCD_TO}"), F.lit(True))
    closed = _row("t", F.col(f"t.{SCD_FROM}"), now, F.lit(False))
    opened = _row("s", effective, F.lit(None).cast("timestamp"), F.lit(True))

    emitted = (
        F.when(t_present & s_present & changed, F.array(closed, opened))
        .when(t_present & s_present, F.array(kept))
        .when(s_present, F.array(opened))
        .otherwise(F.array(kept))  # current version untouched by snapshot
    )
    out = j.select(F.explode(emitted).alias("r")).select("r.*")
    return out.unionByName(past.select(*out.columns))
