"""Keyed merge/upsert (MERGE INTO) as a pure-Spark full-outer-join rewrite.

≙ the reference's T-SQL ``MERGE api.RQTradeinReport`` (rqtradein_etl.py:160-184):
  - MATCHED      → take every source column, stamp the updated-audit column
  - NOT MATCHED  → insert the source row, stamp the inserted-audit column
  - target-only  → keep the target row untouched

Vanilla Spark has no MERGE against Parquet, so this is the join rewrite from
SURVEY.md §4.1(b): a full-outer join on the key plus per-column
``when(source present, source).otherwise(target)``. Physically a single
shuffle on the key (sort-merge join, or broadcast-hash when one side is
small — AQE decides at runtime); the result is written atomically by the
pipeline layer. Idempotence: re-merging an identical batch yields an
identical table (update branch rewrites equal values).

The merge key must be unique on BOTH sides — run ``dedup.latest_per_key``
on the source first, exactly as the reference dedups its staging CTE before
MERGE (a duplicate-key source makes T-SQL MERGE fail too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker column recording what the merge did to each row; droppable.
MERGE_ACTION = "__merge_action"
_S_MARK = "__src_present"
_T_MARK = "__tgt_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    audit_inserted: str | None = None,
    audit_updated: str | None = None,
    now: Column | None = None,
    keep_action: bool = False,
    spread_null_keys: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on equi-key ``key``.

    Output columns = target's data columns (+ audit columns if named,
    + ``__merge_action`` if ``keep_action``). ``now`` is the audit
    timestamp — injectable for deterministic tests; defaults to
    ``current_timestamp()`` (the reference's ``GETDATE()``).

    NULL-key skew: an equi-join never matches NULL = NULL, but every
    NULL-key row still hashes to the SAME shuffle partition, so a
    null-heavy side (the classic dirty-feed pathology) melts one reducer.
    ``spread_null_keys=True`` routes NULL-key rows around the join:
    target NULLs pass through as 'keep' rows and source NULLs as 'insert'
    rows — exactly what the outer join would emit for them — union'ed
    with the non-null join, which no longer receives a NULL partition at
    all. Opt-in, not default: the bypass branches re-evaluate each side's
    upstream under pushed-down IS NULL / IS NOT NULL predicates (two
    extra cheap scans, no extra shuffles), which breaks dedup-exchange
    reuse on the merge path — worth it only when the feed actually
    carries a meaningful NULL fraction (persist the deduped source first
    at scale to make the branches metadata-cheap).
    """
    if now is None:
        now = F.current_timestamp()
    if spread_null_keys and (
        target.schema[key].nullable or source.schema[key].nullable
    ):
        core = _merge_core(
            target.filter(F.col(key).isNotNull()),
            source.filter(F.col(key).isNotNull()),
            key=key,
            audit_inserted=audit_inserted,
            audit_updated=audit_updated,
            now=now,
            keep_action=keep_action,
        )
        audit_cols = {c for c in (audit_inserted, audit_updated) if c}
        data_cols = [c for c in source.columns if c != key and c not in audit_cols]
        target_only = [
            c for c in target.columns
            if c != key and c not in audit_cols and c not in source.columns
        ]

        t_out: list[Column] = [F.col(key)]
        t_out += [
            (F.col(c) if c in target.columns else F.lit(None)).alias(c)
            for c in data_cols
        ]
        t_out += [F.col(c) for c in target_only]
        if audit_inserted:
            t_out.append(
                (
                    F.col(audit_inserted)
                    if audit_inserted in target.columns
                    else F.lit(None).cast("timestamp")
                ).alias(audit_inserted)
            )
        if audit_updated:
            t_out.append(
                (
                    F.col(audit_updated)
                    if audit_updated in target.columns
                    else F.lit(None).cast("timestamp")
                ).alias(audit_updated)
            )
        if keep_action:
            t_out.append(F.lit("keep").alias(MERGE_ACTION))

        s_out: list[Column] = [F.col(key)]
        s_out += [F.col(c) for c in data_cols]
        s_out += [F.lit(None).alias(c) for c in target_only]
        if audit_inserted:
            s_out.append(now.alias(audit_inserted))
        if audit_updated:
            s_out.append(F.lit(None).cast("timestamp").alias(audit_updated))
        if keep_action:
            s_out.append(F.lit("insert").alias(MERGE_ACTION))

        types = {f.name: f.dataType for f in core.schema.fields}
        t_by = (
            target.filter(F.col(key).isNull())
            .select(*t_out)
            .select(*[F.col(c).cast(types[c]).alias(c) for c in core.columns])
        )
        s_by = (
            source.filter(F.col(key).isNull())
            .select(*s_out)
            .select(*[F.col(c).cast(types[c]).alias(c) for c in core.columns])
        )
        return core.unionByName(t_by).unionByName(s_by)
    return _merge_core(
        target,
        source,
        key=key,
        audit_inserted=audit_inserted,
        audit_updated=audit_updated,
        now=now,
        keep_action=keep_action,
    )


def _merge_core(
    target: DataFrame,
    source: DataFrame,
    *,
    key: str,
    audit_inserted: str | None,
    audit_updated: str | None,
    now: Column,
    keep_action: bool,
) -> DataFrame:
    """The full-outer-join MERGE rewrite proper (see module docstring)."""
    audit_cols = {c for c in (audit_inserted, audit_updated) if c}
    data_cols = [c for c in source.columns if c != key and c not in audit_cols]
    # Target-only columns survive the merge: kept on matched/target rows,
    # NULL on inserts (the T-SQL MERGE's UPDATE only touches listed
    # columns). Without this they'd vanish from the rewritten table.
    target_only = [
        c for c in target.columns
        if c != key and c not in audit_cols and c not in source.columns
    ]

    t = target.withColumn(_T_MARK, F.lit(True)).alias("t")
    s = source.withColumn(_S_MARK, F.lit(True)).alias("s")
    # String-key join => Spark emits one coalesced key column in full outer.
    joined = t.join(s, on=key, how="full_outer")

    s_present = F.col(_S_MARK).isNotNull()
    t_present = F.col(_T_MARK).isNotNull()

    out: list[Column] = [F.col(key)]
    for c in data_cols:
        # Source-only columns have no target side to fall back to.
        fallback = F.col(f"t.{c}") if c in target.columns else F.lit(None)
        out.append(F.when(s_present, F.col(f"s.{c}")).otherwise(fallback).alias(c))
    for c in target_only:
        out.append(F.when(t_present, F.col(f"t.{c}")).otherwise(F.lit(None)).alias(c))

    if audit_inserted:
        existing = (
            F.col(f"t.{audit_inserted}")
            if audit_inserted in target.columns
            else F.lit(None).cast("timestamp")
        )
        out.append(F.when(t_present, existing).otherwise(now).alias(audit_inserted))
    if audit_updated:
        existing = (
            F.col(f"t.{audit_updated}")
            if audit_updated in target.columns
            else F.lit(None).cast("timestamp")
        )
        out.append(
            F.when(t_present & s_present, now).otherwise(existing).alias(audit_updated)
        )
    if keep_action:
        out.append(
            F.when(t_present & s_present, F.lit("update"))
            .when(s_present, F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias(MERGE_ACTION)
        )
    return joined.select(*out)


def merge_counts(merged_with_action: DataFrame) -> dict[str, int]:
    """Inserted/updated tallies from a ``keep_action=True`` merge result.

    ≙ the reference's post-merge audit counts (rqtradein_etl.py:188-189) —
    computed from the merge itself rather than re-scanning the target with
    the reference's midnight-equality quirk (SURVEY.md §2 O18).
    """
    row = (
        merged_with_action.agg(
            F.count(F.when(F.col(MERGE_ACTION) == "insert", 1)).alias("inserted"),
            F.count(F.when(F.col(MERGE_ACTION) == "update", 1)).alias("updated"),
        )
    ).collect()[0]
    return {"inserted": row["inserted"], "updated": row["updated"]}


def merge_upsert_delta(
    spark,
    target_path: str,
    source: DataFrame,
    key: str,
    audit_inserted: str | None = None,
    audit_updated: str | None = None,
) -> None:
    """Delta Lake backend for the same merge contract (SURVEY.md §4.1(a)):
    ``DeltaTable.merge`` gives transactional MERGE INTO with file-level
    conflict detection — the production choice when the delta-spark jars
    are on the classpath. Import-gated: this environment ships plain
    parquet only, so calling it without delta installed raises with a
    pointer to the join-rewrite backend above. (Install re-attempted and
    still impossible as of round 9, 2026-08-16: the sandbox has no
    package-index network route — pip retries end in NewConnectionError.)
    """
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415
    except ImportError as exc:
        raise ImportError(
            "delta-spark is not installed; use merge_upsert() (the pure-Spark "
            "full-outer-join rewrite) or add delta jars to the session"
        ) from exc

    target = DeltaTable.forPath(spark, target_path)
    cond = f"t.{key} = s.{key}"
    update_set = {c: f"s.{c}" for c in source.columns if c != key}
    insert_set = dict(update_set) | {key: f"s.{key}"}
    if audit_updated:
        update_set[audit_updated] = "current_timestamp()"
    if audit_inserted:
        insert_set[audit_inserted] = "current_timestamp()"
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdate(set=update_set)
        .whenNotMatchedInsert(values=insert_set)
        .execute()
    )
