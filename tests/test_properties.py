"""Property-based tests (hypothesis): the lenient timestamp parser against
a Python reference implementation of the reference's semantics, and the
merge/dedup algebraic invariants (SURVEY.md §5.3).

Each example batches many generated rows into ONE Spark job so the suite
stays fast (a per-example job would be ~0.3 s each).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.functions.timestamps import parse_timestamp_multi
from fn_rq_report_etl_dev_spark.operators.dedup import latest_per_key
from fn_rq_report_etl_dev_spark.operators.merge import merge_upsert

BASE = datetime(2024, 1, 1)

_dts = st.builds(
    lambda s, us: BASE + timedelta(seconds=s, microseconds=us),
    st.integers(0, 365 * 24 * 3600),
    st.integers(0, 999_999),
)


def _render(dt: datetime, variant: int, frac_digits: int) -> tuple[str, datetime]:
    """Render ``dt`` in one of the reference's accepted shapes and return
    (raw string, expected parse) — expected per rqtradein_etl.py:260-284."""
    frac = f"{dt.microsecond:06d}"[:frac_digits]
    whole = dt.replace(microsecond=0)
    if variant == 0:  # ISO T + fraction + Z
        expected_us = int(frac.ljust(6, "0")) if frac_digits else 0
        raw = f"{whole:%Y-%m-%dT%H:%M:%S}" + (f".{frac}" if frac_digits else "") + "Z"
        return raw, whole.replace(microsecond=expected_us)
    if variant == 1:  # ISO T, no fraction
        return f"{whole:%Y-%m-%dT%H:%M:%S}", whole
    if variant == 2:  # space separator
        return f"{whole:%Y-%m-%d %H:%M:%S}", whole
    if variant == 3:  # space + fraction
        expected_us = int(frac.ljust(6, "0")) if frac_digits else 0
        raw = f"{whole:%Y-%m-%d %H:%M:%S}" + (f".{frac}" if frac_digits else "")
        return raw, whole.replace(microsecond=expected_us)
    return f"not-a-date-{dt.toordinal()}", None  # unparseable → NULL


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(_dts, st.integers(0, 4), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_parser_matches_reference_semantics(spark, cases):
    rows = [_render(dt, variant, frac) for dt, variant, frac in cases]
    df = spark.createDataFrame([(raw,) for raw, _ in rows], "raw string")
    got = [
        r["p"] for r in df.select(parse_timestamp_multi(F.col("raw")).alias("p")).collect()
    ]
    expected = [exp for _, exp in rows]
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=25, unique=True),
    st.lists(st.integers(0, 30), min_size=0, max_size=25, unique=True),
)
def test_merge_invariants(spark, target_keys, source_keys):
    target = spark.createDataFrame(
        [(k, f"t{k}") for k in target_keys], "k long, v string"
    )
    source = spark.createDataFrame(
        [(k, f"s{k}") for k in source_keys], "k long, v string"
    )
    merged = {r["k"]: r["v"] for r in merge_upsert(target, source, "k").collect()}
    # keys = union; source wins on overlap; target rows otherwise untouched
    assert set(merged) == set(target_keys) | set(source_keys)
    for k in merged:
        assert merged[k] == (f"s{k}" if k in source_keys else f"t{k}")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    )
)
def test_dedup_keeps_exactly_the_max_per_key(spark, rows):
    # rows: (key, order_value, unique_tiebreak) — tiebreak made unique
    uniq = [(k, o, i) for i, (k, o, _) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "k long, o long, tid long")
    got = {(r["k"], r["o"], r["tid"]) for r in latest_per_key(df, ["k"], ["o", "tid"]).collect()}
    expected = {}
    for k, o, tid in uniq:
        if k not in expected or (o, tid) > (expected[k][1], expected[k][2]):
            expected[k] = (k, o, tid)
    assert got == set(expected.values())
