"""Dtype alignment between every Spark workload and its DuckDB oracle —
the driver's schema comparison must never see int-vs-bigint (or worse,
HUGEINT) divergence. DuckDB's integer-returning functions (row_number,
length, levenshtein, year, sum-of-int → HUGEINT...) are wider than
Spark's; workloads cast to BIGINT where needed."""

from __future__ import annotations

import pytest

from fn_rq_report_etl_dev_spark.workloads import EAGER_SCHEMAS, ORACLES, QUERIES
from tests.conftest import duck_connection


def _schema_fields(name, spark, sf_dir):
    """(name, simpleString-dtype) pairs WITHOUT executing eager builders:
    workloads whose construction already runs Spark jobs (streaming
    drains, k-means, label propagation) declare their schema in
    EAGER_SCHEMAS; tests/test_oracle_parity.py verifies declared==actual
    when it executes them anyway (ADVICE r03)."""
    from pyspark.sql import types as T

    if name in EAGER_SCHEMAS:
        return list(T.StructType.fromDDL(EAGER_SCHEMAS[name]).fields)
    return list(QUERIES[name](spark, sf_dir).schema.fields)

EQUIV = {
    ("bigint", "BIGINT"), ("int", "INTEGER"), ("double", "DOUBLE"),
    ("string", "VARCHAR"), ("timestamp", "TIMESTAMP"), ("date", "DATE"),
    ("boolean", "BOOLEAN"), ("float", "FLOAT"),
    # parquet TIMESTAMP(isAdjustedToUTC=false) reads as NTZ in Spark; the
    # naive instants are identical to DuckDB's TIMESTAMP.
    ("timestamp_ntz", "TIMESTAMP"),
    ("array<int>", "INTEGER[]"), ("array<bigint>", "BIGINT[]"),
    ("array<double>", "DOUBLE[]"), ("array<string>", "VARCHAR[]"),
    ("array<float>", "FLOAT[]"),
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_output_dtypes_align(name, spark, sf_dir, duck):
    st = {
        f.name.lower(): f.dataType.simpleString()
        for f in _schema_fields(name, spark, sf_dir)
    }
    dt = {r[0].lower(): r[1] for r in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()}
    mismatches = []
    for col, s in st.items():
        d = dt.get(col, "MISSING")
        if s.startswith("decimal") and d.startswith("DECIMAL"):
            continue
        if (s, d) not in EQUIV:
            mismatches.append((col, s, d))
    assert not mismatches, f"{name}: {mismatches}"


def test_registry_rotation_prioritizes_unverified():
    """Dict order = recheck, then never-green-in-any-driver-report, then
    settled-green LRU (oldest latest-verdict round first) — so a 50-entry
    driver cap always lands on the queries that most need a verdict. The
    expected green map is derived the SAME way the rotation derives it
    (_driver_green_rounds globs every CORRECTNESS_r*.json), so this test
    stays correct as new rounds land their reports."""
    from fn_rq_report_etl_dev_spark.workloads import (
        _RECHECK,
        QUERIES,
        _active_recheck,
        _driver_green_rounds,
    )

    names = list(QUERIES)
    assert len(names) == len(set(names))
    green_rounds = _driver_green_rounds()
    active = _active_recheck(_RECHECK, green_rounds)
    # active recheck first, in order
    assert names[: len(active)] == [n for n in active if n in QUERIES]
    # every settled-green query sorts after every fresh query
    settled = [
        n for n in names if n in green_rounds and n not in active
    ]
    fresh_pos = [
        names.index(n)
        for n in names
        if n not in green_rounds and n not in active
    ]
    if settled and fresh_pos:
        assert names.index(settled[0]) > max(fresh_pos)
    # LRU within settled: latest-verdict rounds are non-decreasing — a
    # query verified last in r01 MUST front one verified in r06
    # (VERDICT r06 ask #1).
    settled_rounds = [green_rounds[n] for n in settled]
    assert settled_rounds == sorted(settled_rounds), (
        "settled queries not in oldest-verdict-first (LRU) order"
    )


def test_rotation_cycles_whole_registry_within_cycle_bound():
    """Staleness guarantee (VERDICT r06 ask #1): simulate the driver
    forward from the LIVE green-round state — each simulated round
    reports the first 50 registry entries green (the observed driver
    cap) and the rotation reorders on the updated map. With LRU settled
    ordering, EVERY registered query must receive a fresh verdict within
    ceil(N/50) = 4 simulated rounds, and in steady state no query's
    verdict is ever staler than 4 rounds."""
    import math

    from fn_rq_report_etl_dev_spark.workloads import (
        _RECHECK,
        QUERIES,
        _active_recheck,
        _driver_green_rounds,
        _ordered_names,
    )

    names = list(QUERIES)
    green_rounds = dict(_driver_green_rounds())
    cycle = math.ceil(len(names) / 50)
    # 201 queries since r10 (the incremental flagship + frame-level video
    # dedup) -> the steady-state staleness bound is ceil(N/50) = 5 rounds.
    # Keep a hard ceiling so unbounded registry growth can't silently
    # stretch verdict staleness past what a judge can re-check.
    assert cycle <= 5, f"registry outgrew the 5-round cycle: {len(names)}"
    current = max(green_rounds.values(), default=0)
    # consumed by the first simulated round
    recheck = _active_recheck(_RECHECK, green_rounds)
    last_seen = dict(green_rounds)
    for step in range(1, 13):
        rnd = current + step
        window = _ordered_names(names, last_seen, recheck)[:50]
        recheck = []
        for n in window:
            last_seen[n] = rnd
        if step >= cycle:
            # transient drained: every query has a verdict and none is
            # staler than `cycle` rounds.
            stale = [
                n for n in names if rnd - last_seen.get(n, -(10**6)) >= cycle + 1
            ]
            assert not stale, (
                f"round {rnd}: verdicts staler than {cycle} rounds: {stale}"
            )


def test_recheck_auto_settles_on_post_change_green():
    """_RECHECK hygiene is mechanical, not manual (VERDICT r07 nit #1):
    an entry carries the round its change landed and is ACTIVE only
    until a driver verdict from that round or later is green. A green
    verdict from an EARLIER round (it predates the change) must NOT
    settle it, and a red/absent verdict keeps it active."""
    from fn_rq_report_etl_dev_spark.workloads import _active_recheck

    recheck = {"a": 8, "b": 8, "c": 8, "d": 7}
    greens = {
        "a": 8,   # green at the change round -> settled
        "b": 7,   # green only BEFORE the change -> still active
        "d": 9,   # green after the change round -> settled
        # "c" never green -> active
    }
    assert _active_recheck(recheck, greens) == ["b", "c"]
    # all-settled: the window is spent entirely on the LRU tail
    assert _active_recheck({"a": 8, "d": 7}, greens) == []
    # live invariant: every CURRENT entry's change round is the round in
    # flight (no green report committed yet), so none can be mis-settled
    from fn_rq_report_etl_dev_spark.workloads import (
        _RECHECK,
        _driver_green_rounds,
    )

    live_green = _driver_green_rounds()
    latest_report = max(live_green.values(), default=0)
    for name, rnd in _RECHECK.items():
        assert rnd > latest_report or live_green.get(name, 0) >= rnd or (
            name in _active_recheck(_RECHECK, live_green)
        )


def test_every_entry_driver_reported_or_in_recheck():
    """Rotation-coverage guard (VERDICT r05 ask #8): with 171 queries and
    a 50-slot driver cap, full driver coverage takes multiple rounds — a
    query added mid-round that is neither in any pinned CORRECTNESS
    report NOR in _RECHECK can silently miss the next driver run (this
    happened in r05: basket_brand_pairs, profile_column_stats and
    scd2_point_in_time_join were added after the driver run and were not
    fronted). Invariants:

    1. every registered query has a row in SOME committed driver report
       or is listed in _RECHECK (the workflow rule: new/changed queries
       go straight into _RECHECK);
    2. _RECHECK itself fits the 50-slot window (an oversized _RECHECK
       pushes never-reported entries out of the window — the r05 failure
       mode, when 85 recheck entries crowded out the three additions);
    3. every _RECHECK name actually exists in the registry (typo guard —
       a misspelled entry would silently front nothing).
    """
    import json
    import os

    from fn_rq_report_etl_dev_spark.workloads import (
        _RECHECK,
        _REPO_ROOT,
        QUERIES,
    )

    reported: set[str] = set()
    for path in sorted(
        os.path.join(_REPO_ROOT, f)
        for f in os.listdir(_REPO_ROOT)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    ):
        with open(path, encoding="utf-8") as fh:
            reported.update(json.load(fh))

    assert set(_RECHECK) <= set(QUERIES), sorted(set(_RECHECK) - set(QUERIES))
    assert len(_RECHECK) <= 50, "oversized _RECHECK crowds the driver window"
    untracked = [
        n for n in QUERIES if n not in reported and n not in set(_RECHECK)
    ]
    assert not untracked, (
        f"never driver-reported and not in _RECHECK: {untracked}"
    )


def _green_from_reports(paths):
    """Green-round map derived from an explicit, frozen list of report
    files — rotation simulations must NEVER call the live
    _driver_green_rounds() (which globs every CORRECTNESS_r*.json on
    disk), or the simulation's premise silently changes the moment the
    next round's report lands (VERDICT r03 'What's wrong' #1)."""
    import json
    import re

    rounds: dict[str, int] = {}
    for path in paths:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path, encoding="utf-8") as fh:
            report = json.load(fh)
        for name, row in report.items():
            ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if ok:
                rounds[name] = max(rounds.get(name, 0), rnd)
    return rounds


def test_rotation_fronts_unverified_tpch_under_frozen_r02_reports():
    """Simulate the round-3 state with FROZEN inputs: greens = every
    green row in the literal r01+r02 report files only, and the registry
    = the round-3 registry RECONSTRUCTED from the pinned report files
    (r01+r02 greens ∪ r03's reported names — every query that provably
    existed then). The 11 TPC-H entries with no verdict at that point
    plus the 4 r02-red (since fixed) queries must ALL land inside the
    driver's 50-slot window. Both inputs are pinned files, so the
    simulation is immune to later registry growth (the first version of
    this test used the LIVE registry and broke as soon as enough
    alphabetically-early queries were added in round 5)."""
    import json
    import os

    from fn_rq_report_etl_dev_spark.workloads import (
        _REPO_ROOT,
        _ordered_names,
    )

    frozen = [
        os.path.join(_REPO_ROOT, "CORRECTNESS_r01.json"),
        os.path.join(_REPO_ROOT, "CORRECTNESS_r02.json"),
    ]
    green = _green_from_reports(frozen)
    with open(
        os.path.join(_REPO_ROOT, "CORRECTNESS_r03.json"), encoding="utf-8"
    ) as fh:
        r03_names = list(json.load(fh))
    registry_r03 = sorted(set(green) | set(r03_names))
    ordered = _ordered_names(registry_r03, green, recheck=[])
    window = set(ordered[:50])
    must_verify = {
        "q8_market_share", "q9_product_profit", "q10_returned_items",
        "q12_late_shipment_priority", "q14_promo_revenue",
        "q15_top_supplier", "q16_part_supplier_counts",
        "q17_small_quantity_revenue", "q19_disjunctive_revenue",
        "q21_waiting_suppliers", "q22_dormant_customers",
        "approx_quantiles_price", "array_hof_showcase",
        "cdc_snapshot_diff", "lateral_nation_customer_stats",
    }
    missing = must_verify - window
    assert not missing, f"outside the 50-slot driver window: {missing}"


def test_no_driver_unhashable_output_types(spark, sf_dir):
    """Schema lint (VERDICT r02): the driver canonicalizes results with
    pandas sort_values + hash, which crashes on array/map/struct cells and
    hash-diverges on Decimal vs DuckDB's float. No registered query may
    expose such a column — operators can use complex types internally, but
    registered outputs must flatten (to_json / array_join / element_at)
    and cast money to DOUBLE."""
    offenders = []
    for name in QUERIES:
        for f in _schema_fields(name, spark, sf_dir):
            s = f.dataType.simpleString()
            if s.startswith(("array", "map", "struct", "decimal")):
                offenders.append((name, f.name, s))
    assert not offenders, f"driver-unhashable output columns: {offenders}"
