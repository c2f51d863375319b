"""Opt-in audit sweeps (VERDICT r04 #6): the empty-corpus, NULL-injection,
varied-parallelism-determinism, adversarial-Unicode, adversarial-float and
extreme-date audits as pytest targets, so one command (`pytest -m audit`)
runs the round's adversarial sweeps at sf0.001.

Deselected by default via pytest.ini's `addopts = -m "not audit"` — the
sweeps re-run every registered query against mutated corpora (~6-9 min
total), which would triple the default suite's wall time. `pytest -m audit`
overrides the addopts -m (later flag wins) and runs exactly these.

Each audit runs as a SUBPROCESS: the scripts build their own SparkSession
with audit-specific configs (tiny shuffle partitions, varied master), which
must not collide with the session-scoped fixture JVM of a concurrent
default run.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.audit

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, env: dict[str, str] | None = None, timeout: int = 540) -> str:
    e = {**os.environ, **(env or {})}
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, script)],
        env=e,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=ROOT,
    )
    assert p.returncode == 0, (
        f"{script} exited {p.returncode}\n"
        f"--- stdout tail ---\n{p.stdout[-4000:]}\n"
        f"--- stderr tail ---\n{p.stderr[-2000:]}"
    )
    return p.stdout


def test_empty_corpus_audit():
    """Every registered query must run (not crash) on a zero-row corpus —
    empty partitions/days/filters are routine at 100 TB."""
    out = _run("scripts_empty_audit.py")
    assert "audit: 0 failures" in out


def test_null_injection_audit():
    """Every oracle-checked query must still hash-match DuckDB on a corpus
    with 10% deterministic NULLs in non-key columns (3VL seams)."""
    out = _run("scripts_null_audit.py")
    assert "null audit: 0 failures" in out


def test_null_injection_audit_with_key_nulling():
    """Second pass with join/group-key columns also nulled
    (SPARK_NULL_KEYS=1) — the NULL-equality seams: equi-join drops,
    GROUP BY NULL groups, eqNullSafe paths."""
    out = _run("scripts_null_audit.py", env={"SPARK_NULL_KEYS": "1"})
    assert "null audit: 0 failures" in out


def test_determinism_under_varied_parallelism():
    """Driver-sim at sf0.001 under a deliberately odd task split
    (local[3], 7 shuffle partitions): every oracle hash must be
    independent of partition/shuffle order."""
    out = _run(
        "scripts_driver_sim.py",
        env={
            "SPARK_SIM_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_SIM_MASTER": "local[3]",
            "SPARK_SIM_SHUFFLE": "7",
        },
    )
    assert '"bad": 0' in out


def test_unicode_injection_audit():
    """Every oracle-checked query must still hash-match DuckDB on a corpus
    with 10% adversarial-Unicode mutations in the text-bearing columns
    (case-fold, \\b, codepoint-count and BLOB-cast seams between the JVM
    and utf8proc/RE2 — the round-5 sweep that forced the engine-wide
    ASCII-fold tokenization policy)."""
    out = _run("scripts_unicode_audit.py")
    assert "unicode audit: 0 failures" in out


def test_float_injection_audit():
    """Every oracle-checked query must still hash-match DuckDB on a corpus
    with IEEE-754 edge values (NaN, +/-Inf, -0.0, ~1.7e308, subnormals) in
    the telemetry doubles and poisoned embedding elements — the round-5
    sweep behind the finite-vector ANN contract, the bounded-money guards
    and the -0.0 group-key normalization."""
    out = _run("scripts_float_audit.py")
    assert "float audit: 0 failures" in out


def test_date_injection_audit():
    """Every oracle-checked query must still hash-match DuckDB on a corpus
    with calendar boundary values (proleptic year 1, Gregorian-cutover
    eve, pre-epoch, leap day, year-9999 sentinels) in the relational date
    columns — the round-5 sweep behind the interval-overflow guard and
    the make_timestamp_ntz month-start (Spark's date_trunc/LTZ collect
    path cannot represent year-1 results)."""
    out = _run("scripts_date_audit.py")
    assert "date audit: 0 failures" in out
