"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the pattern for semantics Spark's built-in
streaming aggregations can't express (arbitrary per-key state machines).

Batch counterpart: ``workloads.relational.sessionize_events`` (lag +
cumulative sum). Here the session state (start, last-seen, count) lives in
the state store keyed by user, survives across micro-batches, and closed
sessions are emitted in append mode. State is bounded: one fixed-width
tuple per active user, and processing-time timeout flushes idle users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.TimestampType(), True),
    T.StructField("session_end", T.TimestampType(), True),
    T.StructField("n_events", T.LongType(), True),
])

# (session_start_us, last_seen_us, n_events) — epoch microseconds.
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), True),
    T.StructField("last_us", T.LongType(), True),
    T.StructField("n", T.LongType(), True),
])


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def sessionize_with_state(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Emit (user_id, session_start, session_end, n_events) for every
    session closed by a gap > ``gap_minutes`` — and, when
    ``idle_timeout_ms`` is set, flush still-open sessions of users idle
    that long (processing-time timeout; note that with AvailableNow the
    trigger keeps running micro-batches until pending timeouts fire, so
    leave it None for drain-and-stop batch replays).

    ``events`` is a streaming DataFrame with ``user_id`` and ``ts``.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = None, None, 0
            for ts in rows["ts"]:
                t = _us(ts)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
            state.update((start_us, last_us, n))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        timeout_conf,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 state-v2 API)
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
    T.StructField("total_value", T.DoubleType(), True),
])


def running_totals_with_state(events: DataFrame) -> DataFrame:
    """Per-key running totals on the Spark 4 ``transformWithStateInPandas``
    API (the successor to ``applyInPandasWithState``: typed state handles
    + timers instead of one opaque GroupState tuple). Each micro-batch
    folds its rows into a ``ValueState`` and emits the key's NEW running
    (count, sum) — the custom incremental-aggregate pattern for metrics
    Spark's built-in streaming aggs can't express.

    State is one fixed-width value per key; emitted rows are one per
    key per micro-batch that touched it (update semantics). ``events``
    is a streaming DataFrame with ``user_id`` and ``value``.

    Environment-gated like the Delta merge backend (COVERAGE.md): the
    state-v2 protocol talks protobuf between the JVM and the Python
    state server, so it needs the ``protobuf`` package AND the RocksDB
    state store provider (``spark.sql.streaming.stateStore.providerClass
    = ...RocksDBStateStoreProvider``, bundled in Spark 4). Without
    protobuf this raises at build time with a pointer to
    :func:`sessionize_with_state` (applyInPandasWithState needs neither).
    """
    try:
        import google.protobuf  # noqa: F401 — state-v2 wire protocol
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(the state-v2 JVM<->Python protocol is protobuf-encoded); "
            "it is not installed in this environment. Use "
            "sessionize_with_state (applyInPandasWithState) instead, or "
            "install protobuf on a real cluster."
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prev = self._totals.get() if self._totals.exists() else None
            n, total = (prev[0], prev[1]) if prev else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
