"""Spark 4 Python DataSource for the trade-in activity API — the
reference's HTTP JSON source (rqtradein_etl.py:203-227) re-expressed as a
first-class ``spark.read.format(...)`` source instead of a driver-side
fetch loop.

Why a DataSource and not a driver fetch (``sources/json_api.py`` keeps
that form for strict parity): the reference pulls ONE day per run on one
machine. At scale the backfill shape is "N date windows × M locations",
which is exactly a partitioned scan — each (date-slice) becomes an
``InputPartition`` fetched BY AN EXECUTOR, so a 3-year backfill is ~1100
parallel tasks instead of a sequential driver loop, and Spark's task
retry/speculation machinery covers transient HTTP failures per-slice
(the reference's retry loop, O2, becomes the task scheduler's job).

Offline mode: this container has no network, so the source also accepts a
``landing`` directory of per-day JSON files (``{landing}/{YYYY-MM-DD}.json``)
— the same dual-mode the tests and any air-gapped replay would use. The
HTTP path goes through :func:`fetch_json_batch` (same linear-backoff retry
as the reference) when ``landing`` is unset.

Row semantics match O7/O8 exactly: every row is projected onto the fixed
44-column VARCHAR contract, absent keys → NULL (rqtradein_etl.py:233-238).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from datetime import date, timedelta

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from ..schemas import STAGING_SCHEMA, TRADEIN_COLUMNS

FORMAT_NAME = "rq_tradein_api"


class DateSlice(InputPartition):
    def __init__(self, day: str):
        self.day = day


def _project(row: dict) -> tuple:
    """dict → ordered 44-tuple, absent keys NULL (rqtradein_etl.py:338)."""
    return tuple(
        None if row.get(c) is None else str(row.get(c)) for c in TRADEIN_COLUMNS
    )


def _date_range(start: str, stop: str) -> list[str]:
    d0, d1 = date.fromisoformat(start), date.fromisoformat(stop)
    if d1 < d0:
        raise ValueError(f"stop_date {stop} precedes start_date {start}")
    return [(d0 + timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)]


class TradeInApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.landing = options.get("landing")
        self.url = options.get("url")
        if not self.landing and not self.url:
            raise ValueError("rq_tradein_api requires 'url' or 'landing'")
        start = options.get("start_date")
        stop = options.get("stop_date", start)
        if not start:
            raise ValueError("rq_tradein_api requires 'start_date'")
        self.days = _date_range(start, stop)
        self.params = {
            k: options[k]
            for k in ("provider_id", "location_type", "location_type_ids", "company_id")
            if k in options
        }
        # Retry knobs (reference defaults: 3 attempts, 5 s linear backoff,
        # rqtradein_etl.py:211-227) — configurable so tests and callers with
        # different SLAs can tune them.
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_seconds = int(options.get("backoff_seconds", 5))

    def partitions(self) -> Sequence[InputPartition]:
        # One task per day slice — the unit of retry AND of parallelism.
        return [DateSlice(d) for d in self.days]

    def read(self, partition: DateSlice) -> Iterator[tuple]:
        day = partition.day
        if self.landing:
            path = os.path.join(self.landing, f"{day}.json")
            if not os.path.exists(path):  # a day with no landed file = no rows
                return
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        else:  # network path — tested against a loopback http.server
            from .json_api import fetch_json_batch

            rows = fetch_json_batch(
                self.url,
                params={**self.params, "StartDate": day, "StopDate": day},
                max_retries=self.max_retries,
                backoff_seconds=self.backoff_seconds,
            )
        for row in rows:
            yield _project(row)


class TradeInApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the source: the reference's daily re-scan window
    (O3/O4 — NCRONTAB trigger + [today-1d, today] parameterization,
    rq_tradein_report/__init__.py:9-21) becomes a real incremental source:
    the offset is the next unprocessed DAY, each micro-batch drains every
    newly landed day, and exactly-once delivery is the engine's offset
    log instead of relying on the merge's idempotence to absorb re-reads.

    Day granularity keeps offsets tiny (one ISO date string) and replays
    deterministic: ``readBetweenOffsets`` re-derives any committed batch
    from its [start, end) day range alone.

    Two availability modes:
    - ``landing``: a directory of per-day JSON files; a day is available
      once its file lands (the air-gapped/replay mode).
    - ``url`` + ``available_through``: poll the HTTP API day-by-day up to
      an explicit high-water date. The caller (or an outer restart loop)
      advances ``available_through``; keeping it explicit — instead of
      wall-clock "today" — makes every micro-batch replay-deterministic.
    """

    def __init__(self, options: dict):
        self.landing = options.get("landing")
        self.url = options.get("url")
        if not self.landing and not self.url:
            raise ValueError("streaming rq_tradein_api requires 'landing' or 'url'")
        start = options.get("start_date")
        if not start:
            raise ValueError("streaming rq_tradein_api requires 'start_date'")
        date.fromisoformat(start)  # validate
        self.start = start
        self.available_through = options.get("available_through")
        if self.url and not self.landing:
            if not self.available_through:
                raise ValueError(
                    "streaming rq_tradein_api over 'url' requires "
                    "'available_through' (explicit high-water date)"
                )
            date.fromisoformat(self.available_through)  # validate
        self.params = {
            k: options[k]
            for k in ("provider_id", "location_type", "location_type_ids", "company_id")
            if k in options
        }
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_seconds = int(options.get("backoff_seconds", 5))

    def initialOffset(self) -> dict:
        return {"next_day": self.start}

    def _landed_days(self) -> list[str]:
        if not self.landing:
            if self.available_through < self.start:
                # high-water before the configured start (no data published
                # yet, or an outer restart loop set it to yesterday): an
                # idle empty batch, matching landing mode's empty listing —
                # never a ValueError that kills the stream on every poll.
                return []
            return _date_range(self.start, self.available_through)
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.landing)
            if f.endswith(".json")
        )

    def _read_days(self, days: list[str]) -> Iterator[tuple]:
        if not self.landing:
            from .json_api import fetch_json_batch

            for day in days:
                rows = fetch_json_batch(
                    self.url,
                    params={**self.params, "StartDate": day, "StopDate": day},
                    max_retries=self.max_retries,
                    backoff_seconds=self.backoff_seconds,
                )
                for row in rows:
                    yield _project(row)
            return
        for day in days:
            with open(os.path.join(self.landing, f"{day}.json"), encoding="utf-8") as fh:
                for row in json.load(fh):
                    yield _project(row)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        ready = [d for d in self._landed_days() if d >= start["next_day"]]
        if not ready:
            return iter(()), start
        next_day = (date.fromisoformat(ready[-1]) + timedelta(days=1)).isoformat()
        # list-backed iterator: the engine's prefetch cache copies it
        # (generators aren't copyable), and a day batch is bounded anyway.
        return iter(list(self._read_days(ready))), {"next_day": next_day}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        days = [
            d
            for d in self._landed_days()
            if start["next_day"] <= d < end["next_day"]
        ]
        return iter(list(self._read_days(days)))

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


@dataclass
class TradeInWriteCommit(WriterCommitMessage):
    part_file: str | None  # landing mode: staged part path; HTTP mode: None
    n_rows: int


class TradeInApiWriter(DataSourceWriter):
    """Write side of the trade-in API format — the reference's bulk-insert
    sink (O13, rqtradein_etl.py:330-340) as a first-class
    ``df.write.format("rq_tradein_api")``. Two modes, mirroring the reader:

    - ``landing`` + ``day``: each task stages its partition as a JSON part
      file under ``{landing}/.staging-{day}-{job}/``; the driver-side
      ``commit`` concatenates the parts into ``{landing}/{day}.json``
      atomically (tmp + rename) and drops the staging dir, so readers
      never observe a half-written day and a failed job leaves the
      previous day file untouched (``abort`` removes the staging dir).
      Replaces any existing day file — the reference's daily re-fetch +
      idempotent re-merge contract (SURVEY §3.1), where a day batch is a
      unit that supersedes its previous version.
    - ``url``: each task POSTs its partition as a JSON array with the
      same linear-backoff retry as the fetch path. HTTP has no
      transaction: a failed job may leave some partitions delivered —
      exactly the reference's exposure, absorbed downstream by the
      key-idempotent merge (O16). ``commit`` is then bookkeeping only.

    NULL fields are omitted from the JSON (the reader's ``row.get`` →
    NULL projection restores them), so a landing round-trip is lossless.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        self.landing = options.get("landing")
        self.url = options.get("url")
        if not self.landing and not self.url:
            raise ValueError("rq_tradein_api writer requires 'landing' or 'url'")
        self.day = options.get("day")
        if self.landing and not self.day:
            raise ValueError("rq_tradein_api landing writer requires 'day'")
        if self.day:
            date.fromisoformat(self.day)  # validate
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_seconds = int(options.get("backoff_seconds", 5))
        self.columns = [f.name for f in schema.fields]
        # one staging namespace per write job: concurrent jobs never mix
        import uuid

        self.job_id = uuid.uuid4().hex[:12]

    def _staging_dir(self) -> str:
        return os.path.join(self.landing, f".staging-{self.day}-{self.job_id}")

    def write(self, iterator) -> TradeInWriteCommit:
        rows = [
            {c: row[c] for c in self.columns if row[c] is not None}
            for row in iterator
        ]
        if self.landing:
            import uuid

            os.makedirs(self._staging_dir(), exist_ok=True)
            part = os.path.join(
                self._staging_dir(), f"part-{uuid.uuid4().hex}.json"
            )
            with open(part, "w", encoding="utf-8") as fh:
                json.dump(rows, fh)
            return TradeInWriteCommit(part_file=part, n_rows=len(rows))
        from .json_api import post_json_batch

        post_json_batch(
            self.url, rows,
            max_retries=self.max_retries, backoff_seconds=self.backoff_seconds,
        )
        return TradeInWriteCommit(part_file=None, n_rows=len(rows))

    def commit(self, messages) -> None:
        if not self.landing:
            return
        import shutil

        parts = sorted(
            m.part_file for m in messages if m is not None and m.part_file
        )
        merged: list[dict] = []
        for p in parts:
            with open(p, encoding="utf-8") as fh:
                merged.extend(json.load(fh))
        tmp = os.path.join(self.landing, f".tmp-{self.day}-{self.job_id}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(merged, fh)
        os.replace(tmp, os.path.join(self.landing, f"{self.day}.json"))
        shutil.rmtree(self._staging_dir(), ignore_errors=True)

    def abort(self, messages) -> None:
        if self.landing:
            import shutil

            shutil.rmtree(self._staging_dir(), ignore_errors=True)


class TradeInApiStreamWriter(DataSourceStreamWriter):
    """Streaming HTTP delivery sink: each micro-batch's partitions POST
    their rows as JSON arrays (same retry envelope as the fetch path);
    the driver appends one line per committed epoch to
    ``{commit_log}`` — replayable bookkeeping of what was delivered.

    Delivery semantics are at-least-once ACROSS failures (a task retried
    after a partial epoch re-POSTs its partition; HTTP has no
    transaction) and exactly-once per SUCCESSFUL epoch via the engine's
    checkpoint — the same contract the reference's re-scan-and-absorb
    pipeline exposes, absorbed downstream by the key-idempotent merge
    (O16)."""

    def __init__(self, options: dict):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("streaming rq_tradein_api writer requires 'url'")
        self.commit_log = options.get("commit_log")
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_seconds = int(options.get("backoff_seconds", 5))

    def write(self, iterator) -> TradeInWriteCommit:
        from .json_api import post_json_batch

        rows = [
            {k: v for k, v in row.asDict().items() if v is not None}
            for row in iterator
        ]
        if not rows:
            return TradeInWriteCommit(part_file=None, n_rows=0)
        post_json_batch(
            self.url, rows,
            max_retries=self.max_retries, backoff_seconds=self.backoff_seconds,
        )
        return TradeInWriteCommit(part_file=None, n_rows=len(rows))

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 — Spark API
        if self.commit_log:
            n = sum(m.n_rows for m in messages if m is not None)
            with open(self.commit_log, "a", encoding="utf-8") as fh:
                fh.write(json.dumps({"batch_id": batchId, "n_rows": n}) + "\n")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 — Spark API
        pass  # nothing to roll back; see class docstring


class TradeInApiDataSource(DataSource):
    """``spark.dataSource.register(TradeInApiDataSource)`` then
    ``spark.read.format("rq_tradein_api").option(...).load()`` (batch),
    ``spark.readStream.format("rq_tradein_api")...`` (incremental days),
    ``df.write.format("rq_tradein_api").option(...)`` (day-file /
    HTTP-POST sink), or ``df.writeStream.format("rq_tradein_api")``
    (per-micro-batch HTTP delivery)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return STAGING_SCHEMA

    def reader(self, schema) -> TradeInApiReader:
        return TradeInApiReader(self.options)

    def simpleStreamReader(self, schema) -> TradeInApiStreamReader:
        return TradeInApiStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> TradeInApiWriter:
        return TradeInApiWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> TradeInApiStreamWriter:  # noqa: N802
        return TradeInApiStreamWriter(self.options)
