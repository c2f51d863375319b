"""HTTP JSON batch source (O1-O3, O7).

≙ the reference's ``fetch_api_data`` (rqtradein_etl.py:203-227): GET a JSON
array for a ``[StartDate, StopDate]`` window with 3-attempt linear-backoff
retry and a 120 s per-attempt timeout, then project each record onto the
fixed 44-column contract (missing keys → NULL, rqtradein_etl.py:233-238,
:338).

Credentials/URL come from configuration — NEVER hardcoded (the reference
embeds a Basic-auth header at rqtradein_etl.py:206-209; that is a defect,
not a behavior to reproduce).

Scale note: a driver-side fetch is fine for the reference's one-day batch
(bounded by the API itself). For large backfills, write responses to a
landing directory and use ``read_json_landing`` so the parse happens
distributed, schema-on-read with an explicit StructType.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import STAGING_SCHEMA, TRADEIN_COLUMNS


def daily_window(today: date | None = None) -> dict[str, str]:
    """The incremental scan window ``[today-1d, today]`` formatted
    ``%Y-%m-%d`` (rq_tradein_report/__init__.py:11-21)."""
    today = today or date.today()
    return {
        "StartDate": (today - timedelta(days=1)).strftime("%Y-%m-%d"),
        "StopDate": today.strftime("%Y-%m-%d"),
    }


def fetch_json_batch(
    url: str,
    params: dict[str, str] | None = None,
    headers: dict[str, str] | None = None,
    max_retries: int = 3,
    backoff_seconds: int = 5,
    timeout: int = 120,
    http_get: Callable | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """GET a JSON array with linear-backoff retry (rqtradein_etl.py:211-227).

    ``http_get(url, params=..., headers=..., timeout=...)`` is injectable for
    tests; by default uses ``requests`` (import-gated — this container has
    it only transitively, and the driver tests never hit the network).
    """
    if http_get is None:
        import requests  # gated: only needed on the real ingest path

        http_get = requests.get

    last_exc: Exception | None = None
    for attempt in range(1, max_retries + 1):
        try:
            response = http_get(url, params=params, headers=headers, timeout=timeout)
            response.raise_for_status()
            return response.json()
        except Exception as exc:  # noqa: BLE001 — retry any transport error
            last_exc = exc
            if attempt == max_retries:
                raise
            sleep(backoff_seconds * attempt)
    raise last_exc  # unreachable; satisfies type checkers


def batch_to_dataframe(
    spark: SparkSession,
    rows: Sequence[dict],
    columns: Sequence[str] = tuple(TRADEIN_COLUMNS),
    schema: T.StructType = STAGING_SCHEMA,
) -> DataFrame:
    """Project raw API dicts onto the fixed column contract.

    ``row.get(col, None)`` ≙ rqtradein_etl.py:338 — absent keys become NULL;
    every present value is rendered as a string (the staging table is
    uniformly VARCHAR, rqtradein_etl.py:43-89).
    """
    projected = [
        tuple(None if row.get(c) is None else str(row.get(c)) for c in columns)
        for row in rows
    ]
    return spark.createDataFrame(projected, schema)


def read_json_landing(spark: SparkSession, path: str, schema: T.StructType = STAGING_SCHEMA) -> DataFrame:
    """Distributed schema-on-read over a landing directory of JSON batches —
    the 100 TB-scale replacement for the driver-side fetch."""
    return spark.read.schema(schema).json(path)


def post_json_batch(
    url: str,
    rows: list[dict],
    max_retries: int = 3,
    backoff_seconds: int = 5,
    timeout: int = 120,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """POST a JSON array with the same linear-backoff retry envelope as
    :func:`fetch_json_batch` — the one shared delivery path for both the
    batch and streaming writers (stdlib urllib: runs executor-side with no
    extra dependency)."""
    import json as _json
    import urllib.request

    body = _json.dumps(rows).encode()
    last_exc: Exception | None = None
    for attempt in range(1, max_retries + 1):
        try:
            req = urllib.request.Request(
                url,
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
            return
        except Exception as exc:  # noqa: BLE001 — retry any transport error
            last_exc = exc
            if attempt == max_retries:
                raise
            sleep(backoff_seconds * attempt)
    raise last_exc  # unreachable; satisfies type checkers
