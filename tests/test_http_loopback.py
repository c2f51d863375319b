"""Real-HTTP integration for O1/O2 (VERDICT r03 next-round #5): a stdlib
``http.server`` loopback fixture serves the trade-in JSON API, and both the
driver-side ``fetch_json_batch`` AND the Spark 4 ``TradeInApiDataSource``
(batch partitions + streaming offsets) fetch from it over a real TCP
socket — zero mocked ``http_get``. Includes the reference's
2-failures-then-success retry sequence (rqtradein_etl.py:211-227).

The server runs in the pytest process on 127.0.0.1:<ephemeral>; Spark's
Python workers (separate processes) reach it over loopback, so the
executor-side fetch path is exercised for real.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from fn_rq_report_etl_dev_spark.sources.datasource import (
    FORMAT_NAME,
    TradeInApiDataSource,
)
from fn_rq_report_etl_dev_spark.sources.json_api import fetch_json_batch

DAYS = {
    "2026-08-01": [
        {"SaleInvoiceID": "1", "TradeInStatus": "OK", "Extra": "dropped"},
        {"SaleInvoiceID": "2"},
    ],
    "2026-08-02": [{"SaleInvoiceID": "3", "TradeInAmount": "19.99"}],
    "2026-08-03": [{"SaleInvoiceID": "4"}],
}


class _ApiState:
    """Mutable server-side state shared across requests (lives in the
    pytest process; workers only see HTTP responses)."""

    def __init__(self):
        self.fail_remaining: dict[str, int] = {}  # day -> 500s left to serve
        self.requests: list[str] = []  # StartDate of every GET, in order
        self.post_fail_remaining = 0  # 500s to serve before accepting POSTs
        self.posts: list[list[dict]] = []  # accepted POST bodies
        self.lock = threading.Lock()


@pytest.fixture()
def api_server():
    state = _ApiState()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            qs = parse_qs(urlparse(self.path).query)
            day = qs.get("StartDate", [""])[0]
            with state.lock:
                state.requests.append(day)
                failing = state.fail_remaining.get(day, 0)
                if failing > 0:
                    state.fail_remaining[day] = failing - 1
            if failing > 0:
                self.send_response(500)
                self.end_headers()
                self.wfile.write(b"transient upstream error")
                return
            body = json.dumps(DAYS.get(day, [])).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 — http.server API
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            with state.lock:
                if state.post_fail_remaining > 0:
                    state.post_fail_remaining -= 1
                    failing = True
                else:
                    failing = False
                    state.posts.append(json.loads(body))
            self.send_response(500 if failing else 200)
            self.end_headers()
            self.wfile.write(b"" if failing else b"ok")

        def log_message(self, *args):  # keep pytest output clean
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/tradein"
    try:
        yield url, state
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_fetch_json_batch_over_real_http(api_server):
    url, state = api_server
    rows = fetch_json_batch(url, params={"StartDate": "2026-08-01", "StopDate": "2026-08-01"})
    assert rows == DAYS["2026-08-01"]
    # unknown day -> empty array, not an error
    assert fetch_json_batch(url, params={"StartDate": "2099-01-01"}) == []


def test_fetch_retries_two_failures_then_succeeds(api_server):
    """The reference's observed sequence: two transport failures, then a
    200 on the third attempt (3-attempt linear backoff budget)."""
    url, state = api_server
    state.fail_remaining["2026-08-02"] = 2
    rows = fetch_json_batch(
        url,
        params={"StartDate": "2026-08-02", "StopDate": "2026-08-02"},
        backoff_seconds=0,
    )
    assert rows == DAYS["2026-08-02"]
    assert state.requests.count("2026-08-02") == 3  # 500, 500, 200


def test_fetch_exhausted_retries_raise(api_server):
    url, state = api_server
    state.fail_remaining["2026-08-01"] = 99
    with pytest.raises(Exception):
        fetch_json_batch(
            url,
            params={"StartDate": "2026-08-01", "StopDate": "2026-08-01"},
            backoff_seconds=0,
        )
    assert state.requests.count("2026-08-01") == 3  # exactly max_retries


def test_datasource_batch_fetches_from_executors(api_server, spark):
    """Batch mode, url option: one InputPartition per day, each fetched by
    a Spark Python worker over loopback HTTP, including a per-day retry
    (day 2 serves 500 twice before succeeding)."""
    url, state = api_server
    state.fail_remaining["2026-08-02"] = 2
    spark.dataSource.register(TradeInApiDataSource)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("url", url)
        .option("start_date", "2026-08-01")
        .option("stop_date", "2026-08-03")
        .option("backoff_seconds", "0")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = {r["SaleInvoiceID"]: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["3"]["TradeInAmount"] == "19.99"
    assert rows["2"]["TradeInTransactionID"] is None  # absent key -> NULL
    assert state.requests.count("2026-08-02") == 3  # retry happened worker-side


def test_stream_reader_http_offsets_exactly_once(api_server, spark, tmp_path):
    """Streaming mode over url: drain 1 covers days 1-2 (available_through
    high-water), the caller advances the high-water to day 3, drain 2 with
    the SAME checkpoint emits ONLY day 3 — offsets advance over real HTTP
    fetches and committed days are never re-fetched."""
    url, state = api_server
    spark.dataSource.register(TradeInApiDataSource)
    checkpoint = str(tmp_path / "ckpt")
    target = str(tmp_path / "out")

    def drain(available_through: str):
        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("url", url)
            .option("start_date", "2026-08-01")
            .option("available_through", available_through)
            .option("backoff_seconds", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", target)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.exception() is None

    drain("2026-08-02")
    got = sorted(r["SaleInvoiceID"] for r in spark.read.parquet(target).collect())
    assert got == ["1", "2", "3"]

    drain("2026-08-03")
    got = sorted(r["SaleInvoiceID"] for r in spark.read.parquet(target).collect())
    assert got == ["1", "2", "3", "4"]  # day 1-2 not re-emitted


def _staging_df(spark, rows):
    from fn_rq_report_etl_dev_spark.schemas import STAGING_SCHEMA, TRADEIN_COLUMNS
    from fn_rq_report_etl_dev_spark.sources.datasource import _project

    return spark.createDataFrame([_project(r) for r in rows], STAGING_SCHEMA)


def test_writer_landing_roundtrip_through_reader(spark, tmp_path):
    """Sink → source round trip: write a day file via the writer (staged
    parts merged atomically on commit), read it back through the batch
    reader — same rows, NULLs restored, no staging residue."""
    spark.dataSource.register(TradeInApiDataSource)
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"SaleInvoiceID": "1", "TradeInStatus": "OK"},
        {"SaleInvoiceID": "2", "TradeInAmount": "19.99"},
        {"SaleInvoiceID": "3"},
    ]
    (
        _staging_df(spark, rows).repartition(3)
        .write.format(FORMAT_NAME)
        .option("landing", str(landing))
        .option("day", "2026-08-05")
        .mode("append")
        .save()
    )
    assert (landing / "2026-08-05.json").exists()
    assert not [p for p in landing.iterdir() if p.name.startswith(".staging")]
    back = (
        spark.read.format(FORMAT_NAME)
        .option("landing", str(landing))
        .option("start_date", "2026-08-05")
        .load()
    )
    got = {r["SaleInvoiceID"]: r for r in back.collect()}
    assert set(got) == {"1", "2", "3"}
    assert got["2"]["TradeInAmount"] == "19.99"
    assert got["3"]["TradeInStatus"] is None  # NULL restored via row.get
    assert got["1"]["TradeInStatus"] == "OK"


def test_writer_replaces_day_file_atomically(spark, tmp_path):
    """A re-write of the same day supersedes the previous file (the
    reference's daily re-fetch contract) — never merges with it."""
    spark.dataSource.register(TradeInApiDataSource)
    landing = tmp_path / "landing"
    landing.mkdir()

    def write(rows):
        (
            _staging_df(spark, rows)
            .write.format(FORMAT_NAME)
            .option("landing", str(landing))
            .option("day", "2026-08-06")
            .mode("append")
            .save()
        )

    write([{"SaleInvoiceID": "1"}])
    write([{"SaleInvoiceID": "2"}, {"SaleInvoiceID": "3"}])
    back = (
        spark.read.format(FORMAT_NAME)
        .option("landing", str(landing))
        .option("start_date", "2026-08-06")
        .load()
    )
    assert sorted(r["SaleInvoiceID"] for r in back.collect()) == ["2", "3"]


def test_writer_http_posts_all_partitions_with_retry(api_server, spark):
    """HTTP sink: every partition POSTs its JSON array from an executor;
    transient 500s are retried with the same envelope as the fetch path."""
    url, state = api_server
    state.post_fail_remaining = 2  # first two POST attempts fail
    spark.dataSource.register(TradeInApiDataSource)
    rows = [{"SaleInvoiceID": str(i), "TradeInStatus": "OK"} for i in range(6)]
    (
        _staging_df(spark, rows).repartition(2)
        .write.format(FORMAT_NAME)
        .option("url", url)
        .option("backoff_seconds", "0")
        .mode("append")
        .save()
    )
    delivered = sorted(r["SaleInvoiceID"] for batch in state.posts for r in batch)
    assert delivered == sorted(str(i) for i in range(6))
    assert len(state.posts) == 2  # one accepted POST per partition


def test_stream_writer_delivers_each_day_batch_once(api_server, spark, tmp_path):
    """End-to-end streaming replication: the streaming READER drains
    landed days from a directory; the streaming WRITER POSTs each
    micro-batch to the API over real HTTP. Drain 1 delivers days 1-2;
    day 3 lands; drain 2 (same checkpoint) delivers ONLY day 3 — the
    engine's offset log gives exactly-once delivery per successful epoch,
    and the commit log records each epoch's row count."""
    url, state = api_server
    spark.dataSource.register(TradeInApiDataSource)
    landing = tmp_path / "landing"
    landing.mkdir()
    for day in ("2026-08-01", "2026-08-02"):
        (landing / f"{day}.json").write_text(json.dumps(DAYS[day]))
    checkpoint = str(tmp_path / "ckpt")
    commit_log = str(tmp_path / "commits.jsonl")

    def drain():
        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("landing", str(landing))
            .option("start_date", "2026-08-01")
            .load()
            .writeStream.format(FORMAT_NAME)
            .option("url", url)
            .option("commit_log", commit_log)
            .option("backoff_seconds", "0")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.exception() is None

    drain()
    delivered = sorted(r["SaleInvoiceID"] for b in state.posts for r in b)
    assert delivered == ["1", "2", "3"]

    (landing / "2026-08-03.json").write_text(json.dumps(DAYS["2026-08-03"]))
    drain()
    delivered = sorted(r["SaleInvoiceID"] for b in state.posts for r in b)
    assert delivered == ["1", "2", "3", "4"]  # days 1-2 not re-delivered

    import pathlib
    commits = [json.loads(l) for l in pathlib.Path(commit_log).read_text().splitlines()]
    assert sum(c["n_rows"] for c in commits) == 4


def test_stream_reader_idles_when_high_water_precedes_start(api_server, spark, tmp_path):
    """available_through before start_date (no data published yet, or an
    outer loop set the high-water to yesterday) must yield an idle empty
    batch — not a ValueError that kills the stream on every poll."""
    url, state = api_server
    spark.dataSource.register(TradeInApiDataSource)
    q = (
        spark.readStream.format(FORMAT_NAME)
        .option("url", url)
        .option("start_date", "2026-08-02")
        .option("available_through", "2026-08-01")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.exception() is None
    assert state.requests == []  # nothing fetched
