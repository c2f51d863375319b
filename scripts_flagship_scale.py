"""Two-point flagship scaling experiment (VERDICT r04 #4).

Question: does the END-TO-END flagship pipeline (ingest → normalize →
partitioned stage → dedup → merge → counts → retention) scale the way the
100 TB design claims?

  A. end-to-end on a fresh warehouse: 1x (the sf0.1 bench batch, 100k
     events) vs 10x (1M events synthesized in-repo from the same fixture
     by key-offset replication) — wall time should grow ~linearly (no
     superlinear blowup) and the biggest reducer's shuffle input should
     grow ∝ batch/partitions (no skew hotspot);
  B. constant daily batch into a GROWING target: a bucket-localized daily
     batch (touches 8 of 64 buckets) merged into a 1x vs a 10x bucketed
     target (run_etl_bucketed), and — the control — into the 10x FLAT
     target (run_etl, full-outer rewrite). The bucketed merge's work
     scales with the touched buckets' data (8/64 of the table), the flat
     merge's with the whole table: at 10x the gap between those two is
     the claim the round-2 synthetic 3-column table made, re-proven here
     on the real 44-column flagship path. Staging is purged between the
     seed and the daily run so the daily merge input is EXACTLY the daily
     batch (leftover seed staging rows would scale with the target and
     pollute the flatness reading — caught on the first run of this
     script: updated-counts 15444 vs 45720 instead of 12504/12504).

Max-reducer input comes from Spark's status REST API (taskSummary at
quantile 1.0 over every stage the scenario ran) — the number that decides
whether a reducer OOMs at scale, which wall time alone can't show.

Run: python scripts_flagship_scale.py   (prints one JSON line per scenario;
~3 min at the default sizes). Results are transcribed in SCALING.md
§"Flagship two-point scaling".
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.catalog import Warehouse
from fn_rq_report_etl_dev_spark.pipeline import run_etl, run_etl_bucketed
from fn_rq_report_etl_dev_spark.schemas import TRADEIN_COLUMNS
from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.workloads import load

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10
KEY_STRIDE = 10_000_000  # keeps replicated SaleInvoiceIDs distinct


def make_batch(events):
    """The bench's batch construction: events → 44-col all-string batch."""
    provided = {
        "SaleInvoiceID": F.col("event_id").cast("string"),
        "TradeInTransactionID": (F.col("event_id") + 1_000_000).cast("string"),
        "TradeInStatus": F.col("event_type"),
        "TradeInDate": F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        "PostTime": F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        "TradeInAmount": F.col("value").cast("string"),
    }
    return events.select(
        *[provided.get(c, F.lit(None).cast("string")).alias(c) for c in TRADEIN_COLUMNS]
    )


def replicate(events, n: int):
    """n key-shifted copies of the fixture events (distinct keys, same
    value/timestamp distributions) — the in-repo 10x synthesizer."""
    out = None
    for i in range(n):
        c = events.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_STRIDE))
        out = c if out is None else out.unionByName(c)
    return out


class StageWindow:
    """Max-reducer shuffle input over the stages run inside the window,
    via the status REST API (quantile-1.0 taskSummary per stage)."""

    def __init__(self, spark):
        self.spark = spark
        self.app = spark.sparkContext.applicationId
        self.base = f"http://localhost:{self._port()}/api/v1/applications/{self.app}"

    def _port(self) -> str:
        return self.spark.sparkContext.getConf().get("spark.ui.port", "4040")

    def _get(self, path: str):
        with urllib.request.urlopen(self.base + path, timeout=10) as r:
            return json.load(r)

    def _max_stage_id(self) -> int:
        stages = self._get("/stages")
        return max((s["stageId"] for s in stages), default=-1)

    def __enter__(self):
        self.start_id = self._max_stage_id()
        return self

    def __exit__(self, *exc):
        self.max_reducer_bytes = 0
        self.stages = 0
        for s in self._get("/stages?status=complete"):
            if s["stageId"] <= self.start_id:
                continue
            self.stages += 1
            if s.get("shuffleReadBytes", 0) <= 0:
                continue
            try:
                summ = self._get(
                    f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary?quantiles=1.0"
                )
            except Exception:
                continue
            read = summ.get("shuffleReadMetrics", {}).get("readBytes", [0])
            self.max_reducer_bytes = max(self.max_reducer_bytes, int(read[-1]))


def scenario(name, spark, fn, **extra):
    win = StageWindow(spark)
    with win:
        t0 = time.perf_counter()
        counts = fn()
        wall = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "scenario": name,
                "wall_sec": wall,
                "max_reducer_shuffle_mb": round(win.max_reducer_bytes / 1e6, 1),
                "stages": win.stages,
                **counts,
                **extra,
            }
        ),
        flush=True,
    )


def main() -> None:
    spark = get_spark(
        app_name="flagship-scale", extra_conf={"spark.ui.enabled": "true"}
    )
    events = load(spark, SF_DIR, "events")
    n1 = events.count()
    batch1 = make_batch(events)
    batch10 = make_batch(replicate(events, REPLICAS))
    now = F.to_timestamp(F.lit("2024-01-30 12:00:00"))

    # Warm-up: full path once so JIT/codegen cost doesn't land on 1x.
    run_etl(spark, Warehouse(tempfile.mkdtemp(prefix="fs-warm-")), batch1, now=now)

    # A. end-to-end linearity, fresh warehouse each.
    scenario(
        "e2e_1x", spark,
        lambda: run_etl(spark, Warehouse(tempfile.mkdtemp(prefix="fs-a1-")), batch1, now=now),
        batch_rows=n1,
    )
    scenario(
        "e2e_10x", spark,
        lambda: run_etl(spark, Warehouse(tempfile.mkdtemp(prefix="fs-a10-")), batch10, now=now),
        batch_rows=n1 * REPLICAS,
    )

    # B. constant bucket-localized daily batch into growing bucketed target.
    # Daily batch: keys ≡ 0..7 (mod 64) → touches 8 of 64 buckets; half of
    # them are updates of seeded keys, half inserts (key offset past every
    # replica).
    daily_src = events.filter(F.pmod(F.col("event_id"), F.lit(64)) < 8)
    daily_updates = make_batch(daily_src)
    daily_inserts = make_batch(
        daily_src.withColumn(
            "event_id", F.col("event_id") + F.lit(REPLICAS * KEY_STRIDE * 2)
        ).filter(F.pmod(F.col("event_id"), F.lit(64)) < 8)
    )
    daily = daily_updates.unionByName(daily_inserts)
    n_daily = daily.count()

    def purge_staging(wh):
        """Drop every staging partition so the daily merge input is the
        daily batch alone (see module docstring)."""
        from fn_rq_report_etl_dev_spark.catalog import (
            STAGING_PARTITION_COL,
            STAGING_TABLE,
        )

        vals = [
            v
            for v in wh.partition_values(STAGING_TABLE, STAGING_PARTITION_COL)
            if v is not None
        ]
        wh.drop_partitions(STAGING_TABLE, STAGING_PARTITION_COL, vals)

    for tag, seed_batch, seed_rows, runner in (
        ("1x_target", batch1, n1, run_etl_bucketed),
        ("10x_target", batch10, n1 * REPLICAS, run_etl_bucketed),
        ("10x_flat_target", batch10, n1 * REPLICAS, run_etl),
    ):
        wh = Warehouse(tempfile.mkdtemp(prefix=f"fs-b-{tag}-"))
        runner(spark, wh, seed_batch, now=now)  # seed (untimed)
        purge_staging(wh)
        scenario(
            f"daily_into_{tag}", spark,
            lambda wh=wh, runner=runner: runner(spark, wh, daily, now=now),
            target_rows=seed_rows,
            daily_rows=n_daily,
        )


if __name__ == "__main__":
    main()
