"""The spark-submit batch entrypoint: landing-dir JSON → pipeline → counts."""

from __future__ import annotations

import json


def test_jobs_main_runs_pipeline(spark, tmp_path, capsys):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"SaleInvoiceID": "1", "TradeInTransactionID": "1",
         "TradeInDate": "2024-03-15T01:00:00Z", "TradeInAmount": "5.00"},
        {"SaleInvoiceID": "2", "TradeInTransactionID": "2",
         "TradeInDate": "2024-03-15T02:00:00Z", "TradeInAmount": "6.00"},
    ]
    with open(landing / "batch.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    from fn_rq_report_etl_dev_spark.jobs import main

    counts = main([
        "--warehouse", str(tmp_path / "wh"),
        "--landing", str(landing),
        "--date", "2024-03-15",
    ])
    assert counts == {"inserted": 2, "updated": 0}
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == counts


def test_jobs_runs_as_plain_script():
    """spark-submit executes the file as __main__ (no parent package);
    the import bootstrap must make --help work from a bare interpreter."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "/root/repo/fn_rq_report_etl_dev_spark/jobs.py", "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    assert "--warehouse" in proc.stdout
