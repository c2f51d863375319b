"""Driver-planning sweep (VERDICT r11 ask #1, guide §7.3).

The r11 scaling block showed the sf0.1 suite is OVERHEAD-BOUND (suite
value 240 s @ 8 cores vs 245 s @ 32): fixed per-job driver cost — plan
construction, analysis/optimization, job scheduling — rivals executor
time, so driver-side planning is the highest-leverage lever left at bench
scale (the r11 NB `withColumns` batching alone was 3.5×).

This script measures, for EVERY registered builder:

  t_build    — seconds to call ``QUERIES[name](spark, sf_dir)``. Catches
               eager work hidden in builders (collect()s, persists
               materialized at build time, py4j chatter from long
               withColumn chains — each re-analyzes the growing plan).
  t_plan     — seconds to force ``executedPlan`` on the result (analysis
               + optimization + physical planning, no execution).
  n_nodes    — optimized-plan tree size (``treeString`` line count), the
               usual culprit behind big t_plan (duplicated subtrees).

Output: one JSON line per query to stdout (sorted by t_build+t_plan at
the end as a summary table on stderr). Run on an idle machine:

    python scripts_plan_sweep.py [min_seconds_to_report]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fn_rq_report_etl_dev_spark.session import get_spark, release_intermediates
from fn_rq_report_etl_dev_spark.workloads import QUERIES


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-sweep")
    rows = []
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            plan = df._jdf.queryExecution().executedPlan()
            t_plan = time.perf_counter() - t0
            n_nodes = plan.treeString().count("\n") + 1
        except Exception as e:  # keep sweeping; report the failure
            rows.append({"name": name, "error": str(e)[:200]})
            release_intermediates(spark)
            continue
        rows.append(
            {
                "name": name,
                "t_build": round(t_build, 3),
                "t_plan": round(t_plan, 3),
                "n_nodes": n_nodes,
            }
        )
        release_intermediates(spark)
    print(json.dumps(rows))
    ok = [r for r in rows if "t_build" in r]
    ok.sort(key=lambda r: -(r["t_build"] + r["t_plan"]))
    print(
        f"{'query':44s} {'t_build':>8s} {'t_plan':>8s} {'nodes':>6s}",
        file=sys.stderr,
    )
    for r in ok:
        if r["t_build"] + r["t_plan"] < threshold:
            break
        print(
            f"{r['name']:44s} {r['t_build']:8.3f} {r['t_plan']:8.3f}"
            f" {r['n_nodes']:6d}",
            file=sys.stderr,
        )
    for r in rows:
        if "error" in r:
            print(f"ERROR {r['name']}: {r['error']}", file=sys.stderr)


if __name__ == "__main__":
    main()
