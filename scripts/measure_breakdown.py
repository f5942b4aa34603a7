"""Per-query cost breakdown for the optimization rounds (guide §1).

For each headline query at $SPARK_GRAFT_SF_DIR this reports, separately:

* ``build``   — seconds spent in ``q.fn(spark, sf_dir)`` (Python plan
  construction + analysis: Py4J round trips, translator work, any probe
  actions the builder runs);
* ``first``   — first execution (codegen compile + cache population);
* ``steady``  — min over the remaining executions (what bench.py's
  min-of-7 converges to);
* ``jobs``    — Spark jobs triggered by ONE steady-state execution (each
  job is a driver→scheduler round trip; >1 means the query runs probe
  actions, multi-action algorithms, or AQE re-plans);
* ``exch``    — Exchange nodes in the final executed plan.

Usage: python scripts/measure_breakdown.py [iters] [name ...]
Writes a markdown table to stdout; stderr carries progress.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from bench import HEADLINE

    from clickhousemigrators3_spark import TABLES
    from clickhousemigrators3_spark.catalog import load_table
    from clickhousemigrators3_spark.registry import load_all
    from clickhousemigrators3_spark.session import get_spark

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    only = set(sys.argv[2:])

    registry = load_all()
    spark = get_spark(
        app_name="measure_breakdown",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    for t in TABLES:
        load_table(spark, SF_DIR, t)
    load_table(spark, SF_DIR, "lineitem").count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    rows = []
    names = [n for n in HEADLINE if not only or n in only]
    for name in names:
        q = registry.get(name)
        if q is None:
            continue
        sc.setJobDescription(f"measure: {name}")
        builds, runs = [], []
        jobs_steady = 0
        df = None
        for it in range(iters):
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            j0 = tracker.getJobIdsForGroup(None)
            n = df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t1)
            if it == iters - 1:
                j1 = tracker.getJobIdsForGroup(None)
                jobs_steady = len(set(j1) - set(j0))
        plan = df._jdf.queryExecution().executedPlan().toString()
        exch = plan.count("Exchange")
        rec = {
            "name": name,
            "build_min": round(min(builds), 3),
            "first": round(runs[0], 3),
            "steady": round(min(runs[1:]) if len(runs) > 1 else runs[0], 3),
            "jobs": jobs_steady,
            "exch": exch,
            "rows": n,
        }
        rows.append(rec)
        print(
            f"# {name}: build {rec['build_min']}s first {rec['first']}s "
            f"steady {rec['steady']}s jobs {rec['jobs']} exch {rec['exch']}",
            file=sys.stderr,
        )
        sc.setJobDescription(None)

    print("| query | build | first | steady | jobs | exch | rows |")
    print("|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -(r["build_min"] + r["steady"])):
        print(
            f"| {r['name']} | {r['build_min']} | {r['first']} | "
            f"{r['steady']} | {r['jobs']} | {r['exch']} | {r['rows']} |"
        )
    tot_build = round(sum(r["build_min"] for r in rows), 3)
    tot_steady = round(sum(r["steady"] for r in rows), 3)
    tot_first = round(sum(r["first"] for r in rows), 3)
    print(
        json.dumps(
            {
                "total_build_min": tot_build,
                "total_first": tot_first,
                "total_steady_min": tot_steady,
                "n": len(rows),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
