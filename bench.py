"""Bench harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action that forces full evaluation
without collecting data to the driver (df.write to noop would need a format;
we use .foreach-free count of the final frame via .count() on cached plans —
these queries all return small results, so toPandas is also fine; we use
collect of the aggregated output, which is what a user would do).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # reference surface
    "flagship_partition_rollup",
    "a3_count_validation_join",
    "a3_checksum_validation",
    # TPC-H-style relational
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q21_waiting_suppliers",
    "window_topn_orders_per_customer",
    # LLM-pipeline extensions
    "dedup_minhash_lsh_pairs",
    "text_quality_scores",
    "knn_bruteforce_topk",
    "ann_lsh_topk",
    "ev_sessionization",
    "ev_funnel_steps",
    "ev_wau_sliding_7d",
    "doc_chunk_overlap",
    "embedding_quantize_int8",
    # round-5 heavy training-data operators (tracked since r6)
    "ccnet_bigram_perplexity",
    "semdedup_prune_trained",
    "embedding_hard_negatives",
    # round-8: the translator (re-tokenizes per call — a regression there
    # would otherwise be invisible) and the in-engine GD trainer
    "chsql_prewhere_rollup",
    "logreg_train_weights",
    # round-9: cross-document substring dedup (the Lee-et-al modality —
    # fingerprint-bucketed, linear retention path) and the deltaSum
    # subquery restructure (window inside a rebuilt aggregate SELECT)
    "dedup_substring_retained",
    "chsql_delta_sum",
    # round-10: the incremental substring gate (delta-vs-corpus, the
    # stored-index emulated twin), the map-combinator aggregate
    # translation (collect-entries-then-fold), and the grouped moving
    # restructure (GROUP BY → window PARTITION BY + pin-ordered
    # re-collection)
    "dedup_substring_incremental_retained",
    "chsql_summap_daily",
    "chsql_moving_sum_grouped",
    # round-11: the GROUP BY WITH ROLLUP translation (grouping()-guarded
    # typed defaults over the probe-typed keys) and the count-combinator
    # two-level restructure with sibling partial-merge (a regression to
    # the O(distinct × rows) collect form would show here)
    "chsql_rollup_status_priority",
    "chsql_topk_with_siblings",
    # round-11b: the ANY JOIN strictness rewrite — row_number window over
    # the pinned right side feeding the join; the plan's WindowGroupLimit
    # partial (map-side top-1 before the exchange) and the join-key filter
    # inference into the right scan are the properties tracked here
    "chsql_any_join_latest_order",
    # round-12: count(DISTINCT shared-value) decomposed through the
    # combinator restructure (a regression back to the collect form or to
    # Spark's Expand-based count-distinct would show here) and the
    # combined GROUP BY modifiers (ROLLUP…WITH TOTALS dedup; TOTALS+LIMIT
    # two-branch union over one unlimited totals aggregate)
    "chsql_topk_with_uniq",
    "chsql_rollup_with_totals",
    "chsql_totals_limit",
    # round-12b: the rank()-window LIMIT WITH TIES rewrite (a global
    # top-n-with-ties — the single-partition window is the honest
    # topology, documented) and the -Array combinators (JVM array folds
    # inside a plain HashAggregate, no explode shuffle)
    "chsql_limit_with_ties",
    "chsql_array_combinators",
    # round-13: the ternary → CASE rewrite (row-level nested banding — a
    # regression to a refusal or a mis-scoped condition shows up as wrong
    # rows, a plan regression as a lost pushdown), the schema-aware column
    # matcher expansion (its analysis probe runs per call — a probe that
    # started executing instead of analyzing would show here), the ANY
    # RIGHT left-side-dedup mirror (WindowGroupLimit partial on the LEFT
    # input), and the multi-array fold (zip_with structs inside one
    # project — no explode, no shuffle)
    "chsql_ternary_bands",
    "chsql_column_matchers",
    "chsql_any_right_join_first_order",
    "chsql_multi_array_fold",
    # round-14: FROM t FINAL (window dedup with a map-side WindowGroupLimit
    # partial; a regression to a full-history shuffle would show here),
    # SAMPLE k OFFSET m (hash-range scan filter — the sample predicate
    # must stay a row-local expression inside the scan's stage), and the
    # windowFunnel aggregate fold (condition-tagged entry lists — state
    # O(matched events) per group; a regression to an anchors×events join
    # or a Python boundary would show here)
    "chsql_final_replacing",
    "chsql_sample",
    "chsql_window_funnel",
]


# ---------------------------------------------------------------------------
# Calibration probes (round-13, verdict r12 #1/#6): two PINNED operations
# that never change across rounds, timed in the same session as the
# headline queries, so cross-round comparisons survive host-speed drift and
# sub-threshold ambient load. The r12 post-mortem: a load-3 window inflated
# the driver bench ~23% while the binary `load1 > 4` stamp read "clean",
# and a uniform ~13% clean-run drift on unchanged plans r11→r12 was
# indistinguishable from a real regression without an anchor.
#   - cpu probe: spark.range fold — pure JVM codegen/scheduling throughput,
#     no I/O, fixed 32 partitions (independent of sf and shuffle conf).
#   - scan probe: full lineitem scan-agg at sf_dir — parquet read path.
# CALIB_REF pins the idle-machine reference measured when the probe was
# introduced (round 13: the TYPICAL of three clean full-harness runs'
# probe minima — cpu 0.100/0.102/0.118, scan 0.063/0.068/0.072 — so
# host_factor reads ≈ 1.0 ± 0.1 on a clean run of that machine; run-to-run
# probe noise is ~±15%, documented, and only >1.2 trips the contended
# stamp); > 1 when today's host is slower (drift OR contention). DO NOT
# retune CALIB_REF without renaming the fields — the anchor is the point.
CALIB_REF = {"cpu": 0.105, "scan": 0.068}  # seconds, round-13 idle machine


def _calibrate(spark, lineitem, iters: int = 3) -> tuple[float, float]:
    cpu_runs, scan_runs = [], []
    # one UNTIMED iteration first: the cpu probe's whole-stage codegen
    # compiles on first execution (~2× the steady-state time), which would
    # otherwise read as "contention" in the before/after spread
    for it in range(iters + 1):
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 7) AS s"
        ).collect()
        if it:
            cpu_runs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        lineitem.selectExpr(
            "count(*) AS c", "sum(l_extendedprice) AS s", "avg(l_discount) AS a"
        ).collect()
        if it:
            scan_runs.append(time.perf_counter() - t0)
    return min(cpu_runs), min(scan_runs)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # sampled BEFORE the JVM spins up: this is the ambient machine load a
    # concurrent run would show; check_evidence warns when it is high
    load_start = os.getloadavg()[0]
    started_at = time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime())
    if load_start > 4:
        print(
            f"# WARNING: load1={load_start:.1f} at bench start — timings "
            "will be contention-inflated; rerun alone",
            file=sys.stderr,
        )

    from clickhousemigrators3_spark.registry import load_all
    from clickhousemigrators3_spark.session import get_spark

    registry = load_all()
    # UI off for benching: per-stage UI bookkeeping is pure overhead here,
    # and no one attaches to a 4-minute batch process
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    # Warm the JVM and seed the shared analyzed-plan cache for EVERY fixture
    # table (one file listing + footer read each, reused by all queries —
    # the repeated re-analysis the round-2 CacheManager warnings pointed
    # at). The count() warms codegen/scan paths on the biggest table.
    from clickhousemigrators3_spark import TABLES
    from clickhousemigrators3_spark.catalog import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t)
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.count()

    # calibration BEFORE and AFTER the headline loop: the min across both
    # anchors today's host speed (host_factor); the before/after spread
    # catches contention that arrives or leaves MID-window, which a single
    # probe (and the start/end loadavg stamps alone) would miss.
    calib_before = _calibrate(spark, lineitem)

    timings: dict[str, float] = {}
    timings_p50: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            continue
        # seven iterations; report steady-state (min) as the headline
        # number: iteration 1 pays JVM JIT and codegen compilation, which
        # amortize to zero on a real cluster; min-of-7 also absorbs
        # co-tenant machine noise (observed run-to-run spread on this box
        # is ~1.5× under load; sustained ambient load average ~2 shifts
        # whole runs). p50 is reported alongside so the spread is visible.
        runs = []
        for _ in range(7):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()  # forces execution; results are small aggregates
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        timings_p50[name] = round(runs[len(runs) // 2], 3)
        print(
            f"# {name}: min {timings[name]}s p50 {timings_p50[name]}s ({n} rows)",
            file=sys.stderr,
        )

    calib_after = _calibrate(spark, lineitem)
    calib_cpu = min(calib_before[0], calib_after[0])
    calib_scan = min(calib_before[1], calib_after[1])
    host_factor = round(
        0.5 * (calib_cpu / CALIB_REF["cpu"] + calib_scan / CALIB_REF["scan"]),
        3,
    )
    # spread on the cpu probe only. Idle-machine baseline is ~1.3-1.7
    # (JIT-convergence asymmetry: the before-probe JVM has executed one
    # query vs the after-probe's ~290 — measured round 13 at load 0.13
    # end-to-end), so the contention gate below fires only ABOVE 2.0 —
    # a run that started beside decaying background work read 2.29 while
    # both loadavg stamps stayed under 2 (round-13 post-mortem).
    calib_spread = round(max(calib_before[0], calib_after[0]) / calib_cpu, 3)

    total = round(sum(timings.values()), 3)
    finished_at = time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime())
    # contention verdict over the WHOLE window, not just the start: the
    # round-11 driver bench started at load1=2.87 ("clean") but ended at
    # 8.75 — load arrived mid-run and inflated p50s ~8% while the
    # start-only gate stayed green. A run is contended if ambient load was
    # high at either edge of the window. The end stamp is sampled after
    # stopping Spark and DRAINING for 60 s: the bench's own 32-thread
    # bursts push the raw 1-min loadavg to ~6 on an idle machine (measured
    # round 12), which would cry wolf — after e^-2 decay (120 s; the 60 s
    # drain left ~2.9 residue under round 13's stricter >2 threshold)
    # self-load reads <1 while genuinely concurrent work stays elevated.
    spark.stop()
    print("# draining 120s before the end load stamp (self-load decay)",
          file=sys.stderr)
    time.sleep(120)
    load_end = os.getloadavg()
    # contended verdict, round-13 recalibration (r12 post-mortem: a load-3
    # window inflated the run ~23% while the old `> 4` threshold stamped
    # clean). Three independent triggers, any one suffices:
    #   - ambient load > 2 at either window edge (the old catastrophic
    #     threshold was calibrated for load ~8; ~3 already costs ~25% on
    #     sub-second queries),
    #   - host_factor > 1.2: today's pinned probes ran ≥20% slower than
    #     the idle-machine reference — drift or co-tenancy either way the
    #     raw timings are not comparable (use the *_calibrated fields),
    contended = (
        max(load_start, load_end[0]) > 2
        or host_factor > 1.2
        or calib_spread > 2.0
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_p50": timings_p50,
                "total_p50": round(sum(timings_p50.values()), 3),
                # host-drift anchor (round 13): raw probe seconds, the
                # factor vs the pinned idle reference, and every headline
                # number re-expressed in reference-machine seconds —
                # cross-round comparisons should use the *_calibrated
                # fields, never raw seconds from different-day hosts
                "calib_cpu_sec": round(calib_cpu, 3),
                "calib_scan_sec": round(calib_scan, 3),
                "calib_spread": calib_spread,
                "host_factor": host_factor,
                "cpu_count": os.cpu_count(),
                "value_calibrated": round(total / host_factor, 3),
                "queries_calibrated": {
                    k: round(v / host_factor, 3) for k, v in timings.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # contamination evidence (round-8 post-mortem: a bench
                # captured beside a concurrent run was ~22% inflated and
                # read as a fabricated regression) — load BEFORE this
                # process ramped up, load at the end, and the wall window
                "load1_start": round(load_start, 2),
                "load1_end": round(load_end[0], 2),
                "contended": contended,
                "started_at": started_at,
                "finished_at": finished_at,
                # round-13 bisect (verdict r12 #1a): the r11 snapshot
                # (966588e) rerun on the round-13 host read 13.94 s min
                # vs the 11.04 s its own round recorded — identical code,
                # data, and plans (docs/BENCH_bisect_r11.json) — so the
                # uniform r11→r12 clean-bench drift was HOST slowdown,
                # not added overhead; compare rounds via value_calibrated.
                "drift_note": "r11 code reruns at 13.94s on this host "
                "(was 11.04s) — drift is the host; use *_calibrated",
            }
        )
    )
    # Compact trailing summary — ALWAYS the last stdout line. The full line
    # above outgrew the driver's fixed-size stdout tail capture (round-10:
    # BENCH_r10.json recorded "parsed": null because the tail started
    # mid-object), which silently defeated check_evidence's
    # load-contamination gate. This line is a few hundred bytes, so any
    # tail window that exists ends with one complete, parseable object
    # carrying the headline number and the load stamps. Per-query timings
    # live in the full line (and docs/BENCH_r*_builder.json).
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "total_p50": round(sum(timings_p50.values()), 3),
                "n_queries": len(timings),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load1_start": round(load_start, 2),
                "load1_end": round(load_end[0], 2),
                "host_factor": host_factor,
                "calib_spread": calib_spread,
                "value_calibrated": round(total / host_factor, 3),
                "contended": contended,
                "started_at": started_at,
                "finished_at": finished_at,
                "summary_of": "full JSON line above",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
