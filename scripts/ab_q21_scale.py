"""A/B the two q21 shuffle shapes on a 16x-replicated fixture (verdict r14
"what's wrong" #1): the round-14 form repartitions the joined facts by
o_orderkey so the (order, supplier) aggregation and the per-order window
share ONE exchange, at the cost of that exchange carrying raw joined rows
(map-side partial aggregation forfeited). The alternative lets the
aggregation shuffle its own partials and the window re-shuffle the
(order, supplier) relation. At sf0.1 the single-exchange form wins; this
script measures both at 16x (9.6M lineitem rows, 2.4M orders — orders no
longer broadcastable, so the fact join is the sort-merge topology a cluster
would run).

Usage: python scripts/ab_q21_scale.py [repl] [iters]
Writes the fixture under /tmp/q21_scale_<repl>x (reused if present).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def build_fixture(spark, big: str) -> None:
    from pyspark.sql import functions as F

    done = os.path.join(big, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(big, exist_ok=True)
    reps = F.explode(F.array(*[F.lit(i) for i in range(REPL)]))
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        li.withColumn("rep", reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{big}/lineitem.parquet")
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    (
        o.withColumn("rep", reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{big}/orders.parquet")
    )
    for t in ("supplier", "nation"):
        dst = f"{big}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)
    open(done, "w").close()


def q21(spark, sf_dir: str, one_exchange: bool):
    """The registered q21 body with the exchange shape as a parameter."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == "NATION_1"
    )
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    if one_exchange:
        lo = lo.repartition(F.col("o_orderkey"))
    per_supp = lo.groupBy(
        F.col("o_orderkey").alias("po_orderkey"), F.col("l_suppkey").alias("ps")
    ).agg(
        F.max("is_late").alias("supp_late"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_rows"),
    )
    w_order = Window.partitionBy("po_orderkey")
    return (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w_order))
        .withColumn(
            "n_late_supp", F.sum(F.col("supp_late").cast("long")).over(w_order)
        )
        .filter(
            F.col("supp_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(s, F.col("ps") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


def main() -> int:
    from clickhousemigrators3_spark.session import get_spark

    spark = get_spark(
        app_name="q21_ab",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    big = f"/tmp/q21_scale_{REPL}x"
    build_fixture(spark, big)
    tracker = spark.sparkContext.statusTracker()

    rows = {}
    for label, one in (("one_exchange", True), ("two_exchange", False)):
        rows[label] = [
            (r["s_name"], r["numwait"]) for r in q21(spark, big, one).collect()
        ]
    same = rows["one_exchange"] == rows["two_exchange"]
    print(f"# results identical: {same} ({len(rows['one_exchange'])} rows)")
    if not same:
        return 1

    times: dict[str, list[float]] = {"one_exchange": [], "two_exchange": []}
    jobs: dict[str, int] = {}
    for it in range(ITERS):
        for label, one in (("one_exchange", True), ("two_exchange", False)):
            spark.sparkContext.setJobDescription(f"q21 {label} iter {it}")
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = q21(spark, big, one)
            df.write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
            jobs[label] = len(set(tracker.getJobIdsForGroup(None)) - set(j0))
    for label, ts in times.items():
        ts_s = sorted(ts)
        print(
            f"{label}: min {ts_s[0]:.3f}s p50 {ts_s[len(ts_s) // 2]:.3f}s "
            f"jobs {jobs[label]} (all: {[round(t, 3) for t in ts]})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
