"""Reference-surface relational queries (SURVEY.md §2.2/§2.3) and the
TPC-H-style join/window workload (§7.3) — all pure DataFrame, all
DuckDB-checkable.

Scale notes per query are in the docstrings; the common properties:

* filters/projections sit directly on the parquet scan (PushedFilters),
* dimension joins use explicit ``F.broadcast`` (region/nation/customer/
  supplier/part stay far under the threshold at every SF; at 100 TB the fact
  side never shuffles for these),
* aggregates rely on map-side partial aggregation, so shuffled bytes are
  ∝ #groups, not #rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.money import (
    SQL_REVENUE,
    avg_double,
    dec,
    revenue_expr,
    sql_avg_double,
    sql_dec,
    sql_sum_double,
    sum_double,
)
from ..plans.partitions import discover_partitions, remaining_partitions
from ..registry import register

# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.1) — partition discovery + per-partition counts fused:
# the semantic core of the reference (M4 + A1/A2) as one statement.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS p_month,
       COUNT(*) AS row_cnt,
       {sql_sum_double(SQL_REVENUE, 'revenue')}
FROM lineitem
GROUP BY p_month
ORDER BY p_month
"""


@register("flagship_partition_rollup", FLAGSHIP_ORACLE)
def flagship_partition_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly partition rollup over lineitem: the reference's
    partition-discovery (M4, ``partition.py:107-114``) + per-partition count
    (A2, ``validator.py:24-28``) in ONE distributed job instead of 1 + N
    scalar queries. Scan is pruned to 3 columns; shuffle is #months rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("p_month"))
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            sum_double(revenue_expr(), "revenue"),
        )
        .orderBy("p_month")
    )


# ---------------------------------------------------------------------------
# M4 — partition discovery (single + composite key)
# ---------------------------------------------------------------------------


@register(
    "m4_partition_discovery",
    """
    SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE) AS p_month
    FROM lineitem ORDER BY p_month
    """,
)
def m4_partition_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (``partition.py:107-114``): ordered distinct partition values, for
    a *derived* single-column partition key. The scan reads one column; the
    distinct is a partial-agg shuffle of #partitions rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return discover_partitions(
        li, [F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("p_month")]
    )


@register(
    "m4_composite_partition_discovery",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
)
def m4_composite_partition_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 composite-key case (tuple partition values,
    ``partition.py:38-57``): distinct over 2 physical columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return discover_partitions(li, ["l_returnflag", "l_linestatus"])


# ---------------------------------------------------------------------------
# M5 / M6 / A1 / A2 — filters + counts
# ---------------------------------------------------------------------------


@register(
    "m5_negated_membership",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def m5_negated_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 (``migration.py:548-550``): enumeration with a negated membership
    filter (engine NOT IN ('View','MaterializedView') analogue). NOT IN over
    literals compiles to pushed-down parquet filters."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority").filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


@register(
    "m6_partition_predicate_count",
    """
    SELECT COUNT(*) AS row_cnt FROM lineitem
    WHERE l_returnflag = 'A' AND l_linestatus = 'F'
    """,
)
def m6_partition_predicate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 + A2 (``partition.py:29-75``, ``validator.py:24-28``): typed
    composite-partition equality predicate, pushed to the scan, under a
    count. The predicate comes from plans.partition_predicate — schema-typed,
    no string probing (obsoletes reference F4)."""
    from ..plans.partitions import partition_predicate

    li = load_table(spark, sf_dir, "lineitem")
    pred = partition_predicate({"l_returnflag": "A", "l_linestatus": "F"})
    return li.filter(pred).agg(F.count(F.lit(1)).alias("row_cnt"))


@register("a1_total_count", "SELECT COUNT(*) AS row_cnt FROM lineitem")
def a1_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (``validator.py:31``). Parquet aggregate pushdown answers this from
    footer metadata — no row scan at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("row_cnt"))


@register(
    "a5_status_tally",
    "SELECT o_orderstatus AS status, COUNT(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1",
)
def a5_status_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (``report.py:20-35``): report summary tally as a grouped count."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("status")
    )


@register(
    "a6_resume_antijoin",
    """
    WITH parts AS (
      SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE) AS p_month
      FROM lineitem
    ),
    done AS (SELECT p_month FROM parts WHERE p_month < DATE '1998-01-01')
    SELECT p.p_month FROM parts p
    WHERE NOT EXISTS (SELECT 1 FROM done d WHERE d.p_month = p.p_month)
    ORDER BY p.p_month
    """,
)
def a6_resume_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/C4 (``resume.py:38``): resume set-difference as LEFT ANTI join —
    completed partitions (here: months before 1998) are skipped. The done
    side is tiny → broadcast anti-join, zero shuffle of the big side."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = discover_partitions(
        li, [F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("p_month")]
    )
    done = parts.filter(F.col("p_month") < F.lit("1998-01-01").cast("date"))
    return remaining_partitions(parts, F.broadcast(done), ["p_month"]).orderBy("p_month")


# ---------------------------------------------------------------------------
# TPC-H-style workload — joins, windows, top-k (SURVEY §7.3 "Joins",
# "Ranking/window fns"). These are the bench headliners.
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum_double(sql_dec('l_quantity'), 'sum_qty')},
       {sql_sum_double(sql_dec('l_extendedprice'), 'sum_base_price')},
       {sql_sum_double(SQL_REVENUE, 'sum_disc_price')},
       {sql_sum_double(f"{SQL_REVENUE} * (1 + {sql_dec('l_tax')})", 'sum_charge')},
       {sql_avg_double(sql_dec('l_quantity'), 'avg_qty')},
       {sql_avg_double(sql_dec('l_extendedprice'), 'avg_price')},
       {sql_avg_double(sql_dec('l_discount'), 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", Q1_ORACLE)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over the fact table. One pass, 6
    output groups; every measure decimal-exact. The shipdate filter is pushed
    into the scan (min/max row-group skipping)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = revenue_expr()
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_double(dec("l_quantity"), "sum_qty"),
            sum_double(dec("l_extendedprice"), "sum_base_price"),
            sum_double(disc_price, "sum_disc_price"),
            sum_double(charge, "sum_charge"),
            avg_double(dec("l_quantity"), "avg_qty"),
            avg_double(dec("l_extendedprice"), "avg_price"),
            avg_double(dec("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_sum_double(SQL_REVENUE, 'revenue')},
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast join → agg → top-k.
    No forced broadcasts: orders/customer grow with SF, so the hint that
    helps at sf0.1 would OOM a 100 TB driver — AQE broadcasts them while
    they fit the threshold and falls back to shuffle joins beyond it.
    Top-10 is a TakeOrdered, not a global sort; tie-broken by l_orderkey so
    the limit is deterministic."""
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(sum_double(revenue_expr(), "revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q5_ORACLE = f"""
SELECT n_name, {sql_sum_double(SQL_REVENUE, 'revenue')}
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("tpch_q5_local_supplier_volume", Q5_ORACLE)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Bounded dims (region/nation)
    broadcast explicitly; supplier/customer/orders scale with SF so their
    join strategy is left to AQE. The s_nationkey=c_nationkey condition
    makes it a cyclic join — expressed as a post-join filter so Catalyst
    keeps the star plan."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(sum_double(revenue_expr(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "join_semi_customers_with_urgent_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS semantics) — reference A6's dual; Spark emits a
    semi-join with no payload columns from the right side shuffled."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — the exact primitive behind resume (A6).
    The right side is filtered (big-ticket orders) so the anti-join is
    non-degenerate on the fixtures (every customer has *some* order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "window_topn_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number window. Spark 3.5+ inserts a
    WindowGroupLimit (partial top-k before the shuffle), so per-group state
    is bounded — the scalable form of per-key top-k."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_lag_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INT) AS gap_days
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window — inter-order gap per customer in days."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("int").alias("gap_days"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "sql_api_revenue_by_nation",
    """
    SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``spark.sql`` entry path: register the catalog views and run the
    SAME SQL text the oracle runs (dialect-shared subset). Demonstrates that
    the engine's second API surface — SQL over registered tables — produces
    identical plans/results to the DataFrame API (both compile through
    Catalyst)."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    from ..registry import REGISTRY

    return spark.sql(REGISTRY["sql_api_revenue_by_nation"].oracle)


@register(
    "window_ratio_to_report",
    """
    WITH r AS (
      SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(revenue AS DOUBLE) AS revenue,
           ROUND(CAST(revenue AS DOUBLE)
                 / CAST(SUM(revenue) OVER () AS DOUBLE), 6) AS share
    FROM r ORDER BY n_name
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (``ratio_to_report``): each nation's share of
    global order revenue. The grouped sum reduces to |nations| rows BEFORE
    the unpartitioned total window, so the single-partition window scans
    dozens of rows, not the fact table — the safe way to use an OVER ()
    at any scale. Division happens in double on decimal-exact inputs, so
    both engines agree to the bit before rounding."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return r.select(
        "n_name",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("revenue").cast("double") / total.cast("double"), 6
        ).alias("share"),
    ).orderBy("n_name")


@register(
    "window_topn_with_ties",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rk
      FROM orders)
    WHERE rk <= 2 ORDER BY o_custkey, rk, o_orderkey
    """,
)
def window_topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-n WITH TIES (``RANK() <= k``, the FETCH FIRST ... WITH TIES
    semantic): unlike row_number top-n, equal prices share a rank and are
    all kept, so the result is deterministic WITHOUT a tie-break column.
    Same WindowGroupLimit bounded-state plan as window_topn."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast("long").alias("rk")
        )
        .orderBy("o_custkey", "rk", "o_orderkey")
    )
