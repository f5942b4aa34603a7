"""Additional TPC-H-shaped workload coverage: EXISTS-with-date-window (Q4),
conditional aggregation (Q12/Q14), HAVING (Q18), anti-join + scalar-subquery
(Q22), min-within-group join (Q2 shape), and the window-function breadth
suite (rank/dense_rank/ntile, moving aggregates, cumulative sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.money import (
    SQL_REVENUE,
    dec,
    revenue_expr,
    sql_dec,
    sql_sum_double,
    sum_double,
)
from ..registry import register


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: date-windowed EXISTS → left-semi join; the semi-join
    shuffles only the join key from lineitem."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE aggregation over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q14_promo_share",
    f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type LIKE 'type0%'
                                  THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE)
            / CAST(SUM({SQL_REVENUE}) AS DOUBLE)) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue share over a lineitem-part join.
    part scales with SF — join strategy left to AQE (no broadcast hint)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = revenue_expr()
    promo = F.when(
        F.col("p_type").like("type0%"), rev
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share")
        )
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT o_orderkey, o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM orders JOIN (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ) big ON o_orderkey = l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a grouped fact, joined back to orders, top-100."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_totalprice", F.col("sum_qty").cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT' AND o_totalprice > 350000)
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery threshold + anti-join + grouped totals.
    Anti-join target narrowed (urgent big-ticket orders) so the result is
    non-degenerate on the fixtures."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 350000)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
    SELECT s.s_suppkey, s.s_name, x.l_partkey, CAST(x.min_price AS DOUBLE) AS min_price
    FROM (
      SELECT l_partkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
      FROM lineitem GROUP BY 1
    ) x
    JOIN lineitem l ON l.l_partkey = x.l_partkey
      AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = x.min_price
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ORDER BY x.l_partkey, s.s_suppkey
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: min-within-group rejoined to recover the argmin rows
    (cheapest supplier per part)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    mins = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min(dec("l_extendedprice")).alias("min_price")
    )
    return (
        li.join(
            mins,
            (li.l_partkey == mins.pk) & (dec("l_extendedprice") == mins.min_price),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "l_partkey",
            F.col("min_price").cast("double").alias("min_price"),
        )
        .orderBy("l_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Window-function breadth
# ---------------------------------------------------------------------------


@register(
    "window_rank_dense_ntile",
    """
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    ).orderBy("o_custkey", "rnk", "o_orderkey")


@register(
    "window_moving_avg_3",
    """
    SELECT o_custkey, o_orderkey,
           (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / COUNT(*) OVER w) AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_moving_avg_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per customer — bounded-frame window aggregate.
    Explicit exact-sum/count division (Spark's avg(DECIMAL) rounds to
    scale+4; dividing the identical exact sums keeps both engines
    bit-equal)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    avg3 = F.sum(dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        avg3.alias("moving_avg3"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_cumulative_revenue",
    f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
             {sql_sum_double(SQL_REVENUE, 'rev')}
      FROM lineitem GROUP BY 1)
    SELECT m, rev,
           CAST(SUM(CAST(rev AS DECIMAL(24,6))) OVER (ORDER BY m
                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
    FROM monthly ORDER BY m
    """,
)
def window_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global cumulative sum over the (tiny) monthly rollup — the
    single-partition window runs on #months rows, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("m")
    ).agg(sum_double(revenue_expr(), "rev"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "m",
        "rev",
        F.sum(F.col("rev").cast("decimal(24,6)")).over(w).cast("double").alias("cum_rev"),
    ).orderBy("m")


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {sql_sum_double(SQL_REVENUE, 'revenue')}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the same dimension table (nation) joined twice under
    different roles with a symmetric cross-nation predicate — alias-heavy
    plan Catalyst must keep distinct."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(sum_double(revenue_expr(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q11_important_stock",
    """
    WITH vals AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
      FROM lineitem GROUP BY 1),
    threshold AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.0007 AS t
      FROM lineitem)
    SELECT l_partkey, part_value FROM vals, threshold
    WHERE part_value > t ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped values filtered against a global-aggregate
    threshold (fraction of total) — groupBy + scalar-broadcast join.
    Threshold 0.0007 of total revenue sits above the mean per-part share on
    the fixtures, so the result is selective but non-empty."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("part_value")
    )
    threshold = li.agg(
        (F.sum(dec("l_extendedprice")).cast("double") * F.lit(0.0007)).alias("t")
    )
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("t"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue_view AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue_view)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: a derived view consumed twice (rows + its own MAX) —
    argmax by scalar subquery. Exact-decimal revenue makes the equality
    against MAX safe cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue_view = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_expr()).cast("double").alias("total_revenue")
    )
    mx = revenue_view.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue_view, s.s_suppkey == revenue_view.supplier_no)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q20_part_suppliers",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-15')
    ORDER BY s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-joins (suppliers who shipped parts from a
    name-filtered part subset in a date window) — semi inside semi, each
    level shuffling only join keys."""
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-15").cast("timestamp_ntz"))
    )
    li_parts = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    return (
        s.join(li_parts, s.s_suppkey == li_parts.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "window_percentiles_firstlast",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_percentiles_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value / last_value — the remaining
    window surface. last_value needs the explicit full frame (the default
    frame ends at CURRENT ROW in both engines). Ratios rounded to 6dp
    (divisions of small ints — identical, rounding is belt-and-braces)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "setop_except_all",
    """
    SELECT l_orderkey FROM (
      SELECT l_orderkey FROM lineitem
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1)
    ORDER BY l_orderkey
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicity-aware difference — each
    orderkey loses exactly one occurrence per line-1 row, unlike the
    set-semantics EXCEPT which would drop every occurrence."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey")
        .exceptAll(li.filter(F.col("l_linenumber") == 1).select("l_orderkey"))
        .orderBy("l_orderkey")
    )


@register(
    "window_range_frame_30d",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(date_diff('day', DATE '1990-01-01',
                                       CAST(o_orderdate AS DATE)) AS BIGINT)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame (RANGE BETWEEN, vs the row frames
    elsewhere): each order's trailing-30-day spend for the same customer —
    the frame holds every order whose DATE is within 30 days, however many
    rows that is. Both engines order by integer day-offset so the range
    arithmetic is identical; the sum is decimal-exact. Ties in the order
    column are fine: RANGE frames include all peer rows, which is
    deterministic (unlike ROWS with ties)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    ).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_percentrank_cumedist",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice, o_orderkey), 6)
               AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cd
    FROM orders WHERE o_custkey % 100 = 0
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_percentrank_cumedist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window surface: PERCENT_RANK and CUME_DIST of each
    order within its customer's price history (deterministic
    (price, orderkey) tie-break; 1%-of-customers slice keeps the oracle
    result compact). Same one-shuffle-per-partition-key topology as every
    other window query."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_nth_value_lead_defaults",
    """
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_cheapest_order,
           LEAD(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice, o_orderkey)
               AS next_pricier_order,
           LAG(o_orderkey, 2, -1) OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice, o_orderkey)
               AS two_cheaper_order
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
)
def window_nth_value_lead_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-surface breadth: nth_value over a running frame (NULL until
    the frame holds n rows — both engines agree on the frame-dependent
    semantics) and lead/lag with explicit offsets and non-NULL defaults.
    Deterministic (o_totalprice, o_orderkey) ordering throughout."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_order"),
            F.lead("o_orderkey", 1, -1).over(wo).alias("next_pricier_order"),
            F.lag("o_orderkey", 2, -1).over(wo).alias("two_cheaper_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
