"""Analytics operators beyond the reference surface — set ops, grouping
sets, subqueries, deterministic sampling, distinct aggregates, scalar/string
function parity (SURVEY §2.4 F-table, §2.7's "absent categories" filled in
as first-class engine capabilities).

All DuckDB-checkable; money aggregates decimal-exact as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import oracle_hash_sql, stable_hash32
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
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {sql_sum_double(f"{sql_dec('l_extendedprice')} * {sql_dec('l_discount')}",
                           'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches
    the parquet reader (PushedFilters) — the canonical pushdown check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(sum_double(dec("l_extendedprice") * dec("l_discount"), "revenue"))


TPCH_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {sql_sum_double(SQL_REVENUE, 'revenue')}, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", TPCH_Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter + top-20. Only nation (25
    rows at any SF) is force-broadcast; orders/customer join strategy is
    AQE's call — they grow with SF."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum_double(revenue_expr(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_URGENT = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_RICH = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000"


def _urgent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


def _rich(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )


@register(
    "setop_union",
    f"SELECT custkey FROM ({_URGENT} UNION {_RICH}) ORDER BY custkey",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + distinct shuffle on the key only."""
    return _urgent(spark, sf_dir).union(_rich(spark, sf_dir)).distinct().orderBy("custkey")


@register(
    "setop_intersect",
    f"SELECT custkey FROM ({_URGENT} INTERSECT {_RICH}) ORDER BY custkey",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).intersect(_rich(spark, sf_dir)).orderBy("custkey")


@register(
    "setop_except",
    f"SELECT custkey FROM ({_RICH} EXCEPT {_URGENT}) ORDER BY custkey",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).exceptAll(_urgent(spark, sf_dir)).distinct().orderBy(
        "custkey"
    )


# ---------------------------------------------------------------------------
# Grouping sets
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum_double(SQL_REVENUE, 'revenue')},
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag×status → grand total) in one
    pass — Spark expands grouping sets in a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            sum_double(revenue_expr(), "revenue"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@register(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@register(
    "subquery_orders_above_avg",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The scalar
    aggregates once and broadcasts — no per-row recomputation."""
    o = load_table(spark, sf_dir, "orders")
    avg = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        o.join(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "subquery_correlated_max_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders o1
    WHERE o_totalprice = (SELECT MAX(o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o1.o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (each customer's max-price orders) decorrelated
    into a grouped-max self-join — the plan Catalyst would produce for the
    SQL form, written explicitly. The grouped side is per-customer (scales
    with SF) so no broadcast hint."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        o.join(
            mx,
            (o.o_custkey == mx.ck) & (o.o_totalprice == mx.max_price),
        )
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Deterministic sampling + distinct aggregates
# ---------------------------------------------------------------------------


@register(
    "sample_hash_5pct",
    f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE {oracle_hash_sql('CAST(o_orderkey AS VARCHAR)', bits=32)} % 100 < 5
    ORDER BY o_orderkey
    """,
)
def sample_hash_5pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample via content hash — reproducible across
    engines, runs, and partitionings (TABLESAMPLE's RNG is none of those).
    The standard trick for stable eval/holdout splits in data pipelines."""
    o = load_table(spark, sf_dir, "orders")
    bucket = stable_hash32(F.col("o_orderkey").cast("string")) % 100
    return o.filter(bucket < 5).select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


@register(
    "agg_distinct_counts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation — Spark plans this as expand + two-phase
    aggregate; exact, unlike approx_count_distinct (provided separately as a
    rows-only sketch query since HLL implementations differ per engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register("approx_distinct_sketch", None)  # HLL algos differ per engine → rows-only
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts — the 100 TB path for
    cardinality estimation (fixed memory per group vs. the exact expand).
    Engine-specific sketch → rows-only driver check; the unit test bounds
    its error against the exact count instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Scalar / string function parity (SURVEY §2.4 F1-F9 as generic ops)
# ---------------------------------------------------------------------------


@register(
    "string_scalar_functions",
    r"""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           regexp_extract(p_type, '^(\w+)', 1) AS type_head,
           regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name_pfx,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part ORDER BY p_partkey
    """,
)
def string_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5 parity as generic column ops: regex extract/replace (the
    reference's DDL-rewrite and engine_full-parse regexes, structured),
    whitespace normalization, substring/concat/length."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
        F.regexp_replace(F.col("p_name"), r"\s+", "_").alias("name_snake"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.substring(F.col("p_name"), 1, 5).alias("name_pfx"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    ).orderBy("p_partkey")


@register(
    "date_format_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(date_part('quarter', o_orderdate) AS INT) AS order_quarter,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
    FROM orders ORDER BY o_orderkey
    """,
)
def date_format_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 parity (timestamp formatting) as generic ops: date_format,
    year/quarter extraction, date arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("order_month"),
        F.year(F.col("o_orderdate")).cast("int").alias("order_year"),
        F.quarter(F.col("o_orderdate")).cast("int").alias("order_quarter"),
        F.datediff(F.lit("2002-01-01").cast("timestamp_ntz"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_2002"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Array aggregation, exact median, null-handling surface
# ---------------------------------------------------------------------------


@register(
    "array_agg_types_per_user",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           len(list(DISTINCT event_type)) AS n_types
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def array_agg_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the set of event types per user, built as a sorted
    array (collect_set is unordered — sort_array makes it deterministic)
    then serialized to a comma-joined string at the output boundary so
    external comparators that can't sort list cells still hash it."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "types"
            ),
            F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


@register(
    "median_value_per_type",
    """
    SELECT event_type,
           ROUND(median(value), 6) AS med,
           ROUND(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def median_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + interpolated p90 per event type. Both engines define
    these as linear interpolation between adjacent order statistics; rounded
    to 6dp to absorb the interpolation arithmetic's last ulp."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.median("value"), 6).alias("med"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


@register(
    "null_handling_surface",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           GREATEST(o_totalprice, 100000.0) AS floored_price,
           IFNULL(NULL, o_orderkey) AS ifnull_demo
    FROM orders ORDER BY o_orderkey
    """,
)
def null_handling_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null/conditional scalar surface: coalesce/nullif/case/greatest/
    ifnull — all JVM codegen, listed once so the inventory is explicit."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored_price"),
        F.ifnull(F.lit(None).cast("long"), F.col("o_orderkey")).alias("ifnull_demo"),
    ).orderBy("o_orderkey")


@register(
    "unpivot_daily_event_counts",
    """
    WITH wide AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY 1)
    SELECT day, event_type, cnt
    FROM wide UNPIVOT (cnt FOR event_type IN (click, view))
    ORDER BY day, event_type
    """,
)
def unpivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-day counts back to long form — the inverse of
    the pivot operator, via the native ``DataFrame.unpivot`` (Spark 3.4+)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    wide = (
        e.groupBy(day)
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("click"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("view"),
        )
    )
    return (
        wide.unpivot("day", ["click", "view"], "event_type", "cnt")
        .orderBy("day", "event_type")
    )


@register(
    "histogram_value_buckets",
    """
    SELECT CAST(CASE WHEN value < 0 THEN 0
                WHEN value >= 200 THEN 21
                ELSE floor(value / 10) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram binning (width_bucket semantics: 20 buckets over [0,200),
    underflow→0, overflow→21, written as explicit arithmetic so the oracle
    is dialect-independent — DuckDB 1.0 lacks width_bucket). The grouped
    form scales as a plain aggregate (bytes shuffled ∝ #buckets)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    bucket = (
        F.when(v < 0, 0)
        .when(v >= 200, 21)
        .otherwise(F.floor(v / 10) + 1)
        .cast("long")
    )
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "stats_aggregates_lineitem",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(stddev_samp(l_quantity), 6) AS std_qty,
           ROUND(var_samp(l_discount), 8) AS var_disc,
           ROUND(skewness(l_quantity) * (COUNT(*) - 2) / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS skew_qty
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def stats_aggregates_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar / stddev / variance / skewness).
    Both engines use streaming moment updates whose accumulation order
    differs — rounded to absorb the trailing-ulp drift. Skewness definitions
    differ (Spark: population g1; DuckDB: sample-adjusted G1) — the oracle
    converts G1 back to g1 with the (n-2)/sqrt(n(n-1)) factor."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
            F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "skew_salted_join_counts",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY s_name
    """,
)
def skew_salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join (functions/skew.py) driven through the contract:
    lineitem×supplier with the supplier side replicated across 8 salts so a
    hot supplier key fans out over 8 reducer tasks instead of one straggler.
    Result set provably identical to the plain join (the oracle IS the
    plain join). AQE skew-split covers most cases at runtime; explicit
    salting is the escape hatch when one key exceeds a single task even
    after splitting."""
    from ..functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(
        li.select(F.col("l_suppkey").alias("s_suppkey")), s, on="s_suppkey"
    )
    return (
        joined.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("s_name")
    )


@register(
    "skew_hotkey_salted_agg",
    """
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 2 = 0 THEN CAST(-1 AS BIGINT)
                  ELSE l_orderkey END AS hot_key
      FROM lineitem)
    SELECT hot_key, CAST(COUNT(*) AS BIGINT) AS n
    FROM skewed GROUP BY hot_key ORDER BY n DESC, hot_key LIMIT 10
    """,
)
def skew_hotkey_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation under REAL skew: half of lineitem collapses onto
    one derived key (-1), the worst case for a plain groupBy (one reducer
    owns 50% of the table). The two-phase salted count (partial on
    (key, salt), final on key) splits that key across 8 tasks; the oracle is
    the plain group-count, so correctness under the hot key is
    value-checked, not assumed. Plan guard: tests/test_plans.py asserts the
    salt fan-out survives optimization."""
    from ..functions.skew import salted_agg_count

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(-1).cast("long"))
        .otherwise(F.col("l_orderkey"))
        .alias("hot_key")
    )
    counted = salted_agg_count(li, "hot_key", n_salts=8)
    return (
        counted.select("hot_key", F.col("cnt").alias("n"))
        .orderBy(F.desc("n"), "hot_key")
        .limit(10)
    )


@register(
    "skew_hotkey_salted_join",
    """
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 2 = 0 THEN CAST(1 AS BIGINT)
                  ELSE 1 + l_orderkey % 100 END AS s_suppkey
      FROM lineitem)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM skewed JOIN supplier USING (s_suppkey)
    GROUP BY s_name ORDER BY s_name
    """,
)
def skew_hotkey_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under REAL skew: half of lineitem's rows map to supplier
    key 1, the classic one-straggler join. salted_join replicates the
    supplier side across 8 salts so the hot key's probe work spreads over 8
    tasks; the oracle is the plain join+count. (AQE skew-split also fires on
    shuffled joins at runtime — explicit salting is the guarantee when one
    key exceeds a single task even after splitting, and the form that works
    for aggregation state too.)"""
    from ..functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1).cast("long"))
        .otherwise(1 + F.col("l_orderkey") % 100)
        .alias("s_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, s, on="s_suppkey", n_salts=8)
    return (
        joined.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("s_name")
    )


@register(
    "array_functions_surface",
    """
    WITH g AS (
      SELECT l_orderkey,
             list(l_quantity
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) AS qtys,
             list(l_extendedprice
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) AS prices
      FROM lineitem WHERE l_orderkey < 1000 GROUP BY 1)
    SELECT l_orderkey,
           len(qtys) AS n_items,
           CAST(list_aggregate(qtys, 'sum') AS DOUBLE) AS total_qty,
           CAST(list_aggregate(qtys, 'max') AS DOUBLE) AS max_qty,
           len(list_filter(qtys, x -> x >= 30)) AS n_heavy,
           CAST(list_aggregate(
               list_transform(range(1, len(qtys) + 1),
                              i -> CAST(qtys[i] AS DECIMAL(18,2))
                                   * CAST(prices[i] AS DECIMAL(18,2))),
               'sum') AS DOUBLE) AS revenue
    FROM g ORDER BY l_orderkey
    """,
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface (ClickHouse arrayMap / arrayFilter
    / arrayReduce parity): per-order line quantities collected into a
    linenumber-ordered array, then transform / filter / aggregate / zip_with
    — all JVM lambda expressions, zero Python UDFs. Both line arrays are
    extracted from ONE struct array under a total order (linenumber alone
    is not unique in the fixture — independent sorts would pair qty/price
    from different lines), and the revenue fold runs in DECIMAL(18,2)
    products so the sum is exact and order-independent in both engines.
    Arrays stay internal — the output is scalar columns."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    lines = F.array_sort(
        F.collect_list(
            F.struct("l_linenumber", "l_quantity", "l_extendedprice")
        )
    )
    g = li.groupBy("l_orderkey").agg(
        F.transform(lines, lambda s: s["l_quantity"]).alias("qtys"),
        F.transform(lines, lambda s: s["l_extendedprice"]).alias("prices"),
    )
    acc_t = "decimal(30,4)"
    products = F.zip_with(
        "qtys",
        "prices",
        lambda q, p: (
            q.cast("decimal(18,2)") * p.cast("decimal(18,2)")
        ).cast(acc_t),
    )
    return (
        g.select(
            "l_orderkey",
            F.size("qtys").cast("long").alias("n_items"),
            F.aggregate("qtys", F.lit(0.0), lambda a, x: a + x).alias("total_qty"),
            F.array_max("qtys").cast("double").alias("max_qty"),
            F.size(F.filter("qtys", lambda x: x >= 30)).cast("long").alias("n_heavy"),
            F.aggregate(
                products,
                F.lit(0).cast(acc_t),
                lambda a, x: (a + x).cast(acc_t),
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_orderkey")
    )


@register("approx_percentiles_value", None)  # sketch impls differ → rows-only
def approx_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch (ClickHouse ``quantileTDigest`` class):
    p50/p90/p99 of event values per type via ``approx_percentile`` — a
    mergeable sketch, so partial aggregation works map-side and the shuffle
    carries one sketch per (type, partition), not raw rows. The exact twin
    (median_value_per_type) is the oracle-checked counterpart; this entry
    is the 100 TB path where an exact global sort is not worth the cost."""
    e = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000)
    return (
        e.groupBy("event_type")
        .agg(
            pct[0].alias("p50"),
            pct[1].alias("p90"),
            pct[2].alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "percentile_disc_per_type",
    """
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           quantile_disc(value, 0.9) AS p90_disc,
           MIN(value) AS min_v, MAX(value) AS max_v
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def percentile_disc_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (``PERCENTILE_DISC``): unlike the interpolated
    continuous form (median_value_per_type, which needs 6dp rounding), the
    discrete percentile RETURNS an actual data value — both engines pick
    the same order statistic, so the comparison is exact with no rounding."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
                "p50_disc"
            ),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias(
                "p90_disc"
            ),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_conditional_if",
    """
    SELECT n_name,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_finished,
           CAST(COUNT(DISTINCT CASE WHEN o_totalprice > 200000
                                    THEN o_custkey END) AS BIGINT) AS big_spenders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def agg_conditional_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregate surface (ClickHouse ``countIf``/``sumIf``,
    ANSI ``FILTER`` clause): several differently-filtered aggregates in ONE
    grouped pass — the idiom that replaces N filtered scans with one. All
    conditions evaluate map-side; the decimal discipline keeps the filtered
    money sum exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            )
            .cast("double")
            .alias("sum_finished"),
            F.count_distinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
            )
            .cast("long")
            .alias("big_spenders"),
        )
        .orderBy("n_name")
    )


@register(
    "try_functions_surface",
    """
    SELECT event_id,
           value / NULLIF(CAST(value AS INTEGER) - CAST(value AS INTEGER), 0)
               AS div_by_zero,
           TRY_CAST(event_type AS INTEGER) AS bad_cast,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS good_cast,
           COALESCE(TRY_CAST(event_type AS INTEGER), -1) AS defaulted
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
)
def try_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe function surface (ClickHouse ``toInt32OrNull`` /
    ``...OrNull`` parity): this engine runs ANSI mode, where bare division
    by zero and bad casts RAISE — ``try_divide``/``try_cast`` are the
    explicit or-null escape hatches, so malformed rows degrade to nulls
    instead of failing 100 TB jobs. The oracle mirrors with NULLIF-guarded
    division and TRY_CAST."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    zero = (F.col("value").cast("int") - F.col("value").cast("int")).cast("double")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), zero).alias("div_by_zero"),
        F.try_to_number(F.col("event_type"), F.lit("999999")).cast("int").alias(
            "bad_cast"
        ),
        F.get_json_object("props", "$.k").try_cast("int").alias("good_cast"),
        F.coalesce(
            F.try_to_number(F.col("event_type"), F.lit("999999")).cast("int"),
            F.lit(-1),
        ).alias("defaulted"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# IPv4 function surface (ClickHouse IPv4NumToString / IPv4StringToNum /
# isIPAddressInRange family) — derived deterministically from user_id so the
# oracle reproduces every value
# ---------------------------------------------------------------------------


@register(
    "ipv4_functions_surface",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    ips AS (
      SELECT user_id,
             167772160 + ((user_id * 7919) % 16777216) AS ip_num,
             (user_id * 104729) % 4294967296 AS ip2_num
      FROM u)
    SELECT user_id,
           CAST(ip_num AS BIGINT) AS ip_num,
           ((ip_num >> 24) & 255) || '.' || ((ip_num >> 16) & 255) || '.'
             || ((ip_num >> 8) & 255) || '.' || (ip_num & 255) AS ip_str,
           (((ip_num >> 24) & 255) * 16777216 + ((ip_num >> 16) & 255) * 65536
             + ((ip_num >> 8) & 255) * 256 + (ip_num & 255)) = ip_num AS rt_ok,
           (ip_num >> 16) = 2602 AS in_cidr_10_42_16,
           CAST(ip2_num AS BIGINT) AS ip2_num,
           CASE WHEN (ip2_num >> 24) = 10 THEN 'rfc1918-10/8'
                WHEN (ip2_num >> 20) = 2753 THEN 'rfc1918-172.16/12'
                WHEN (ip2_num >> 16) = 49320 THEN 'rfc1918-192.168/16'
                ELSE 'public' END AS ip2_class
    FROM ips ORDER BY user_id
    """,
)
def ipv4_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 function surface, ClickHouse-parity: num→dotted-quad rendering,
    string→num round-trip proof, /16 CIDR membership, RFC1918
    classification — all integer shifts/masks in whole-stage codegen (IPs
    are synthesized from user_id; fixtures carry none). 10.42/16 packs to
    2602 = (10<<8)+42; 172.16/12's top 12 bits are 2753; 192.168/16's top
    16 are 49320."""
    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ips = u.select(
        "user_id",
        (F.lit(167772160) + (F.col("user_id") * 7919) % 16777216).alias("ip_num"),
        ((F.col("user_id") * 104729) % F.lit(4294967296)).alias("ip2_num"),
    )
    oct_ = lambda n, s: F.shiftright(F.col(n), s).bitwiseAND(F.lit(255))  # noqa: E731
    ip_str = F.concat_ws(
        ".",
        oct_("ip_num", 24).cast("string"),
        oct_("ip_num", 16).cast("string"),
        oct_("ip_num", 8).cast("string"),
        (F.col("ip_num").bitwiseAND(F.lit(255))).cast("string"),
    )
    rt = (
        oct_("ip_num", 24) * 16777216
        + oct_("ip_num", 16) * 65536
        + oct_("ip_num", 8) * 256
        + F.col("ip_num").bitwiseAND(F.lit(255))
    ) == F.col("ip_num")
    ip2_class = (
        F.when(F.shiftright("ip2_num", 24) == 10, "rfc1918-10/8")
        .when(F.shiftright("ip2_num", 20) == 2753, "rfc1918-172.16/12")
        .when(F.shiftright("ip2_num", 16) == 49320, "rfc1918-192.168/16")
        .otherwise("public")
    )
    return ips.select(
        "user_id",
        F.col("ip_num").cast("long").alias("ip_num"),
        ip_str.alias("ip_str"),
        rt.alias("rt_ok"),
        (F.shiftright("ip_num", 16) == 2602).alias("in_cidr_10_42_16"),
        F.col("ip2_num").cast("long").alias("ip2_num"),
        ip2_class.alias("ip2_class"),
    ).orderBy("user_id")


@register(
    "histogram_equidepth_value",
    """
    WITH b AS (
      SELECT value,
             NTILE(10) OVER (ORDER BY value NULLS LAST, event_id) AS bucket
      FROM events)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, MIN(value) AS lo,
           MAX(value) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equidepth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram over event values: NTILE(10) with a
    deterministic (value, event_id) tie-break, then per-bucket count and
    bounds — the companion to the equi-width histogram above.

    Scale: exact NTILE needs a total order (one sorted exchange; fine at
    fixture scale, serial at 100 TB). The scale path replaces the global
    window with approx_percentile cut points + a range bucket join —
    ``approx_percentiles_value`` is that estimator; this query is its exact
    twin for validating the sketch's error."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    # asc_nulls_last matches DuckDB's default NULLS LAST; Spark ascending is
    # NULLS FIRST, which would silently put any NULL values in bucket 1.
    w = Window.orderBy(F.asc_nulls_last("value"), "event_id")
    b = e.select("value", F.ntile(10).over(w).alias("bucket"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "window_time_range_1h_per_user",
    """
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(ROUND(SUM(value) OVER w * 100) AS BIGINT) AS sum_1h_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY date_diff('microseconds',
                                    TIMESTAMP '2024-01-01 00:00:00', ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_time_range_1h_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based window frame (``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING``):
    per event, the count and value sum of the same user's trailing hour —
    the sliding-window-per-row analytic rows-based frames can't express
    (a ROWS frame counts rows, not time). Spark's rangeBetween needs a
    numeric sort key, so the frame runs over microseconds-since-anchor
    (``timestampdiff`` from a fixed NTZ epoch; DuckDB ``date_diff``) —
    integral, timezone-free, identical in both engines regardless of the
    session TZ (``unix_micros`` would reject/shift TIMESTAMP_NTZ values,
    and any epoch-based key silently moves with the session timezone on a
    vanilla session). Sum emitted in integer cents
    (float-order immunity). One shuffle on user_id, sorted once; per-row
    state is the sliding frame bounds — O(1) memory per partition."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w) * 100).cast("long").alias("sum_1h_cents"),
        )
        .orderBy("user_id", "event_id")
    )
