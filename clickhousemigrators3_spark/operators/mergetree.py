"""MergeTree-engine *query* semantics — the ClickHouse table engines whose
behavior lives in background merges, re-expressed as explicit Spark queries.

The reference migrates MergeTree-family tables (its DDL rewrite keeps the
engine clause verbatim — reference ``migration.py`` builds
``CREATE TABLE … ENGINE = …`` from the source table's DDL), so a user
switching to this repo needs the *read-side* semantics those engines give
for free:

* ReplacingMergeTree + ``FINAL``  → latest version per key
  (:func:`ch_replacing_final`)
* CollapsingMergeTree(sign)       → net row multiplicity per state
  (:func:`ch_collapsing_net_state`)
* VersionedCollapsingMergeTree    → per-version cancellation, then latest
  surviving version (:func:`ch_versioned_collapsing_final`)
* SummingMergeTree                → plain keyed SUM; already covered by the
  grouped-aggregation surface (e.g. ``entropy``/daily rollups), so it gets
  no dedicated query — a groupBy IS the merge.

Plus three adjacent ClickHouse-isms users reach for in the same breath:
``LIMIT n BY key`` (:func:`ch_limit_by_recent`), ``sequenceNextNode``
(:func:`ch_sequence_next_node`), ``sumMap`` (:func:`ch_summap_daily`), and
``dictGet`` (:func:`ch_dict_get_nation_name`).

Scale notes: every query is one shuffle — a grouped aggregation or a
window partitioned by the same key. FINAL-style dedup at 100 TB is the
classic "compact the CDC tail" job: the window form here is exactly what a
1000-executor run wants (hash-partition by key, sort within partition,
keep rank 1 — no global sort, no driver state). The dictGet map literal is
driver-collected by design: ClickHouse external dictionaries are
bounded-by-contract lookup tables (here: nation, 25 rows at every SF), so
the lookup compiles into the row expression with zero join and zero
shuffle — strictly cheaper than even a broadcast join at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register


@register(
    "ch_replacing_final",
    """
    WITH v AS (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      FROM events)
    SELECT user_id, event_type, value AS final_value, ts AS final_ts,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM v WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def ch_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree + ``SELECT … FINAL`` parity: one surviving row per
    key — the one with the greatest version. Key is (user_id, event_type);
    version is (ts, event_id) with event_id as the deterministic tie-break
    (ClickHouse keeps an arbitrary row among equal versions; a reproducible
    engine must not).

    Spark-first: a single ROW_NUMBER window partitioned by the key — the
    same one-shuffle shape as a groupBy, but it keeps the whole winning row
    without an argmax-per-column reconstruction join."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("value").alias("final_value"),
            F.col("ts").alias("final_ts"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_versions"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    )


@register(
    "ch_collapsing_net_state",
    """
    SELECT user_id, event_type,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS net,
           CAST(ROUND(SUM(value * CASE WHEN event_id % 2 = 0
                                       THEN 1 ELSE -1 END) * 100)
                AS BIGINT) AS net_value_cents
    FROM events
    GROUP BY user_id, event_type
    HAVING SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) <> 0
    ORDER BY user_id, event_type
    """,
)
def ch_collapsing_net_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree(sign) parity: +1 rows insert a state, -1 rows
    cancel it; a fully-merged read sees only keys whose net sign ≠ 0, with
    signed aggregates over the surviving multiplicity. The fixture has no
    sign column, so sign is derived deterministically (even event_id = +1,
    odd = -1) — the collapse algebra is what's under test.

    Net value is emitted in integer cents: both engines sum doubles in
    different orders, and an integer output absorbs the last-ulp drift that
    would break the value hash. One grouped aggregation, map-side
    combinable (SUM of ±1 and SUM of ±value are both partial-aggregatable),
    so the collapse costs exactly one shuffle at any scale."""
    e = load_table(spark, sf_dir, "events")
    sign = F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.sum(sign).cast("long").alias("net"),
            F.round(F.sum(F.col("value") * sign) * 100)
            .cast("long")
            .alias("net_value_cents"),
        )
        .filter(F.col("net") != 0)
        .orderBy("user_id", "event_type")
    )


@register(
    "ch_versioned_collapsing_final",
    """
    WITH per_version AS (
      SELECT user_id, event_type,
             CAST(date_trunc('day', ts) AS DATE) AS version_day,
             SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS net,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events
      GROUP BY 1, 2, 3
      HAVING SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) <> 0),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY version_day DESC) AS rn
      FROM per_version)
    SELECT user_id, event_type, version_day,
           CAST(net AS BIGINT) AS net, n_rows
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def ch_versioned_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree parity: sign cancellation happens only
    WITHIN a version (here: the day of ts), and a FINAL read returns each
    key's latest version that survived its own cancellation. Two stages:
    per-(key, version) net sign — a grouped aggregation — then latest
    surviving version per key — a window over the (already small) surviving
    relation. The second shuffle moves one row per (key, version), not the
    fact table."""
    e = load_table(spark, sf_dir, "events")
    sign = F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    per_version = (
        e.groupBy(
            "user_id",
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("version_day"),
        )
        .agg(
            F.sum(sign).alias("net"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .filter(F.col("net") != 0)
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("version_day"))
    return (
        per_version.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "version_day",
            F.col("net").cast("long").alias("net"),
            "n_rows",
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "ch_limit_by_recent",
    """
    WITH r AS (
      SELECT user_id, ts, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, ts, event_type, event_id
    FROM r WHERE rn <= 2
    ORDER BY user_id, ts DESC, event_id DESC
    """,
)
def ch_limit_by_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ts DESC LIMIT 2 BY user_id`` parity: the two
    most recent events per user. Spark's WindowGroupLimit kicks in on the
    rank-filter pattern — each partition keeps a 2-row heap per key during
    the sort, so the shuffle carries at most 2 rows per (key, input
    partition), not the user's full history."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.select("user_id", "ts", "event_type", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
        .orderBy("user_id", F.desc("ts"), F.desc("event_id"))
    )


@register(
    "ch_sequence_next_node",
    """
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type, 2) OVER w AS prev2,
             LAG(event_type, 1) OVER w AS prev1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    hits AS (
      SELECT user_id, ts, event_type AS next_node,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM s WHERE prev2 = 'view' AND prev1 = 'click')
    SELECT user_id, next_node, ts AS next_ts
    FROM hits WHERE rn = 1
    ORDER BY user_id
    """,
)
def ch_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'head')`` parity: per user,
    the event that immediately follows the first consecutive view→click
    chain in the (ts, event_id) order. Two LAGs over ONE window (both share
    the user_id partitioning and sort — one shuffle, one sort), then the
    first hit per user via the same window's ROW_NUMBER."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type", 2).over(w).alias("prev2"),
        F.lag("event_type", 1).over(w).alias("prev1"),
    ).filter((F.col("prev2") == "view") & (F.col("prev1") == "click"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("next_node"), F.col("ts").alias("next_ts"))
        .orderBy("user_id")
    )


@register(
    "ch_summap_daily",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type AS k,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS v
      FROM events GROUP BY 1, 2)
    SELECT day,
           array_to_string(list(k || ':' || CAST(v AS VARCHAR) ORDER BY k),
                           ',') AS summap,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM c GROUP BY day ORDER BY day
    """,
)
def ch_summap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap(map(event_type, value))`` parity: per day, the
    merged map event_type → Σvalue. Built the distributed way — explode is
    already the storage layout here, so it's groupBy (day, key) then
    groupBy (day) re-assembling a SORTED entry list (ClickHouse sumMap
    returns key-sorted maps; sort_array makes Spark's collect_list
    deterministic). Values in integer cents so the value hash is immune to
    float summation order; the map is serialized ``k:v,k:v`` at the output
    boundary, same convention as the array surface queries.

    Scale: two aggregations on prefixes of the same key — AQE reuses the
    (day, k) hash partitioning for the (day) rollup; per-day fan-in is
    bounded by the event-type cardinality, not the corpus."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.col("event_type").alias("k"),
    ).agg(F.round(F.sum("value") * 100).cast("long").alias("v"))
    return (
        c.groupBy("day")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("k", "v"))),
                    lambda x: F.concat(x.k, F.lit(":"), x.v.cast("string")),
                ),
                ",",
            ).alias("summap"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .orderBy("day")
    )


@register(
    "ch_dict_get_nation_name",
    """
    SELECT c_custkey, n.n_name AS nation_name,
           CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY c_custkey
    """,
)
def ch_dict_get_nation_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet('nation_dict', 'n_name', c_nationkey)`` parity:
    a dimension lookup compiled into the row expression instead of a join.
    The dictionary table is bounded by contract (nation: 25 rows at every
    SF — same contract ClickHouse external dictionaries assume), so it is
    collected once on the driver and inlined as a map literal; the customer
    scan then needs NO join, NO broadcast exchange, and no shuffle — the
    lookup is a codegen'd expression. For dictionaries too big to inline
    (>~10k entries) the broadcast-join form elsewhere in this repo is the
    right fallback."""
    n_rows = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    pairs: list = []
    for r in n_rows:
        pairs.append(F.lit(r["n_nationkey"]))
        pairs.append(F.lit(r["n_name"]))
    dict_map = F.create_map(*pairs)
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        dict_map[F.col("c_nationkey")].alias("nation_name"),
        F.when(F.col("c_acctbal") < 0, F.lit("debt"))
        .otherwise(F.lit("credit"))
        .alias("standing"),
    ).orderBy("c_custkey")


@register(
    "ch_any_left_join_first_order",
    """
    WITH fo AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT c_custkey, c_name, fo.o_orderkey AS first_orderkey,
           fo.o_orderdate AS first_orderdate
    FROM customer c
    LEFT JOIN (SELECT * FROM fo WHERE rn = 1) fo
           ON c.c_custkey = fo.o_custkey
    ORDER BY c_custkey
    """,
)
def ch_any_left_join_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN`` parity: each left row pairs with AT MOST
    ONE right row instead of fanning out. ClickHouse picks an arbitrary
    match; a reproducible engine must pin one, so "any" is defined as the
    earliest (o_orderdate, o_orderkey) — the same determinism upgrade this
    repo applies to FINAL and asof ties.

    Spark-first: reduce the right side to one row per key FIRST (window
    rank over orders — WindowGroupLimit keeps one row per key inside the
    shuffle), then a plain left join. At scale this is strictly better than
    joining then deduplicating: the join input shrinks to |customers| ∪
    |distinct custkeys| before any pairing happens, and the fan-out a
    many-per-key right side would cause never exists."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    first = (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        c.join(first, c.c_custkey == first.o_custkey, "left")
        .select("c_custkey", "c_name", "first_orderkey", "first_orderdate")
        .orderBy("c_custkey")
    )


@register(
    "ch_minmax_map_daily",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type AS k,
             CAST(ROUND(MIN(value) * 100) AS BIGINT) AS mn,
             CAST(ROUND(MAX(value) * 100) AS BIGINT) AS mx
      FROM events GROUP BY 1, 2)
    SELECT day,
           array_to_string(list(k || ':' || CAST(mn AS VARCHAR) || '..'
                                  || CAST(mx AS VARCHAR) ORDER BY k),
                           ',') AS minmax_map,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM c GROUP BY day ORDER BY day
    """,
)
def ch_minmax_map_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap``/``maxMap`` parity, completing the map
    combinator family next to :func:`ch_summap_daily`: per day, each event
    type's value range merged across rows as a key-sorted map. Same
    two-stage shape (groupBy (day, key) for the extremes — MIN/MAX are
    mergeable states — then key-sorted entry assembly per day); values in
    integer cents, serialized ``k:lo..hi``."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.col("event_type").alias("k"),
    ).agg(
        F.round(F.min("value") * 100).cast("long").alias("mn"),
        F.round(F.max("value") * 100).cast("long").alias("mx"),
    )
    return (
        c.groupBy("day")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("k", "mn", "mx"))),
                    lambda x: F.concat(
                        x.k,
                        F.lit(":"),
                        x.mn.cast("string"),
                        F.lit(".."),
                        x.mx.cast("string"),
                    ),
                ),
                ",",
            ).alias("minmax_map"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .orderBy("day")
    )
