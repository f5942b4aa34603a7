"""ClickHouse-parity event analytics over ``events`` (SURVEY.md §7.3).

The reference lives in the ClickHouse ecosystem, where the signature
analytics surface is windowFunnel / retention / argMax / topK. These are
re-expressed Spark-first — conditional aggregation, ``max_by``/``min_by``,
and ranked windows; no UDFs — and each has a DuckDB oracle.

Scale notes: every query is one or two shuffles on ``user_id`` (or day) with
map-side partial aggregation. The funnel is three grouped mins joined on
``user_id`` — at 100 TB all three aggregates and the joins co-partition on
the same key, so AQE plans a single exchange; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

FUNNEL_WINDOW_HOURS = 24


@register(
    "ev_funnel_steps",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
            AND e.ts <= v.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
          GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM events e
          JOIN v ON v.user_id = e.user_id
          JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
            AND e.ts <= v.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
          GROUP BY 1),
    steps AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS step
      FROM u
      LEFT JOIN v ON v.user_id = u.user_id
      LEFT JOIN c ON c.user_id = u.user_id
      LEFT JOIN p ON p.user_id = u.user_id)
    SELECT step, COUNT(*) AS n_users FROM steps GROUP BY 1 ORDER BY 1
    """,
)
def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel parity (ClickHouse ``windowFunnel(window)(ts, cond...)``,
    simplified to first-event anchoring): per user, how far the ordered
    chain view → click → purchase progresses within 24 h of the first view.
    Output: funnel histogram (step 0-3 → user count).

    Spark shape (optimization round 14 — guide §2.4): the three step mins
    are whole-partition window aggregates over ONE user_id exchange instead
    of three grouped mins joined back (the old form scanned events 8× and
    planned 17 runtime exchanges). Each step's min is conditional on the
    previous step's window result — null propagation through the
    comparison reproduces the join chain's inner-join semantics exactly
    (no t1 → the t2 condition is null → t2 is null). The per-user step is
    then a first() over the user partitioning the windows already
    established, so the whole funnel is one scan + one exchange + the
    final tiny histogram aggregate."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")

    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + win),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + win),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    steps = staged.groupBy("user_id").agg(
        F.first(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
        ).alias("step")
    )
    return steps.groupBy("step").agg(F.count(F.lit(1)).alias("n_users")).orderBy("step")


@register(
    "ev_retention_day0",
    """
    WITH cohort AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-01'),
    act AS (
      SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS d
      FROM events e JOIN cohort c ON c.user_id = e.user_id)
    SELECT (SELECT COUNT(*) FROM cohort) AS cohort_size,
           COUNT(DISTINCT CASE WHEN d = DATE '2024-01-02' THEN user_id END)
               AS retained_d1,
           COUNT(DISTINCT CASE WHEN d = DATE '2024-01-04' THEN user_id END)
               AS retained_d3,
           COUNT(DISTINCT CASE WHEN d = DATE '2024-01-08' THEN user_id END)
               AS retained_d7
    FROM act
    """,
)
def ev_retention_day0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention parity (ClickHouse ``retention(cond0, cond1, ...)``): of the
    users active on 2024-01-01, how many came back on day +1 / +3 / +7.
    One cohort join to restrict activity, then a single conditional
    distinct-count pass — no per-day self-joins. The day-0 cohort scales
    with DAU, so its join strategy is left to AQE (no broadcast hint)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohort = e.filter(F.col("d") == F.lit("2024-01-01").cast("date")).select(
        "user_id"
    ).distinct()
    act = e.join(cohort, "user_id").distinct()

    def came_back(day: str, alias: str):
        return F.count_distinct(
            F.when(F.col("d") == F.lit(day).cast("date"), F.col("user_id"))
        ).alias(alias)

    return act.agg(
        F.count_distinct("user_id").alias("cohort_size"),
        came_back("2024-01-02", "retained_d1"),
        came_back("2024-01-04", "retained_d3"),
        came_back("2024-01-08", "retained_d7"),
    )


@register(
    "ev_argmax_per_user",
    """
    WITH t AS (
      SELECT user_id, ts, event_id, value, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_first
      FROM events)
    SELECT user_id,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS last_value,
           MAX(CASE WHEN rn_last = 1 THEN event_type END) AS last_type,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS first_value,
           MAX(ts) AS last_ts
    FROM t GROUP BY user_id ORDER BY user_id
    """,
)
def ev_argmax_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax/argMin parity (ClickHouse ``argMax(value, ts)``): the value and
    type carried by each user's latest event, plus the value of the
    earliest. Spark-first: ``max_by``/``min_by`` with a (ts, event_id)
    struct key — single hash aggregate, no window, no second shuffle; the
    composite key makes ties impossible, so both engines agree exactly."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by("value", key).alias("last_value"),
            F.max_by("event_type", key).alias("last_type"),
            F.min_by("value", key).alias("first_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


TOPK_PER_DAY = 2


@register(
    "ev_topk_types_per_day",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, n, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                                       ORDER BY n DESC, event_type) AS rn
          FROM d)
    WHERE rn <= {TOPK_PER_DAY}
    ORDER BY day, rank
    """,
)
def ev_topk_types_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK parity (ClickHouse ``topK(k)(col)``, exact form): the 2 most
    frequent event types per day, deterministic tie-break on type name.
    Count-then-rank: the heavy input reduces to |days|×|types| rows before
    the window, so the rank runs on a tiny relation; Spark plans a
    WindowGroupLimit (top-k pushdown) for the rn filter."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK_PER_DAY)
        .orderBy("day", "rank")
        .select("day", "event_type", "n", "rank")
    )


@register(
    "ev_gapfill_daily_purchases",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                 AS day
      FROM bounds),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT s.day, COALESCE(d.n, 0) AS n_purchases
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    ORDER BY s.day
    """,
)
def ev_gapfill_daily_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (ClickHouse ``ORDER BY day WITH FILL``):
    daily purchase counts on a dense date spine — days with no purchases
    appear as 0, not as holes. The spine is generated with ``sequence``
    over the observed [min, max] date bounds (one tiny aggregate, then a
    broadcast-able explode) and left-joined to the grouped counts; the
    heavy side shuffles once on day."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases"))
        .orderBy("day")
    )


@register(
    "ev_locf_daily_value",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(min(ts) AS DATE)
                 + INTERVAL 9 DAY AS hi
      FROM events),
    spine AS (
      SELECT u.user_id,
             CAST(unnest(generate_series(b.lo, CAST(b.hi AS DATE),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u
      CROSS JOIN bounds b),
    daily AS (
      SELECT user_id, day, value AS day_value FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id < 20)
      WHERE rn = 1)
    SELECT s.user_id, s.day,
           ROUND(LAST_VALUE(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS filled_value
    FROM spine s
    LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    ORDER BY s.user_id, s.day
    """,
)
def ev_locf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF interpolation (ClickHouse ``WITH FILL … INTERPOLATE``): each
    user's latest ``value`` per day, carried forward over days with no
    events (null until the first observation). Dense user×day spine for a
    10-day horizon (users < 20 keep the fixture output bounded), per-day
    last observation via a (ts, event_id)-ordered window, then
    ``last(value, ignorenulls=True)`` over an unbounded-preceding row
    frame — the standard forward-fill; both engines define it identically.

    Scale: the spine is |users|×|days| rows — tiny next to the event log —
    and both the per-day reduction and the forward-fill window partition on
    user_id, so the whole query is one co-partitioned shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    bounds = e.agg(F.to_date(F.min("ts")).alias("lo")).select(
        "lo", F.date_add(F.col("lo"), 9).alias("hi")
    )
    users = e.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        e.select("user_id", F.to_date("ts").alias("day"), "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("day_value"))
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.round(F.last("day_value", ignorenulls=True).over(w_fill), 6).alias(
                "filled_value"
            ),
        )
        .orderBy("user_id", "day")
    )


@register(
    "ev_wau_sliding_7d",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                 AS day
      FROM bounds),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT s.day, COUNT(DISTINCT a.user_id) AS wau
    FROM spine s
    JOIN act a ON a.d <= s.day AND a.d > s.day - INTERVAL 7 DAY
    GROUP BY s.day ORDER BY s.day
    """,
)
def ev_wau_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day distinct active users per day (WAU curve — the
    ClickHouse ``uniq`` -over-sliding-window dashboard staple). Shape:
    reduce the event log to distinct (user, day) FIRST — that collapses the
    heavy side by ~|events per user-day| before the range join fans each
    activity row out to at most 7 spine days. The spine is tiny and
    broadcast; distinct-count per day is the only real shuffle. A plain
    window can't express this (distinct over a range frame), so the
    explicit fan-out join IS the scalable plan."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(
            F.broadcast(spine),
            (F.col("d") <= F.col("day"))
            & (F.col("d") > F.date_sub(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# sequenceMatch — ordered event-pattern matching (ClickHouse sequenceMatch)
# ---------------------------------------------------------------------------

SEQ_PATTERN = "v.*c.*p"  # view … click … purchase, in order, gaps allowed


@register(
    "ev_sequence_match",
    f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           md5(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id))
               AS seq_md5,
           regexp_matches(
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
               '{SEQ_PATTERN}') AS matched
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def ev_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` parity: per user,
    whether a view→click→purchase subsequence occurs in timestamp order
    (gaps allowed). The per-user history compresses to a one-char-per-event
    string (event types have distinct initials), matched with one regex —
    the automaton-over-ordered-events shape, no joins.

    Scale: one shuffle on user_id; state per user is its compressed history
    (1 byte/event) — the same bounded-by-user-history class as
    sessionization, ~3 orders lighter than collecting full rows. The
    deterministic (ts, event_id) sort key makes the string — and its md5
    audit column — reproducible across engines."""
    e = load_table(spark, sf_dir, "events")
    rows = e.select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("c")
        ).alias("r"),
    )
    agg = rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.concat_ws(
            "", F.expr("transform(array_sort(collect_list(r)), x -> x.c)")
        ).alias("seq"),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.md5("seq").alias("seq_md5"),
        F.col("seq").rlike(SEQ_PATTERN).alias("matched"),
    ).orderBy("user_id")


SEQ_COUNT_PATTERN = "v.*?c.*?p"  # lazy: leftmost non-overlapping occurrences


@register(
    "ev_sequence_count",
    f"""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, '{SEQ_COUNT_PATTERN}')) AS INT)
               AS n_matches
    FROM s ORDER BY user_id
    """,
)
def ev_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount`` parity: how many non-overlapping
    view→click→purchase subsequences each user's ordered history contains.
    Lazy quantifiers make the scan greedy-leftmost in both engines, so the
    counts agree exactly. Same compressed-history shape as
    ``ev_sequence_match`` — one shuffle, 1 byte of state per event."""
    e = load_table(spark, sf_dir, "events")
    rows = e.select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("c")
        ).alias("r"),
    )
    agg = rows.groupBy("user_id").agg(
        F.concat_ws(
            "", F.expr("transform(array_sort(collect_list(r)), x -> x.c)")
        ).alias("seq")
    )
    return agg.select(
        "user_id",
        F.size(F.expr(f"regexp_extract_all(seq, '{SEQ_COUNT_PATTERN}', 0)")).alias(
            "n_matches"
        ),
    ).orderBy("user_id")


@register(
    "ev_window_funnel_sliding",
    f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS lv
      FROM events),
    seq2 AS (
      SELECT user_id, ts, event_id, event_type, lv,
             MAX(CASE WHEN event_type = 'click' THEN lv END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS bc
      FROM seq),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND lv IS NOT NULL
                       AND ts <= lv + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                      THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND bc IS NOT NULL
                       AND ts <= bc + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                      THEN 1 ELSE 0 END) AS s3
      FROM seq2 GROUP BY user_id)
    SELECT CASE WHEN s3 = 1 THEN 3 WHEN s2 = 1 THEN 2
                WHEN s1 = 1 THEN 1 ELSE 0 END AS step,
           COUNT(*) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
)
def ev_window_funnel_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windowFunnel — ClickHouse ``windowFunnel`` proper, where the
    chain may anchor at ANY view, not just the user's first (the
    ev_funnel_steps simplification). Exists-any-chain semantics:

    * step 2 — some view→click with click ≤ view + window;
    * step 3 — some view→click→purchase with purchase ≤ view + window.

    The trick that keeps this one linear pass instead of an anchors×events
    join: for each event, ``lv`` = latest earlier view; a purchase completes
    a chain iff the best "view that starts a view→click chain ending before
    me" (``bc``, a running max of ``lv`` over earlier clicks) is within the
    window — choosing the LATEST qualifying view maximizes slack for every
    inner condition, so exists-any-chain reduces to two cascaded
    conditional running maxes. One shuffle on user_id, constant state per
    row; the oracle runs the identical formulation."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return window_funnel_sliding(e)


def window_funnel_sliding(e: DataFrame, window_hours: int = FUNNEL_WINDOW_HOURS) -> DataFrame:
    """Core of ev_window_funnel_sliding over any (user_id, ts, event_id,
    event_type) relation — factored so property tests can feed arbitrary
    random event sequences (tests/test_properties.py compares against the
    literal exists-any-chain brute force)."""
    win = F.expr(f"INTERVAL {window_hours} HOURS")
    prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(prior)
    seq = e.withColumn("lv", lv)
    bc = F.max(F.when(F.col("event_type") == "click", F.col("lv"))).over(prior)
    seq2 = seq.withColumn("bc", bc)
    per_user = seq2.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("lv").isNotNull()
                & (F.col("ts") <= F.col("lv") + win),
                1,
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("bc").isNotNull()
                & (F.col("ts") <= F.col("bc") + win),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    step = (
        F.when(F.col("s3") == 1, 3)
        .when(F.col("s2") == 1, 2)
        .when(F.col("s1") == 1, 1)
        .otherwise(0)
    )
    return (
        per_user.select(step.alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step")
    )


@register(
    "ev_cohort_weekly_activity",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_trunc('week', e.ts) AS DATE) AS act_week
      FROM events e JOIN first_seen f USING (user_id))
    SELECT cohort_week,
           CAST((act_week - cohort_week) / 7 AS BIGINT) AS week_n,
           COUNT(*) AS n_users
    FROM act GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev_cohort_weekly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort activity matrix: users grouped by first-seen week, counted in
    every later week they were active — the standard retention heat-map
    input. Two aggregations co-partitioned on user_id (first-seen min, then
    distinct user-weeks), then a count on (cohort, offset); nothing touches
    the driver."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first_seen = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    act = (
        e.join(first_seen, "user_id")
        .select("user_id", "cohort_week", week.alias("act_week"))
        .distinct()
    )
    week_n = (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("long")
    return (
        act.groupBy("cohort_week", week_n.alias("week_n"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_n")
    )


@register(
    "ev_transition_pairs",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-path analysis: counts of consecutive event-type transitions
    per user (the Markov/Sankey input). One shuffle on user_id for the lag,
    then a grouped count on the (prev, next) pair — transition cardinality
    is |types|^2, so the second agg is map-side absorbed."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@register("ev_hll_partial_merge_weekly", None)  # binary sketches → rows-only
def ev_hll_partial_merge_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pre-aggregation — THE pattern that makes distinct
    counts incremental at 100 TB (ClickHouse ``uniqState``/``uniqMerge``
    parity): per-day HLL sketches (DataSketches ``hll_sketch_agg``) are the
    stored partials; weekly uniques come from ``hll_union_agg`` over 7 tiny
    sketches instead of re-scanning the week's raw events. A day's late
    data re-aggregates one day, not the week. No SQL oracle (sketches are
    binary); the estimate's error vs the exact weekly distinct is bounded
    in tests/test_engine_units.py."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy(F.date_trunc("week", "d").cast("date").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_uniq"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("week")
    )


@register(
    "ev_window_funnel_strict_order",
    f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type, 1) OVER w AS t1, LAG(ts, 1) OVER w AS ts1,
             LAG(event_type, 2) OVER w AS t2, LAG(ts, 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND t1 = 'view'
                       AND ts <= ts1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                      THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND t1 = 'click'
                       AND t2 = 'view'
                       AND ts <= ts2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
                      THEN 1 ELSE 0 END) AS s3
      FROM seq GROUP BY user_id)
    SELECT CASE WHEN s3 = 1 THEN 3 WHEN s2 = 1 THEN 2
                WHEN s1 = 1 THEN 1 ELSE 0 END AS step,
           COUNT(*) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
)
def ev_window_funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_order')``: the chain is
    broken by ANY intervening event — view→click counts only when the click
    is the event IMMEDIATELY after a view in the user's stream, and
    view→click→purchase only as three consecutive events (all within the
    window measured from the view).

    Consecutiveness makes the per-event test purely local: each event looks
    at its 1- and 2-back neighbors via LAG — one shuffle on user_id, one
    sorted window scan, constant state per row (even cheaper than the
    sliding variant's cascaded running maxes). The window bound only needs
    checking against the chain head: consecutive events are time-ordered,
    so purchase ≤ view+W implies click ≤ view+W."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return window_funnel_strict_order(e)


def window_funnel_strict_order(
    e: DataFrame, window_hours: int = FUNNEL_WINDOW_HOURS
) -> DataFrame:
    """Core of ev_window_funnel_strict_order over any (user_id, ts,
    event_id, event_type) relation — factored so tests can feed constructed
    sequences (consecutive chains, broken chains, window edges)."""
    win = F.expr(f"INTERVAL {window_hours} HOURS")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("ts", 1).over(w).alias("ts1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("ts", 2).over(w).alias("ts2"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("t1") == "view")
                & (F.col("ts") <= F.col("ts1") + win),
                1,
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("t1") == "click")
                & (F.col("t2") == "view")
                & (F.col("ts") <= F.col("ts2") + win),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    step = (
        F.when(F.col("s3") == 1, 3)
        .when(F.col("s2") == 1, 2)
        .when(F.col("s1") == 1, 1)
        .otherwise(0)
    )
    return (
        per_user.select(step.alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step")
    )


@register(
    "ev_ohlc_hourly_bars",
    """
    WITH t AS (
      SELECT event_type, value, ts, event_id,
             date_trunc('hour', ts) AS bar,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_o,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_c
      FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-03')
    SELECT event_type, CAST(bar AS VARCHAR) AS bar,
           ROUND(MAX(CASE WHEN rn_o = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_c = 1 THEN value END), 6) AS close,
           COUNT(*) AS n_events
    FROM t GROUP BY 1, 2 ORDER BY event_type, bar
    """,
)
def ev_ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time bars (the ClickHouse time-series staple: argMin/argMax +
    min/max per toStartOfHour bucket): per event type and hour, the first,
    highest, lowest and last ``value`` with a deterministic (ts, event_id)
    tie-break on first/last. One day's slice keeps the fixture output
    bounded; the bar column goes out as a string because NULL-free DATE
    canonicalization differs across engines for TIMESTAMP keys.

    Scale: open/close via two opposed ROW_NUMBERs inside the same
    (type, hour) window partition — one shuffle, then a plain grouped agg;
    at 100 TB the partition key is (type, hour) so state never exceeds a
    bucket."""
    e = load_table(spark, sf_dir, "events").filter(
        F.to_date("ts") == F.lit("2024-01-03").cast("date")
    )
    bar = F.date_trunc("hour", F.col("ts"))
    w_o = Window.partitionBy("event_type", bar).orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    w_c = Window.partitionBy("event_type", bar).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    t = e.select(
        "event_type",
        "value",
        bar.alias("bar"),
        F.row_number().over(w_o).alias("rn_o"),
        F.row_number().over(w_c).alias("rn_c"),
    )
    return (
        t.groupBy("event_type", F.col("bar").cast("string").alias("bar"))
        .agg(
            F.round(F.max(F.when(F.col("rn_o") == 1, F.col("value"))), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(F.when(F.col("rn_c") == 1, F.col("value"))), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bar")
    )


@register(
    "ev_new_vs_returning_daily",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day, f.first_day
      FROM events e JOIN first_seen f USING (user_id))
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users,
           CAST(SUM(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END))
                  OVER (ORDER BY day) AS BIGINT) AS cumulative_users
    FROM act GROUP BY day ORDER BY day
    """,
)
def ev_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning split per day plus the running total of ever-seen
    users (ClickHouse ``runningAccumulate`` over a uniqState-by-day
    pattern): a user counts as new on their first-seen day, returning on
    any later active day — the growth-dashboard companion to the cohort
    matrix.

    Scale: first-seen is one grouped min co-partitioned with the distinct
    (user, day) reduction on user_id; the daily rollup then shuffles
    |users×active-days| rows once; the cumulative window runs over
    calendar-sized data."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    act = e.distinct().join(first_seen, "user_id")
    daily = act.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("returning_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


@register(
    "ev_sequence_count_nonoverlap",
    """
    WITH seq AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v_cum,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c_cum
      FROM events),
    per_user AS (
      SELECT user_id,
             MAX(c_cum) AS c_total,
             GREATEST(MAX(c_cum - v_cum), 0) AS unmatched
      FROM seq GROUP BY user_id)
    SELECT CAST(c_total - unmatched AS BIGINT) AS n_matches,
           COUNT(*) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
)
def ev_sequence_count_nonoverlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2)')`` parity: per user, the
    maximum number of NON-OVERLAPPING view→click chains (each view serves
    at most one later click), rolled up into a users-per-match-count
    histogram.

    The greedy stack simulation (view pushes, click pops-if-available)
    reduces to closed form: matched = total_clicks − max(0, max_k
    (clicks≤k − views≤k)) — the unmatched clicks are exactly the worst
    prefix deficit. That turns a stateful scan into two conditional
    running sums + a grouped max: one shuffle on user_id, no iteration,
    no Python. An independent stack-simulation test guards the closed
    form (the oracle shares it)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return sequence_count_nonoverlap(e)


def sequence_count_nonoverlap(e: DataFrame) -> DataFrame:
    """Core of ev_sequence_count_nonoverlap — factored for the brute-force
    cross-check test."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = e.select(
        "user_id",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("v_cum"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("c_cum"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.max("c_cum").alias("c_total"),
        F.greatest(F.max(F.col("c_cum") - F.col("v_cum")), F.lit(0)).alias(
            "unmatched"
        ),
    )
    return (
        per_user.select(
            (F.col("c_total") - F.col("unmatched")).cast("long").alias("n_matches")
        )
        .groupBy("n_matches")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("n_matches")
    )


INTERVAL_MINUTES = 30


@register(
    "ev_interval_length_sum",
    f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {INTERVAL_MINUTES} MINUTE AS e
      FROM events),
    sweep AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_e
      FROM iv),
    seg AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s, e) AS seg_id
      FROM sweep),
    merged AS (
      SELECT user_id, seg_id, MIN(s) AS seg_start, MAX(e) AS seg_end
      FROM seg GROUP BY 1, 2)
    SELECT user_id,
           CAST(FLOOR(SUM(epoch_us(seg_end) - epoch_us(seg_start)) / 1000000.0)
                AS BIGINT) AS covered_seconds,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
)
def ev_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` parity: total time covered by the
    UNION of each user's activity intervals (event ± a {INTERVAL_MINUTES}-
    minute attention window), counting overlaps once — time-on-site without
    double-counting, the complement of gap-based sessionization.

    The interval union is the classic sweep, made relational: per user in
    (start, end) order, an interval opens a new segment iff its start
    exceeds the running max of all earlier ends (prev-row window), segment
    ids are the running count of openings, and each segment contributes
    max(end)−min(start). One shuffle on user_id; both windows and the
    grouped min/max reuse that partitioning. An independent brute-force
    union test guards the sweep (the oracle shares it)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {INTERVAL_MINUTES} MINUTES")).alias("e"),
    )
    return interval_length_sum(e)


def interval_length_sum(iv: DataFrame) -> DataFrame:
    """Core of ev_interval_length_sum over any (user_id, s, e) interval
    relation — factored for the brute-force cross-check test."""
    prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = iv.withColumn("prev_max_e", F.max("e").over(prev))
    seg = sweep.withColumn(
        "seg_id",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(run),
    )
    merged = seg.groupBy("user_id", "seg_id").agg(
        F.min("s").alias("seg_start"), F.max("e").alias("seg_end")
    )
    dur = F.unix_micros(F.col("seg_end").cast("timestamp")) - F.unix_micros(
        F.col("seg_start").cast("timestamp")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            # micros summed exactly as longs on both sides, ONE floor-divide
            # at the end (epoch-seconds sums would round sub-second parts
            # differently across engines)
            F.floor(F.sum(dur) / 1_000_000).cast("long").alias("covered_seconds"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
        )
        .orderBy("user_id")
    )


@register(
    "ev_lttb_downsample_daily",
    """
    WITH pts AS (
      SELECT event_id, ts, value,
             CAST(date_trunc('day', ts) AS DATE) AS bucket,
             CAST(date_diff('microseconds',
                            TIMESTAMP '2024-01-01 00:00:00', ts) AS DOUBLE)
               AS x
      FROM events),
    bavg AS (
      SELECT bucket, AVG(x) AS bx, AVG(value) AS by
      FROM pts GROUP BY bucket),
    ctx AS (
      SELECT bucket,
             LAG(bx)  OVER (ORDER BY bucket) AS px,
             LAG(by)  OVER (ORDER BY bucket) AS py,
             LEAD(bx) OVER (ORDER BY bucket) AS nx,
             LEAD(by) OVER (ORDER BY bucket) AS ny
      FROM bavg),
    scored AS (
      SELECT p.bucket, p.event_id, p.ts, p.value,
             ABS((c.px - c.nx) * (p.value - c.py)
                 - (c.px - p.x) * (c.ny - c.py)) AS area2,
             c.px IS NULL AS is_first, c.nx IS NULL AS is_last
      FROM pts p JOIN ctx c ON p.bucket = c.bucket),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY bucket
               ORDER BY CASE WHEN is_first THEN 0 WHEN is_last THEN 1
                             ELSE 2 END,
                        CASE WHEN is_first THEN ts END ASC,
                        CASE WHEN is_last THEN ts END DESC,
                        area2 DESC, event_id) AS rn
      FROM scored)
    SELECT bucket, event_id, ts, value
    FROM ranked WHERE rn = 1 ORDER BY bucket
    """,
)
def ev_lttb_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (ClickHouse
    ``largestTriangleThreeBuckets``), fixed-anchor variant: one
    representative event per day chosen to maximize the triangle area
    against the NEIGHBOR BUCKETS' average points. Canonical LTTB anchors on
    the previously SELECTED point, which is inherently sequential; the
    bucket-average anchor (Steinarsson's thesis §4.2 "LTTB with fixed
    anchors") differs only marginally in output quality and is fully
    parallel — each bucket's argmax is independent, so the whole
    downsample is one grouped aggregate + one windowed argmax. First/last
    buckets keep the series' first/last point, as LTTB requires.

    Determinism: the area is the same arithmetic expression in both
    engines with (area DESC, event_id) ordering pinned. The area itself is
    NOT emitted: at ~1e13 magnitude a 6dp round is a no-op and the
    anchor AVERAGES differ by an ulp across engines' summation orders —
    the SELECTION is stable (distinct points' areas differ by far more
    than an ulp) but the raw score is not hash-comparable."""
    e = load_table(spark, sf_dir, "events")
    x = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        " AS DOUBLE)"
    )
    pts = e.select(
        "event_id",
        "ts",
        "value",
        F.date_trunc("day", F.col("ts")).cast("date").alias("bucket"),
        x.alias("x"),
    )
    bavg = pts.groupBy("bucket").agg(
        F.avg("x").alias("bx"), F.avg("value").alias("by")
    )
    wb = Window.orderBy("bucket")
    ctx = bavg.select(
        "bucket",
        F.lag("bx").over(wb).alias("px"),
        F.lag("by").over(wb).alias("py"),
        F.lead("bx").over(wb).alias("nx"),
        F.lead("by").over(wb).alias("ny"),
    )
    scored = pts.join(ctx, "bucket").select(
        "bucket",
        "event_id",
        "ts",
        "value",
        F.abs(
            (F.col("px") - F.col("nx")) * (F.col("value") - F.col("py"))
            - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
        ).alias("area2"),
        F.col("px").isNull().alias("is_first"),
        F.col("nx").isNull().alias("is_last"),
    )
    order_key = [
        F.when(F.col("is_first"), F.lit(0))
        .when(F.col("is_last"), F.lit(1))
        .otherwise(F.lit(2)),
        F.when(F.col("is_first"), F.col("ts")).asc(),
        F.when(F.col("is_last"), F.col("ts")).desc(),
        F.desc("area2"),
        F.asc("event_id"),
    ]
    w = Window.partitionBy("bucket").orderBy(*order_key)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", "event_id", "ts", "value")
        .orderBy("bucket")
    )


@register(
    "ev_rfm_segmentation",
    """
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    rfm AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(ts), (SELECT mx FROM anchor))
                  AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS monetary_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    scored AS (
      SELECT *,
             CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id)
                  AS BIGINT) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id)
                  AS BIGINT) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary_cents ASC, user_id)
                  AS BIGINT) AS m_score
      FROM rfm)
    SELECT *,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN r_score >= 4 THEN 'recent'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored ORDER BY user_id
    """,
)
def ev_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last purchase,
    anchored at the corpus max ts so the query is reproducible), frequency
    (purchase count), monetary (cents) — scored into quintiles with
    deterministic (metric, user_id) NTILE tie-breaks and bucketed into the
    classic segments. One grouped aggregation over purchases + three
    NTILE windows over the per-user relation (users ≪ events; at larger
    scale swap exact NTILE for approx_percentile cut points, same
    downstream CASE)."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    rfm = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value") * 100).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("mx"), F.col("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    scored = rfm.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), F.asc("user_id")))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), F.asc("user_id")))
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary_cents"), F.asc("user_id")))
        .cast("long")
        .alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 2, "hibernating")
        .otherwise("regular")
    )
    return scored.select("*", seg.alias("segment")).orderBy("user_id")


@register(
    "ev_funnel_time_to_convert",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id),
    durs AS (
      SELECT user_id,
             CAST(date_diff('microseconds', first_view, first_purchase)
                  AS BIGINT) AS micros
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(quantile_disc(micros, 0.5) AS BIGINT) AS p50_micros,
           CAST(quantile_disc(micros, 0.9) AS BIGINT) AS p90_micros,
           CAST(MIN(micros) AS BIGINT) AS min_micros,
           CAST(MAX(micros) AS BIGINT) AS max_micros
    FROM durs
    """,
)
def ev_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: per converting user the time from first
    view to first purchase, summarized as exact discrete percentiles
    (integral microseconds — no interpolation, engine-identical). One
    grouped conditional-min pass over events (the funnel-steps shape) +
    one tiny aggregate over converting users."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    durs = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        F.expr(
            "timestampdiff(MICROSECOND, first_view, first_purchase)"
        ).alias("micros")
    )
    return durs.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY micros)")
        .cast("long")
        .alias("p50_micros"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY micros)")
        .cast("long")
        .alias("p90_micros"),
        F.min("micros").alias("min_micros"),
        F.max("micros").alias("max_micros"),
    )


DECAY_TAU_HOURS = 72.0


@register(
    "ev_trending_decay_score",
    f"""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    scored AS (
      SELECT event_type,
             exp(-CAST(date_diff('microseconds', ts, (SELECT mx FROM anchor))
                       AS DOUBLE) / (3600000000.0 * {DECAY_TAU_HOURS}))
               AS w
      FROM events)
    SELECT event_type,
           ROUND(SUM(w), 6) AS decay_score,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(RANK() OVER (ORDER BY ROUND(SUM(w), 6) DESC) AS BIGINT)
             AS trend_rank
    FROM scored GROUP BY event_type ORDER BY trend_rank, event_type
    """,
)
def ev_trending_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed event counts — the trending-topics primitive
    (each event contributes exp(-age/τ), τ = {DECAY_TAU_HOURS}h, anchored
    at the corpus max ts for reproducibility). Unlike a sliding window the
    decayed sum is MERGEABLE map-side (it's just a SUM of per-row weights),
    so the same one-shuffle grouped aggregate serves it at any scale, and
    a stored partial re-anchors by multiplying exp(-Δ/τ) — the
    AggregatingMergeTree trick applied to decay. Ranked after rounding so
    both engines rank identical values."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    w = F.exp(
        -F.expr("CAST(timestampdiff(MICROSECOND, ts, mx) AS DOUBLE)")
        / (3_600_000_000.0 * DECAY_TAU_HOURS)
    )
    scored = e.crossJoin(F.broadcast(anchor)).select(
        "event_type", w.alias("w")
    )
    agg = scored.groupBy("event_type").agg(
        F.round(F.sum("w"), 6).alias("decay_score"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return agg.select(
        "event_type",
        "decay_score",
        "n_raw",
        F.rank()
        .over(Window.orderBy(F.desc("decay_score")))
        .cast("long")
        .alias("trend_rank"),
    ).orderBy("trend_rank", "event_type")


@register(
    "ev_cohort_ltv_cumulative",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id),
    rev AS (
      SELECT f.cohort_week,
             CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_week) / 7
                  AS BIGINT) AS week_n,
             SUM(e.value) AS wk_rev
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2),
    size_ AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
              FROM first_seen GROUP BY 1)
    SELECT r.cohort_week, r.week_n, s.cohort_users,
           CAST(ROUND(SUM(r.wk_rev) OVER (PARTITION BY r.cohort_week
                                          ORDER BY r.week_n) * 100)
                AS BIGINT) AS cum_revenue_cents
    FROM rev r JOIN size_ s ON r.cohort_week = s.cohort_week
    ORDER BY r.cohort_week, r.week_n
    """,
)
def ev_cohort_ltv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: cumulative purchase revenue per signup-cohort
    week over weeks-since-signup — the growth-accounting companion to the
    retention matrix. Per-cohort weekly revenue is one grouped aggregation
    over purchases; the cumulative sum is a window over the TINY cohort ×
    week matrix (not the fact table), and cohort sizes ride a separate
    bounded relation. Cents at the output boundary for float-order
    immunity."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    purchases = e.filter(F.col("event_type") == "purchase")
    rev = (
        purchases.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .agg(F.sum("value").alias("wk_rev"))
    )
    size_ = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_n")
    return (
        rev.join(size_, "cohort_week")
        .select(
            "cohort_week",
            "week_n",
            "cohort_users",
            F.round(F.sum("wk_rev").over(w) * 100)
            .cast("long")
            .alias("cum_revenue_cents"),
        )
        .orderBy("cohort_week", "week_n")
    )


@register(
    "ev_interarrival_stats",
    """
    WITH gaps AS (
      SELECT event_type,
             CAST(date_diff('microseconds',
                            LAG(ts) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id),
                            ts) AS BIGINT) AS gap_micros
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap_micros) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap_micros, 0.5) AS BIGINT) AS p50_gap_micros,
           CAST(quantile_disc(gap_micros, 0.9) AS BIGINT) AS p90_gap_micros,
           CAST(MIN(gap_micros) AS BIGINT) AS min_gap_micros
    FROM gaps WHERE gap_micros IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ev_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type — the burstiness
    profile (p50/p90 gap between a user's consecutive events of the same
    type), the signal behind rate-limiting and bot detection thresholds.
    One LAG window on (user, type) + exact discrete percentiles over
    integral microsecond gaps — engine-identical order statistics."""
    e = load_table(spark, sf_dir, "events")
    gaps = e.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " lag(ts) OVER (PARTITION BY user_id, event_type"
            " ORDER BY ts, event_id), ts)"
        ).alias("gap_micros"),
    ).filter(F.col("gap_micros").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_micros").alias("n_gaps"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_micros)")
            .cast("long")
            .alias("p50_gap_micros"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_micros)")
            .cast("long")
            .alias("p90_gap_micros"),
            F.min("gap_micros").alias("min_gap_micros"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_dau_mau_stickiness",
    """
    WITH dau AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1),
    mau AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1)
    SELECT d.day, d.dau, m.mau,
           ROUND(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
    FROM dau d JOIN mau m ON CAST(date_trunc('month', d.day) AS DATE) = m.month
    ORDER BY d.day
    """,
)
def ev_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (calendar-month MAU) — the standard
    engagement ratio. Two exact distinct aggregations (day-grain and
    month-grain) + a join on month: the month relation is ~30× smaller
    than the day one, so AQE broadcasts it; ratios are exact-integer
    quotients. For sliding-30d MAU swap the month groupBy for the bitmap
    partials (``ch_group_bitmap_weekly_users`` pattern) OR-merged over a
    30-day window."""
    e = load_table(spark, sf_dir, "events")
    dau = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("dau"))
    mau = e.groupBy(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month")
    ).agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(
            mau,
            F.date_trunc("month", F.col("day")).cast("date") == F.col("month"),
        )
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


_WFD_WIN_US = FUNNEL_WINDOW_HOURS * 3_600_000_000  # window in integer micros
_WFD_NEXT_SQL = "CASE r.lvl WHEN 0 THEN 'view' WHEN 1 THEN 'click' WHEN 2 THEN 'purchase' END"
_WFD_ADV_SQL = (
    f"e.et = {_WFD_NEXT_SQL} AND (r.lvl = 0 OR e.t <= r.t0 + {_WFD_WIN_US})"
)


@register(
    "ev_window_funnel_strict_dedup",
    f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_type AS et,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    mx AS (SELECT user_id, MAX(rn) AS mx FROM ev GROUP BY user_id),
    fin AS (
      WITH RECURSIVE r(user_id, rn, lvl, t0, dead) AS (
        SELECT user_id, 0, 0, CAST(0 AS BIGINT), FALSE FROM mx
        UNION ALL
        SELECT r.user_id, r.rn + 1,
          CASE WHEN NOT r.dead AND r.lvl < 3 AND {_WFD_ADV_SQL}
               THEN r.lvl + 1 ELSE r.lvl END,
          CASE WHEN NOT r.dead AND r.lvl = 0 AND e.et = 'view'
               THEN e.t ELSE r.t0 END,
          r.dead OR (NOT r.dead AND r.lvl < 3 AND NOT ({_WFD_ADV_SQL})
                     AND ((r.lvl >= 1 AND e.et = 'view')
                          OR (r.lvl >= 2 AND e.et = 'click')))
        FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
      SELECT r.user_id, r.lvl
      FROM r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.mx)
    SELECT lvl AS step, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM fin GROUP BY 1 ORDER BY 1
    """,
)
def ev_window_funnel_strict_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_dedup')`` parity — the
    remaining funnel mode next to the sliding and strict_order variants: a
    repeat of an ALREADY-MATCHED step interrupts the chain. Exact
    first-anchor semantics (documented, both engines fold the identical
    state machine): events scanned in (ts, event_id) order; the chain
    anchors at the user's first view; the next step must land within
    {FUNNEL_WINDOW_HOURS}h of the anchor; unrelated event types are ignored
    (unlike strict_order); but a second view while at level >= 1, or a
    second click while at level >= 2, freezes the chain at its current
    level. Output = user count per final level.

    Spark side: one shuffle on user_id, per-user sorted struct array, then
    a JVM higher-order AGGREGATE fold carrying (lvl, anchor, dead) — no
    Python, state O(1) per user, per-user arrays bounded by per-user event
    counts (the same bound every collect_list sessionizer in this repo
    rides). Oracle: a recursive-CTE state machine stepping rn+1 per user —
    the same fold, integer-microsecond comparisons, so the engines agree
    exactly."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
        "event_type",
    )
    return window_funnel_strict_dedup(e)


def window_funnel_strict_dedup(e: DataFrame) -> DataFrame:
    """Core of ev_window_funnel_strict_dedup over any (user_id, t[micros],
    event_id, event_type) relation — factored so tests can feed constructed
    sequences (dedup kills, window edges, ignored bystander events)."""
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("t").alias("t"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            )
        )
    )
    per_user = e.groupBy("user_id").agg(arr.alias("evs"))

    init = F.struct(
        F.lit(0).alias("lvl"),
        F.lit(0).cast("long").alias("t0"),
        F.lit(False).alias("dead"),
    )

    def fold(acc, x):
        nxt = (
            F.when(acc["lvl"] == 0, F.lit("view"))
            .when(acc["lvl"] == 1, F.lit("click"))
            .when(acc["lvl"] == 2, F.lit("purchase"))
        )
        advance = (
            (~acc["dead"])
            & (acc["lvl"] < 3)
            & (x["et"] == nxt)
            & ((acc["lvl"] == 0) | (x["t"] <= acc["t0"] + F.lit(_WFD_WIN_US)))
        )
        repeat = (
            (~acc["dead"])
            & (acc["lvl"] < 3)
            & (~advance)
            & (
                ((acc["lvl"] >= 1) & (x["et"] == F.lit("view")))
                | ((acc["lvl"] >= 2) & (x["et"] == F.lit("click")))
            )
        )
        return F.struct(
            F.when(advance, acc["lvl"] + 1).otherwise(acc["lvl"]).alias("lvl"),
            F.when(advance & (acc["lvl"] == 0), x["t"])
            .otherwise(acc["t0"])
            .alias("t0"),
            (acc["dead"] | repeat).alias("dead"),
        )

    lvl = F.aggregate(F.col("evs"), init, fold)["lvl"]
    return (
        per_user.select(lvl.alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step")
    )
