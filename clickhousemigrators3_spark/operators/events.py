"""Event-stream operators over ``events`` (SURVEY.md §7.3: tumbling/sliding
windows, sessionization, JSON extraction, pivot). Batch forms here — each
has a DuckDB oracle; the Structured Streaming twin of the tumbling window
lives in streaming/stream_queries.py (rows-only check).

Scale notes: all window aggregations shuffle on (window, key) with map-side
partial aggregation; sessionization is a per-user window scan — partition by
user_id, no global sort. ``value`` sums go through DECIMAL(18,2) for
cross-engine exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

_SUM_VALUE_SQL = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"


def _sum_value():
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value")


@register(
    "ev_tumbling_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events, {_SUM_VALUE_SQL}
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type. Uses ``F.window`` (the same
    construct the streaming twin uses) and surfaces ``window.start``."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "ev_sliding_1h_30m",
    f"""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start,
             value
      FROM events)
    SELECT window_start, COUNT(*) AS n_events, {_SUM_VALUE_SQL}
    FROM expanded GROUP BY 1 ORDER BY 1
    """,
)
def ev_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in 2
    windows; Spark's TimeWindow expansion does this natively. The oracle
    expands the two epoch-aligned window starts explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


SESSION_GAP_MIN = 30

SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '{SESSION_GAP_MIN} minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, {_SUM_VALUE_SQL}
FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_idx
"""


@register("ev_sessionization", SESSION_ORACLE)
def ev_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a {SESSION_GAP_MIN}-minute
    inactivity gap; session id = running sum of session-start flags (the
    classic lag-gap-cumsum). Batch twin of streaming
    ``session_window``; per-user windows mean the only shuffle is the
    user_id hash partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
    new_session = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > gap), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.withColumn("new_session", new_session).withColumn(
        "session_idx", F.sum("new_session").over(run)
    )
    return (
        sessions.groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            _sum_value(),
        )
        .orderBy("user_id", "session_idx")
    )


@register(
    "ev_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
            / COUNT(*)) AS avg_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` payload column
    (``get_json_object`` — JVM-side JSON path, no UDF) + typed aggregation."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_type_pivot_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def ev_type_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide daily counts per event type) with an explicit value list —
    the scalable form: no extra pass to discover pivot values, single
    aggregation."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    out = (
        e.groupBy(day)
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .orderBy("day")
    )
    # pivot yields nulls for absent combos; oracle's CASE-sum yields 0
    cols = ["click", "error", "purchase", "signup", "view"]
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


@register(
    "range_join_events_in_error_windows",
    f"""
    WITH err_hours AS (
      SELECT date_trunc('hour', ts) AS h_start,
             date_trunc('hour', ts) + INTERVAL '1 hour' AS h_end
      FROM events WHERE event_type = 'error'
      GROUP BY 1 HAVING COUNT(*) >= 3)
    SELECT e.event_type, COUNT(*) AS n_events, {_SUM_VALUE_SQL}
    FROM events e JOIN err_hours w
      ON e.ts >= w.h_start AND e.ts < w.h_end
    GROUP BY 1 ORDER BY 1
    """,
)
def range_join_events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: all events falling inside "error-storm" windows (hours
    with ≥3 errors). Naive ``ts BETWEEN start AND end`` joins are O(n·m);
    because these intervals are hour-aligned, the join is expressed as an
    EQUI-join on the hour bucket — hash join, no Cartesian pass. For
    arbitrary intervals the same trick buckets both sides to a grid and
    joins (bucket, overlap-filter), keeping the pair space linear in
    events × avg-buckets-per-interval."""
    e = load_table(spark, sf_dir, "events")
    err_hours = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h_start"))
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= 3)
        .select("h_start")
    )
    bucketed = e.withColumn("h_start", F.date_trunc("hour", F.col("ts")))
    return (
        bucketed.join(err_hours, "h_start")  # equi-join on the aligned bucket
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .orderBy("event_type")
    )


@register(
    "ev_json_malformed_tolerance",
    """
    WITH dirty AS (
      SELECT event_type,
             CASE WHEN event_id % 10 = 0 THEN 'x' || props ELSE props END AS props
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_malformed,
           CAST(SUM(CASE WHEN json_valid(props)
                         THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS sum_k_valid
    FROM dirty GROUP BY 1 ORDER BY 1
    """,
)
def ev_json_malformed_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data tolerance: 10% of the JSON payloads are deterministically
    corrupted (prefix garbage — Spark's Jackson parser tolerates trailing
    garbage, so suffix corruption wouldn't register), and the parse degrades
    to NULL instead of failing the job (``get_json_object`` is
    null-on-malformed; the oracle mirrors it with json_valid guards). The malformed count is the data-quality metric a
    pipeline would alert on."""
    e = load_table(spark, sf_dir, "events")
    dirty = e.select(
        "event_type",
        F.when(F.col("event_id") % 10 == 0, F.concat(F.lit("x"), F.col("props")))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        dirty.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("long").alias("n_malformed"),
            F.sum(F.coalesce(k, F.lit(0))).cast("long").alias("sum_k_valid"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_variant_json_surface",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INT) AS max_k,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL)
               AS n_with_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def ev_variant_json_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (ClickHouse JSON-type parity, Spark 4
    ``parse_json``/``variant_get``): props parsed once into an open-schema
    variant, fields extracted with typed paths. Unlike ``get_json_object``
    (string re-parse per extraction), the variant parses once into a binary
    shredded form — at 100 TB the difference between O(extractions) and
    O(1) JSON parses per row."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_time_bucket_15m",
    f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
           COUNT(*) AS n_events, {_SUM_VALUE_SQL},
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def ev_time_bucket_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-interval ``time_bucket`` (the TimescaleDB/hypertable rollup
    primitive, 15-minute grain): one grouped aggregation per bucket with
    count/sum/min/max — the raw material the incremental rollup
    (operators/rollup_maintenance.py) refreshes. ``F.window`` is the Spark
    spelling; grain is a literal, so Catalyst folds the bucket boundary
    arithmetic into the scan projection."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_value(),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
        .orderBy("bucket_start")
    )


PEAK_CONCURRENCY_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '{SESSION_GAP_MIN} minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged),
iv AS (
  SELECT user_id, session_idx, MIN(ts) AS s, MAX(ts) AS e
  FROM sess GROUP BY 1, 2),
bounds AS (
  SELECT s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS t, -1 AS delta FROM iv),
intra AS (
  SELECT date_trunc('hour', t) AS hour,
         SUM(delta) OVER (PARTITION BY date_trunc('hour', t)
                          ORDER BY t, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS pref
  FROM bounds),
intra_max AS (SELECT hour, MAX(pref) AS max_pref FROM intra GROUP BY 1),
carry AS (
  SELECT u.hour, COUNT(*) AS c
  FROM iv, unnest(generate_series(date_trunc('hour', s) + INTERVAL 1 HOUR,
                                  date_trunc('hour', e),
                                  INTERVAL 1 HOUR)) AS u(hour)
  GROUP BY 1),
spine AS (
  SELECT unnest(generate_series(
           (SELECT MIN(date_trunc('hour', s)) FROM iv),
           (SELECT MAX(date_trunc('hour', e)) FROM iv),
           INTERVAL 1 HOUR)) AS hour)
SELECT spine.hour,
       CAST(COALESCE(c.c, 0) + GREATEST(COALESCE(m.max_pref, 0), 0) AS BIGINT)
           AS peak_concurrency
FROM spine
LEFT JOIN carry c USING (hour)
LEFT JOIN intra_max m USING (hour)
ORDER BY hour
"""


@register("ev_peak_concurrency_hourly", PEAK_CONCURRENCY_ORACLE)
def ev_peak_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the interval-overlap operator
    (ClickHouse ``runningConcurrency`` shape) WITHOUT the global sort it is
    usually written with. Sessions come from the lag-gap-cumsum
    sessionizer; each closed interval [start, end] emits a +1/-1 boundary
    pair, and concurrency decomposes per hour bucket as

        peak(H) = carry_in(H) + max(0, max prefix-sum of boundaries in H)

    where carry_in counts sessions spanning the hour start (computed by a
    bounded explode: one row per spanned hour, fan-out = session length in
    hours — sessions are inactivity-bounded, so this never approaches
    corpus scale). Prefix sums are windowed PER HOUR, so the only global
    structure is the hour spine (metadata-sized); at 100 TB every stage
    shuffles on (hour) or (user_id), never a single total order. Ties at
    equal t process +1 before -1 (closed-interval semantics), identically
    in the oracle."""
    sess = ev_sessionization(spark, sf_dir).select(
        F.col("session_start").alias("s"), F.col("session_end").alias("e")
    )
    return peak_concurrency_hourly(sess)


def peak_concurrency_hourly(sess: DataFrame) -> DataFrame:
    """Core of ev_peak_concurrency_hourly over ANY closed-interval relation
    with columns (s, e) — factored so property tests can feed arbitrary
    random intervals (tests/test_properties.py compares against a Python
    brute force)."""
    hour_s = F.date_trunc("hour", F.col("s"))
    hour_e = F.date_trunc("hour", F.col("e"))
    one_h = F.expr("INTERVAL 1 HOURS")

    bounds = sess.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    wpref = (
        Window.partitionBy(F.date_trunc("hour", F.col("t")))
        .orderBy(F.col("t"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra_max = (
        bounds.select(
            F.date_trunc("hour", F.col("t")).alias("hour"),
            F.sum("delta").over(wpref).alias("pref"),
        )
        .groupBy("hour")
        .agg(F.max("pref").alias("max_pref"))
    )
    carry = (
        sess.select(
            F.explode(
                F.when(
                    hour_s + one_h <= hour_e,
                    F.sequence(hour_s + one_h, hour_e, one_h),
                ).otherwise(F.expr("CAST(array() AS ARRAY<TIMESTAMP_NTZ>)"))
            ).alias("hour")
        )
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spine = (
        sess.agg(
            F.min(hour_s).alias("lo"), F.max(hour_e).alias("hi")
        )
        .select(F.explode(F.sequence(F.col("lo"), F.col("hi"), one_h)).alias("hour"))
    )
    return (
        spine.join(carry, "hour", "left")
        .join(intra_max, "hour", "left")
        .select(
            "hour",
            (
                F.coalesce(F.col("c"), F.lit(0))
                + F.greatest(F.coalesce(F.col("max_pref"), F.lit(0)), F.lit(0))
            )
            .cast("long")
            .alias("peak_concurrency"),
        )
        .orderBy("hour")
    )


@register(
    "ev_session_stats",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL '{SESSION_GAP_MIN} minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    per_session AS (
      SELECT user_id, sid,
             CAST(date_diff('microseconds', MIN(ts), MAX(ts)) AS BIGINT)
               AS dur_micros,
             CAST(COUNT(*) AS BIGINT) AS depth
      FROM sessions GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(quantile_disc(dur_micros, 0.5) AS BIGINT) AS p50_dur_micros,
           CAST(quantile_disc(dur_micros, 0.9) AS BIGINT) AS p90_dur_micros,
           CAST(quantile_disc(depth, 0.5) AS BIGINT) AS p50_depth,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces
    FROM per_session
    """,
)
def ev_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session distribution summary over the sessionized events: duration
    and depth percentiles (exact discrete order statistics — integral
    micros, engine-identical), plus the bounce count (single-event
    sessions). Reuses the lag-gap-cumsum sessionization — the extra cost
    over ``ev_sessionization`` is one tiny aggregate over sessions."""
    sess = ev_sessionization(spark, sf_dir)
    per = sess.select(
        F.expr(
            "timestampdiff(MICROSECOND, session_start, session_end)"
        ).alias("dur_micros"),
        F.col("n_events").alias("depth"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur_micros)")
        .cast("long")
        .alias("p50_dur_micros"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY dur_micros)")
        .cast("long")
        .alias("p90_dur_micros"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY depth)")
        .cast("long")
        .alias("p50_depth"),
        F.max("depth").alias("max_depth"),
        F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
    )
