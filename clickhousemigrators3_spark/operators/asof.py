"""As-of join — an operator Spark has no native form of (SURVEY §7.3
"custom operators": compose from existing DataFrame ops when semantics
allow).

``asof_join(probe, source, by, ts)`` attaches to each probe row the payload
of the latest source row with a strictly earlier timestamp in the same
``by`` group. Implementation is the union-sort trick:

  union(source-tagged, probe-tagged)
  → window per ``by`` ordered by (ts, tag)
  → last(payload, ignorenulls=True) over rows unbounded-preceding

One shuffle on ``by`` + one ordered window scan — O(n log n) per group and
no range self-join blow-up, which is why this form survives 10^9-row event
tables (a naive ``p.ts > c.ts`` join is quadratic per group). Ties: probe
sorts before source at equal ts (tag 0 < 1), giving the strict
"earlier-only" semantics of DuckDB's ``ASOF JOIN ON p.ts > c.ts``, which is
the oracle here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register


def asof_join(
    probe: DataFrame,
    source: DataFrame,
    by: list[str],
    ts: str,
    payload: dict[str, Column],
    probe_cols: list[str],
    direction: str = "backward",
    tie_break: str | None = None,
) -> DataFrame:
    """Generic as-of join. ``payload`` maps output-column → source column
    expression; probe rows keep ``probe_cols``.

    ``direction="backward"`` attaches the latest strictly-earlier source row
    (the default, DuckDB ``ON p.ts > s.ts``); ``"forward"`` the earliest
    strictly-later one (``ON p.ts < s.ts``) — same union-sort trick with the
    scan order reversed, so the nearest preceding row in window order is the
    nearest *later* timestamp.

    ``tie_break`` names a source column used as the final ordering key when
    two source rows in the same group share a timestamp — without it the
    window order ties and ``last()`` picks an arbitrary one per run. The
    winner at equal ts is the max ``tie_break`` value (backward) / min
    (forward); pass the source's unique id for determinism. (DuckDB's ASOF
    JOIN is likewise unspecified on source-ts ties, so there is no one
    "correct" row — only a repeatable one.)"""
    tie_src = F.col(tie_break) if tie_break else F.lit(0)
    src_tagged = source.select(
        *by,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        tie_src.alias("_tie"),
        *[expr.alias(f"_p_{name}") for name, expr in payload.items()],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_k_{c}") for c in probe_cols],
    )
    probe_tagged = probe.select(
        *by,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(src_tagged.schema["_tie"].dataType).alias("_tie"),
        *[F.lit(None).cast(source.select(expr.alias("x")).schema["x"].dataType).alias(f"_p_{name}") for name, expr in payload.items()],
        *[F.col(c).alias(f"_k_{c}") for c in probe_cols],
    )
    unioned = src_tagged.unionByName(probe_tagged)
    if direction == "backward":
        # scan old→new; among equal-ts sources the max tie wins (last seen)
        order = [F.col("_ts").asc(), F.col("_tag"), F.asc_nulls_first("_tie")]
    else:
        # scan new→old; among equal-ts sources the min tie wins (last seen)
        order = [F.col("_ts").desc(), F.col("_tag"), F.desc_nulls_first("_tie")]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *by,
        "_ts",
        "_tag",
        *[F.col(f"_k_{c}") for c in probe_cols],
        *[
            F.last(F.col(f"_p_{name}"), ignorenulls=True).over(w).alias(name)
            for name in payload
        ],
    )
    return carried.filter(F.col("_tag") == 0).select(
        *[F.col(f"_k_{c}").alias(c) for c in probe_cols],
        *by,
        F.col("_ts").alias(ts),
        *payload.keys(),
    )


@register(
    "asof_join_last_click_before_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts, c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the value of the user's most recent strictly
    earlier click (NULL if none) — checked against DuckDB's native
    ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    out = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"last_click_value": F.col("value")},
        probe_cols=["event_id"],
        tie_break="event_id",
    )
    return out.select("event_id", "user_id", "ts", "last_click_value").orderBy("event_id")


@register(
    "asof_join_next_view_after_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts, v.value AS next_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts < v.ts
    ORDER BY p.event_id
    """,
)
def asof_join_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every purchase, the value of the user's first
    strictly later 'view' event (NULL if none) — e.g. post-purchase
    engagement attribution. Checked against DuckDB's native forward
    ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    out = asof_join(
        probe=purchases,
        source=views,
        by=["user_id"],
        ts="ts",
        payload={"next_view_value": F.col("value")},
        probe_cols=["event_id"],
        direction="forward",
        tie_break="event_id",
    )
    return out.select("event_id", "user_id", "ts", "next_view_value").orderBy("event_id")


@register(
    "asof_interpolate_value_at_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(CASE
             WHEN b.ts IS NOT NULL AND f.ts IS NOT NULL THEN
               b.value + (f.value - b.value)
                 * (epoch_us(p.ts) - epoch_us(b.ts))
                 / (epoch_us(f.ts) - epoch_us(b.ts))
             WHEN b.ts IS NOT NULL THEN b.value
             WHEN f.ts IS NOT NULL THEN f.value
             ELSE NULL END, 6) AS interp_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON p.user_id = b.user_id AND p.ts > b.ts
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') f
      ON p.user_id = f.user_id AND p.ts < f.ts
    ORDER BY p.event_id
    """,
)
def asof_interpolate_value_at_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear interpolation at probe time — the upgrade of LOCF gap-filling:
    each purchase gets the click ``value`` linearly interpolated between
    the user's nearest strictly-earlier and strictly-later clicks
    (falling back to the single neighbor at either edge, NULL when the
    user never clicked). Composes the backward and forward as-of forms —
    two union-sort window passes over the same user_id partitioning, then
    arithmetic; the oracle is DuckDB's native ASOF chained both ways.

    The time fraction is exact integer µs on both sides; one double
    divide, rounded at 6dp."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    back = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"prev_value": F.col("value"), "prev_ts": F.col("ts")},
        probe_cols=["event_id"],
        tie_break="event_id",
    )
    fwd = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"next_value": F.col("value"), "next_ts": F.col("ts")},
        probe_cols=["event_id"],
        direction="forward",
        tie_break="event_id",
    ).select("event_id", "next_value", "next_ts")
    j = back.join(fwd, "event_id")
    pt = F.unix_micros(F.col("ts").cast("timestamp"))
    bt = F.unix_micros(F.col("prev_ts").cast("timestamp"))
    ft = F.unix_micros(F.col("next_ts").cast("timestamp"))
    interp = (
        F.when(
            F.col("prev_ts").isNotNull() & F.col("next_ts").isNotNull(),
            F.col("prev_value")
            + (F.col("next_value") - F.col("prev_value"))
            * (pt - bt)
            / (ft - bt),
        )
        .when(F.col("prev_ts").isNotNull(), F.col("prev_value"))
        .when(F.col("next_ts").isNotNull(), F.col("next_value"))
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        j.select(
            "event_id",
            "user_id",
            "ts",
            F.round(interp, 6).alias("interp_value"),
        )
        .orderBy("event_id")
    )


@register(
    "asof_join_click_within_tolerance",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL 1 HOUR
                THEN c.value END AS click_value_1h,
           CASE WHEN c.ts IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL 1 HOUR
                THEN c.ts END AS click_ts_1h
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_click_within_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with TOLERANCE (kdb ``aj`` tolerance / pandas
    ``merge_asof(tolerance=...)``): the most recent earlier click counts
    only if it happened within 1 hour of the purchase — stale state older
    than the tolerance must NOT leak in, it becomes NULL. Built on the same
    union-sort as-of core (one shuffle, no range fan-out): the source ts
    rides along as payload and the tolerance is a post-projection, so the
    tolerance costs nothing over the plain as-of."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    out = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"_click_value": F.col("value"), "_click_ts": F.col("ts")},
        probe_cols=["event_id"],
        tie_break="event_id",
    )
    # exact microsecond gap (timestampdiff in SECOND would truncate and
    # admit gaps up to 3600.999…s that the INTERVAL comparison rejects)
    within = F.col("_click_ts").isNotNull() & (
        F.expr("timestampdiff(MICROSECOND, _click_ts, ts)") <= 3_600_000_000
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("_click_value")).alias("click_value_1h"),
        F.when(within, F.col("_click_ts")).alias("click_ts_1h"),
    ).orderBy("event_id")


@register(
    "asof_join_nearest_click",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN b.ts IS NULL THEN f.value
                WHEN f.ts IS NULL THEN b.value
                WHEN date_diff('microseconds', b.ts, p.ts)
                     <= date_diff('microseconds', p.ts, f.ts)
                THEN b.value ELSE f.value END AS nearest_click_value,
           CASE WHEN b.ts IS NULL THEN 'after'
                WHEN f.ts IS NULL THEN 'before'
                WHEN date_diff('microseconds', b.ts, p.ts)
                     <= date_diff('microseconds', p.ts, f.ts)
                THEN 'before' ELSE 'after' END AS nearest_side
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON p.user_id = b.user_id AND p.ts > b.ts
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') f
      ON p.user_id = f.user_id AND p.ts < f.ts
    ORDER BY p.event_id
    """,
)
def asof_join_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of (pandas ``merge_asof(direction='nearest')``):
    the click closest in time to each purchase, in EITHER direction —
    backward wins ties. Composes the backward and forward as-of cores
    (each one union-sort shuffle on user_id); the direction pick is a
    row-local comparison of the two candidate gaps, so 'nearest' costs
    exactly backward + forward, no range join, no fan-out. When only one
    side exists the survivor wins; a purchase with no clicks at all yields
    NULL."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    back = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"_bv": F.col("value"), "_bts": F.col("ts")},
        probe_cols=["event_id"],
        tie_break="event_id",
    )
    fwd = asof_join(
        probe=purchases,
        source=clicks,
        by=["user_id"],
        ts="ts",
        payload={"_fv": F.col("value"), "_fts": F.col("ts")},
        probe_cols=["event_id"],
        direction="forward",
        tie_break="event_id",
    ).select("event_id", "_fv", "_fts")
    j = back.join(fwd, "event_id")
    bgap = F.expr("timestampdiff(MICROSECOND, _bts, ts)")
    fgap = F.expr("timestampdiff(MICROSECOND, ts, _fts)")
    prefer_back = F.col("_fts").isNull() | (
        F.col("_bts").isNotNull() & (bgap <= fgap)
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(prefer_back, F.col("_bv"))
        .otherwise(F.col("_fv"))
        .alias("nearest_click_value"),
        F.when(
            F.col("_bts").isNull() & F.col("_fts").isNull(), F.lit(None)
        )
        .when(prefer_back, F.lit("before"))
        .otherwise(F.lit("after"))
        .alias("nearest_side"),
    ).orderBy("event_id")
