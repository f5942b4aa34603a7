"""ClickHouse statistical-test and association-measure parity, round 2
(complements ch_aggregates.py's welchTTest / mannWhitneyUTest /
kolmogorovSmirnovTest / cramersV / theilsU): studentTTest,
proportionsZTest, categoricalInformationValue, contingency +
cramersVBiasCorrected + Tschuprow's T, and exponentialTimeDecayedAvg
evaluated at each user's latest event.

Reference parity: ClickHouse exposes all of these as native aggregate /
window functions (studentTTest, proportionsZTest,
categoricalInformationValue, contingency, cramersVBiasCorrected,
exponentialTimeDecayedAvg); an analyst migrating off the reference stack
expects them. Every query here reduces to grouped moments or contingency
counts — one corpus scan with map-side-combinable partials, then scalar
algebra on a tiny relation. No Python in the hot path, no extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_AB = ("click", "view")  # the two-sample arms reused across the tests


def _arm(t: str, agg, c: str = "value"):
    """Conditional aggregate over one arm (aggregates skip NULLs)."""
    return agg(F.when(F.col("event_type") == t, F.col(c)))


@register(
    "ch_student_ttest_click_vs_view",
    """
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('click', 'view')),
    m AS (
      SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n1,
        AVG(CASE WHEN event_type = 'click' THEN value END) AS m1,
        var_samp(CASE WHEN event_type = 'click' THEN value END) AS v1,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2,
        AVG(CASE WHEN event_type = 'view' THEN value END) AS m2,
        var_samp(CASE WHEN event_type = 'view' THEN value END) AS v2
      FROM s)
    SELECT ROUND((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2) * (1 / n1 + 1 / n2)),
                 6) AS t_stat,
           CAST(n1 + n2 - 2 AS BIGINT) AS df,
           ROUND(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2), 6)
             AS pooled_var,
           CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_view
    FROM m
    """,
)
def ch_student_ttest_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest(value, group)`` parity: the pooled-variance
    two-sample t statistic and its n1+n2-2 degrees of freedom
    (equal-variance assumption; the unequal-variance twin is
    ch_welch_ttest_click_vs_view). One grouped-moment pass —
    count/mean/sample-variance per arm accumulate map-side — then scalar
    algebra on the 1-row moment relation; holds at any scale."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin(*_AB))
    m = e.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("double").alias("n1"),
        _arm("click", F.avg).alias("m1"),
        _arm("click", F.var_samp).alias("v1"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("double").alias("n2"),
        _arm("view", F.avg).alias("m2"),
        _arm("view", F.var_samp).alias("v2"),
    )
    sp2 = ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2")) / (
        F.col("n1") + F.col("n2") - 2
    )
    return m.select(
        F.round(
            (F.col("m1") - F.col("m2"))
            / F.sqrt(sp2 * (1 / F.col("n1") + 1 / F.col("n2"))),
            6,
        ).alias("t_stat"),
        (F.col("n1") + F.col("n2") - 2).cast("long").alias("df"),
        F.round(sp2, 6).alias("pooled_var"),
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
    )


PZT_THRESHOLD = 50.0  # "success" = event value >= this (≈ the value median)


@register(
    "ch_proportions_ztest_click_vs_view",
    f"""
    WITH s AS (
      SELECT event_type, CAST(value >= {PZT_THRESHOLD} AS INT) AS succ
      FROM events WHERE event_type IN ('click', 'view')),
    m AS (
      SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n1,
        CAST(SUM(CASE WHEN event_type = 'click' THEN succ END) AS DOUBLE) AS s1,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2,
        CAST(SUM(CASE WHEN event_type = 'view' THEN succ END) AS DOUBLE) AS s2
      FROM s)
    SELECT ROUND((s1 / n1 - s2 / n2)
                 / sqrt(((s1 + s2) / (n1 + n2)) * (1 - (s1 + s2) / (n1 + n2))
                        * (1 / n1 + 1 / n2)), 6) AS z_stat,
           ROUND(s1 / n1, 6) AS p_click,
           ROUND(s2 / n2, 6) AS p_view,
           CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_view
    FROM m
    """,
)
def ch_proportions_ztest_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``proportionsZTest`` parity (pooled variant): two-sample
    z statistic for the difference of success proportions, success =
    value >= {PZT_THRESHOLD}. All inputs are integer counts from one
    grouped pass, so the double algebra is bit-identical across engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin(*_AB))
    succ = (F.col("value") >= PZT_THRESHOLD).cast("int")
    m = e.select("event_type", succ.alias("succ")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("double").alias("n1"),
        F.sum(F.when(F.col("event_type") == "click", F.col("succ")))
        .cast("double")
        .alias("s1"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("double").alias("n2"),
        F.sum(F.when(F.col("event_type") == "view", F.col("succ")))
        .cast("double")
        .alias("s2"),
    )
    p1, p2 = F.col("s1") / F.col("n1"), F.col("s2") / F.col("n2")
    pp = (F.col("s1") + F.col("s2")) / (F.col("n1") + F.col("n2"))
    return m.select(
        F.round(
            (p1 - p2) / F.sqrt(pp * (1 - pp) * (1 / F.col("n1") + 1 / F.col("n2"))),
            6,
        ).alias("z_stat"),
        F.round(p1, 6).alias("p_click"),
        F.round(p2, 6).alias("p_view"),
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
    )


IV_GOOD_CHARS = 300  # binary label: "good" doc = n_chars >= this
IV_SMOOTH = 0.5  # Laplace half-count so zero cells never hit ln(0)


@register(
    "ch_categorical_iv_lang",
    f"""
    WITH c AS (
      SELECT lang,
             CAST(SUM(CASE WHEN n_chars >= {IV_GOOD_CHARS} THEN 1 ELSE 0 END)
                  AS DOUBLE) AS ng,
             CAST(SUM(CASE WHEN n_chars >= {IV_GOOD_CHARS} THEN 0 ELSE 1 END)
                  AS DOUBLE) AS nb
      FROM documents GROUP BY lang),
    t AS (SELECT SUM(ng) AS tg, SUM(nb) AS tb, COUNT(*) AS k FROM c)
    SELECT lang,
           CAST(ng AS BIGINT) AS n_good,
           CAST(nb AS BIGINT) AS n_bad,
           ROUND(ln(((ng + {IV_SMOOTH}) / (tg + {IV_SMOOTH} * k))
                    / ((nb + {IV_SMOOTH}) / (tb + {IV_SMOOTH} * k))), 6) AS woe,
           ROUND(((ng + {IV_SMOOTH}) / (tg + {IV_SMOOTH} * k)
                  - (nb + {IV_SMOOTH}) / (tb + {IV_SMOOTH} * k))
                 * ln(((ng + {IV_SMOOTH}) / (tg + {IV_SMOOTH} * k))
                      / ((nb + {IV_SMOOTH}) / (tb + {IV_SMOOTH} * k))), 6)
             AS iv_term
    FROM c, t ORDER BY lang
    """,
)
def ch_categorical_iv_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``categoricalInformationValue`` parity: weight-of-evidence
    and information-value contribution of each lang category toward the
    binary label n_chars >= {IV_GOOD_CHARS} (the classic feature-screening
    statistic; total IV = SUM(iv_term)). Laplace-smoothed with half-counts
    so empty cells stay finite. One grouped count per category (bounded
    relation), then algebra against the broadcast one-row totals."""
    d = load_table(spark, sf_dir, "documents")
    good = (F.col("n_chars") >= IV_GOOD_CHARS).cast("int")
    c = d.groupBy("lang").agg(
        F.sum(good).cast("double").alias("ng"),
        F.sum(1 - good).cast("double").alias("nb"),
    )
    t = c.agg(
        F.sum("ng").alias("tg"),
        F.sum("nb").alias("tb"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    pg = (F.col("ng") + IV_SMOOTH) / (F.col("tg") + IV_SMOOTH * F.col("k"))
    pb = (F.col("nb") + IV_SMOOTH) / (F.col("tb") + IV_SMOOTH * F.col("k"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            F.col("ng").cast("long").alias("n_good"),
            F.col("nb").cast("long").alias("n_bad"),
            F.round(F.log(pg / pb), 6).alias("woe"),
            F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_term"),
        )
        .orderBy("lang")
    )


@register(
    "ch_contingency_coeffs",
    """
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS obs
      FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, SUM(obs) AS row_tot FROM o GROUP BY lang),
    ct AS (SELECT source, SUM(obs) AS col_tot FROM o GROUP BY source),
    n AS (SELECT SUM(obs) AS n FROM o),
    rc AS (SELECT CAST((SELECT COUNT(*) FROM rt) AS DOUBLE) AS r,
                  CAST((SELECT COUNT(*) FROM ct) AS DOUBLE) AS c),
    chi AS (
      SELECT SUM(POW(obs - row_tot * col_tot / n.n, 2)
                 / (row_tot * col_tot / n.n)) AS chi2,
             MAX(n.n) AS n
      FROM o JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n)
    SELECT ROUND(sqrt(chi2 / (chi2 + n)), 6) AS contingency_coef,
           ROUND(sqrt(GREATEST(chi2 / n - (r - 1) * (c - 1) / (n - 1), 0)
                      / LEAST(r - POW(r - 1, 2) / (n - 1) - 1,
                              c - POW(c - 1, 2) / (n - 1) - 1)), 6)
             AS cramers_v_bc,
           ROUND(sqrt((chi2 / n) / sqrt((r - 1) * (c - 1))), 6)
             AS tschuprow_t,
           ROUND(chi2, 6) AS chi2
    FROM chi, rc
    """,
)
def ch_contingency_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``contingency`` / ``cramersVBiasCorrected`` /
    Tschuprow's T parity over (lang, source) — the bias-corrected family
    next to ch_cramers_v_lang_source's plain V. Everything derives from one
    contingency count (cells = |lang|×|source|, dozens of rows); the corpus
    is scanned exactly once regardless of scale, margins and chi² are
    algebra over that tiny relation."""
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("col_tot"))
    n = o.agg(F.sum("obs").alias("n"))
    r = rt.agg(F.count(F.lit(1)).cast("double").alias("r"))
    c = ct.agg(F.count(F.lit(1)).cast("double").alias("c"))
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = (
        o.join(rt, "lang")
        .join(ct, "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2"),
            F.max("n").alias("n"),
        )
        .crossJoin(F.broadcast(r))
        .crossJoin(F.broadcast(c))
    )
    phi2 = F.col("chi2") / F.col("n")
    phi2c = F.greatest(
        phi2 - (F.col("r") - 1) * (F.col("c") - 1) / (F.col("n") - 1), F.lit(0.0)
    )
    rcorr = F.col("r") - F.pow(F.col("r") - 1, 2) / (F.col("n") - 1)
    ccorr = F.col("c") - F.pow(F.col("c") - 1, 2) / (F.col("n") - 1)
    return chi.select(
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 6).alias(
            "contingency_coef"
        ),
        F.round(F.sqrt(phi2c / F.least(rcorr - 1, ccorr - 1)), 6).alias(
            "cramers_v_bc"
        ),
        F.round(
            F.sqrt(phi2 / F.sqrt((F.col("r") - 1) * (F.col("c") - 1))), 6
        ).alias("tschuprow_t"),
        F.round("chi2", 6).alias("chi2"),
    )


DECAY_AVG_TAU_HOURS = 24.0


@register(
    "ch_exp_decayed_avg_per_user",
    f"""
    WITH a AS (
      SELECT user_id, value,
             epoch_us(ts) AS t,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS t_max
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value * exp(-(t_max - t)
                                 / ({DECAY_AVG_TAU_HOURS} * 3600e6)))
                 / SUM(exp(-(t_max - t) / ({DECAY_AVG_TAU_HOURS} * 3600e6))),
                 6) AS decayed_avg
    FROM a GROUP BY user_id ORDER BY user_id
    """,
)
def ch_exp_decayed_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg(tau)(value, t)`` parity,
    evaluated at each user's LATEST event: the recency-weighted mean of the
    user's event values, weight exp(-age/τ), τ = {DECAY_AVG_TAU_HOURS}h,
    anchored at that user's max ts. The per-event-type count-weighted twin
    is ev_trending_decay_score; this is the per-entity normalized-average
    form a feature store materializes.

    Scale: the anchor is a per-user window MAX over the same user_id
    partitioning the grouped aggregate uses — one shuffle total, and both
    the weighted sum and the normalizer are plain SUMs, so the aggregate is
    map-side combinable and a stored partial re-anchors by multiplying
    exp(-Δ/τ) (the AggregatingMergeTree trick)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    e = e.withColumn("t_max", F.max("t").over(Window.partitionBy("user_id")))
    w = F.exp(
        -(F.col("t_max") - F.col("t")).cast("double")
        / (DECAY_AVG_TAU_HOURS * 3600e6)
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value") * w) / F.sum(w), 6
            ).alias("decayed_avg"),
        )
        .orderBy("user_id")
    )
