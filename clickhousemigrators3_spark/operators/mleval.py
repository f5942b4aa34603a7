"""Model/labeler evaluation over corpus-scale predictions — the measurement
half of a training-data pipeline: once a quality classifier, language
detector, or dedup scorer runs over the corpus, you need ranking metrics
(ROC AUC, average precision), calibration (reliability bins + ECE),
classification quality (confusion matrix, per-class precision/recall/F1),
annotator agreement (Cohen's kappa), and audience/segment set algebra
(exact + mergeable-sketch). ClickHouse ships arrayAUC / uniqTheta set
operations natively (reference users call them on eval result tables);
these are the grouped, corpus-scale Spark equivalents.

Scale design notes (each query's docstring has specifics):

* Ranking metrics are rank-statistic forms — ROC AUC via the tie-corrected
  Mann-Whitney rank sum, AP via one ordered cumulative scan — ONE window
  shuffle on the group key, never a pairwise comparison.
* Tie counts reuse the SAME exchange+sort as the rank (a
  ``RANGE BETWEEN CURRENT ROW AND CURRENT ROW`` peer frame), so Catalyst
  plans one Exchange per query.
* Confusion/kappa reduce to contingency counts: one scan with map-side
  combine, then algebra on a #classes² relation.
* Sketch overlap uses DataSketches HLL partials (mergeable, fixed-size
  state) with inclusion-exclusion for the intersection — the 100 TB path
  where exact distinct-user joins would shuffle the raw corpus.

Reference parity: ClickHouse ``arrayAUC`` (AUC semantics matched on the
flat form), ``uniqCombined``-based segment overlap dashboards
(``ch_client.py:10-25`` transport executes these query shapes verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import langid_expr, sql_langid
from ..registry import register

_POS = "purchase"  # positive class for score-ranking metrics
_PROB_DEN = 500.0  # value → pseudo-probability denominator (value ∈ [0, 490])


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (day, score, y): does `value` rank purchases above the rest."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.to_date("ts").alias("day"),
        F.col("event_id"),
        F.col("value").alias("score"),
        (F.col("event_type") == _POS).cast("int").alias("y"),
    )


def roc_auc_by_group(df: DataFrame, group: str = "day") -> DataFrame:
    """Core grouped ROC AUC over (group, score, y∈{0,1}) rows — the
    tie-corrected Mann-Whitney rank-sum form (see ml_roc_auc_daily for the
    derivation and plan shape). Groups without both classes are dropped
    (AUC undefined)."""
    w = Window.partitionBy(group).orderBy("score")
    peers = w.rangeBetween(Window.currentRow, Window.currentRow)
    r = df.select(
        group,
        "y",
        F.rank().over(w).alias("mn_rank"),
        F.count(F.lit(1)).over(peers).alias("ties"),
    )
    g = r.groupBy(group).agg(
        F.sum("y").cast("double").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("double").alias("n_neg"),
        F.sum(
            F.when(F.col("y") == 1, F.col("mn_rank") + (F.col("ties") - 1) / 2.0)
        ).alias("r_pos"),
    )
    return (
        g.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            group,
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.round(
                (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2)
                / (F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("roc_auc"),
        )
        .orderBy(group)
    )


def avg_precision_by_group(
    df: DataFrame, group: str = "day", tiebreak: str = "event_id"
) -> DataFrame:
    """Core grouped average precision over (group, score, y, tiebreak)
    rows — AP over the (score DESC, tiebreak ASC) ranking; see
    ml_avg_precision_daily."""
    w = Window.partitionBy(group).orderBy(F.desc("score"), tiebreak)
    r = df.select(
        group,
        "y",
        F.row_number().over(w).alias("k"),
        F.sum("y").over(w).alias("cum_pos"),
    )
    return (
        r.groupBy(group)
        .agg(
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                F.sum(
                    F.when(
                        F.col("y") == 1,
                        F.col("cum_pos").cast("double") / F.col("k"),
                    )
                )
                / F.sum("y"),
                6,
            ).alias("avg_precision"),
        )
        .filter(F.col("n_pos") > 0)
        .orderBy(group)
    )


@register(
    "ml_roc_auc_daily",
    f"""
    WITH s AS (
      SELECT CAST(ts AS DATE) AS day, event_id, value AS score,
             CAST(event_type = '{_POS}' AS INT) AS y
      FROM events),
    r AS (
      SELECT day, y,
             rank() OVER (PARTITION BY day ORDER BY score) AS mn_rank,
             COUNT(*) OVER (PARTITION BY day, score) AS ties
      FROM s),
    g AS (
      SELECT day,
             CAST(SUM(y) AS DOUBLE) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS n_neg,
             SUM(CASE WHEN y = 1 THEN mn_rank + (ties - 1) / 2.0 END) AS r_pos
      FROM r GROUP BY day)
    SELECT day,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg), 6)
             AS roc_auc
    FROM g WHERE n_pos > 0 AND n_neg > 0
    ORDER BY day
    """,
)
def ml_roc_auc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day ROC AUC of ``value`` as a purchase score — the tie-corrected
    Mann-Whitney rank-sum form: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), where R⁺
    sums the AVERAGE rank of each positive (min-rank + (ties−1)/2 handles
    tied scores exactly; no sampling, no pairwise loop).

    Scale: the only corpus shuffle is the window exchange on ``day``. The
    tie count is a peer frame (``RANGE CURRENT ROW``) over the SAME
    (day, ORDER BY score) sort the rank uses, so Catalyst plans one
    Exchange + one Sort; the follow-up groupBy(day) aggregation is
    map-side-combinable on already-day-clustered data."""
    return roc_auc_by_group(_scored(spark, sf_dir))


@register(
    "ml_avg_precision_daily",
    f"""
    WITH s AS (
      SELECT CAST(ts AS DATE) AS day, event_id, value AS score,
             CAST(event_type = '{_POS}' AS INT) AS y
      FROM events),
    r AS (
      SELECT day, y,
             row_number() OVER (PARTITION BY day
                                ORDER BY score DESC, event_id) AS k,
             SUM(y) OVER (PARTITION BY day
                          ORDER BY score DESC, event_id) AS cum_pos
      FROM s)
    SELECT day,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN y = 1 THEN CAST(cum_pos AS DOUBLE) / k END)
                 / SUM(y), 6) AS avg_precision
    FROM r GROUP BY day HAVING SUM(y) > 0
    ORDER BY day
    """,
)
def ml_avg_precision_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day average precision (area under the precision-recall curve,
    interpolation-free form): AP = (1/n⁺) Σ_{k: yₖ=1} Precision@k over the
    score-descending ranking. Ties broken by event_id so both engines walk
    the identical ranking.

    Scale: one window exchange on ``day``; row_number and the running
    positive count share the same (day, score DESC, event_id) sort."""
    return avg_precision_by_group(_scored(spark, sf_dir))


@register(
    "ml_calibration_bins",
    f"""
    WITH s AS (
      SELECT LEAST(CAST(FLOOR(value / {_PROB_DEN} * 10) AS INT), 9) AS bin,
             value / {_PROB_DEN} AS prob,
             CAST(event_type = '{_POS}' AS INT) AS y
      FROM events),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM s)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(prob), 6) AS avg_conf,
           ROUND(AVG(CAST(y AS DOUBLE)), 6) AS frac_pos,
           ROUND(ABS(AVG(prob) - AVG(CAST(y AS DOUBLE))), 6) AS abs_gap,
           ROUND(COUNT(*) / (SELECT total FROM t)
                 * ABS(AVG(prob) - AVG(CAST(y AS DOUBLE))), 6)
             AS ece_contrib
    FROM s GROUP BY bin ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE decomposition: ``value`` rescaled to a
    pseudo-probability, 10 equal-width bins; per bin the mean confidence,
    the empirical positive rate, their gap, and the bin's weighted
    contribution to Expected Calibration Error (ECE = Σ ece_contrib).

    Scale: one grouped scan (10-key groupBy, map-side combinable); the
    corpus total is a broadcast 1-row scalar — no second corpus pass."""
    e = load_table(spark, sf_dir, "events")
    s = e.select(
        F.least(F.floor(F.col("value") / _PROB_DEN * 10).cast("int"), F.lit(9)).alias(
            "bin"
        ),
        (F.col("value") / _PROB_DEN).alias("prob"),
        (F.col("event_type") == _POS).cast("int").alias("y"),
    )
    total = s.agg(F.count(F.lit(1)).cast("double").alias("total"))
    g = s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("prob").alias("conf"),
        F.avg(F.col("y").cast("double")).alias("acc"),
    )
    return (
        g.crossJoin(F.broadcast(total))
        .select(
            "bin",
            F.col("n").cast("long").alias("n_events"),
            F.round("conf", 6).alias("avg_conf"),
            F.round("acc", 6).alias("frac_pos"),
            F.round(F.abs(F.col("conf") - F.col("acc")), 6).alias("abs_gap"),
            F.round(
                F.col("n") / F.col("total") * F.abs(F.col("conf") - F.col("acc")), 6
            ).alias("ece_contrib"),
        )
        .orderBy("bin")
    )


@register(
    "ml_langid_confusion",
    f"""
    SELECT lang AS true_lang, {sql_langid('text')} AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ml_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the corpus language-ID heuristic (text_langid)
    against the labeled ``lang`` column — the eval loop a pipeline runs
    after any labeler change. One scan, groupBy on a #langs² key space."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("true_lang"),
            langid_expr(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "ml_langid_prf",
    f"""
    WITH p AS (
      SELECT lang AS true_lang, {sql_langid('text')} AS pred_lang
      FROM documents),
    by_true AS (SELECT true_lang AS cls, COUNT(*) AS n_true
                FROM p GROUP BY 1),
    by_pred AS (SELECT pred_lang AS cls, COUNT(*) AS n_pred
                FROM p GROUP BY 1),
    tp AS (SELECT true_lang AS cls, COUNT(*) AS n_tp
           FROM p WHERE true_lang = pred_lang GROUP BY 1),
    j AS (
      SELECT COALESCE(by_true.cls, by_pred.cls) AS cls,
             COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred,
             COALESCE(n_tp, 0) AS n_tp
      FROM by_true FULL OUTER JOIN by_pred ON by_true.cls = by_pred.cls
      LEFT JOIN tp ON COALESCE(by_true.cls, by_pred.cls) = tp.cls)
    SELECT cls,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred,
           ROUND(CAST(n_tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision,
           ROUND(CAST(n_tp AS DOUBLE) / NULLIF(n_true, 0), 6) AS recall,
           ROUND(2.0 * n_tp / NULLIF(n_pred + n_true, 0), 6) AS f1
    FROM j ORDER BY cls
    """,
)
def ml_langid_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the language-ID labeler vs the
    labeled truth. F1 uses the 2·TP/(pred+true) identity so a 0/0 class
    yields NULL on both engines rather than a NaN-vs-NULL mismatch.

    Scale: the corpus is scanned once into (true, pred) pairs; everything
    after is algebra on #classes-sized relations (map-side-combined
    groupBys, then joins between ≤#classes-row tables)."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        F.col("lang").alias("true_lang"),
        langid_expr(F.col("text")).alias("pred_lang"),
    )
    by_true = p.groupBy(F.col("true_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    by_pred = p.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        p.filter(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    j = (
        by_true.join(by_pred, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
        )
    )
    return j.select(
        "cls",
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.round(
            F.col("n_tp").cast("double") / F.nullif(F.col("n_pred"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            F.col("n_tp").cast("double") / F.nullif(F.col("n_true"), F.lit(0)), 6
        ).alias("recall"),
        F.round(
            2.0 * F.col("n_tp") / F.nullif(F.col("n_pred") + F.col("n_true"), F.lit(0)),
            6,
        ).alias("f1"),
    ).orderBy("cls")


@register(
    "ml_cohens_kappa",
    f"""
    WITH p AS (
      SELECT lang AS a, {sql_langid('text')} AS b FROM documents),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total,
                 SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree FROM p),
    ma AS (SELECT a AS cls, COUNT(*) AS na FROM p GROUP BY 1),
    mb AS (SELECT b AS cls, COUNT(*) AS nb FROM p GROUP BY 1),
    pe AS (SELECT SUM(CAST(na AS DOUBLE) * nb) AS chance_prod
           FROM ma JOIN mb ON ma.cls = mb.cls)
    SELECT CAST(total AS BIGINT) AS n_items,
           ROUND(agree / total, 6) AS po,
           ROUND(chance_prod / (total * total), 6) AS pe,
           ROUND((agree / total - chance_prod / (total * total))
                 / NULLIF(1 - chance_prod / (total * total), 0), 6) AS kappa
    FROM n CROSS JOIN pe
    """,
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two labelers of the corpus — here the labeled
    ``lang`` column vs the heuristic detector, the agreement check a
    pipeline runs before trusting auto-labels: κ = (p₀ − pₑ)/(1 − pₑ) with
    pₑ from the marginal products.

    Scale: one corpus scan into pairs; marginals are #classes-row
    relations, their join and the final scalar algebra are driver-trivial
    but stay in Spark (broadcast 1-row cross joins)."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        F.col("lang").alias("a"), langid_expr(F.col("text")).alias("b")
    )
    return kappa_from_pairs(p)


def kappa_from_pairs(p: DataFrame) -> DataFrame:
    """κ over a ``(a, b)`` label-pair relation — the agreement algebra
    behind :func:`ml_cohens_kappa`, exposed for direct use on any two
    label columns. Degenerate pe = 1 (full agreement, single-class
    marginals) yields kappa = NULL rather than an ANSI DIVIDE_BY_ZERO."""
    n = p.agg(
        F.count(F.lit(1)).cast("double").alias("total"),
        F.sum((F.col("a") == F.col("b")).cast("int")).alias("agree"),
    )
    ma = p.groupBy(F.col("a").alias("cls")).agg(F.count(F.lit(1)).alias("na"))
    mb = p.groupBy(F.col("b").alias("cls")).agg(F.count(F.lit(1)).alias("nb"))
    pe = (
        ma.join(mb, "cls")
        .agg(F.sum(F.col("na").cast("double") * F.col("nb")).alias("chance_prod"))
    )
    po = F.col("agree") / F.col("total")
    pe_v = F.col("chance_prod") / (F.col("total") * F.col("total"))
    return n.crossJoin(F.broadcast(pe)).select(
        F.col("total").cast("long").alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe_v, 6).alias("pe"),
        # nullif guard: a degenerate corpus where both labelers fully agree
        # with single-class marginals gives pe = 1 — ANSI division would
        # throw DIVIDE_BY_ZERO; both engines yield NULL instead.
        F.round((po - pe_v) / F.nullif(F.lit(1) - pe_v, F.lit(0)), 6).alias(
            "kappa"
        ),
    )


_SEG_A = "click"
_SEG_B = "purchase"


@register(
    "ev_segment_overlap_exact",
    f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = '{_SEG_A}' THEN 1 ELSE 0 END) AS a,
             MAX(CASE WHEN event_type = '{_SEG_B}' THEN 1 ELSE 0 END) AS b
      FROM events GROUP BY user_id)
    SELECT CAST(SUM(a) AS BIGINT) AS n_a,
           CAST(SUM(b) AS BIGINT) AS n_b,
           CAST(SUM(a * b) AS BIGINT) AS n_and,
           CAST(SUM(CASE WHEN a = 1 OR b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_or,
           CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a_not_b
    FROM u
    """,
)
def ev_segment_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience set algebra — |A|, |B|, |A∩B|, |A∪B|, |A∖B| over
    distinct users in two behavioral segments (ClickHouse users do this
    with uniqExact / groupBitmapAnd-style queries). One shuffle on
    user_id; per-user membership flags collapse with map-side MAX, the
    final reduce is a 1-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == _SEG_A).cast("int")).alias("a"),
        F.max((F.col("event_type") == _SEG_B).cast("int")).alias("b"),
    )
    return u.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n_and"),
        F.sum(((F.col("a") == 1) | (F.col("b") == 1)).cast("int"))
        .cast("long")
        .alias("n_or"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("int"))
        .cast("long")
        .alias("n_a_not_b"),
    )


@register("ev_segment_overlap_hll", None)  # approximate → rows-only; bounds in pytest
def ev_segment_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch audience overlap (ClickHouse uniqCombined /
    uniqTheta set-operation parity): per-segment DataSketches HLL partials,
    |A∪B| from the union sketch, |A∩B| and |A∖B| by inclusion-exclusion.

    This is the 100 TB path: each segment's state is a fixed-size sketch
    built with map-side partial aggregation (no per-user shuffle at all —
    contrast the exact twin's user_id exchange), partials are mergeable
    across shards/days, and set algebra happens on final estimates.
    Accuracy vs the exact twin is asserted within HLL error bounds in
    tests/test_engine_units.py (lgK=12 → ~1.6% relative standard error;
    inclusion-exclusion compounds to a few % on the intersection)."""
    e = load_table(spark, sf_dir, "events")
    seg = e.filter(F.col("event_type").isin(_SEG_A, _SEG_B)).select(
        "event_type", "user_id"
    )
    sk = seg.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    # one row per segment → estimates + the union estimate, all JVM-side
    est = sk.agg(
        F.round(
            F.hll_sketch_estimate(
                F.max(F.when(F.col("event_type") == _SEG_A, F.col("sketch")))
            )
        )
        .cast("long")
        .alias("n_a"),
        F.round(
            F.hll_sketch_estimate(
                F.max(F.when(F.col("event_type") == _SEG_B, F.col("sketch")))
            )
        )
        .cast("long")
        .alias("n_b"),
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch")))
        .cast("long")
        .alias("n_or"),
    )
    return est.select(
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b") - F.col("n_or")).alias("n_and"),
        "n_or",
        (F.col("n_or") - F.col("n_b")).alias("n_a_not_b"),
    )


_NDCG_K = 50
_GRADES = "CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2 WHEN 'click' THEN 1 ELSE 0 END"


@register(
    "ml_ndcg_at_k_daily",
    f"""
    WITH s AS (
      SELECT CAST(ts AS DATE) AS day, event_id, value AS score,
             {_GRADES} AS rel
      FROM events),
    r AS (
      SELECT day, rel,
             row_number() OVER (PARTITION BY day
                                ORDER BY score DESC, event_id) AS k,
             row_number() OVER (PARTITION BY day
                                ORDER BY rel DESC, event_id) AS ik
      FROM s),
    g AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CASE WHEN k <= {_NDCG_K}
                 THEN (POW(2, rel) - 1) / (LN(k + 1) / LN(2)) END) AS dcg,
             SUM(CASE WHEN ik <= {_NDCG_K}
                 THEN (POW(2, rel) - 1) / (LN(ik + 1) / LN(2)) END) AS idcg
      FROM r GROUP BY day)
    SELECT day, n_events, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
           ROUND(dcg / idcg, 6) AS ndcg
    FROM g WHERE idcg > 0 ORDER BY day
    """,
)
def ml_ndcg_at_k_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day NDCG@{k}: how well the ``value`` score ranks events against
    graded relevance (purchase=3 > signup=2 > click=1 > rest=0) — the
    ranking-quality check a retrieval/reranker eval runs per slice.
    DCG@k over the score-descending ranking, normalized by the ideal
    (relevance-descending) DCG@k; ties broken by event_id so both engines
    walk identical rankings.

    Scale: ONE exchange on ``day`` feeding both window sorts (actual vs
    ideal ranking); the per-day reduce is map-side-combinable. No per-query
    fan-out — k caps the contributing rows per group inside the
    aggregation, not via a LIMIT join."""
    e = load_table(spark, sf_dir, "events")
    rel = (
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
    )
    s = e.select(
        F.to_date("ts").alias("day"),
        "event_id",
        F.col("value").alias("score"),
        rel.alias("rel"),
    )
    wk = Window.partitionBy("day").orderBy(F.desc("score"), "event_id")
    wi = Window.partitionBy("day").orderBy(F.desc("rel"), "event_id")
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    r = s.select(
        "day",
        "rel",
        F.row_number().over(wk).alias("k"),
        F.row_number().over(wi).alias("ik"),
    )
    g = r.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("k") <= _NDCG_K, gain / (F.log2(F.col("k") + 1)))
        ).alias("dcg"),
        F.sum(
            F.when(F.col("ik") <= _NDCG_K, gain / (F.log2(F.col("ik") + 1)))
        ).alias("idcg"),
    )
    return (
        g.filter(F.col("idcg") > 0)
        .select(
            "day",
            "n_events",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Data-drift monitoring: PSI between corpus snapshots
# ---------------------------------------------------------------------------

_PSI_MOD = 4  # "new snapshot" = doc_id % 4 = 0, same split as the
#               incremental-dedup operator
_PSI_BUCKETS = 10
_PSI_WIDTH = 100  # n_chars bucket width; last bucket absorbs the tail


@register(
    "ml_psi_length_drift",
    f"""
    WITH b AS (
      SELECT LEAST(n_chars // {_PSI_WIDTH}, {_PSI_BUCKETS - 1}) AS bucket,
             CAST(doc_id % {_PSI_MOD} = 0 AS INT) AS is_new
      FROM documents),
    g AS (
      SELECT bucket,
             SUM(1 - is_new) AS c_old,
             SUM(is_new) AS c_new
      FROM b GROUP BY bucket),
    t AS (SELECT SUM(c_old) AS t_old, SUM(c_new) AS t_new FROM g),
    p AS (
      SELECT bucket,
             (c_old + 0.5) / (t_old + 0.5 * {_PSI_BUCKETS}) AS p_old,
             (c_new + 0.5) / (t_new + 0.5 * {_PSI_BUCKETS}) AS p_new
      FROM g CROSS JOIN t)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           ROUND(p_old, 6) AS p_old,
           ROUND(p_new, 6) AS p_new,
           ROUND((p_new - p_old) * ln(p_new / p_old), 6) AS psi_contrib
    FROM p ORDER BY bucket
    """,
)
def ml_psi_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between corpus snapshots (new arrivals =
    doc_id % {_PSI_MOD} = 0, the incremental-dedup split) over document
    length — the standard drift gate an ingestion pipeline runs per crawl
    drop (PSI > 0.25 = investigate). Per-bucket Laplace-smoothed shares and
    contributions; total PSI = SUM(psi_contrib).

    Scale: one corpus scan → {_PSI_BUCKETS}-row grouped counts; the totals
    relation is one broadcast row. Drift math is per-bucket scalar algebra
    on a metadata-sized relation."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        F.least(
            (F.col("n_chars") / _PSI_WIDTH).cast("long"),
            F.lit(_PSI_BUCKETS - 1),
        ).alias("bucket"),
        (F.col("doc_id") % _PSI_MOD == 0).cast("int").alias("is_new"),
    )
    g = b.groupBy("bucket").agg(
        F.sum(1 - F.col("is_new")).alias("c_old"),
        F.sum("is_new").alias("c_new"),
    )
    t = g.agg(
        F.sum("c_old").alias("t_old"), F.sum("c_new").alias("t_new")
    )
    p_old = (F.col("c_old") + 0.5) / (F.col("t_old") + 0.5 * _PSI_BUCKETS)
    p_new = (F.col("c_new") + 0.5) / (F.col("t_new") + 0.5 * _PSI_BUCKETS)
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias(
                "psi_contrib"
            ),
        )
        .orderBy("bucket")
    )
