"""Grouped Pandas operators — ``applyInPandas`` for semantics the built-in
operators genuinely can't express per-group (SURVEY §7.3 "custom
operators", option b).

Kept deliberately rare: everything else in this engine is JVM expressions.
These two show the full plumbing — grouped Arrow batches in, typed schema
out — with deterministic math so one of them still oracles against DuckDB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "grouped_zscore_per_lang",
    """
    SELECT doc_id,
           ROUND((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z
    FROM documents ORDER BY doc_id
    """,
)
def grouped_zscore_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via ``applyInPandas`` — the
    grouped-UDF shape of per-group normalization (feature scaling, outlier
    trimming). Each language group arrives as one pandas DataFrame; output
    rounded to 6dp because pandas and DuckDB compute variance by different
    algorithms (ulp-level drift).

    Scale note: group = shuffle partition, so the biggest group must fit an
    executor's Arrow buffer — per-lang groups are fine; for heavier keys use
    the two-pass built-in form instead (window mean/std, pure JVM)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["n_chars"].mean()
        std = pdf["n_chars"].std(ddof=1)
        z = ((pdf["n_chars"] - mean) / std).round(6)
        return pd.DataFrame({"doc_id": pdf["doc_id"], "z": z})

    return (
        d.groupBy("lang")
        .applyInPandas(zscore, schema="doc_id long, z double")
        .orderBy("doc_id")
    )


@register(
    "grouped_linear_trend_per_user",
    """
    SELECT user_id,
           ROUND(COALESCE(regr_slope(value, epoch(ts)) * 86400, 0), 6)
               AS slope_per_day,
           COUNT(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def grouped_linear_trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event values over time (least-squares slope
    via the centered normal equations inside applyInPandas) — the 'small
    model per group' pattern (forecasting, drift detection). Slope reported
    per *day* and rounded to 6dp so the DuckDB ``regr_slope`` oracle matches
    despite different fp summation orders (same discipline as
    grouped_zscore_per_lang)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            slope = 0.0
        else:
            x = pdf["ts"].astype("int64") / 1e9
            x = x - x.mean()
            y = pdf["value"]
            denom = (x * x).sum()
            slope = float((x * y).sum() / denom) if denom else 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[:1],
                "slope_per_day": [round(slope * 86400.0, 6)],
                "n": [len(pdf)],
            }
        )

    return (
        e.groupBy("user_id")
        .applyInPandas(trend, schema="user_id long, slope_per_day double, n long")
        .orderBy("user_id")
    )
