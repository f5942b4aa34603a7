"""The end-to-end training-data-curation pipeline — quality filter → exact
dedup → near-dup drop → per-language corpus stats, composed from this
engine's operators in ONE declarative plan (the shape of a real
pre-training data build, and the reason these operators live in one
engine: Catalyst fuses the whole chain).

Retention rule (deterministic, oracle-reproducible):
  1. quality_score ≥ 2 (textops quality signals);
  2. first doc_id per exact-content group survives;
  3. of each MinHash near-dup pair (a<b), the b side is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .dedup import MINHASH_ORACLE, dedup_minhash_lsh_pairs
from .textops import PUNCT_PATTERN, STOP_PATTERN, WORD_PATTERN, rx_count
from ..functions.text import sql_rx_count

_SQL_WORDS = sql_rx_count("text", WORD_PATTERN)

_QUALITY_SQL = f"""
  (CASE WHEN {_SQL_WORDS} >= 20 THEN 1 ELSE 0 END
   + CASE WHEN {_SQL_WORDS} = 0 THEN 0
          WHEN CAST({sql_rx_count('lower(text)', STOP_PATTERN)} AS DOUBLE)
               / {_SQL_WORDS} BETWEEN 0.05 AND 0.6 THEN 1 ELSE 0 END
   + CASE WHEN length(text) = 0 THEN 0
          WHEN CAST({sql_rx_count('text', PUNCT_PATTERN)} AS DOUBLE)
               / length(text) <= 0.2 THEN 1 ELSE 0 END) >= 2
"""

PIPELINE_ORACLE = f"""
WITH pairs AS ({MINHASH_ORACLE.strip()}),
dropped AS (SELECT DISTINCT b_id AS doc_id FROM pairs),
exact_kept AS (
  SELECT doc_id FROM documents
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
retained AS (
  SELECT d.* FROM documents d
  JOIN exact_kept k ON k.doc_id = d.doc_id
  WHERE {_QUALITY_SQL}
    AND NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = d.doc_id))
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)) AS avg_chars
FROM retained GROUP BY lang ORDER BY lang
"""


@register("corpus_cleaning_pipeline", PIPELINE_ORACLE)
def corpus_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter + exact-dedup + near-dup-drop + per-lang stats as one
    composed plan. At 100 TB: the quality filter is a narrow map (prunes
    early), exact dedup shuffles 16-byte hashes, the near-dup pair set is
    the LSH pipeline's output (small) and anti-joins broadcast."""
    d = load_table(spark, sf_dir, "documents")

    text = F.col("text")
    n_words = rx_count(text, WORD_PATTERN)
    n_punct = rx_count(text, PUNCT_PATTERN)
    n_stop = rx_count(F.lower(text), STOP_PATTERN)
    length = F.length(text)
    stop_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / n_words
    )
    punct_ratio = F.when(length == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / length
    )
    quality = (
        F.when(n_words >= 20, 1).otherwise(0)
        + F.when((n_words != 0) & stop_ratio.between(0.05, 0.6), 1).otherwise(0)
        + F.when((length != 0) & (punct_ratio <= 0.2), 1).otherwise(0)
    )

    w = Window.partitionBy(F.md5(text)).orderBy("doc_id")
    exact_kept = (
        d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).select("doc_id")
    )

    dropped = (
        dedup_minhash_lsh_pairs(spark, sf_dir)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )

    retained = (
        d.filter(quality >= 2)
        .join(exact_kept, "doc_id", "left_semi")
        # dropped-doc-id set scales with the corpus — no broadcast hint;
        # AQE broadcasts it only while it actually fits
        .join(dropped, "doc_id", "left_anti")
    )
    return (
        retained.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang")
    )
