"""In-engine classifier TRAINING — the quality-filter model a curation
pipeline fits over its own corpus (fastText/logreg-class filters in
CCNet/Gopher-style stacks; this engine already ships the SCORING side in
traindata.classifier_quality_score and the EVAL side in operators/mleval).

Logistic regression by full-batch gradient descent, expressed the
Spark-first way: each iteration is ONE aggregation pass over the corpus
producing a 1-row weight relation, which broadcast-cross-joins back into
the next pass — {ITERS} fixed iterations chained into a single DAG (no
driver-side collect between steps, same fusion pattern as
embeddings_ops._lloyd_assign_unrolled). At 100 TB each iteration is a
narrow map + map-side-combined mean; the only data that ever moves is the
4-scalar weight row.

Oracle: the IDENTICAL fixed-depth recurrence unrolled as a DuckDB CTE
chain — full value parity on the trained weights, train accuracy, and
train AUC, not rows-only.

Reference parity: ClickHouse ships stochasticLogisticRegression as a
native aggregate; an analyst migrating a quality-gate training job
expects a drivable equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

ITERS = 3
LR = 1.0

# features: doc length, word count, chars/word — scaled to O(1) so plain
# GD converges without per-feature learning rates; label: is-English
_X_SQL = {
    "x1": "(n_chars / 300.0)",
    "x2": "(nw / 60.0)",
    "x3": "((n_chars / CAST(nw AS DOUBLE)) / 6.0)",
}
_Y_SQL = "CAST(lang = 'en' AS INT)"


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nw = F.size(F.split(F.col("text"), " "))
    return d.select(
        (F.col("n_chars") / 300.0).alias("x1"),
        (nw / 60.0).alias("x2"),
        ((F.col("n_chars") / nw.cast("double")) / 6.0).alias("x3"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )


def _feature_cte(tbl: str = "documents") -> str:
    return (
        f"SELECT {_X_SQL['x1']} AS x1, {_X_SQL['x2']} AS x2, "
        f"{_X_SQL['x3']} AS x3, {_Y_SQL} AS y FROM "
        f"(SELECT n_chars, lang, len(string_split(text, ' ')) AS nw "
        f"FROM {tbl})"
    )


def _z(prefix: str = "") -> str:
    return (
        f"({prefix}b + {prefix}a1 * x1 + {prefix}a2 * x2 + {prefix}a3 * x3)"
    )


def _oracle_weight_ctes() -> str:
    """w0 (zeros) then ITERS mean-gradient updates, each one CTE reading
    the previous weight row — textually the same recurrence the Spark
    side fuses."""
    ctes = ["w0 AS (SELECT 0.0 AS b, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3)"]
    for i in range(1, ITERS + 1):
        p = f"(1.0 / (1.0 + exp(-{_z()})))"
        ctes.append(
            f"w{i} AS (SELECT "
            f"MIN(b) + {LR} * AVG(y - {p}) AS b, "
            f"MIN(a1) + {LR} * AVG((y - {p}) * x1) AS a1, "
            f"MIN(a2) + {LR} * AVG((y - {p}) * x2) AS a2, "
            f"MIN(a3) + {LR} * AVG((y - {p}) * x3) AS a3 "
            f"FROM f CROSS JOIN w{i - 1})"
        )
    return ",\n".join(ctes)


_SPARK_X = {
    "x1": "(n_chars / 300.0D)",
    "x2": "(size(split(text, ' ')) / 60.0D)",
    "x3": "((n_chars / CAST(size(split(text, ' ')) AS DOUBLE)) / 6.0D)",
}


def _spark_weight_ctes(view: str = "_logreg_docs") -> str:
    """Spark-SQL twin of the fused Column-API trainer (opt round 14): the
    same w0 → w{ITERS} recurrence as ONE parsed text — the Column-object
    loop measured ~0.35 s of Py4J round trips per call re-building the
    iteration chain. Double literals are explicit (`0.0D`) so literal
    types match the Column form's Python-float lits; every arithmetic
    expression mirrors train_logreg operation-for-operation, so the
    trained weights are bit-identical (oracle-checked). ``view`` is the
    dataset-scoped documents view the caller registered."""
    z = "(b + a1 * x1 + a2 * x2 + a3 * x3)"
    p = f"(1.0D / (1.0D + exp(-{z})))"
    ctes = [
        "f AS (SELECT "
        + ", ".join(f"{e} AS {k}" for k, e in _SPARK_X.items())
        + f", CAST(lang = 'en' AS INT) AS y FROM {view})",
        "w0 AS (SELECT 0.0D AS b, 0.0D AS a1, 0.0D AS a2, 0.0D AS a3)",
    ]
    for i in range(1, ITERS + 1):
        ctes.append(
            f"w{i} AS (SELECT /*+ BROADCAST(w{i - 1}) */ "
            f"min(b) + {LR}D * avg(y - {p}) AS b, "
            f"min(a1) + {LR}D * avg((y - {p}) * x1) AS a1, "
            f"min(a2) + {LR}D * avg((y - {p}) * x2) AS a2, "
            f"min(a3) + {LR}D * avg((y - {p}) * x3) AS a3 "
            f"FROM f CROSS JOIN w{i - 1})"
        )
    return ",\n".join(ctes)


def train_logreg(f: DataFrame) -> DataFrame:
    """Fused {ITERS}-iteration trainer over a (x1, x2, x3, y) relation:
    returns the 1-row final weight relation. Each step: broadcast the
    1-row weights into the corpus, one map-side-combined AVG per gradient
    component, carry the old weight through MIN (it is constant on every
    row). No collect, no loop state outside the plan."""
    spark = f.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0, 0.0)], "b double, a1 double, a2 double, a3 double")
    for _ in range(ITERS):
        j = f.crossJoin(F.broadcast(w))
        z = (
            F.col("b")
            + F.col("a1") * F.col("x1")
            + F.col("a2") * F.col("x2")
            + F.col("a3") * F.col("x3")
        )
        p = 1.0 / (1.0 + F.exp(-z))
        r = F.col("y") - p
        w = j.agg(
            (F.min("b") + LR * F.avg(r)).alias("b"),
            (F.min("a1") + LR * F.avg(r * F.col("x1"))).alias("a1"),
            (F.min("a2") + LR * F.avg(r * F.col("x2"))).alias("a2"),
            (F.min("a3") + LR * F.avg(r * F.col("x3"))).alias("a3"),
        )
    return w


@register(
    "logreg_train_weights",
    f"""
    WITH f AS ({_feature_cte()}),
    {_oracle_weight_ctes()},
    acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             AVG(CAST((CASE WHEN 1.0 / (1.0 + exp(-{_z()})) >= 0.5
                       THEN 1 ELSE 0 END) = y AS INT)) AS accuracy
      FROM f CROSS JOIN w{ITERS})
    SELECT n_docs,
           ROUND(b, 6) AS w_bias, ROUND(a1, 6) AS w1,
           ROUND(a2, 6) AS w2, ROUND(a3, 6) AS w3,
           ROUND(accuracy, 6) AS accuracy
    FROM w{ITERS} CROSS JOIN acc
    """,
)
def logreg_train_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the is-English quality gate: {ITERS} full-batch GD iterations
    over (length, word-count, chars-per-word) features; returns the final
    weights plus train accuracy at the 0.5 threshold. See module docstring
    for the fused-iteration scale shape. Plan travels as ONE generated
    Spark-SQL text (see _spark_weight_ctes) — same expressions, same
    values, a fraction of the per-call construction cost."""
    from ..catalog import dataset_tag

    view = f"_logreg_docs_{dataset_tag(sf_dir)}"
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    z = "(b + a1 * x1 + a2 * x2 + a3 * x3)"
    p = f"(1.0D / (1.0D + exp(-{z})))"
    return spark.sql(f"""
WITH {_spark_weight_ctes(view)}
SELECT /*+ BROADCAST(w{ITERS}) */
       count(1) AS n_docs,
       round(min(b), 6) AS w_bias,
       round(min(a1), 6) AS w1,
       round(min(a2), 6) AS w2,
       round(min(a3), 6) AS w3,
       round(avg(CAST((CAST(({p} >= 0.5D) AS INT) = y) AS INT)), 6)
         AS accuracy
FROM f CROSS JOIN w{ITERS}
""")


@register(
    "logreg_train_auc",
    f"""
    WITH f AS ({_feature_cte()}),
    {_oracle_weight_ctes()},
    s AS (
      SELECT y, 1.0 / (1.0 + exp(-{_z()})) AS score
      FROM f CROSS JOIN w{ITERS}),
    r AS (
      SELECT y,
             rank() OVER (ORDER BY score) AS mn_rank,
             COUNT(*) OVER (PARTITION BY score) AS ties
      FROM s),
    g AS (
      SELECT CAST(SUM(y) AS DOUBLE) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS n_neg,
             SUM(CASE WHEN y = 1 THEN mn_rank + (ties - 1) / 2.0 END) AS r_pos
      FROM r)
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg), 6)
             AS roc_auc
    FROM g
    """,
)
def logreg_train_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the train→score→evaluate loop in one plan: AUC of the freshly
    trained classifier on its training corpus, via the same tie-corrected
    rank-sum form as operators/mleval.roc_auc_by_group (single global
    ordering — the one-group case; n is the corpus, so the window is one
    exchange, same as any global sort)."""
    from .mleval import roc_auc_by_group

    f = _features(spark, sf_dir)
    w = train_logreg(f)
    j = f.crossJoin(F.broadcast(w))
    z = (
        F.col("b")
        + F.col("a1") * F.col("x1")
        + F.col("a2") * F.col("x2")
        + F.col("a3") * F.col("x3")
    )
    s = j.select(
        F.lit(1).alias("g"),
        (1.0 / (1.0 + F.exp(-z))).alias("score"),
        F.col("y"),
    )
    return roc_auc_by_group(s, group="g").select("n_pos", "n_neg", "roc_auc")


# ---------------------------------------------------------------------------
# Hashed bag-of-words trainer — the fastText-style quality filter, with the
# REAL feature map (hashed unigram counts), same fused-GD scale shape
# ---------------------------------------------------------------------------

NB = 8  # hash buckets — architecture is bucket-count-agnostic; 8 keeps the
#         unrolled DuckDB oracle text and fixture runtimes small
BOW_ITERS = 2
BOW_LR = 0.5

# cross-engine-stable bucket: md5-derived 32-bit int % NB (Spark hash() and
# DuckDB hash() are different algorithms — functions/hashing.py)
_BUCKET_SQL = "((('0x' || substr(md5({t}), 1, 8))::BIGINT) % " + str(NB) + ")"


def _bow_feature_cte() -> str:
    xs = ", ".join(
        f"len(list_filter(toks, t -> {_BUCKET_SQL.format(t='t')} = {b}))"
        f" / 10.0 AS x{b}"
        for b in range(NB)
    )
    return (
        f"SELECT CAST(lang = 'en' AS INT) AS y, {xs} FROM "
        "(SELECT lang, list_filter(regexp_split_to_array(trim(lower(text)),"
        " '\\s+'), t -> t <> '') AS toks FROM documents)"
    )


def _bow_z(prefix: str = "") -> str:
    terms = " + ".join(f"{prefix}a{b} * x{b}" for b in range(NB))
    return f"({prefix}b + {terms})"


def _bow_weight_ctes() -> str:
    zero = ", ".join(["0.0 AS b"] + [f"0.0 AS a{b}" for b in range(NB)])
    ctes = [f"w0 AS (SELECT {zero})"]
    for i in range(1, BOW_ITERS + 1):
        p = f"(1.0 / (1.0 + exp(-{_bow_z()})))"
        cols = [f"MIN(b) + {BOW_LR} * AVG(y - {p}) AS b"] + [
            f"MIN(a{b}) + {BOW_LR} * AVG((y - {p}) * x{b}) AS a{b}"
            for b in range(NB)
        ]
        ctes.append(
            f"w{i} AS (SELECT {', '.join(cols)} FROM f CROSS JOIN w{i - 1})"
        )
    return ",\n".join(ctes)


def _bow_feature_frame(d: DataFrame, carry_doc_id: bool = False) -> DataFrame:
    """(y, x0..x{NB-1}) hashed-BoW features, optionally carrying doc_id.

    Optimization round 14 (guide §1 hot-path rule): the md5 bucket of each
    token is computed ONCE into a bound `_bk` array column, and each
    bucket count filters that array of small longs. The old form passed
    the token-array EXPRESSION into {NB} separate filter lambdas —
    Catalyst does not CSE across HOF lambdas, so the split ran {NB}× and
    the md5 {NB}× per token per row. Counts (and therefore features,
    weights, and scores) are unchanged.

    NOTE: the filter lambdas must stay single-parameter — a second
    parameter makes F.filter pass the array INDEX there, silently."""
    from ..functions.hashing import stable_hash32

    carry = ["doc_id"] if carry_doc_id else []
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    staged = d.select(*carry, "lang", toks.alias("_toks")).select(
        *carry,
        "lang",
        F.transform(F.col("_toks"), lambda t: stable_hash32(t) % NB).alias(
            "_bk"
        ),
    )
    cols = [*[F.col(c) for c in carry], (F.col("lang") == "en").cast("int").alias("y")]
    for b in range(NB):
        cols.append(
            (F.size(F.filter(F.col("_bk"), lambda v: v == b)) / 10.0).alias(
                f"x{b}"
            )
        )
    return staged.select(*cols)


def _bow_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bow_feature_frame(load_table(spark, sf_dir, "documents"))


def train_logreg_bow(f: DataFrame) -> DataFrame:
    """Fused {BOW_ITERS}-iteration hashed-BoW trainer over a
    (y, x0..x{NB-1}) relation — identical topology to train_logreg, NB+1
    weight scalars instead of 4: each iteration is one map-side-combined
    AVG pass, only the 1-row weight relation moves."""
    spark = f.sparkSession
    schema = ", ".join(["b double"] + [f"a{b} double" for b in range(NB)])
    w = spark.createDataFrame([tuple([0.0] * (NB + 1))], schema)
    for _ in range(BOW_ITERS):
        j = f.crossJoin(F.broadcast(w))
        z = F.col("b")
        for b in range(NB):
            z = z + F.col(f"a{b}") * F.col(f"x{b}")
        r = F.col("y") - 1.0 / (1.0 + F.exp(-z))
        aggs = [(F.min("b") + BOW_LR * F.avg(r)).alias("b")]
        for b in range(NB):
            aggs.append(
                (F.min(f"a{b}") + BOW_LR * F.avg(r * F.col(f"x{b}"))).alias(
                    f"a{b}"
                )
            )
        w = j.agg(*aggs)
    return w


@register(
    "logreg_train_bow",
    f"""
    WITH f AS ({_bow_feature_cte()}),
    {_bow_weight_ctes()},
    acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             AVG(CAST((CASE WHEN 1.0 / (1.0 + exp(-{_bow_z()})) >= 0.5
                       THEN 1 ELSE 0 END) = y AS INT)) AS accuracy
      FROM f CROSS JOIN w{BOW_ITERS})
    SELECT n_docs, ROUND(b, 6) AS w_bias,
           {', '.join(f'ROUND(a{b}, 6) AS w{b}' for b in range(NB))},
           ROUND(accuracy, 6) AS accuracy
    FROM w{BOW_ITERS} CROSS JOIN acc
    """,
)
def logreg_train_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the is-English gate on REAL text features: hashed unigram
    counts ({NB} md5-stable buckets — the fastText/CCNet quality-filter
    architecture at toy width), {BOW_ITERS} fused full-batch GD iterations.
    Returns final weights + train accuracy; the oracle is the identical
    unrolled recurrence with the identical md5 bucket hash.

    Scale: the feature map is a narrow per-doc fold over its own tokens
    (corpus-size-independent per-row cost); each GD pass moves only the
    (NB+1)-scalar weight row. Widening NB to fastText's 2^20 changes the
    weight relation to a broadcast array, not the topology."""
    f = _bow_features(spark, sf_dir)
    w = train_logreg_bow(f)
    j = f.crossJoin(F.broadcast(w))
    z = F.col("b")
    for b in range(NB):
        z = z + F.col(f"a{b}") * F.col(f"x{b}")
    pred = (1.0 / (1.0 + F.exp(-z)) >= 0.5).cast("int")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.min("b"), 6).alias("w_bias"),
    ]
    for b in range(NB):
        aggs.append(F.round(F.min(f"a{b}"), 6).alias(f"w{b}"))
    aggs.append(
        F.round(F.avg((pred == F.col("y")).cast("int")), 6).alias("accuracy")
    )
    return j.agg(*aggs)


@register(
    "bow_quality_retained",
    f"""
    WITH raw AS (
      SELECT doc_id, lang, list_filter(regexp_split_to_array(
               trim(lower(text)), '\\s+'), t -> t <> '') AS toks
      FROM documents),
    f AS (
      SELECT doc_id, CAST(lang = 'en' AS INT) AS y,
             {', '.join(
                 f"len(list_filter(toks, t -> {_BUCKET_SQL.format(t='t')}"
                 f" = {b})) / 10.0 AS x{b}"
                 for b in range(NB)
             )}
      FROM raw),
    {_bow_weight_ctes()}
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-{_bow_z()})), 6) AS score
    FROM f CROSS JOIN w{BOW_ITERS}
    WHERE 1.0 / (1.0 + exp(-{_bow_z()})) >= 0.5
    ORDER BY doc_id
    """,
)
def bow_quality_retained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full in-engine curation loop in ONE plan: train the hashed-BoW
    gate (fused GD), broadcast the learned weights, score every document,
    and emit the retained set (score ≥ 0.5) — no model file, no driver
    round trip between train and apply.

    Scale: training per train_logreg_bow; scoring is a narrow map with the
    (NB+1)-scalar weight row broadcast — the retained relation streams
    straight into whatever writes the curated corpus."""
    f = _bow_feature_frame(
        load_table(spark, sf_dir, "documents"), carry_doc_id=True
    )
    w = train_logreg_bow(f.drop("doc_id"))
    j = f.crossJoin(F.broadcast(w))
    z = F.col("b")
    for b in range(NB):
        z = z + F.col(f"a{b}") * F.col(f"x{b}")
    p = 1.0 / (1.0 + F.exp(-z))
    return (
        j.filter(p >= 0.5)
        .select("doc_id", F.round(p, 6).alias("score"))
        .orderBy("doc_id")
    )
