"""Corpus-curation operators (BASELINE north-star / SURVEY.md §7.3 family):
sliding-window document chunking, int8 embedding quantization, and
domain-mixture reweighting — the steps between a deduped corpus and a
tokenizer/trainer-ready dataset.

Reference parity: none (the reference is a migration tool, SURVEY.md §0);
these extend the training-data-pipeline surface alongside
operators/traindata.py.

Scale notes per operator are on the docstrings; the common shape is narrow
map + bounded explode — no shuffle grows faster than the output itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import to_double
from ..registry import register

CHUNK_SIZE = 64  # words per chunk
CHUNK_STRIDE = 48  # overlap = CHUNK_SIZE - CHUNK_STRIDE = 16 words


@register(
    "doc_chunk_overlap",
    f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
      FROM documents WHERE trim(text) <> ''),
    s AS (
      SELECT doc_id, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) AS start
      FROM w)
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(len(list_slice(ws, start + 1, start + {CHUNK_SIZE})) AS INT)
               AS n_chunk_words,
           md5(array_to_string(list_slice(ws, start + 1, start + {CHUNK_SIZE}), ' '))
               AS chunk_md5
    FROM s ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: each document splits into {CHUNK_SIZE}-word
    chunks at stride {CHUNK_STRIDE} (16-word overlap) — the standard
    context-window packing shape for embedding/RAG pipelines. Chunk text is
    surfaced as md5 so the comparator stays scalar; real pipelines keep the
    string column.

    Scale: split + sequence-explode + slice, all JVM built-ins; the explode
    fan-out is output-proportional (~n_words/stride rows per doc) and never
    shuffles — chunks stay on the partition that read the document."""
    d = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    w = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ws"))
    s = w.select(
        "doc_id",
        "ws",
        F.explode(
            F.sequence(F.lit(0), F.size("ws") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.expr(f"slice(ws, start + 1, {CHUNK_SIZE})")
    return s.select(
        "doc_id",
        F.expr(f"CAST(start div {CHUNK_STRIDE} AS INT)").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "embedding_quantize_int8",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS ma
          FROM e),
    q AS (SELECT vec_id, ma,
                 CASE WHEN ma = 0
                      THEN list_transform(v, x -> CAST(0 AS BIGINT))
                      ELSE list_transform(
                             v, x -> CAST(floor(x * 127 / ma + 0.5) AS BIGINT))
                 END AS qv
          FROM m)
    SELECT vec_id,
           ROUND(ma / 127, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
    FROM q ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = max|v|/127, q =
    round-half-up(v/scale)) — the 4× storage/bandwidth cut applied before
    ANN indexing at scale. Quantized codes are surfaced as sum/min/max
    invariants so the comparator stays scalar; rounding is spelled
    ``floor(x*127/ma + 0.5)`` so both engines make the identical
    half-up choice on the identical double.

    Scale: pure narrow map over the vector column — no shuffle at all; the
    higher-order exprs run in the JVM, never Python."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    m = e.withColumn("ma", F.array_max(F.transform("v", lambda x: F.abs(x))))
    q = m.withColumn(
        "qv",
        F.expr(
            "CASE WHEN ma = 0 THEN transform(v, x -> 0L) "
            "ELSE transform(v, x -> CAST(floor(x * 127 / ma + 0.5) AS BIGINT)) END"
        ),
    )
    return q.select(
        "vec_id",
        F.round(F.col("ma") / 127, 6).alias("scale"),
        F.expr("aggregate(qv, 0L, (a, x) -> a + x)").alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    ).orderBy("vec_id")


MIXTURE_ORACLE = """
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1, 2),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT c.lang, c.source, c.n_docs,
           ROUND(CAST(c.n_docs AS DOUBLE) / t.tot, 6) AS actual_frac,
           ROUND((1.0 / t.k) / (CAST(c.n_docs AS DOUBLE) / t.tot), 6) AS weight
    FROM c, t ORDER BY lang, source
"""


@register("mixture_domain_weights", MIXTURE_ORACLE)
def mixture_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-(lang, source) corpus share and the
    resampling weight that would equalize the mixture (target = uniform
    across observed domains; swap the target vector for DoReMi-style learned
    weights). The weight column is what a sampler multiplies into each
    document's keep-probability.

    Scale: one grouped count (shuffle keys = domain pairs, cardinality
    ~dozens) + a broadcast of the 1-row totals — nothing global moves."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").alias("tot"), F.count(F.lit(1)).alias("k")
    )
    actual = F.col("n_docs").cast("double") / F.col("tot")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "n_docs",
            F.round(actual, 6).alias("actual_frac"),
            F.round((F.lit(1.0) / F.col("k")) / actual, 6).alias("weight"),
        )
        .orderBy("lang", "source")
    )


@register(
    "scd2_customer_price_history",
    """
    WITH changes AS (
      SELECT o_custkey AS customer_id,
             o_orderdate AS valid_from,
             max_by(o_totalprice, o_orderkey) AS price,
             CAST(COUNT(*) AS BIGINT) AS n_changes_that_day
      FROM orders GROUP BY 1, 2)
    SELECT customer_id, valid_from,
           LEAD(valid_from) OVER (PARTITION BY customer_id
                                  ORDER BY valid_from) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY customer_id
                                  ORDER BY valid_from) IS NULL AS is_current,
           price, n_changes_that_day
    FROM changes ORDER BY customer_id, valid_from
    """,
)
def scd2_customer_price_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval construction — the standard warehouse shape for
    dimension history: collapse each key's change events to one row per
    change date (latest writer wins via ``max_by`` on the highest order
    key), then derive [valid_from, valid_to) intervals with LEAD; the open
    interval is the current row.

    Scale: one shuffle on the dimension key for the groupBy, and the window
    reuses that partitioning (no second exchange); state per key = its
    change count, never the fact table. Applying such intervals to facts is
    the range join in operators/events.py."""
    o = load_table(spark, sf_dir, "orders")
    changes = o.groupBy(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("valid_from"),
    ).agg(
        F.expr("max_by(o_totalprice, o_orderkey)").alias("price"),
        F.count(F.lit(1)).alias("n_changes_that_day"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("customer_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    return changes.select(
        "customer_id",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "price",
        "n_changes_that_day",
    ).orderBy("customer_id", "valid_from")


SAMPLE_BASE_RATE = 0.2  # target corpus-wide keep rate before reweighting

RESAMPLE_ORACLE = f"""
WITH mix AS ({MIXTURE_ORACLE}),
kept AS (
  SELECT d.doc_id, d.lang, d.source
  FROM documents d
  JOIN mix m ON m.lang = d.lang AND m.source = d.source
  WHERE (('0x' || substr(md5('mx' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT)
          / 4294967296.0
        < LEAST(1.0, {SAMPLE_BASE_RATE} * m.weight))
SELECT doc_id, lang, source FROM kept ORDER BY doc_id
"""


@register("mixture_resampled_docs", RESAMPLE_ORACLE)
def mixture_resampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the mixture: keep each document with probability
    base_rate × its domain weight (capped at 1), decided by a deterministic
    per-document hash fraction — so over-represented domains are downsampled
    toward the uniform target and the selection is reproducible run-to-run
    (the property random() sampling loses on retries/replays).

    Scale: weights table is domain-cardinality rows → broadcast; the keep
    decision is a narrow map over the scan. This is the executable
    counterpart of ``mixture_domain_weights``."""
    from ..functions.hashing import stable_hash32

    d = load_table(spark, sf_dir, "documents")
    w = mixture_domain_weights(spark, sf_dir).select("lang", "source", "weight")
    frac = stable_hash32(
        F.concat(F.lit("mx"), F.col("doc_id").cast("string"))
    ).cast("double") / F.lit(4294967296.0)
    keep_p = F.least(F.lit(1.0), F.lit(SAMPLE_BASE_RATE) * F.col("weight"))
    return (
        d.join(F.broadcast(w), ["lang", "source"])
        .filter(frac < keep_p)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH changes AS (
      SELECT o_custkey AS customer_id,
             o_orderdate AS valid_from,
             max_by(o_totalprice, o_orderkey) AS price
      FROM orders GROUP BY 1, 2),
    hist AS (
      SELECT customer_id, valid_from,
             LEAD(valid_from) OVER (PARTITION BY customer_id
                                    ORDER BY valid_from) AS valid_to,
             price
      FROM changes)
    SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
           h.customer_id,
           CAST(h.price AS DOUBLE) AS pit_price
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN hist h ON h.customer_id = o.o_custkey
      AND l.l_shipdate >= h.valid_from
      AND (h.valid_to IS NULL OR l.l_shipdate < h.valid_to)
    ORDER BY l.l_orderkey, l_linenumber
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) lookup against the SCD2 history — the
    warehouse staple scd2_customer_price_history's intervals exist FOR:
    each shipment joins the price state its customer had AT SHIP TIME
    (ship dates before the first change drop out — no state existed yet).

    Scale: equality join on customer_id carries the interval bounds along;
    the non-overlapping [valid_from, valid_to) intervals guarantee ≤1
    surviving match per fact row, so the pre-filter fan-out is bounded by
    intervals-per-customer (changes, not facts). When per-key interval
    counts are heavy, the union-sort as-of form (operators/asof.py) is the
    same semantics with no fan-out at all."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    changes = o.groupBy(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("valid_from"),
    ).agg(F.expr("max_by(o_totalprice, o_orderkey)").alias("price"))
    w = Window.partitionBy("customer_id").orderBy("valid_from")
    hist = changes.select(
        "customer_id",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        "price",
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    okeys = o.select("o_orderkey", "o_custkey")
    return (
        li.join(okeys, li.l_orderkey == F.col("o_orderkey"))
        .join(
            hist,
            (F.col("o_custkey") == hist.customer_id)
            & (F.col("l_shipdate") >= hist.valid_from)
            & (hist.valid_to.isNull() | (F.col("l_shipdate") < hist.valid_to)),
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "customer_id",
            F.col("price").cast("double").alias("pit_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


SOURCE_CAP = 10  # max docs retained per source (domain capping)


@register(
    "curation_source_cap",
    f"""
    WITH ranked AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents)
    SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {SOURCE_CAP}
    ORDER BY source, rank
    """,
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping (the CommonCrawl-pipeline staple: cap how many
    documents any one domain/source may contribute, so a single boilerplate
    mill can't dominate the mixture): keep the top {SOURCE_CAP} docs per
    source by quality (n_chars, doc_id tie-break).

    Scale: one window partitioned BY SOURCE — the same key any downstream
    per-domain stage shuffles on — and Spark's WindowGroupLimit pushes the
    rank<=cap limit into the sort, so per-partition state is cap rows, not
    the domain's full posting. A skewed mega-domain is exactly the case the
    rank-pushdown handles (heap of {SOURCE_CAP}, one pass)."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= SOURCE_CAP)
        .orderBy("source", "rank")
    )
