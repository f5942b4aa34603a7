"""Product quantization (PQ) over the ``embeddings`` table — the memory-side
half of large-scale ANN (SURVEY §7.3 / BASELINE north-star "similarity
search: … an IVF or LSH-bucketed variant as the scale path").

Why PQ at 100 TB: a 64-dim float vector is 256 bytes; its PQ code is
M_SUB = 4 bytes. The corpus the ANN scan touches shrinks 64×, so the
"scan the probed cells" step of an IVF index reads codes, not vectors —
that is how billion-vector indexes (FAISS IVFADC, SCANN) fit a cluster's
memory. This module implements the full pipeline with deterministic
codebooks (sub-vectors of the first K_SUB corpus vectors — same convention
as ann_ivf_topk's sampled centroids; k-means-trained codebooks would slot
in via _lloyd exactly like ann_ivf_kmeans_topk):

* encode: per subspace, argmin-L2 codeword — a pure-JVM higher-order
  expression per row (no fan-out, no shuffle; the codebook is a literal).
* ADC (asymmetric distance computation): per query, an M_SUB×K_SUB
  distance table; approx distance of a candidate = sum of table lookups by
  its code — again a per-row expression against a broadcast query set.
* quality gate: recall@k against the exact brute-force baseline.

Everything is value-checked against a relational DuckDB unrolling of the
same math (sequential left-to-right double sums on both sides, the repo's
standard determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vectors import l2sq, sql_l2sq, to_double
from ..registry import register
from .similarity import N_QUERIES

M_SUB = 4  # subspaces
SUBDIM = 16  # dims per subspace (DIM = 64)
K_SUB = 16  # codewords per subspace: sub-vectors of vec_id < K_SUB
PQ_TOP_K = 10


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )


def _codebook(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """codebook[s][c] = codeword c of subspace s (a SUBDIM list). Bounded
    M_SUB×K_SUB×SUBDIM floats — the only training state, driver-held and
    shipped as literals (the PQ analogue of broadcasting k-means
    centroids)."""
    rows = (
        _vectors(spark, sf_dir)
        .filter(F.col("vec_id") < K_SUB)
        .orderBy("vec_id")
        .collect()
    )
    return [
        [list(r["v"][s * SUBDIM : (s + 1) * SUBDIM]) for r in rows]
        for s in range(M_SUB)
    ]


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def _sub_dists(vec, cb_s: list[list[float]]):
    """Array of squared L2 distances from a SUBDIM slice to every codeword
    of one subspace, in codeword order."""
    return F.array(*[l2sq(vec, _lit_vec(cw)) for cw in cb_s])


def _encode(df: DataFrame, cb: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes) — codes[s] is the 1-based argmin codeword index of
    subspace s (first minimum wins, matching the oracle's (dist, c)
    tie-break). Per-row JVM expressions only: at 10^9 vectors this is a
    single narrow map writing 4-byte codes."""
    codes = []
    for s in range(M_SUB):
        sub = F.slice(F.col("v"), s * SUBDIM + 1, SUBDIM)
        d = _sub_dists(sub, cb[s])
        codes.append(F.array_position(d, F.array_min(d)).cast("int"))
    return df.select("vec_id", F.array(*codes).alias("codes"))


PQ_SUBS = ", ".join(str(s) for s in range(M_SUB))

PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sub AS (SELECT unnest([{PQ_SUBS}]) AS s),
cw AS (
  SELECT e.vec_id AS c, sub.s,
         list_slice(e.v, sub.s * {SUBDIM} + 1, sub.s * {SUBDIM} + {SUBDIM}) AS w
  FROM e, sub WHERE e.vec_id < {K_SUB}),
enc AS (
  SELECT vec_id, s, c + 1 AS code FROM (
    SELECT e.vec_id, cw.s, cw.c,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, cw.s
             ORDER BY {sql_l2sq(f"list_slice(e.v, cw.s * {SUBDIM} + 1, cw.s * {SUBDIM} + {SUBDIM})", "cw.w")}, cw.c
           ) AS rn
    FROM e, cw)
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
dt AS (
  SELECT q.query_id, cw.s, cw.c,
         {sql_l2sq(f"list_slice(q.qv, cw.s * {SUBDIM} + 1, cw.s * {SUBDIM} + {SUBDIM})", "cw.w")} AS d
  FROM q, cw),
adc AS (
  SELECT dt.query_id, enc.vec_id,
         list_sum(list(dt.d ORDER BY dt.s)) AS adist
  FROM enc JOIN dt ON dt.s = enc.s AND dt.c + 1 = enc.code
  GROUP BY 1, 2)
SELECT query_id, vec_id AS neighbor_id, rn AS rank, ROUND(adist, 6) AS approx_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adist, vec_id) AS rn
      FROM adc WHERE vec_id <> query_id)
WHERE rn <= {PQ_TOP_K}
ORDER BY query_id, rank
"""


@register("ann_pq_adc_topk", PQ_ORACLE)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k: encode the corpus to M_SUB-byte codes, build each
    query's subspace distance table, score candidates by table lookups, and
    take the per-query k smallest approximate distances.

    Scale shape: encode is a narrow map (64× smaller output than the
    vectors); the query set with its distance tables is bounded and
    broadcast; the scan is one pass over CODES with a per-row constant-time
    expression; per-query top-k is a WindowGroupLimit. Composed with IVF
    probing (ann_ivf_topk) this is the FAISS IVFADC layout — probe prunes
    the rows, PQ shrinks the bytes."""
    e = _vectors(spark, sf_dir)
    cb = _codebook(spark, sf_dir)
    enc = _encode(e, cb)

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # dt[s] = the query's distance table of subspace s (codeword order)
    dts = F.array(
        *[
            _sub_dists(F.slice(F.col("qv"), s * SUBDIM + 1, SUBDIM), cb[s])
            for s in range(M_SUB)
        ]
    )
    qdt = q.select("query_id", dts.alias("dt"))

    # adist = sum_s dt[s][codes[s]] — sequential s-order sum, matching the
    # oracle's list_sum(list(d ORDER BY s))
    adist = F.aggregate(
        F.sequence(F.lit(1), F.lit(M_SUB)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.element_at(F.col("dt"), s), F.element_at(F.col("codes"), s)),
    )
    scored = (
        enc.crossJoin(F.broadcast(qdt))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("adist", adist)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("adist"), 6).alias("approx_dist"),
        )
        .orderBy("query_id", "rank")
    )


PQ_RECALL_K = 10

PQ_RECALL_ORACLE = f"""
WITH exact_all AS (
  SELECT query_id, neighbor_id, rank FROM (
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERIES}),
    s AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {sql_l2sq('q.v', 'e.v')} AS d
      FROM q JOIN e ON e.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id)
               AS rank
    FROM s)
  WHERE rank <= {PQ_RECALL_K}),
approx_all AS ({PQ_ORACLE.replace(";", "")}),
hits AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact_all e JOIN approx_all a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1),
qs AS (SELECT DISTINCT query_id FROM exact_all)
SELECT q.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE) / {PQ_RECALL_K}, 6)
           AS recall_at_k
FROM qs q LEFT JOIN hits h ON h.query_id = q.query_id
ORDER BY q.query_id
"""


@register("ann_pq_recall_at_k", PQ_RECALL_ORACLE)
def ann_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{PQ_RECALL_K} of the PQ/ADC ranking against exact L2 top-k —
    the quality gate that makes the 64× compression measurable (same
    discipline as ann_ivf_recall_at_k; the exact side is the baseline that
    would run on a sampled query panel at corpus scale).

    The exact baseline here ranks by L2 (what PQ approximates), not cosine
    — comparing against knn_bruteforce_topk's cosine ranking would conflate
    metric mismatch with quantization loss."""
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact_scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d", l2sq(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = (
        exact_scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_RECALL_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    approx = ann_pq_adc_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    qs = exact.select("query_id").distinct()
    return (
        qs.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / PQ_RECALL_K, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# IVFADC: IVF coarse probe pruning the rows × PQ codes shrinking the bytes —
# the FAISS IVFADC / ScaNN layout both halves above exist for.
# ---------------------------------------------------------------------------

def _ivfadc_oracle() -> str:
    from ..functions.vectors import sql_cosine
    from .similarity import IVF_TOP_K, N_CENTROIDS, N_PROBE

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
assign AS (
  SELECT vec_id, cent_id AS cluster FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.v', 'c.cv')} DESC, c.cent_id) AS rn
    FROM e, cent c)
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT query_id, cent_id AS cluster FROM (
    SELECT q.query_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.qv', 'c.cv')} DESC, c.cent_id) AS rn
    FROM q, cent c)
  WHERE rn <= {N_PROBE}),
sub AS (SELECT unnest([{PQ_SUBS}]) AS s),
cw AS (
  SELECT e.vec_id AS c, sub.s,
         list_slice(e.v, sub.s * {SUBDIM} + 1, sub.s * {SUBDIM} + {SUBDIM}) AS w
  FROM e, sub WHERE e.vec_id < {K_SUB}),
enc AS (
  SELECT vec_id, s, c + 1 AS code FROM (
    SELECT e.vec_id, cw.s, cw.c,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, cw.s
             ORDER BY {sql_l2sq(f"list_slice(e.v, cw.s * {SUBDIM} + 1, cw.s * {SUBDIM} + {SUBDIM})", "cw.w")}, cw.c
           ) AS rn
    FROM e, cw)
  WHERE rn = 1),
dt AS (
  SELECT q.query_id, cw.s, cw.c,
         {sql_l2sq(f"list_slice(q.qv, cw.s * {SUBDIM} + 1, cw.s * {SUBDIM} + {SUBDIM})", "cw.w")} AS d
  FROM q, cw),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probe p JOIN assign a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.query_id),
adc AS (
  SELECT dt.query_id, c.vec_id,
         list_sum(list(dt.d ORDER BY dt.s)) AS adist
  FROM cand c
  JOIN enc ON enc.vec_id = c.vec_id
  JOIN dt ON dt.query_id = c.query_id AND dt.s = enc.s AND dt.c + 1 = enc.code
  GROUP BY 1, 2)
SELECT query_id, vec_id AS neighbor_id, rn AS rank, ROUND(adist, 6) AS approx_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adist, vec_id) AS rn
      FROM adc)
WHERE rn <= {IVF_TOP_K}
ORDER BY query_id, rank
"""


@register("ann_ivfadc_topk", _ivfadc_oracle())
def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the composition both halves exist for: the IVF coarse
    probe restricts candidates to nprobe/nlist of the corpus (row pruning),
    and scoring reads PQ codes instead of vectors (byte shrinking, 64×) via
    per-query distance-table lookups. This is the FAISS IVFADC layout on
    relational operators: at 10^9 vectors the scan cost is
    (nprobe/nlist) × (code_bytes/vector_bytes) of brute force.

    Residual refinement (encoding v − coarse_centroid instead of v, which
    sharpens the codebooks around each cell) is the one piece deliberately
    simplified — same plan, different training input."""
    from ..functions.vectors import cosine
    from .similarity import IVF_TOP_K, N_CENTROIDS, N_PROBE

    e = _vectors(spark, sf_dir)
    cb = _codebook(spark, sf_dir)
    enc = _encode(e, cb)

    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ac"), F.asc("cent_id"))
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("ac", cosine(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qc"), F.asc("cent_id"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("qc", cosine(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", F.col("cent_id").alias("cluster"))
    )
    dts = F.array(
        *[
            _sub_dists(F.slice(F.col("qv"), s * SUBDIM + 1, SUBDIM), cb[s])
            for s in range(M_SUB)
        ]
    )
    qdt = q.select("query_id", dts.alias("dt"))
    cand = (
        probe.join(assign, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    adist = F.aggregate(
        F.sequence(F.lit(1), F.lit(M_SUB)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.element_at(F.col("dt"), s), F.element_at(F.col("codes"), s)),
    )
    scored = (
        cand.join(enc, "vec_id")
        .join(F.broadcast(qdt), "query_id")
        .withColumn("adist", adist)
    )
    w_top = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= IVF_TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("adist"), 6).alias("approx_dist"),
        )
        .orderBy("query_id", "rank")
    )
