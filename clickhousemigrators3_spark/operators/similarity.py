"""Similarity search over the ``embeddings`` table (SURVEY.md §7.3,
BASELINE north-star): brute-force cosine top-k as the correctness baseline,
IVF (inverted-file) cluster-probed top-k as the scale path.

Scale design: brute-force is O(Q·N) dot products — fine when the query set
is small and broadcast; the IVF variant prunes to nprobe clusters, which is
how the same plan holds when N is 10^9: the assignment pass is one linear
scan, the probe join touches only the probed clusters' rows. All vector math
is JVM higher-order exprs (functions/vectors.py) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vectors import cosine, cosine_pre, dot, norm, sql_cosine, sql_dot, to_double
from ..registry import register

N_QUERIES = 5  # queries = vec_id < 5
TOP_K = 10


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )


KNN_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {sql_cosine('q.v', 'e.v')} AS c
  FROM q JOIN e ON e.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, rn AS rank, ROUND(c, 6) AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, neighbor_id) AS rn
      FROM s)
WHERE rn <= {TOP_K}
ORDER BY query_id, rank
"""


@register("knn_bruteforce_topk", KNN_ORACLE)
def knn_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, per-query window top-k. The window's
    WindowGroupLimit keeps per-partition state at k rows. Exact — the recall
    baseline the ANN variant is judged against."""
    e = _vectors(spark, sf_dir).withColumn("nv", norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "c", cosine_pre(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("c"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


N_CENTROIDS = 8  # deterministic "trained" centroids: vec_id < 8
N_PROBE = 2
IVF_TOP_K = 5

IVF_ORACLE = f"""
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
cand AS (
  SELECT p.query_id, a.vec_id AS cand_id
  FROM probe p JOIN assign a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.cand_id, {sql_cosine('q.qv', 'e.v')} AS c
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.cand_id)
SELECT query_id, cand_id AS neighbor_id, rn AS rank, ROUND(c, 6) AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, cand_id) AS rn
      FROM scored)
WHERE rn <= {IVF_TOP_K}
ORDER BY query_id, rank
"""


@register("ann_ivf_topk", IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest of
    {N_CENTROIDS} centroids (one linear pass, centroids broadcast), then
    answer each query from its {N_PROBE} best clusters only.

    Centroids here are deterministically "sampled" (vec_id < N) so the
    oracle can reproduce them; a production build would k-means them — the
    query plan is identical. At 10^9 vectors the candidate join reads
    nprobe/nlist of the corpus instead of all of it; writing the corpus
    partitioned by ``cluster`` turns the probe into partition pruning."""
    e = _vectors(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    # assignment pass: nearest centroid per vector
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ac"), F.asc("cent_id")
    )
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
    cand = (
        probe.join(assign, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    scored = (
        cand.join(q, "query_id")
        .join(e, cand.cand_id == e.vec_id)
        .withColumn("c", cosine(F.col("qv"), F.col("v")))
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= IVF_TOP_K)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("c"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH-bucketed top-k (the third ANN strategy: signature
# buckets instead of IVF cluster probes)
# ---------------------------------------------------------------------------

LSH_NBITS = 6  # 2^6 = 64 buckets
LSH_HP_BASE = 20  # hyperplanes = corpus vectors vec_id in [20, 26)
LSH_TOP_K = 5

LSH_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
hp AS (SELECT vec_id - {LSH_HP_BASE} AS hp_id, v AS hv
       FROM e WHERE vec_id >= {LSH_HP_BASE}
         AND vec_id < {LSH_HP_BASE + LSH_NBITS}),
bits AS (
  SELECT e.vec_id,
         CASE WHEN {sql_dot('e.v', 'hp.hv')} > 0
              THEN CAST(1 AS BIGINT) << hp.hp_id ELSE 0 END AS b
  FROM e, hp),
buckets AS (
  SELECT vec_id, CAST(SUM(b) AS BIGINT) AS bucket FROM bits GROUP BY 1),
q AS (SELECT e.vec_id AS query_id, e.v AS qv, b.bucket
      FROM e JOIN buckets b ON b.vec_id = e.vec_id
      WHERE e.vec_id < {N_QUERIES}),
cand AS (
  SELECT q.query_id, b.vec_id AS cand_id, q.qv
  FROM q JOIN buckets b ON b.bucket = q.bucket
  WHERE b.vec_id <> q.query_id),
scored AS (
  SELECT c.query_id, c.cand_id, {sql_cosine('c.qv', 'e.v')} AS c
  FROM cand c JOIN e ON e.vec_id = c.cand_id)
SELECT query_id, cand_id AS neighbor_id, rn AS rank, ROUND(c, 6) AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, cand_id) AS rn
      FROM scored)
WHERE rn <= {LSH_TOP_K}
ORDER BY query_id, rank
"""


@register("ann_lsh_topk", LSH_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k: sign-of-dot-product against NBITS
    hyperplanes packs each vector into a bucket id; queries rescore only
    their own bucket (N/2^NBITS expected candidates).

    The hyperplanes are corpus vectors (zero-mean per FIXTURES stats), kept
    relational so the DuckDB twin reproduces them; in production they'd be
    literal broadcast arrays, making bucket assignment a pure projection
    with zero shuffle. Candidate generation joins on the 8-byte bucket key
    only — vectors rejoin at rescoring, so the bucket shuffle never carries
    embeddings. Scale: assignment is one linear scan; the rescore join
    touches one bucket per query (multi-probe = OR over Hamming-adjacent
    buckets, same plan)."""
    e = _vectors(spark, sf_dir)
    # Optimization round 14 (guide §2.4): the 6 hyperplanes collapse into
    # ONE broadcast row of (bit, hv) structs, so bucket assignment is a
    # pure projection — a commutative long-sum fold over the 6 sign bits —
    # instead of the old explode(×NBITS) + corpus-wide groupBy(vec_id)
    # shuffle. Bit-identical: the old SUM(b) over per-hyperplane rows and
    # this fold add the same longs, and addition of longs is order-free.
    #
    # Optimization round 15 (guide §2.4/§5): the hyperplane MODEL crosses
    # the driver once — NBITS×DIM doubles, the same bounded-model collect
    # the Lloyd trainer uses for its centroids — and re-enters as a one-row
    # LOCAL relation. The previous aggregate-built hp_row was a subtree the
    # plan referenced twice (bucket assignment for the corpus side and for
    # the query side), and Spark plans each reference separately: two extra
    # embeddings scans, two collect_list exchanges, two broadcast stages.
    # A local relation is free to reference anywhere — the executed plan
    # keeps ONE corpus scan plus the pushed-filter query-side scan. The
    # explicit NBITS check is the degenerate-input guard (advice r14): with
    # the hyperplane rows absent, the fold over an empty model row would
    # send every vector to bucket 0 and the bucket join would go quadratic.
    hp_rows = sorted(
        e.filter(
            (F.col("vec_id") >= LSH_HP_BASE)
            & (F.col("vec_id") < LSH_HP_BASE + LSH_NBITS)
        )
        .select((F.col("vec_id") - LSH_HP_BASE).alias("hp_id"), "v")
        .collect(),
        key=lambda r: r["hp_id"],
    )
    if len(hp_rows) != LSH_NBITS:
        raise ValueError(
            f"ann_lsh_topk: expected {LSH_NBITS} hyperplane vectors "
            f"(vec_id in [{LSH_HP_BASE}, {LSH_HP_BASE + LSH_NBITS})), "
            f"found {len(hp_rows)} — refusing the degenerate all-pairs join"
        )
    hp_row = spark.createDataFrame(
        [([(1 << int(r["hp_id"]), [float(x) for x in r["v"]]) for r in hp_rows],)],
        "hps array<struct<bit: long, hv: array<double>>>",
    )
    # coalesce(..., 0) makes the bucket provably non-nullable: the fold
    # itself never returns null (non-null init, when/otherwise arms both
    # non-null), but Catalyst can't see that, and the join-key
    # isnotnull(bucket) it would otherwise infer re-evaluates the WHOLE
    # NBITS×dot fold a second time per row as a BroadcastNestedLoopJoin
    # condition (observed in the r14 executed plan). With a non-nullable
    # key the inferred filter constant-folds away and each row pays the
    # fold exactly once, in its projection.
    bucket = F.coalesce(
        F.aggregate(
            F.col("hps"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(dot(F.col("v"), h["hv"]) > 0, h["bit"]).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
    )
    # norms are precomputed per ROW, not per pair (guide §2.3, the same
    # cosine_pre move the r14 embedding-pairs family took): the rescore
    # touches ~Q·N/2^NBITS pairs (Q = {N_QUERIES} here, far above the
    # 2^NBITS break-even where per-pair norms would win), and the inline
    # cosine's guard + denominator re-derived BOTH norms twice per pair —
    # five array traversals per pair against one dot here. Bit-identical:
    # same guard, same d / (na * nb) order, the norm itself the same
    # sqrt(aggregate(...)) fold.
    eb = (
        e.crossJoin(F.broadcast(hp_row))
        .select("vec_id", "v", norm(F.col("v")).alias("nv"), bucket.alias("bucket"))
    )
    q = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(eb, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), "qv", "nq", "v", "nv")
        .withColumn(
            "c", cosine_pre(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LSH_TOP_K)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("c"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# ANN quality measurement: recall@k of the IVF path vs the exact baseline
# ---------------------------------------------------------------------------

RECALL_K = 5

RECALL_ORACLE = f"""
WITH exact_all AS ({KNN_ORACLE}),
exact AS (SELECT query_id, neighbor_id FROM exact_all WHERE rank <= {RECALL_K}),
approx_all AS ({IVF_ORACLE}),
approx AS (SELECT query_id, neighbor_id FROM approx_all),
hits AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1),
qs AS (SELECT DISTINCT query_id FROM exact)
SELECT q.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE) / {RECALL_K}, 6) AS recall_at_k
FROM qs q LEFT JOIN hits h ON h.query_id = q.query_id
ORDER BY q.query_id
"""


@register("ann_ivf_recall_at_k", RECALL_ORACLE)
def ann_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{RECALL_K} of the IVF path against the exact brute-force
    baseline, per query — the standard ANN quality gate. At 10^9 vectors
    the exact side runs on a sampled query panel only; the measurement plan
    (two top-k pipelines + an intersection count) is unchanged."""
    exact = knn_bruteforce_topk(spark, sf_dir).filter(
        F.col("rank") <= RECALL_K
    ).select("query_id", "neighbor_id")
    approx = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
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
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / RECALL_K, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


TRUNC_DIM = 16  # matryoshka prefix length


MATRYOSHKA_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERIES}),
full_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {sql_cosine('q.v', 'e.v')} DESC,
                                       e.vec_id) AS rn
    FROM q JOIN e ON e.vec_id <> q.vec_id)
  WHERE rn <= {TOP_K}),
trunc_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {sql_cosine(f'list_slice(q.v, 1, {TRUNC_DIM})', f'list_slice(e.v, 1, {TRUNC_DIM})')} DESC,
                      e.vec_id) AS rn
    FROM q JOIN e ON e.vec_id <> q.vec_id)
  WHERE rn <= {TOP_K}),
hits AS (
  SELECT f.query_id, COUNT(*) AS n
  FROM full_rank f JOIN trunc_rank t
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY 1)
SELECT q.vec_id AS query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_common,
       ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE) / {TOP_K}, 6) AS overlap_at_k
FROM q LEFT JOIN hits h ON h.query_id = q.vec_id
ORDER BY query_id
"""


@register("embedding_matryoshka_overlap_at_k", MATRYOSHKA_ORACLE)
def embedding_matryoshka_overlap_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation quality gate: per query, the top-{TOP_K}
    overlap between cosine rankings computed on the FULL embedding and on
    its first {TRUNC_DIM} dimensions — the measurement behind "can we
    serve retrieval on a prefix and re-rank on the tail?" (matryoshka
    representation learning's deployment question; on these random
    fixtures the prefix carries 1/4 of the signal, so overlap is the
    honest baseline a trained MRL model would beat).

    Scale: same plan as the recall gates — two broadcast-query scans over
    the corpus (the truncated one reading {TRUNC_DIM}/{{DIM}} of the
    vector bytes), WindowGroupLimit top-k each, intersection count on
    (query, neighbor) keys."""
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def topk(score_col) -> DataFrame:
        scored = (
            F.broadcast(q)
            .crossJoin(e)
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("c", score_col)
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )

    full = topk(cosine(F.col("qv"), F.col("v")))
    trunc = topk(
        cosine(
            F.slice(F.col("qv"), 1, TRUNC_DIM), F.slice(F.col("v"), 1, TRUNC_DIM)
        )
    )
    hits = (
        full.join(trunc, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / TOP_K, 6
            ).alias("overlap_at_k"),
        )
        .orderBy("query_id")
    )


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    n_centroids: int = 8,
) -> dict:
    """Persist an IVF index: the embedding corpus written PARTITIONED BY its
    nearest-centroid cluster, plus the centroid table. This is the
    materialized form of ``ann_ivf_topk``'s assignment pass — build once,
    then every query's coarse probe becomes parquet PARTITION PRUNING: a
    1000-executor query over 10^9 vectors opens only nprobe/nlist of the
    files, no job-side filtering of unprobed rows ever happens.

    Centroids follow the deterministic vec_id-prefix contract of the query
    twins; swap in k-means centroids (``embeddings_ops._lloyd``) for a
    trained build — the layout and query path are identical."""
    e = _vectors(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ac"), F.asc("cent_id"))
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("ac", cosine(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("cent_id").alias("cluster"))
    )
    assign.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{index_path}/vectors"
    )
    cent.write.mode("overwrite").parquet(f"{index_path}/centroids")
    return {"n_centroids": n_centroids, "path": index_path}


def query_ivf_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k against a persisted IVF index. ``queries`` carries
    (query_id, qv: array<double>); bounded by contract (it broadcasts).

    The probed cluster ids are collected (≤ nprobe × |queries| ints) and
    pushed into the scan as a partition filter — ``.explain`` shows
    ``PartitionFilters: [cluster IN (...)]`` and the unprobed directories
    are never opened. The per-query restriction to ITS OWN probed clusters
    then happens on the pruned remainder, followed by the same
    score + WindowGroupLimit top-k as the in-memory IVF twin."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qc"), F.asc("cent_id"))
    probe = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("qc", cosine(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cluster"))
    )
    probed = [r["cluster"] for r in probe.select("cluster").distinct().collect()]
    vecs = spark.read.parquet(f"{index_path}/vectors").filter(
        F.col("cluster").isin(probed)
    )
    cand = (
        F.broadcast(probe)
        .join(vecs, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.join(F.broadcast(queries), "query_id").withColumn(
        "c", cosine(F.col("qv"), F.col("v"))
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("c"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


HARDNEG_K = 5

HARDNEG_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT vec_id, label, v FROM e WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         e.vec_id AS neighbor_id, e.label AS neighbor_label,
         {sql_cosine('q.v', 'e.v')} AS c
  FROM q JOIN e ON e.vec_id <> q.vec_id AND e.label <> q.label)
SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
       neighbor_id, CAST(neighbor_label AS BIGINT) AS neighbor_label,
       rn AS rank, ROUND(c, 6) AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, neighbor_id) AS rn
      FROM s)
WHERE rn <= {HARDNEG_K}
ORDER BY query_id, rank
"""


@register("embedding_hard_negatives", HARDNEG_ORACLE)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the retrieval-training
    counterpart of knn_bruteforce_topk): for each query vector, the top-k
    most similar vectors whose LABEL DIFFERS — the near-misses a contrastive
    loss learns the most from (Karpukhin et al. 2020, DPR §4.2's "hard
    negatives from the retriever").

    Scale: identical topology to the kNN baseline — bounded query set
    broadcast, corpus scanned once, the label inequality folds into the join
    condition so non-candidates never reach the scorer, per-query
    WindowGroupLimit keeps k rows of state. Swap the scan for the IVF probe
    (ann_ivf_topk) when the corpus outgrows brute force."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = (
        F.broadcast(q)
        .join(
            e,
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("query_label")),
        )
        .withColumn(
            "c", cosine_pre(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARDNEG_K)
        .select(
            "query_id",
            F.col("query_label").cast("long").alias("query_label"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("long").alias("neighbor_label"),
            F.col("rn").cast("long").alias("rank"),
            F.round(F.col("c"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_CAND = 50  # per-ranker candidate depth before fusion
RRF_TOP = 10
_RRF_TERMS = ("hash", "join", "filter")  # textops._BM25_QUERY
_RRF_QVEC = 0  # the vector query: embedding of vec_id 0

HYBRID_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '')) AS dl
  FROM documents WHERE trim(text) <> ''),
stats AS (SELECT COUNT(*) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM d),
w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM w
  WHERE term IN ('hash', 'join', 'filter') GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
bm25 AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / stats.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN stats
  WHERE tf.doc_id <> {_RRF_QVEC}
  GROUP BY 1),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id)
         AS lex_rank
  FROM bm25 QUALIFY lex_rank <= {RRF_CAND}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {_RRF_QVEC}),
vec AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY {sql_cosine('q.qv', 'e.v')} DESC,
                            vec_id) AS vec_rank
  FROM e CROSS JOIN q WHERE vec_id <> {_RRF_QVEC}
  QUALIFY vec_rank <= {RRF_CAND})
SELECT doc_id, ROUND(rrf, 6) AS rrf, rn AS rank, lex_rank, vec_rank FROM (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0)
         + COALESCE(1.0 / ({RRF_K} + vec.vec_rank), 0) AS rrf,
         lex.lex_rank, vec.vec_rank,
         ROW_NUMBER() OVER (
           ORDER BY COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0)
                    + COALESCE(1.0 / ({RRF_K} + vec.vec_rank), 0) DESC,
                    COALESCE(lex.doc_id, vec.doc_id)) AS rn
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
WHERE rn <= {RRF_TOP} ORDER BY rank
"""


@register("hybrid_rrf_topk", HYBRID_ORACLE)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (rrf = Σ 1/(60 + rank),
    Cormack et al.) of a BM25 keyword ranking and an embedding-cosine
    ranking for the same information need — the standard RAG first-stage
    retriever. Each ranker contributes its top-{RRF_CAND}; documents
    missing from one list contribute 0 from it.

    Scale: the lexical side is the BM25 topology (postings filtered to the
    query's terms before the shuffle); the vector side is one corpus scan
    against a broadcast single query vector; fusion is a full outer join of
    two candidate-depth-bounded (≤50-row) relations — driver never sees
    data. RRF scores are sums of exact dyadic-free reciprocals of small
    integers: bit-identical across engines, so only the output is rounded."""
    from .textops import bm25_scores

    bm = bm25_scores(spark, sf_dir, _RRF_TERMS).filter(
        F.col("doc_id") != _RRF_QVEC
    )
    w_lex = Window.orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
    )
    lex = (
        bm.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= RRF_CAND)
        .select("doc_id", "lex_rank")
    )
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("v").alias("qv")
    )
    w_vec = Window.orderBy(F.desc("c"), F.asc("doc_id"))
    vec = (
        e.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
        .withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= RRF_CAND)
        .select("doc_id", "vec_rank")
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
        "lex_rank",
        "vec_rank",
    )
    w_f = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= RRF_TOP)
        .select(
            "doc_id",
            F.round("rrf", 6).alias("rrf"),
            F.col("rank").cast("long").alias("rank"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("vec_rank").cast("long").alias("vec_rank"),
        )
        .orderBy("rank")
    )
