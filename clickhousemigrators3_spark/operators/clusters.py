"""Duplicate-cluster formation: connected components over the near-dup pair
graph (the step after pair detection in every production dedup pipeline —
keep one doc per *cluster*, not per pair).

Spark side: iterative min-label propagation driven from the driver — each
iteration is one join + grouped min; convergence is checked on a changed-row
count (metadata only). Iterations are bounded by the graph diameter; dup
clusters are shallow (usually ≤ 3 hops), and the loop exits as soon as a
pass changes nothing. This is the standard large-graph CC pattern when a
graph library isn't warranted.

Oracle: DuckDB recursive CTE computing reachability closure over the same
edges, then min over the reachable set — exact same clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import MINHASH_ORACLE, dedup_minhash_lsh_pairs

_PAIRS_CTE = MINHASH_ORACLE.strip().rstrip()

CLUSTERS_ORACLE = f"""
WITH pairs AS ({_PAIRS_CTE}),
edges AS (
  SELECT a_id AS a, b_id AS b FROM pairs
  UNION SELECT b_id, a_id FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
  ) SELECT * FROM r)
SELECT v.v AS doc_id,
       LEAST(v.v, MIN(r.dst)) AS cluster_id
FROM verts v LEFT JOIN reach r ON r.src = v.v
GROUP BY v.v
ORDER BY doc_id
"""


@register("dedup_clusters_connected_components", CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over MinHash-LSH near-dup pairs via min-label
    propagation; cluster_id = smallest doc_id in the component."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("a_id", "b_id")
    pairs.persist()
    edges = pairs.selectExpr("a_id AS a", "b_id AS b").union(
        pairs.selectExpr("b_id AS a", "a_id AS b")
    )
    edges.persist()
    labels = edges.select(F.col("a").alias("v")).distinct().withColumn(
        "label", F.col("v")
    )
    for _ in range(20):  # bound >> real dup-cluster diameter
        neighbor_min = (
            edges.join(labels, edges.b == labels.v)
            .groupBy(F.col("a").alias("v2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.v2, "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        )
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("v", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(
        F.col("v").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


_CLUSTERS_CORE = CLUSTERS_ORACLE.rsplit("ORDER BY", 1)[0]

REPRESENTATIVES_ORACLE = f"""
WITH clusters AS ({_CLUSTERS_CORE}),
j AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars
  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
SELECT cluster_id, rep_doc_id, cluster_size FROM (
  SELECT cluster_id, doc_id AS rep_doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM j
) WHERE rn = 1
ORDER BY cluster_id
"""


@register("dedup_cluster_representatives", REPRESENTATIVES_ORACLE)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection: keep the BEST document of each duplicate
    cluster instead of an arbitrary one (production dedup keeps the
    highest-quality member — here the longest, ties broken on doc_id so
    both engines pick the same row).

    Scale: one shuffle on cluster_id; both window functions share the same
    partitioning so Spark evaluates them in a single Window node. Cluster
    sizes are bounded by near-dup group sizes (small), so per-partition
    window state is O(cluster), never O(corpus)."""
    from ..catalog import load_table
    from pyspark.sql import Window

    cl = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = cl.join(docs, "doc_id")
    w_ord = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    w_all = Window.partitionBy("cluster_id")
    return (
        j.withColumn("rn", F.row_number().over(w_ord))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w_all))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "cluster_size",
        )
        .orderBy("cluster_id")
    )


SPLIT_ORACLE = f"""
WITH clusters AS ({_CLUSTERS_CORE}),
lab AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS label
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
b AS (
  SELECT doc_id, label,
         (('0x' || substr(md5(CAST(label AS VARCHAR)), 1, 8))::BIGINT) % 100
           AS bucket
  FROM lab)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       count(DISTINCT label) AS n_groups
FROM b GROUP BY 1 ORDER BY 1
"""


@register("split_by_cluster", SPLIT_ORACLE)
def split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the duplicate
    CLUSTER, not the document — near-duplicate documents always land in the
    same split, so the eval set can never contain a near-copy of a training
    document (the train/test contamination failure mode of naive row-hash
    splits). Singletons split on their own doc_id.

    Deterministic across engines/runs/partitionings via the md5 bucket
    (functions/hashing.py stable_hash32), 80/10/10.

    Scale: the cluster map is bounded by the near-dup population — the
    corpus-sized relation is scanned once and left-joined (AQE broadcasts
    the small cluster side); one aggregation, no window."""
    from ..catalog import load_table
    from ..functions.hashing import stable_hash32

    cl = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    lab = docs.join(cl, "doc_id", "left").withColumn(
        "label", F.coalesce("cluster_id", "doc_id")
    )
    bucket = stable_hash32(F.col("label").cast("string")) % 100
    return (
        lab.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise(
                "test"
            ),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("label").alias("n_groups"),
        )
        .orderBy("split")
    )
