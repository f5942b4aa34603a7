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
