"""Migration planning queries — the metadata queries the migration driver
(operators/migrate.py) runs before moving data, exposed as checkable
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register


@register(
    "migration_partition_plan",
    """
    WITH per_part AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS row_cnt
      FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag, l_linestatus, row_cnt,
           (CAST(row_cnt AS DOUBLE) / SUM(row_cnt) OVER ()) AS share,
           (CAST(row_cnt AS DOUBLE)
              > 2.0 * (CAST(SUM(row_cnt) OVER () AS DOUBLE) / COUNT(*) OVER ()))
             AS is_skewed
    FROM per_part
    ORDER BY row_cnt DESC, l_returnflag, l_linestatus
    """,
)
def migration_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight plan the migration driver computes: per-partition row
    counts, share of total, and a skew flag (count > 2× mean). Skewed
    partitions are the ones to sub-split or salt before a 100 TB copy —
    this query is why the driver can make that call from metadata alone
    (reference analogue: ordering partitions from ``system.parts``,
    ``partition.py:107-114``, which has no skew visibility at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("row_cnt")
    )
    w = Window.partitionBy()
    total = F.sum("row_cnt").over(w)
    mean = total.cast("double") / F.count(F.lit(1)).over(w)
    return per_part.select(
        "l_returnflag",
        "l_linestatus",
        "row_cnt",
        (F.col("row_cnt").cast("double") / total).alias("share"),
        (F.col("row_cnt").cast("double") > 2.0 * mean).alias("is_skewed"),
    ).orderBy(F.desc("row_cnt"), "l_returnflag", "l_linestatus")
