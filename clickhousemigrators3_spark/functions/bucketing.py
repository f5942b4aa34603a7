"""Bucketed tables — shuffle-free co-located joins (SURVEY north-star:
"bucketing for co-located joins").

Writing both sides of a recurring large-large join bucketed by the join key
(same bucket count) lets Spark sort-merge-join them with ZERO exchange: each
task reads bucket i of both tables. At 100 TB this converts the biggest
shuffle in the pipeline into a partitioned file read — the cluster-scale
payoff; tests assert the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    # a dangling warehouse dir from a dropped in-memory-catalog table blocks
    # re-creation — drop both the catalog entry and the location first
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    from ..catalog import drop_path

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    drop_path(spark, f"{warehouse}/{table_name}")
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket column — planned
    as a sort-merge join with no shuffle exchange (the merge hint keeps
    Catalyst from choosing broadcast at test scale; at the sizes where
    bucketing matters, SMJ is what it would pick anyway)."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on=on
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan repartitions data (shuffle exchange);
    broadcast exchanges don't move the big side and don't count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
