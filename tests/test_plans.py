"""Plan-regression guards: the scale-critical physical-plan properties must
not silently degrade (pushdown reaching the scan, dims broadcasting, top-k
avoiding global sorts, column pruning)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import pyspark

    return df._jdf.queryExecution().explainString(
        pyspark.SparkContext._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q6_filters_pushed_to_scan(spark):
    from clickhousemigrators3_spark.operators.analytics import tpch_q6

    plan = _formatted(tpch_q6(spark, SF_DIR))
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    # column pruning: only the 4 needed columns reach the reader
    import re

    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in schema_line
    assert "l_extendedprice" in schema_line


def test_q3_broadcasts_dims_and_takeordered(spark):
    from clickhousemigrators3_spark.operators.relational import (
        tpch_q3_shipping_priority,
    )

    plan = _plan(tpch_q3_shipping_priority(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
    assert "SortMergeJoin" not in plan


def test_flagship_prunes_columns(spark):
    from clickhousemigrators3_spark.operators.relational import (
        flagship_partition_rollup,
    )

    plan = _formatted(flagship_partition_rollup(spark, SF_DIR))
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_orderkey", "l_partkey", "l_quantity", "l_returnflag"):
        assert col not in schema_line, f"unpruned column {col}"


def test_migrated_dataset_partition_pruning(spark, tmp_path):
    """Reading one partition of a migrated dataset must scan only that
    partition's directory (PartitionFilters, zero data filters)."""
    from clickhousemigrators3_spark.config import MigrationConfig
    from clickhousemigrators3_spark.operators.migrate import migrate_single_table
    from pyspark.sql import functions as F

    cfg = MigrationConfig(
        source_dir=SF_DIR,
        dest_dir=str(tmp_path / "dest"),
        partition_keys=["l_returnflag", "l_linestatus"],
        insert_interval=0.0,
        lock_dir=str(tmp_path / "locks"),
        progress_path=str(tmp_path / "progress.json"),
        report_dir=str(tmp_path / "reports"),
    )
    res = migrate_single_table(spark, cfg, "lineitem")
    assert res["status"] == "completed", res.get("error")
    out = spark.read.parquet(str(tmp_path / "dest" / "lineitem"))
    one = out.filter((F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F"))
    plan = _formatted(one)
    assert "PartitionFilters" in plan
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "l_returnflag" in part_line
    assert one.count() > 0


def test_window_topn_uses_group_limit(spark):
    from clickhousemigrators3_spark.operators.relational import window_topn

    plan = _plan(window_topn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle
