"""EP2 driven by ClickHouse SQL texts ONLY — the reference's migration
state machine (SURVEY §3 EP2, reference migration.py:372-542) replayed
through this engine's ClickHouse-SQL surface: system-table discovery,
per-partition INSERT INTO … SELECT, count validation, final invariant.

This is the switch-over proof for the "users write ClickHouse SQL" story:
every query text below is the shape the reference emits (f-strings with
db/table interpolated), executed verbatim via run_ch_sql / run_ch_insert —
no DataFrame code in the orchestration path.
"""

from __future__ import annotations

from clickhousemigrators3_spark.functions.ch_sql import (
    run_ch_insert,
    run_ch_sql,
)

SF = "/root/testdata/sf0.001"


def _scalar(spark, sql):
    return run_ch_sql(spark, sql, SF).collect()[0][0]


def test_ep2_partition_migration_via_ch_sql(spark, tmp_path):
    # 3/6. partition key + discovery (reference partition.py:12-16,107-114)
    key = _scalar(
        spark,
        "SELECT partition_key FROM system.tables "
        "WHERE database = 'default' AND name = 'orders'",
    )
    assert key == "toYYYYMM(o_orderdate)"
    partitions = [
        r[0]
        for r in run_ch_sql(
            spark,
            "SELECT DISTINCT partition FROM system.parts "
            "WHERE database = 'default' AND table = 'orders' AND active = 1 "
            "ORDER BY partition",
            SF,
        ).collect()
    ]
    assert len(partitions) > 3
    todo = partitions[:3]  # C1 loop, truncated for test wall-clock

    # 9. total_rows (A1) — zero-arg count() is the CH spelling
    total = _scalar(spark, "SELECT count() FROM orders")

    dest_root = str(tmp_path / "dst")
    copied = 0
    for p in todo:
        # 10a/10b. typed WHERE + INSERT…SELECT copy (S10/M6)
        ins = run_ch_insert(
            spark,
            f"INSERT INTO default.orders_backup SELECT * FROM orders "
            f"WHERE {key} = {p}",
            dest_root,
            SF,
        ).collect()[0]
        # 10c. src partition count vs rows just landed (A2/A3; C10 on fail)
        src_n = _scalar(
            spark, f"SELECT count() FROM orders WHERE {key} = {p}"
        )
        assert ins.rows_inserted == src_n > 0, (p, ins.rows_inserted, src_n)
        copied += src_n

    # 11. invariant over the landed backup (A4): register the written
    # parquet under its CH name and validate with CH SQL texts again
    spark.read.parquet(f"{dest_root}/default/orders_backup") \
        .createOrReplaceTempView("orders_backup")
    dst_n = _scalar(spark, "SELECT count() FROM orders_backup")
    assert dst_n == copied < total
    # checksum upgrade (validator.py:24-31 shape): count + key-sum per side
    src_sum = _scalar(
        spark,
        "SELECT sum(toInt64(o_orderkey)) FROM orders "
        f"WHERE {key} IN ({', '.join(todo)})",
    )
    dst_sum = _scalar(
        spark, "SELECT sum(toInt64(o_orderkey)) FROM orders_backup"
    )
    assert src_sum == dst_sum


def test_ep3_table_enumeration_via_ch_sql(spark):
    # EP3 step 1 (reference migration.py:548-551): enumerate non-view tables
    names = {
        r[0]
        for r in run_ch_sql(
            spark,
            "SELECT name FROM system.tables WHERE database = 'default' "
            "AND engine NOT IN ('View', 'MaterializedView') ORDER BY name",
            SF,
        ).collect()
    }
    assert {"orders", "lineitem", "events"} <= names
