"""Registered validation queries — A3/A4 as distributed joins, plus the
checksum upgrade (SURVEY §7.2 step 3).

Scenario fixture: "dst" is lineitem with one composite partition missing
(R/F), simulating a partially-migrated backup. The validation query must
flag exactly that partition and pass the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import oracle_hash_sql, oracle_row_concat, row_concat, stable_hash32
from ..registry import register
from .validate import count_validation

KEYS = ["l_returnflag", "l_linestatus"]


@register(
    "a3_count_validation_join",
    """
    WITH src AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS src_cnt
      FROM lineitem GROUP BY 1, 2
    ),
    dst AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS dst_cnt
      FROM lineitem
      WHERE NOT (l_returnflag = 'R' AND l_linestatus = 'F')
      GROUP BY 1, 2
    )
    SELECT COALESCE(s.l_returnflag, d.l_returnflag) AS l_returnflag,
           COALESCE(s.l_linestatus, d.l_linestatus) AS l_linestatus,
           CAST(s.src_cnt AS BIGINT) AS src_cnt,
           CAST(d.dst_cnt AS BIGINT) AS dst_cnt,
           (s.src_cnt IS NOT DISTINCT FROM d.dst_cnt) AS passed
    FROM src s FULL OUTER JOIN dst d
      ON s.l_returnflag = d.l_returnflag AND s.l_linestatus = d.l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a3_count_validation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (``migration.py:480-495``, ``validator.py:38-56``): per-partition
    src-vs-dst count equality for ALL partitions in one full-outer join —
    versus the reference's 2 scalar queries per partition. At 100 TB: two
    column-pruned scans, shuffle of #partitions rows."""
    src = load_table(spark, sf_dir, "lineitem")
    dst = src.filter(~((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")))
    return count_validation(src, dst, KEYS).orderBy(*KEYS)


_CONCAT_COLS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]


@register(
    "a3_checksum_validation",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS row_cnt,
           CAST(SUM({oracle_hash_sql(oracle_row_concat(_CONCAT_COLS), bits=32)}) AS BIGINT)
             AS content_hash
    FROM lineitem
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def a3_checksum_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum upgrade of A3: order-insensitive per-partition content hash
    (sum of 32-bit stable row hashes). Same cost class as the count — one
    pass, map-side combine — but catches content corruption that equal row
    counts cannot (SURVEY §7.2 step 3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.sum(stable_hash32(row_concat(_CONCAT_COLS))).alias("content_hash"),
        )
        .orderBy(*KEYS)
    )
