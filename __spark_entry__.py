"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``clickhousemigrators3_spark.registry`` — every operator from
SURVEY.md §2/§7.3 registers itself there with a Spark callable and (when
SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package lives next to this file — make the contract importable from
# any working directory the driver happens to use
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Monthly partition rollup over lineitem — the reference's partition
    discovery (M4) fused with per-partition count+revenue validation
    aggregates (A1/A2). See SURVEY.md §7.1.
    """
    from clickhousemigrators3_spark.operators.relational import flagship_partition_rollup

    return flagship_partition_rollup(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.3."""
    from clickhousemigrators3_spark.registry import load_all

    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query (same keys as
    ``queries()``; non-SQL-expressible ops omitted → rows-only check)."""
    from clickhousemigrators3_spark.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
