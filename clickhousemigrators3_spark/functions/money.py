"""Exact-decimal measure arithmetic for cross-engine-deterministic aggregates.

Summing doubles is order-dependent; Spark's partition order is not stable, so
a double sum can differ run-to-run in the last ulp and differ from DuckDB.
Casting measures to DECIMAL(18,2) first makes every sum exact (and therefore
identical in any engine); the final cast back to double then yields
bit-identical values. Cost: decimal aggregation is still JVM codegen —
negligible vs. the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col_name: str) -> Column:
    return F.col(col_name).cast(DEC)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


def sum_double(col: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(col).cast("double").alias(alias)


def avg_double(col: Column, alias: str) -> Column:
    """Exact-sum-based average, surfaced as double (identical across engines
    because both divide the same exact sum by the same count)."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)


# --- DuckDB twins -----------------------------------------------------------

SQL_DEC = "DECIMAL(18,2)"


def sql_dec(c: str) -> str:
    return f"CAST({c} AS {SQL_DEC})"


SQL_REVENUE = f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})"


def sql_sum_double(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_avg_double(expr: str, alias: str) -> str:
    return f"(CAST(SUM({expr}) AS DOUBLE) / COUNT(*)) AS {alias}"
