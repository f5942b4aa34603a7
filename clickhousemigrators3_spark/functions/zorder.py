"""Z-order (Morton) clustering for multi-dimension pruning.

One sort key can only cluster one dimension; queries filtering on a second
column read every row group. Interleaving the bits of two (min-max scaled)
columns gives a space-filling curve: sorting by the Morton code co-locates
rows that are close in BOTH dimensions, so parquet row-group min/max stats
become selective for point/range predicates on either column — the same
lever Delta/Iceberg expose as OPTIMIZE ZORDER BY, built here from plain
Spark expressions (bit shifts inside whole-stage codegen, no UDF).

Scale: the write is one global sort (range exchange) — the cost you pay
once so every subsequent scan prunes. The min/max bounds collected on the
driver are two scalars per column (metadata, not data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution: 2^16 cells per axis


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to [0, 2^bits - 1] as a long."""
    span = (hi - lo).cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    return F.least(
        F.greatest((unit * ((1 << bits) - 1)).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def morton_code(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two longs: a→even positions,
    b→odd. Pure JVM shift/mask expressions."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = ZBITS,
    max_records_per_file: int = 50_000,
    n_partitions: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    (col_a, col_b). Bounds are collected once (two scalars per column);
    the sort is the one global exchange that buys min/max pruning on both
    columns for every later scan."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]
    za = _scale_to_bits(
        F.col(col_a), F.lit(bounds["a_lo"]), F.lit(bounds["a_hi"]), bits
    )
    zb = _scale_to_bits(
        F.col(col_b), F.lit(bounds["b_lo"]), F.lit(bounds["b_hi"]), bits
    )
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("_z", morton_code(za, zb, bits))
        .repartitionByRange(max(n, 1), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
