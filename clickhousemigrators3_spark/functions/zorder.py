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
    deterministic: bool = False,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    (col_a, col_b). Bounds are collected once (two scalars per column);
    the sort is the one global exchange that buys min/max pruning on both
    columns for every later scan.

    ``deterministic=True`` swaps the default ``repartitionByRange`` (whose
    partition boundaries come from reservoir sampling and can shift
    between runs) for a fully reproducible layout: rows are bucketed by
    the top bits of the Morton code (a fixed, data-independent split of
    the z-space), hash-repartitioned on the bucket id, and sorted within
    partitions by (_z, col_a, col_b) so ties cannot reorder under shuffle
    arrival races. Byte-identical stats layout on every run — use it for
    reproducible-pruning tests and audit snapshots. The default sampling
    mode remains the scale path: uniform z-space splits can skew when the
    data does not fill the [min, max] box evenly, while range sampling
    adapts to the actual distribution."""
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
    n = max(n_partitions or df.sparkSession.sparkContext.defaultParallelism, 1)
    zdf = df.withColumn("_z", morton_code(za, zb, bits))
    if deterministic:
        # fixed split of the 2*bits-wide z-space: bucket = top ceil(log2 n)
        # bits. Row→bucket is a pure function of the row; bucket→partition
        # is Spark's hash (stable across runs); the sort key includes the
        # clustered columns so shuffle arrival order cannot permute ties.
        bucket_bits = max((n - 1).bit_length(), 1)
        part = zdf.repartition(
            n, F.shiftright(F.col("_z"), 2 * bits - bucket_bits)
        ).sortWithinPartitions("_z", col_a, col_b)
    else:
        part = zdf.repartitionByRange(n, "_z").sortWithinPartitions("_z")
    (
        part.drop("_z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
