"""Skew-handling join utilities (SURVEY north-star: "skewed keys hurt —
salting for skew").

``salted_join`` spreads a hot key's rows across ``n_salts`` reducer
partitions: the big (skewed) side gets a per-row salt, the small side is
replicated once per salt value, and the join key becomes (key, salt). Same
result set as the plain join, but the hot key's work is parallelized over
``n_salts`` tasks instead of one straggler.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when a single key exceeds what
one task can hold even after AQE splits, or for aggregations
(``salted_agg_count``: two-phase partial-on-salt → final).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on column ``on``. The salt on the
    big side is derived from a hash of the full row partition id via
    ``spark_partition_id``+monotonic id — any per-row spread works; it never
    affects results, only placement."""
    salted_big = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    salted_small = small.select("*", salts)
    joined = salted_big.join(salted_small, on=[on, "_salt"], how=how)
    return joined.drop("_salt")


def salted_agg_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase count for skewed group keys: partial count on (key, salt),
    final sum on key. Map-side combine already does this for counts; the
    pattern matters for high-cardinality state aggs (collect_set etc.)."""
    partial = (
        df.withColumn("_salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("cnt"))
