"""Dataset maintenance — MERGE/upsert and small-file compaction.

Two operations the reference's world delegates to ClickHouse's MergeTree
engine (ReplacingMergeTree dedup-on-merge, background part merges) and a
Spark-native parquet dataset must provide itself:

* :func:`merge_upsert` — MERGE INTO semantics (update matched keys, insert
  new ones) as copy-on-write over only the partitions the source touches.
* :func:`compact_partitions` — rewrite fragmented partitions into few
  right-sized files (the small-files swamp is the #1 operational failure of
  100 TB parquet lakes).

Both use dynamic partition overwrite (session.py sets
``partitionOverwriteMode=dynamic``), so reruns are idempotent and untouched
partitions are never rewritten — the same validate-before-destroy posture as
the migration pipeline (reference parity: ``migration.py:473-502``'s
per-partition copy + drop, re-expressed without destructive intermediate
states).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> dict:
    """MERGE INTO target USING source ON key: source rows replace matched
    target rows, unmatched source rows insert. Copy-on-write at partition
    grain:

    1. Partitions touched by the source are computed from the SOURCE side
       (small) — ``collect`` only sees partition values, never data rows.
    2. Only those partitions are read back from the target (partition
       pruning on the read), anti-joined against the source keys, unioned
       with the source, and rewritten via dynamic partition overwrite.

    At 100 TB an upsert that touches 3 of 10 000 partitions reads and
    writes exactly 3; the anti-join shuffles only the touched partitions'
    rows and broadcasts when the source is small. Contracts: keys are
    unique in ``source`` (enforce upstream with dropDuplicates), and a
    key's partition value is stable — a source row whose partition differs
    from the key's current partition would insert without deleting the old
    copy (partition-grain merge cannot see untouched partitions; keys that
    move partitions need a full-table merge or an explicit delete of the
    old partition value first).

    Returns ``{"touched_partitions": n, "rows_written": n}``.
    """
    touched = [
        tuple(r)
        for r in source.select(*partition_cols).distinct().collect()
    ]
    if not touched:
        return {"touched_partitions": 0, "rows_written": 0}

    target = spark.read.parquet(target_path)
    pred = F.lit(False)
    for vals in touched:
        clause = F.lit(True)
        for c, v in zip(partition_cols, vals):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    existing = target.filter(pred)

    kept = existing.join(
        source.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = kept.unionByName(source.select(*existing.columns))
    n_rows = merged.count()
    _ensure_dynamic_overwrite(spark)
    (
        merged.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )
    return {"touched_partitions": len(touched), "rows_written": n_rows}


def _ensure_dynamic_overwrite(spark: SparkSession) -> None:
    """Partition-grain overwrite must be surgical: static mode would wipe
    partitions absent from the written frame. Runtime-settable, so enforce
    on whatever session the caller hands us (same posture as
    catalog.load_table's reader conf)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def fragmented_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    max_files: int = 4,
) -> list[tuple]:
    """Partitions whose file count exceeds ``max_files`` — metadata-only
    (``input_file_name`` over the scan; no data columns are read thanks to
    column pruning)."""
    df = spark.read.parquet(path)
    per_part = (
        df.select(*partition_cols, F.input_file_name().alias("f"))
        .groupBy(*partition_cols)
        .agg(F.count_distinct("f").alias("n_files"))
        .filter(F.col("n_files") > max_files)
    )
    return [tuple(r)[:-1] for r in per_part.collect()]


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_files_per_partition: int = 1,
    max_files: int = 4,
) -> dict:
    """Rewrite fragmented partitions into ``target_files_per_partition``
    files each. Only partitions over the ``max_files`` threshold are
    rewritten (dynamic overwrite leaves the rest byte-identical); row
    content is unchanged — callers can re-validate with the count/checksum
    validators, same as post-migration.

    Scale: compaction is the maintenance job that keeps scan task counts
    proportional to data size instead of write history. Run it per
    partition predicate so the rewrite working set stays bounded.
    """
    frag = fragmented_partitions(spark, path, partition_cols, max_files)
    if not frag:
        return {"compacted_partitions": 0}

    df = spark.read.parquet(path)
    pred = F.lit(False)
    for vals in frag:
        clause = F.lit(True)
        for c, v in zip(partition_cols, vals):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    # hash-repartition on the partition cols co-locates each partition's
    # rows in one task → exactly one output file per partition value;
    # >1 target files adds a salt so tasks (and files) stay parallel
    keys = [F.col(c) for c in partition_cols]
    if target_files_per_partition > 1:
        keys = keys + [
            (F.spark_partition_id() % target_files_per_partition).alias("_salt")
        ]
    _ensure_dynamic_overwrite(spark)
    (
        df.filter(pred)
        .repartition(*keys)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return {"compacted_partitions": len(frag)}


def delete_keys(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> dict:
    """DELETE WHERE key IN (keys) — the right-to-be-forgotten primitive.
    Copy-on-write at partition grain, same posture as :func:`merge_upsert`:
    ``keys`` must carry the partition columns (at 100 TB you keep a
    key→partition index or derive the partition from the key); only the
    partitions containing doomed keys are read, anti-joined, rewritten.

    Returns ``{"touched_partitions": n, "rows_deleted": n}``.
    """
    touched = [
        tuple(r) for r in keys.select(*partition_cols).distinct().collect()
    ]
    if not touched:
        return {"touched_partitions": 0, "rows_deleted": 0}

    target = spark.read.parquet(target_path)
    pred = F.lit(False)
    for vals in touched:
        clause = F.lit(True)
        for c, v in zip(partition_cols, vals):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    existing = target.filter(pred)
    n_before = existing.count()
    kept = existing.join(
        keys.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    n_after = kept.count()
    _ensure_dynamic_overwrite(spark)
    (
        kept.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )
    return {
        "touched_partitions": len(touched),
        "rows_deleted": n_before - n_after,
    }
