"""Dataset maintenance — the operations the reference's world delegates to
ClickHouse's MergeTree engine (dedup-on-merge, background part merges, TTL
moves, OPTIMIZE, ALTER ADD COLUMN) and a Spark-native parquet dataset must
provide itself:

* :func:`merge_upsert` — MERGE INTO semantics (update matched keys, insert
  new ones) as copy-on-write over only the partitions the source touches.
* :func:`compact_partitions` — rewrite fragmented partitions into few
  right-sized files (the small-files swamp is the #1 operational failure of
  100 TB parquet lakes).
* :func:`delete_keys` — DELETE WHERE key IN (…), partition-grain.
* :func:`optimize_final_deduplicate` — OPTIMIZE FINAL DEDUPLICATE.
* :func:`apply_ttl` — TTL expiry (drop dead partitions, rewrite boundary).
* :func:`append_with_schema_evolution` / :func:`read_evolved` — additive
  ALTER ADD COLUMN with mergeSchema readers.

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


def optimize_final_deduplicate(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    version_cols: list[str],
    partition_cols: list[str],
) -> dict:
    """ClickHouse ``OPTIMIZE TABLE … FINAL DEDUPLICATE`` parity — the
    WRITE-side compaction that makes ReplacingMergeTree's lazy dedup
    durable: rewrite partitions so only the greatest-version row per key
    survives. Faithful to ClickHouse scope: deduplication applies WITHIN a
    partition (ClickHouse merges never cross partitions); cross-partition
    duplicates remain the read-side FINAL query's job
    (``ch_replacing_final`` in ``mergetree.py``).

    Partition-grain copy-on-write: a first grouped pass finds partitions
    that actually contain duplicate keys — partitions already clean are
    never rewritten (idempotent; a second run is a metadata-only no-op).
    ``version_cols`` orders versions; the LAST version column acts as the
    deterministic tie-break, so reruns are bit-stable.

    Returns ``{"rewritten_partitions": n, "rows_removed": n}``.
    """
    from pyspark.sql.window import Window

    df = spark.read.parquet(path)
    dirty = [
        tuple(r)
        for r in (
            df.groupBy(*partition_cols, *key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(*partition_cols)
            .distinct()
            .collect()
        )
    ]
    if not dirty:
        return {"rewritten_partitions": 0, "rows_removed": 0}

    pred = F.lit(False)
    for vals in dirty:
        clause = F.lit(True)
        for c, v in zip(partition_cols, vals):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    existing = df.filter(pred)
    n_before = existing.count()
    w = Window.partitionBy(*partition_cols, *key_cols).orderBy(
        *[F.desc(c) for c in version_cols]
    )
    kept = (
        existing.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    n_after = kept.count()
    _ensure_dynamic_overwrite(spark)
    (
        kept.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return {
        "rewritten_partitions": len(dirty),
        "rows_removed": n_before - n_after,
    }


def apply_ttl(
    spark: SparkSession,
    path: str,
    ts_col: str,
    cutoff,
    partition_cols: list[str],
) -> dict:
    """ClickHouse table ``TTL`` parity (``TTL ts + INTERVAL n``): expire
    rows older than ``cutoff`` with the cheapest action each partition
    allows —

    * partitions whose max(ts) < cutoff are FULLY expired → dropped as
      directories (metadata-only, zero data read — the Hadoop FS delete
      works the same on s3a://), exactly how ClickHouse's
      ``ttl_only_drop_parts`` drops whole parts;
    * partitions straddling the cutoff are rewritten keeping live rows
      (dynamic overwrite, bounded to the boundary partitions);
    * fully-live partitions are untouched.

    Contract: partition values must be filesystem-safe scalars (the same
    constraint the migration writer already imposes), since fully-expired
    partitions are located by their ``col=value`` directory names.

    Returns ``{"dropped_partitions": n, "rewritten_partitions": n,
    "rows_expired": n}``.
    """
    from ..catalog import _delete_path

    df = spark.read.parquet(path)
    stats = (
        df.groupBy(*partition_cols)
        .agg(
            F.min(ts_col).alias("__mn"),
            F.max(ts_col).alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    dead = [r for r in stats if r["__mx"] < cutoff]
    boundary = [r for r in stats if r["__mn"] < cutoff <= r["__mx"]]

    for r in dead:
        segs = "/".join(f"{c}={r[c]}" for c in partition_cols)
        _delete_path(spark, f"{path}/{segs}")

    rows_expired = sum(r["__n"] for r in dead)
    if boundary:
        pred = F.lit(False)
        for r in boundary:
            clause = F.lit(True)
            for c in partition_cols:
                clause = clause & (F.col(c) == F.lit(r[c]))
            pred = pred | clause
        straddling = df.filter(pred)
        n_before = straddling.count()
        kept = straddling.filter(F.col(ts_col) >= F.lit(cutoff))
        rows_expired += n_before - kept.count()
        _ensure_dynamic_overwrite(spark)
        (
            kept.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    return {
        "dropped_partitions": len(dead),
        "rewritten_partitions": len(boundary),
        "rows_expired": rows_expired,
    }


def append_with_schema_evolution(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    partition_cols: list[str],
) -> dict:
    """ClickHouse ``ALTER TABLE … ADD COLUMN`` mid-migration parity for the
    parquet lake: append a batch whose schema is a SUPERSET of the
    target's. Parquet handles added nullable columns natively — new files
    carry the new column, old files simply lack it, and readers
    reconstruct the union via ``mergeSchema`` (``read_evolved``). No
    rewrite of history, which at 100 TB is the entire point: schema
    evolution must be O(new data), never O(table).

    Guarded: a batch that DROPS or retypes an existing column is rejected
    (that needs an explicit migration, not a silent append) — additions
    only, so every reader sees a consistent widening history.

    Returns ``{"appended_rows": n, "added_columns": [...]}``.
    """
    existing = spark.read.parquet(target_path).schema
    batch_fields = {f.name: f.dataType for f in batch.schema.fields}
    missing = [f.name for f in existing.fields if f.name not in batch_fields]
    if missing:
        raise ValueError(
            f"schema evolution is additive-only; batch lacks {missing}"
        )
    retyped = [
        f.name
        for f in existing.fields
        if batch_fields[f.name].simpleString() != f.dataType.simpleString()
    ]
    if retyped:
        raise ValueError(
            f"schema evolution is additive-only; batch retypes {retyped}"
        )
    added = [n for n in batch_fields if n not in {f.name for f in existing.fields}]
    n = batch.count()
    (
        batch.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("append")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )
    return {"appended_rows": n, "added_columns": sorted(added)}


def read_evolved(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a dataset whose files span schema versions: ``mergeSchema``
    unions all file schemas; rows from pre-evolution files surface NULL in
    later-added columns (exactly ClickHouse's ADD COLUMN default
    behavior)."""
    return spark.read.option("mergeSchema", "true").parquet(target_path)


def write_with_skip_indexes(
    df: DataFrame,
    path: str,
    bloom_cols: dict[str, int],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ClickHouse skip-index parity (``INDEX … TYPE bloom_filter`` /
    ``minmax`` + ``ORDER BY`` primary key) for a parquet dataset:

    * **minmax** is free — parquet row-group statistics, which Spark's
      reader already uses for row-group pruning; sorting by ``sort_cols``
      first (the ClickHouse ORDER BY analogue) makes those ranges disjoint
      so point/range predicates skip most of the file.
    * **bloom_filter** maps to parquet's native column bloom filters
      (``parquet.bloom.filter.enabled#col``), which prune row groups on
      point predicates over high-cardinality columns where minmax is
      useless — the exact niche ClickHouse's bloom skip index serves.
      ``bloom_cols`` maps column → expected NDV (sizes the filter; ~1.1
      bytes/value at the default 1% FPP).

    Pruning happens inside parquet-mr at scan time on every executor —
    no driver involvement, effective at any file count."""
    writer = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    w = writer.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    w.parquet(path)


def attach_partition_from(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str],
    values: list,
    move: bool = False,
    replace: bool = False,
) -> dict:
    """ClickHouse ``ALTER TABLE dst ATTACH PARTITION … FROM src`` (and
    ``MOVE PARTITION TO TABLE`` when ``move=True``, ``REPLACE PARTITION``
    when ``replace=True``): transfer one partition between two datasets
    with identical schema and partitioning at FILE level — a Hadoop-FS
    copy/rename of the ``col=value`` directory, O(partition metadata +
    bytes streamed by the filesystem), never a Spark job over the data.
    On HDFS/local the move is an atomic rename; on S3 it is a server-side
    copy (same as ClickHouse on S3 disks).

    Refuses to clobber an existing destination partition unless
    ``replace=True`` (ClickHouse semantics: ATTACH FROM requires absence,
    REPLACE swaps). Returns ``{"files": n, "action": ...}``."""
    segs = "/".join(f"{c}={v}" for c, v in zip(partition_cols, values))
    src = f"{src_path}/{segs}"
    dst = f"{dst_path}/{segs}"

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    fs = src_p.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(src_p):
        raise FileNotFoundError(f"source partition not found: {src}")
    if fs.exists(dst_p):
        if not replace:
            raise FileExistsError(
                f"destination partition exists (use replace=True): {dst}"
            )
        fs.delete(dst_p, True)
    fs.mkdirs(dst_p.getParent())
    n_files = sum(
        1 for st in fs.listStatus(src_p) if st.getPath().getName().endswith(".parquet")
    )
    if move:
        if not fs.rename(src_p, dst_p):
            raise OSError(f"partition rename failed: {src} -> {dst}")
        action = "moved"
    else:
        util = jvm.org.apache.hadoop.fs.FileUtil
        if not util.copy(fs, src_p, fs, dst_p, False, jsc.hadoopConfiguration()):
            raise OSError(f"partition copy failed: {src} -> {dst}")
        action = "replaced" if replace else "attached"
    return {"files": n_files, "action": action}


def alter_update_where(
    spark: SparkSession,
    target_path: str,
    assignments: dict[str, str],
    predicate: str,
    partition_cols: list[str],
) -> dict:
    """ClickHouse mutation parity — ``ALTER TABLE … UPDATE col = expr
    WHERE pred``: copy-on-write at partition grain, like the server's
    mutation machinery rewrites only the parts containing matching rows.

    A first metadata-cheap pass finds the partitions with any matching row
    (predicate pushdown prunes the scan); only those partitions are read
    back, the assignments applied to matching rows (non-matching rows pass
    through untouched), and rewritten via dynamic partition overwrite —
    partitions with no matches are never rewritten. Assignment expressions
    are SQL strings evaluated per row (``{"o_totalprice":
    "o_totalprice * 1.1"}``).

    Returns ``{"touched_partitions": n, "rows_updated": n}``."""
    target = spark.read.parquet(target_path)
    touched = [
        tuple(r)
        for r in target.filter(F.expr(predicate))
        .select(*partition_cols)
        .distinct()
        .collect()
    ]
    if not touched:
        return {"touched_partitions": 0, "rows_updated": 0}

    part_pred = F.lit(False)
    for vals in touched:
        clause = F.lit(True)
        for c, v in zip(partition_cols, vals):
            clause = clause & (F.col(c) == F.lit(v))
        part_pred = part_pred | clause
    existing = target.filter(part_pred)
    hit = F.expr(predicate)
    n_updated = existing.filter(hit).count()
    updated = existing.select(
        *[
            F.when(hit, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in existing.columns
        ]
    )
    _ensure_dynamic_overwrite(spark)
    (
        updated.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )
    return {"touched_partitions": len(touched), "rows_updated": n_updated}
