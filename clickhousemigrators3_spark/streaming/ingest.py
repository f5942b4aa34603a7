"""Streaming ingestion to partitioned parquet with checkpointed
exactly-once semantics — the streaming analogue of the batch migration
pipeline (C3's checkpoint ledger becomes Structured Streaming's
``checkpointLocation``; the partitioned staging write becomes a partitioned
file sink).

Restart safety: the checkpoint records which source files are committed, so
re-running against the same checkpoint ingests nothing twice — the property
the batch migrator gets from its ledger + idempotent overwrites (Q4 fix),
here provided by the engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .stream_queries import _events_stream


def ingest_events_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 4,
) -> None:
    """Drain the events source into day-partitioned parquet, exactly once
    per source file across restarts. ``availableNow`` processes everything
    currently present then stops; in production the same call runs forever
    with a processing-time trigger."""
    stream = _events_stream(spark, sf_dir).withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_latest_state(
    spark: SparkSession,
    sf_dir: str,
    state_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming materialization of "latest event per user" into a
    partitioned parquet state table — ClickHouse ReplacingMergeTree
    semantics, Spark-first: ``foreachBatch`` reduces each micro-batch to
    one row per user (``max_by`` on the (ts, event_id) key, same as the
    batch ev_argmax query), then MERGEs it into the state table with
    :func:`~..operators.maintenance.merge_upsert` at partition grain.

    Exactly-once: the checkpoint replays a failed batch, and merge_upsert
    is idempotent (same keys → same partitions rewritten to the same
    content), so replays converge instead of duplicating — the streaming
    continuation of the migrator's Q4 fix.

    Scale: state partitions on ``bucket`` (user_id mod 16), so each
    micro-batch rewrites only the buckets its users touch; the per-batch
    reduction keeps the merge source at |distinct users in batch| rows.
    """
    from pyspark.sql import DataFrame

    from ..operators.maintenance import merge_upsert

    stream = _events_stream(spark, sf_dir)

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        key = F.struct(F.col("ts"), F.col("event_id"))
        latest = (
            batch.groupBy("user_id")
            .agg(
                F.max_by("event_type", key).alias("last_type"),
                F.max_by("value", key).alias("last_value"),
                F.max("ts").alias("last_ts"),
            )
            .withColumn("bucket", (F.col("user_id") % 16).cast("int"))
        )
        spark_ = batch.sparkSession
        try:
            existing = spark_.read.parquet(state_path)
        except Exception:  # first batch: no state yet
            latest.repartition("bucket").write.partitionBy("bucket").parquet(
                state_path
            )
            return
        # within-run ordering: a later batch may carry a user already in
        # state; keep the newer row (max last_ts wins on replay too)
        src = (
            latest.unionByName(
                existing.join(
                    latest.select("user_id").distinct(), "user_id", "left_semi"
                )
            )
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("last_type", "last_value", "last_ts", "bucket"),
                    F.struct("last_ts", "last_value"),
                ).alias("s")
            )
            .select("user_id", "s.last_type", "s.last_value", "s.last_ts", "s.bucket")
        )
        merge_upsert(
            spark_,
            state_path,
            src,
            key_cols=["user_id"],
            partition_cols=["bucket"],
        )

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_ingest(
    spark: SparkSession,
    docs_source_dir: str,
    index_dir: str,
    retained_out: str,
    checkpoint_path: str,
    substring_gate: bool = False,
    decontam_bloom_dir: str | None = None,
) -> None:
    """Streaming crawl-drop dedup against the STORED index — the
    Structured Streaming twin of operators/dedup_index.py: each
    micro-batch of new documents is deduped against the published
    fingerprint/band index (exact anti-join + cross-snapshot LSH verify;
    with ``substring_gate`` additionally the Lee-et-al span-fingerprint
    gate via :func:`~..operators.dedup_index.dedup_delta_substring_retained`
    — a doc sharing a verbatim span with the stored corpus drops too;
    with ``decontam_bloom_dir`` additionally the benchmark-contamination
    gate against a published Bloom artifact — see
    :func:`~..operators.traindata.publish_decontamination_bloom`),
    the survivors land in ``retained_out/batch=<id>`` and are merged into
    the index BEFORE the next batch runs (foreachBatch batches are
    sequential), so a duplicate arriving two drops later is still caught.

    Exactly-once across restarts, twice over: the checkpoint replays a
    failed batch; the replay's index update no-ops (the manifest already
    records snapshot ``b<batch_id>`` — dedup_index's idempotence
    contract) and the retained write targets a deterministic per-batch
    directory in overwrite mode, so replays converge instead of
    duplicating. Scale: per-batch cost is delta-sized (the stored side
    joins on its own keys); the index tables are the same
    manifest-published parquet the batch pipeline reads."""
    from pyspark.sql import DataFrame

    from ..operators.dedup_index import (
        dedup_delta_retained,
        dedup_delta_substring_retained,
        update_dedup_index,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_source_dir)
    )
    # the published filter is immutable for the stream's lifetime — read
    # its plan (and its self-describing (m, k) sizing) ONCE here, not per
    # micro-batch (per-batch file listing and footer reads would add fixed
    # latency to every trigger)
    if decontam_bloom_dir is not None:
        from ..operators.traindata import read_decontamination_bloom

        bloom, bloom_m, bloom_k = read_decontamination_bloom(
            spark, decontam_bloom_dir
        )
    else:
        bloom = bloom_m = bloom_k = None

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        spark_ = batch.sparkSession
        batch.persist()
        retained = dedup_delta_retained(spark_, batch, index_dir)
        if substring_gate:
            retained = retained.join(
                dedup_delta_substring_retained(spark_, batch, index_dir),
                "doc_id",
                "semi",
            )
        docs = batch.join(retained, "doc_id", "semi")
        if bloom is not None:
            # benchmark-decontamination gate against the PUBLISHED Bloom
            # artifact (operators/traindata.py
            # publish_decontamination_bloom): contaminated docs never
            # enter the retained corpus OR the dedup index. The filter is
            # constant-size, so the per-batch probe is a map-side
            # broadcast join — no benchmark text ships to ingest.
            from ..functions.text import exploded_word_shingles
            from ..operators.traindata import (
                CONTAM_N,
                bloom_contaminated_ids,
            )

            grams = exploded_word_shingles(
                docs, "text", CONTAM_N, "g"
            ).distinct()
            docs = docs.join(
                bloom_contaminated_ids(grams, bloom, bloom_m, bloom_k),
                "doc_id",
                "anti",
            )
        docs.persist()
        docs.write.mode("overwrite").parquet(
            f"{retained_out}/batch={batch_id}"
        )
        update_dedup_index(spark_, docs, index_dir, snapshot=f"b{batch_id}")
        docs.unpersist()
        batch.unpersist()

    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
