"""Structured Streaming twins (SURVEY.md §2.7 notes the reference is
batch-only; §7.3/§7.4 adds the streaming extension for ``events``).

Each query runs the *same logical plan* as its batch twin in
operators/events.py, but through ``readStream`` with a watermark, a
``Trigger.AvailableNow`` drain of the fixture parquet, and a memory sink.
The callables block until the stream drains, then return the sink table —
so the driver's rows-only check exercises the full streaming path.

Scale: at 100 TB/day the same code runs continuously — watermark bounds
state, ``maxFilesPerTrigger`` paces ingestion (the streaming analogue of the
reference's ``insert_interval`` throttle, C2); the memory sink becomes a
parquet/Kafka sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_path
from ..registry import register


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema from the batch reader (includes the nanos→ntz ts conversion
    # contract: streaming reads the raw long and applies the same transform)
    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # readStream needs a directory source; the fixture is a single file —
    # stream the parent dir with a glob filter selecting just this table
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require event-time to be TIMESTAMP (ltz); the fixture's ts
    # arrives as long nanos or TIMESTAMP_NTZ depending on how the parquet was
    # written. Session tz is pinned UTC so wall-clock values match the batch
    # twin's ntz values exactly in either case.
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert stream.columns == batch.columns
    return stream


def _drain_to_memory(agg: DataFrame, output_mode: str) -> str:
    name = f"stream_sink_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


@register("stream_tumbling_hourly", None)  # streaming → rows-only check
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ev_tumbling_hourly: watermarked tumbling 1-hour
    window counts per event_type, drained with AvailableNow into a memory
    sink. Late data beyond the 2-hour watermark would be dropped in
    continuous operation; with a full drain the result equals the batch
    twin (asserted in tests/test_streaming.py)."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )
    # complete mode: append would withhold the trailing windows the
    # watermark hasn't closed when the drain ends — complete emits every
    # window, making the full-drain result equal the batch twin
    name = _drain_to_memory(agg, "complete")
    return spark.table(name).orderBy("hour_start", "event_type")


@register("stream_user_running_totals", None)  # streaming → rows-only check
def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful aggregation without time windows: per-user event
    totals in update mode — the state-store-backed shape of a continuously
    maintained feature table."""
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    name = _drain_to_memory(agg, "complete")
    return spark.table(name).orderBy("user_id")


@register("stream_session_window", None)  # streaming → rows-only check
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` stateful streaming aggregation: per-user
    sessions closed by a 30-minute inactivity gap — the streaming twin of
    the batch lag-gap-cumsum in operators/events.py. Watermark bounds the
    session state store; sessions not yet closed by the watermark when the
    AvailableNow drain ends are withheld (append mode), which the test
    accounts for by asserting emitted ⊆ batch."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    name = _drain_to_memory(agg, "append")
    return spark.table(name).orderBy("user_id", "session_start")


@register("stream_stateful_anomaly_flags", None)  # custom state → rows-only
def stream_stateful_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running mean of ``value`` kept in the state store; each batch
    emits events whose value exceeds 3× the running mean seen so far (a
    streaming anomaly detector no built-in aggregation expresses).

    State is a 2-tuple (count, sum) per user — constant memory per key; the
    GroupStateTimeout would evict idle users in continuous operation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)

    def flag(key, pdfs, state: GroupState):
        # vectorized running mean (opt round 14, guide §4.2 — the old
        # per-row iterrows loop was the row-at-a-time anti-pattern):
        # cumsum is the same sequential left-to-right double accumulation
        # as the loop's `total += value`, so every emitted mean and the
        # carried (cnt, total) state are bit-identical
        (user_id,) = key
        cnt, total = state.get if state.exists else (0, 0.0)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            v = pdf["value"].to_numpy(dtype=np.float64)
            if len(v) == 0:
                continue
            # seed the cumsum with the carried total so every partial sum
            # is the loop's exact add sequence ((total + v0) + v1) + …,
            # not total + (v0 + v1 + …) — float addition isn't associative
            csum = np.cumsum(np.concatenate(([total], v)))
            total_before = csum[:-1]
            cnt_before = cnt + np.arange(len(v), dtype=np.int64)
            mean = np.divide(
                total_before,
                cnt_before,
                out=np.zeros_like(total_before),
                where=cnt_before > 0,
            )
            hit = (cnt_before > 0) & (v > 3.0 * mean)
            if hit.any():
                eids = pdf["event_id"].to_numpy()[hit]
                for eid, val, m in zip(eids, v[hit], mean[hit]):
                    rows.append((int(user_id), int(eid), float(val), float(m)))
            cnt += len(v)
            total = float(csum[-1])
        state.update((cnt, total))
        yield pd.DataFrame(rows, columns=["user_id", "event_id", "value", "running_mean"])

    out = stream.groupBy("user_id").applyInPandasWithState(
        flag,
        outputStructType="user_id long, event_id long, value double, running_mean double",
        stateStructType="cnt long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = _drain_to_memory(out, "append")
    return spark.table(name).orderBy("user_id", "event_id")


@register("stream_dedup_within_watermark", None)  # streaming → rows-only check
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on a content
    key — the in-flight twin of the batch exact-dedup operator. State holds
    only keys younger than the watermark (bounded memory at any stream
    volume), the property plain dropDuplicates lacks on streams. Here the
    key is (user_id, event_type, value) — a semantic-duplicate guard."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "value"])
    )
    agg = deduped.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_unique_events"))
    name = _drain_to_memory(agg, "complete")
    return spark.table(name).orderBy("user_id")


@register("stream_stream_interval_join", None)  # streaming → rows-only check
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same user's
    clicks in the preceding 10 minutes — both sides watermarked so Spark can
    bound the buffered state (clicks older than purchase-watermark − 10 min
    are evicted). The canonical funnel/attribution join; at scale the state
    store holds only the interval's worth of the click stream per user.
    Batch twin equality is asserted in tests/test_streaming.py."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")
    name = _drain_to_memory(joined, "append")
    return spark.table(name).orderBy("purchase_id", "click_id")


def batch_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_stream_interval_join (not registered — used by
    tests to assert the streaming result equals the batch plan)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")
            )
            & (F.col("click_ts") < F.col("purchase_ts")),
        )
        .select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")
        .orderBy("purchase_id", "click_id")
    )


@register("stream_rollup_hourly_finalized", None)  # streaming → rows-only
def stream_rollup_hourly_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production continuous-rollup pattern: watermarked tumbling
    aggregation in APPEND mode to a parquet sink — only windows the
    watermark has CLOSED are ever written, so the sink is an
    immutable, exactly-once, incrementally-growing rollup table (the
    streaming counterpart of rollup_maintenance's batch refresh; a real
    deployment points this at the same partitioned layout). The
    AvailableNow drain emits every closed window; the trailing ~2 h of
    windows stay in state awaiting later data, which the batch-equality
    test accounts for (emitted ⊆ batch twin, equality on closed rows)."""
    import tempfile

    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
        )
    )
    out_dir = tempfile.mkdtemp(prefix="stream_rollup_")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).orderBy("hour_start", "event_type")


@register("stream_bitmap_daily_uniques", None)  # streaming → rows-only
def stream_bitmap_daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per day, streaming: the mergeable-bitmap twin
    of the batch ``ch_group_bitmap_weekly_users`` — per (closed day
    window, bucket) a ``bitmap_construct_agg`` partial accumulates in
    stream state, append mode emits only watermark-closed windows, and the
    final projection OR-merges nothing further (day grain) so
    ``bitmap_count`` + SUM gives the exact daily uniques. This is the
    AggregatingMergeTree-materialized-view pattern with exactly-once
    append semantics: late data inside the 2-day watermark re-aggregates
    one day's bitmap, never a rescan."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withColumn("bkt", F.bitmap_bucket_number(F.col("user_id")))
        .withColumn("pos", F.bitmap_bit_position(F.col("user_id")))
        .withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"), "bkt")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            F.bitmap_count(F.col("bm")).alias("n"),
        )
    )
    name = _drain_to_memory(agg, "append")
    return (
        spark.table(name)
        .groupBy("day")
        .agg(F.sum("n").cast("long").alias("exact_users"))
        .orderBy("day")
    )
