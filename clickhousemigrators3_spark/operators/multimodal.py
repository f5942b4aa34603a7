"""Multimodal-column operators (SURVEY.md §7.3 / BASELINE north-star).

Pattern: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Decode / feature-extract / frame-sample run
as Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing (schema,
batch shape, partitioning) is real; the actual codec call is STUBBED behind
an import-try (the image/audio libs aren't in this container) with a
deterministic fake so tests are stable. Swap ``_decode_stub`` for a real
PIL/ffmpeg call and nothing else changes.

The fixtures carry no binary column, so payloads are derived as
``encode(text, 'utf-8')`` — which also gives the metadata query a DuckDB
oracle (octet_length).

Scale: mapInPandas streams Arrow batches through Python — ~10-100× the
throughput of row-at-a-time UDFs; batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py) so executor
memory is independent of corpus size. Payload columns prune away for any
query not touching them (columnar parquet).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a derived binary payload + typed metadata struct."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: the real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``. Deterministic fake: byte stats.
    """
    try:
        import PIL.Image  # noqa: F401 — not in this container

        raise NotImplementedError("real image decode not wired up yet")
    except ImportError:
        pass
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else 0,
        "byte_sum_mod": sum(payload) % 65536,
    }


@register(
    "mm_binary_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata via Arrow-batched ``mapInPandas`` — the
    smallest real multimodal pipeline: binary in, typed scalars out. The
    oracle checks the byte accounting end-to-end through the Python stage."""
    src = _payloads(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    out = src.mapInPandas(extract, schema="doc_id long, n_bytes long, mime string")
    return out.orderBy("doc_id")


@register("mm_feature_extract", None)  # stubbed decode → rows-only check
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: mapInPandas batch →
    fixed-dim float feature vector per document (deterministic stub in place
    of a real model/codec). Schema/batch plumbing is exactly what a CLIP- or
    mel-spectrogram-style extractor needs. The vector stays an
    ``array<float>`` through the Python stage; the output boundary projects
    the fixed dims to scalar columns (external result comparators can't sort
    list-typed cells)."""
    src = _payloads(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda p: [
                    float(v)
                    for v in (
                        _decode_stub(p)["n_bytes"] % 256,
                        _decode_stub(p)["first_byte"],
                        _decode_stub(p)["byte_sum_mod"] % 256,
                    )
                ]
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    vecs = src.mapInPandas(extract, schema="doc_id long, features array<float>")
    return vecs.select(
        "doc_id",
        F.col("features")[0].alias("f0"),
        F.col("features")[1].alias("f1"),
        F.col("features")[2].alias("f2"),
    ).orderBy("doc_id")


@register(
    "mm_frame_sample",
    """
    WITH p AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               LEAST(4, GREATEST(octet_length(encode(text)) // 64, 1)) AS nf
        FROM documents
    ), s AS (
        SELECT doc_id, n, nf, GREATEST(n // nf, 1) AS stride FROM p
    ), f AS (
        SELECT doc_id, n, stride,
               CAST(unnest(range(0, nf)) AS INT) AS frame_idx
        FROM s
    )
    SELECT doc_id, frame_idx,
           CAST(LEAST(64, GREATEST(n - frame_idx * stride, 0)) AS INT)
               AS frame_bytes
    FROM f ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: each payload explodes into
    ≤4 evenly-spaced fixed-size "frames" (chunks) — one row per frame, the
    fan-out shape of real frame extraction. mapInPandas may emit more rows
    than it consumes; output partitioning stays aligned with input splits."""
    src = _payloads(spark, sf_dir)
    frame_size, max_frames = 64, 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = min(max_frames, max(n // frame_size, 1))
                stride = max(n // n_frames, 1)
                for i in range(n_frames):
                    chunk = bytes(payload[i * stride : i * stride + frame_size])
                    rows.append((int(doc_id), i, len(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return src.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_bytes int"
    ).orderBy("doc_id", "frame_idx")


@register("mm_resize", None)  # stubbed decode → rows-only check
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: decode payload → (h, w) from header bytes →
    downscale to fit a 64×64 box (aspect preserved) → re-encoded payload.
    The pixel work is a deterministic stub (no codec libs in this
    container, see _decode_stub); the Spark surface — binary in/binary out
    mapInPandas, Arrow batches, 1:1 row mapping, metadata columns typed —
    is exactly what a real PIL/libvips resize stage needs. Scale: pure map,
    no shuffle; batch size bounded by arrow.maxRecordsPerBatch so executor
    memory holds ~batch×payload bytes."""
    src = _payloads(spark, sf_dir)
    box = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                # fake dims from header bytes (deterministic stand-in for a
                # real decode): 1..256 each
                h = (payload[0] if n > 0 else 0) + 1
                w = (payload[1] if n > 1 else 0) + 1
                scale = min(box / h, box / w, 1.0)
                nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
                # fake re-encode: truncate payload proportionally to area ratio
                out_len = max(int(n * (nh * nw) / (h * w)), 1) if n else 0
                rows.append(
                    (int(doc_id), h, w, nh, nw, bytes(payload[:out_len]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_h", "src_w", "dst_h", "dst_w", "payload"],
            )

    return src.mapInPandas(
        resize,
        schema="doc_id long, src_h int, src_w int, dst_h int, dst_w int, payload binary",
    ).orderBy("doc_id")
