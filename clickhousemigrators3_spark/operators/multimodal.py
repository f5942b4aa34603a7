"""Multimodal-column operators (SURVEY.md §7.3 / BASELINE north-star).

Pattern: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Decode / feature-extract / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The codec is REAL pure Python
(functions/codecs.py): payloads synthesized here are genuine valid PNG/WAV
files, and the decode stage parses actual container headers — so these
queries exercise a true binary encode → Arrow transfer → decode round trip.
A PIL/libvips/ffmpeg swap-in would replace only the pixel/sample math.

The fixtures carry no binary column, so payloads are derived per doc: the
metadata/frame queries use ``encode(text, 'utf-8')`` (giving octet_length
oracles), the codec queries synthesize PNG/WAV with dimensions that are
deterministic functions of ``doc_id`` (giving exact header-value oracles).

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


def _media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthesized REAL media payload: even doc_ids become
    valid grayscale PNGs, odd doc_ids valid PCM WAVs, parameters derived
    deterministically from doc_id (so header values are SQL-predictable).
    Synthesis runs executor-side in Arrow batches — the driver never sees a
    payload byte, same as reading a real binary column from parquet."""
    from ..functions.codecs import make_png, make_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    payloads.append(
                        make_png(16 + i % 64, 16 + (i // 64) % 64, gray=i % 256)
                    )
                else:
                    payloads.append(
                        make_wav(
                            256 + i % 512,
                            sample_rate=8000 + (i % 8) * 1000,
                            channels=1 + (i // 2) % 2,
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(synth, schema="doc_id long, payload binary")


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


@register(
    "mm_feature_extract",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS fmt,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(16 + doc_id % 64 AS BIGINT) END AS width,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(16 + (doc_id // 64) % 64 AS BIGINT) END AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS BIGINT)
               AS bit_depth,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1
                ELSE 1 + (doc_id // 2) % 2 END AS BIGINT) AS channels,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(8000 + (doc_id % 8) * 1000 AS BIGINT)
           END AS sample_rate,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((256 + doc_id % 512) * 1000
                          // (8000 + (doc_id % 8) * 1000) AS BIGINT)
           END AS duration_ms
    FROM documents ORDER BY doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata feature extraction with a REAL codec: synthesized valid
    PNG/WAV payloads (see _media_payloads) flow through Arrow as binary, and
    the decode stage parses actual container headers (functions/codecs.py —
    PNG IHDR, RIFF fmt/data walk). The oracle recomputes every header field
    from the doc_id formulas, so a bug in either the encoder or the parser
    breaks parity. This is the schema/batch plumbing a CLIP- or
    mel-spectrogram-style extractor drops into unchanged."""
    from ..functions.codecs import parse_header

    src = _media_payloads(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdrs = [parse_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [h["fmt"] for h in hdrs],
                    "width": pd.array([h.get("width") for h in hdrs], dtype="Int64"),
                    "height": pd.array([h.get("height") for h in hdrs], dtype="Int64"),
                    "bit_depth": pd.array(
                        [h.get("bit_depth") for h in hdrs], dtype="Int64"
                    ),
                    "channels": pd.array(
                        [h.get("channels") for h in hdrs], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [h.get("sample_rate") for h in hdrs], dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        [h.get("duration_ms") for h in hdrs], dtype="Int64"
                    ),
                }
            )

    return src.mapInPandas(
        extract,
        schema=(
            "doc_id long, fmt string, width long, height long, bit_depth long,"
            " channels long, sample_rate long, duration_ms long"
        ),
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


@register(
    "mm_resize",
    """
    WITH p AS (
      SELECT doc_id,
             CAST(16 + (doc_id * 7) % 80 AS BIGINT) AS src_h,
             CAST(16 + doc_id % 80 AS BIGINT) AS src_w
      FROM documents),
    d AS (
      SELECT doc_id, src_h, src_w,
             CAST(GREATEST(FLOOR(src_h * LEAST(64.0 / src_h, 64.0 / src_w,
                                               1.0)), 1) AS BIGINT) AS dst_h,
             CAST(GREATEST(FLOOR(src_w * LEAST(64.0 / src_h, 64.0 / src_w,
                                               1.0)), 1) AS BIGINT) AS dst_w
      FROM p)
    SELECT doc_id, src_h, src_w, dst_h, dst_w,
           (CAST(FLOOR(0.5 * src_h / dst_h) AS BIGINT) * 31
            + CAST(FLOOR(0.5 * src_w / dst_w) AS BIGINT) * 7
            + doc_id) % 256 AS corner_px
    FROM d ORDER BY doc_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize with a REAL codec + pixel round trip: synthesize a valid
    PNG per doc with a deterministic gradient pattern
    ``px(r, c) = (31r + 7c + doc_id) % 256``, decode the pixel grid
    (all-filter PNG unfilter → numpy), nearest-neighbor resample into a
    64×64 box (aspect preserved, pixel-center mapping), re-encode a genuine
    PNG at the new dimensions, and emit dims by re-parsing the re-encoded
    bytes. ``corner_px`` is the resampled (0,0) pixel read back from the
    DECODED re-encoded image — the oracle recomputes it from the pattern
    formula at the mapped source coordinate, so encoder, decoder, and
    resample kernel must all agree for the hash to hold.

    Scale: embarrassingly parallel Python codec work — worth one narrow
    round-robin repartition so a single input split (one small parquet
    file) doesn't serialize the whole CPU-bound loop onto one core; batch
    size bounded by arrow.maxRecordsPerBatch so executor memory holds
    ~batch x payload."""
    import numpy as np

    from ..functions.codecs import (
        decode_png_gray,
        encode_png_gray,
        parse_header,
        resize_nearest,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    box = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                h, w = 16 + (i * 7) % 80, 16 + i % 80
                r_ix, c_ix = np.meshgrid(
                    np.arange(h), np.arange(w), indexing="ij"
                )
                src_px = ((31 * r_ix + 7 * c_ix + i) % 256).astype(np.uint8)
                src = encode_png_gray(src_px)
                hdr = parse_header(src)
                h, w = hdr["height"], hdr["width"]
                scale = min(box / h, box / w, 1.0)
                nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
                resized = resize_nearest(decode_png_gray(src), nh, nw)
                out_bytes = encode_png_gray(resized)
                out = parse_header(out_bytes)
                corner = int(decode_png_gray(out_bytes)[0, 0])
                rows.append((i, h, w, out["height"], out["width"], corner))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_h", "src_w", "dst_h", "dst_w", "corner_px",
                ],
            )

    return d.mapInPandas(
        resize,
        schema=(
            "doc_id long, src_h long, src_w long, dst_h long, dst_w long, "
            "corner_px long"
        ),
    ).orderBy("doc_id")


@register(
    "mm_audio_resample",
    """
    WITH p AS (
      SELECT doc_id,
             CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS src_rate,
             CAST(256 + doc_id % 512 AS BIGINT) AS n_in
      FROM documents),
    d AS (
      SELECT doc_id, src_rate, n_in,
             CAST(n_in * 16000 // src_rate AS BIGINT) AS n_out
      FROM p),
    m AS (
      SELECT doc_id, src_rate, n_in, n_out,
             GREATEST(LEAST((CAST(n_out // 2 AS DOUBLE) + 0.5) * n_in / n_out
                            - 0.5, CAST(n_in - 1 AS DOUBLE)), 0.0) AS pos
      FROM d)
    SELECT doc_id, src_rate, n_in, n_out,
           CAST(ROUND(((CAST(((CAST(FLOOR(pos) AS BIGINT) * 37 + doc_id)
                              % 2000) - 1000 AS DOUBLE))
                         * (1.0 - (pos - FLOOR(pos)))
                 + (CAST(((LEAST(CAST(FLOOR(pos) AS BIGINT) + 1, n_in - 1)
                           * 37 + doc_id) % 2000) - 1000 AS DOUBLE))
                   * (pos - FLOOR(pos))) * 2 * n_out, 0) AS BIGINT)
             AS mid_q,
           TRUE AS rt_ok
    FROM m ORDER BY doc_id
    """,
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resample with a REAL codec + sample round trip: synthesize a
    mono 16-bit PCM WAV per doc with a deterministic sawtooth waveform
    ``s(i) = ((37i + doc_id) % 2000) - 1000`` at ``8000 + (doc_id%8)*1000``
    Hz, decode the PCM, linear-interpolate to 16 kHz (pixel-center mapping,
    the resize_bilinear twin in 1-D), re-encode a genuine WAV at 16 kHz, and
    emit the output length by re-parsing the re-encoded bytes.
    ``mid_q`` is the resampled midpoint taken from the FLOAT resample
    output (pre-quantization), rescaled by 2·n_out (the interpolation
    fraction's denominator) to a mathematically-integral value —
    nearest-integer rounding is engine-robust where fixed-decimal ROUND of
    exact .5 boundaries is not (see mm_resize_bilinear). The oracle
    recomputes that interpolation from the waveform formula, so the
    decoder, RIFF walk, and resample kernel must agree on it. The
    encode→decode round trip of wav2 is verified VALUE-exactly by
    ``rt_ok``: every decoded int16 sample of the re-encoded WAV is
    compared against the quantized resample output inside the codec
    domain (exact integer equality, no cross-engine float), and the
    oracle pins the column TRUE.

    Scale: embarrassingly parallel; same round-robin spread as mm_resize."""
    import numpy as np

    from ..functions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        parse_header,
        resample_linear,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    dst_rate = 16000

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rate = 8000 + (i % 8) * 1000
                n_in = 256 + i % 512
                saw = ((np.arange(n_in, dtype=np.int64) * 37 + i) % 2000
                       - 1000).astype(np.int16)
                src = encode_wav_pcm16(saw, rate)
                in_rate, pcm = decode_wav_pcm16(src)
                n_out = len(pcm) * dst_rate // in_rate
                out = resample_linear(pcm, n_out)
                q = np.clip(np.rint(out), -32768, 32767).astype(np.int16)
                wav2 = encode_wav_pcm16(q, dst_rate)
                hdr2 = parse_header(wav2)
                mid = float(out[len(out) // 2])
                # value-exact round trip: decode the re-encoded WAV and
                # compare EVERY int16 sample against the quantized output
                rt_rate, pcm2 = decode_wav_pcm16(wav2)
                rt_ok = bool(
                    rt_rate == dst_rate
                    and len(pcm2) == len(q)
                    and (pcm2 == q).all()
                )
                rows.append(
                    (i, in_rate, len(pcm), hdr2["n_samples"], mid, rt_ok)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_rate", "n_in", "n_out", "mid_sample",
                    "rt_ok",
                ],
            )

    out_df = d.mapInPandas(
        resample,
        schema=(
            "doc_id long, src_rate long, n_in long, n_out long, "
            "mid_sample double, rt_ok boolean"
        ),
    )
    # rescale to the mathematically-integral grid before rounding (see
    # docstring) — engine-robust where fixed-decimal rounding is not
    return (
        out_df.withColumn(
            "mid_q",
            F.round(F.col("mid_sample") * 2 * F.col("n_out"), 0).cast("long"),
        )
        .drop("mid_sample")
        .orderBy("doc_id")
    )


@register(
    "mm_resize_bilinear",
    """
    WITH p AS (
      SELECT doc_id,
             CAST(16 + (doc_id * 7) % 80 AS BIGINT) AS src_h,
             CAST(16 + doc_id % 80 AS BIGINT) AS src_w
      FROM documents),
    d AS (
      SELECT doc_id, src_h, src_w,
             CAST(GREATEST(FLOOR(src_h * LEAST(64.0 / src_h, 64.0 / src_w,
                                               1.0)), 1) AS BIGINT) AS dst_h,
             CAST(GREATEST(FLOOR(src_w * LEAST(64.0 / src_h, 64.0 / src_w,
                                               1.0)), 1) AS BIGINT) AS dst_w
      FROM p),
    m AS (
      SELECT doc_id, src_h, src_w, dst_h, dst_w,
             GREATEST(LEAST(0.5 * src_h / dst_h - 0.5,
                            CAST(src_h - 1 AS DOUBLE)), 0.0) AS ry,
             GREATEST(LEAST(0.5 * src_w / dst_w - 0.5,
                            CAST(src_w - 1 AS DOUBLE)), 0.0) AS rx
      FROM d),
    g AS (
      SELECT doc_id, src_h, src_w, dst_h, dst_w, ry, rx,
             CAST(FLOOR(ry) AS BIGINT) AS y0,
             LEAST(CAST(FLOOR(ry) AS BIGINT) + 1, src_h - 1) AS y1,
             CAST(FLOOR(rx) AS BIGINT) AS x0,
             LEAST(CAST(FLOOR(rx) AS BIGINT) + 1, src_w - 1) AS x1
      FROM m)
    SELECT doc_id, src_h, src_w, dst_h, dst_w,
           CAST(ROUND((
             (1 - (ry - y0)) * ((1 - (rx - x0))
                 * CAST((31 * y0 + 7 * x0 + doc_id) % 256 AS DOUBLE)
               + (rx - x0)
                 * CAST((31 * y0 + 7 * x1 + doc_id) % 256 AS DOUBLE))
             + (ry - y0) * ((1 - (rx - x0))
                 * CAST((31 * y1 + 7 * x0 + doc_id) % 256 AS DOUBLE)
               + (rx - x0)
                 * CAST((31 * y1 + 7 * x1 + doc_id) % 256 AS DOUBLE))
           ) * 4 * dst_h * dst_w, 0) AS BIGINT) AS corner_q
    FROM g ORDER BY doc_id
    """,
)
def mm_resize_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear twin of mm_resize: same gradient-pattern PNG decode, but
    the resample kernel is edge-clamped bilinear (resize_bilinear —
    align_corners=False). ``corner_q`` is the blend of the four pattern
    pixels around the mapped (0,0) source coordinate, RESCALED to an exact
    integer: the interpolation fractions have denominators 2·dst_h and
    2·dst_w, so blend × 4·dst_h·dst_w is mathematically integral —
    rounding to the nearest integer is then engine-robust, unlike a
    fixed-decimal ROUND whose exact .5 boundaries Spark (binary-value
    rounding) and DuckDB (shortest-decimal rounding) resolve differently.
    The oracle recomputes the identical blend from the pattern formula.

    Scale: identical posture to mm_resize (map-only, round-robin spread)."""
    import numpy as np

    from ..functions.codecs import (
        decode_png_gray,
        encode_png_gray,
        resize_bilinear,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    box = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                h, w = 16 + (i * 7) % 80, 16 + i % 80
                r_ix, c_ix = np.meshgrid(
                    np.arange(h), np.arange(w), indexing="ij"
                )
                src_px = ((31 * r_ix + 7 * c_ix + i) % 256).astype(np.uint8)
                scale = min(box / h, box / w, 1.0)
                nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
                out = resize_bilinear(
                    decode_png_gray(encode_png_gray(src_px)), nh, nw
                )
                rows.append((i, h, w, nh, nw, float(out[0, 0])))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_h", "src_w", "dst_h", "dst_w", "corner_px",
                ],
            )

    out = d.mapInPandas(
        resize,
        schema=(
            "doc_id long, src_h long, src_w long, dst_h long, dst_w long, "
            "corner_px double"
        ),
    )
    # rescale to the mathematically-integral grid before rounding: see the
    # docstring — fixed-decimal rounding of boundary doubles is
    # engine-divergent, nearest-integer of an ~integral value is not
    return (
        out.withColumn(
            "corner_q",
            F.round(
                F.col("corner_px") * 4 * F.col("dst_h") * F.col("dst_w"), 0
            ).cast("long"),
        )
        .drop("corner_px")
        .orderBy("doc_id")
    )


@register(
    "mm_video_frame_sample",
    """
    WITH p AS (
      SELECT doc_id,
             CAST(4 + doc_id % 9 AS BIGINT) AS n_frames,
             CAST(8 + doc_id % 5 AS BIGINT) AS h,
             CAST(8 + doc_id % 3 AS BIGINT) AS w
      FROM documents WHERE doc_id < 300),
    f AS (
      SELECT doc_id, n_frames, h, w,
             unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx
      FROM p),
    y AS (
      SELECT doc_id, n_frames, frame_idx, h, w,
             unnest(generate_series(0, h - 1)) AS yy
      FROM f),
    px AS (
      SELECT doc_id, n_frames, frame_idx, yy, w,
             unnest(generate_series(0, w - 1)) AS xx
      FROM y)
    SELECT doc_id, n_frames, frame_idx,
           CAST((17 * frame_idx + doc_id) % 256 AS BIGINT) AS corner_px,
           CAST(SUM((17 * frame_idx + 31 * yy + 7 * xx + doc_id) % 256)
                AS BIGINT) AS sum_px
    FROM px
    GROUP BY doc_id, n_frames, frame_idx
    ORDER BY doc_id, frame_idx
    """,
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling over a REAL indexed container: synthesize an
    SGV1 video per doc (4..12 genuine PNG frames behind a length
    directory, gradient pattern ``px(f,y,x) = (17f+31y+7x+doc_id) % 256``),
    then sample every 3rd frame — the directory seek decodes ONLY the
    sampled frames (functions/codecs.py decode_video_frame), which is the
    property that makes frame-sampling affordable at scale: decode cost ∝
    sampled frames, not video length. ``corner_px`` and the exact integer
    ``sum_px`` are read from the DECODED pixels, so the container walk,
    the PNG decode, and the sampling stride all have to agree with the
    oracle's closed-form pattern.

    Scale: map-only mapInPandas over the same round-robin spread as
    mm_resize (CPU-bound codec work across cores); the fps/n_frames
    directory read costs O(bytes of header), never a full decode."""
    import numpy as np

    from ..functions.codecs import decode_video_frame, encode_video_sgv

    d = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 300
    )
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n_frames = 4 + i % 9
                h, w = 8 + i % 5, 8 + i % 3
                yy, xx = np.mgrid[0:h, 0:w]
                video = encode_video_sgv(
                    [
                        ((17 * f + 31 * yy + 7 * xx + i) % 256).astype(
                            np.uint8
                        )
                        for f in range(n_frames)
                    ],
                    fps=24,
                )
                for f in range(0, n_frames, 3):
                    frame = decode_video_frame(video, f)
                    rows.append(
                        (
                            i,
                            n_frames,
                            f,
                            int(frame[0, 0]),
                            int(frame.astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "frame_idx", "corner_px", "sum_px",
                ],
            )

    return d.mapInPandas(
        sample,
        schema=(
            "doc_id long, n_frames long, frame_idx long, corner_px long, "
            "sum_px long"
        ),
    ).orderBy("doc_id", "frame_idx")


@register(
    "mm_audio_frame_energy",
    """
    WITH p AS (
      SELECT doc_id, CAST(256 + doc_id % 512 AS BIGINT) AS n_in
      FROM documents),
    idx AS (
      SELECT doc_id, n_in,
             unnest(generate_series(0, CAST(n_in - 1 AS BIGINT))) AS i
      FROM p),
    fr AS (
      SELECT doc_id, i // 128 AS f,
             CAST(((37 * i + doc_id) % 2000) - 1000 AS BIGINT) AS v
      FROM idx WHERE i < (n_in // 128) * 128),
    en AS (
      SELECT doc_id, f, SUM(v * v) AS e FROM fr GROUP BY 1, 2),
    en2 AS (
      SELECT doc_id, f, e, MAX(e) OVER (PARTITION BY doc_id) AS me
      FROM en)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(CASE WHEN f = 0 THEN e END) AS BIGINT) AS e0,
           CAST(MAX(e) AS BIGINT) AS emax,
           CAST(MIN(CASE WHEN e = me THEN f END) AS BIGINT) AS fmax
    FROM en2 GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio energy over REAL decoded PCM — the VAD-style
    feature-extract step a speech-data pipeline gates on: synthesize the
    same deterministic sawtooth WAV as mm_audio_resample
    (``s(i) = ((37i + doc_id) % 2000) - 1000``), decode it through the
    genuine RIFF walk, split into non-overlapping 128-sample frames
    (dropping the partial tail — the documented contract), and emit per
    doc the frame count, frame-0 energy, max frame energy, and the FIRST
    frame index achieving that max. Energy = Σ s² of int16 samples —
    exactly integral in int64, so the cross-engine comparison is
    value-exact with zero float surface; the oracle recomputes the sums
    from the waveform formula, so the decoder and the framing must agree
    with it sample-for-sample.

    Scale: embarrassingly parallel (one doc per row through the
    sanctioned Arrow codec class, RoundRobin-spread like mm_resize);
    decode cost is linear in samples, output is 5 small ints per doc."""
    import numpy as np

    from ..functions.codecs import decode_wav_pcm16, encode_wav_pcm16

    FRAME = 128
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)

    def frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rate = 8000 + (i % 8) * 1000
                n_in = 256 + i % 512
                saw = ((np.arange(n_in, dtype=np.int64) * 37 + i) % 2000
                       - 1000).astype(np.int16)
                _rate, pcm = decode_wav_pcm16(encode_wav_pcm16(saw, rate))
                n_frames = len(pcm) // FRAME
                fr = pcm[: n_frames * FRAME].astype(np.int64).reshape(
                    n_frames, FRAME
                )
                en = (fr * fr).sum(axis=1)
                rows.append(
                    (i, n_frames, int(en[0]), int(en.max()),
                     int(en.argmax()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "e0", "emax", "fmax"],
            )

    return d.mapInPandas(
        frame_energy,
        schema="doc_id long, n_frames long, e0 long, emax long, fmax long",
    ).orderBy("doc_id")
