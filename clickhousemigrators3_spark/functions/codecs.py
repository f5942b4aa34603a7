"""Pure-Python media codecs — real header encode/parse, no PIL/ffmpeg.

The container ships no image/audio libraries, but PNG/GIF/WAV containers are
simple enough to encode and parse with ``struct`` + ``zlib`` alone. This is
the "real codec" behind operators/multimodal.py: payloads are genuine valid
PNG/WAV files (a PNG written here opens in any viewer), and the parser reads
actual header bytes — so the multimodal queries test a true binary
encode → Arrow transfer → decode round trip, not a byte-stat fake.

Everything here is driver/executor-agnostic pure Python + numpy:
multimodal.py calls it inside Arrow-batched ``mapInPandas`` stages. The
pixel path is real too — ``decode_png_gray`` inverts all five PNG scanline
filters to a numpy array, ``resize_nearest`` is the standard pixel-center
nearest-neighbor kernel, and ``encode_png_gray`` re-emits a valid PNG — so
``mm_resize`` does genuine decode → resample → re-encode work, the same
dataflow a PIL/libvips swap-in would run.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type → sample channels (grayscale, rgb, palette, gray+a, rgba)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, gray: int = 0) -> bytes:
    """A complete, valid 8-bit grayscale PNG of the given dimensions with
    every pixel set to ``gray`` (filter byte 0 per scanline, zlib IDAT)."""
    if width < 1 or height < 1:
        raise ValueError("PNG dimensions must be >= 1")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([gray]) * width) * height
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray(pixels) -> bytes:
    """A complete, valid 8-bit grayscale PNG from a 2-D uint8 pixel array
    (filter byte 0 per scanline, zlib IDAT)."""
    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim != 2 or arr.shape[0] < 1 or arr.shape[1] < 1:
        raise ValueError("pixels must be a non-empty 2-D array")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a (h, w) uint8 array: concatenate
    IDAT chunks, inflate, and invert the per-scanline filters — all five
    standard types (None/Sub/Up/Average/Paeth, PNG spec §9), not just the
    filter-0 lines our own encoder writes."""
    hdr = parse_header(payload)
    if (
        hdr.get("fmt") != "png"
        or hdr.get("channels") != 1
        or hdr.get("bit_depth") != 8
    ):
        raise ValueError("decode_png_gray supports 8-bit grayscale PNG only")
    w, h = hdr["width"], hdr["height"]
    i, idat = 8, []
    while i + 8 <= len(payload):
        clen = struct.unpack(">I", payload[i : i + 4])[0]
        typ = payload[i + 4 : i + 8]
        if typ == b"IDAT":
            idat.append(payload[i + 8 : i + 8 + clen])
        elif typ == b"IEND":
            break
        i += 12 + clen
    raw = zlib.decompress(b"".join(idat))
    stride = w + 1
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        f = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, count=w, offset=1).astype(
            np.int32
        )
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up — vectorizable (no left-neighbor dependency)
            rec = (cur + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in the left px
            rec = np.empty(w, dtype=np.int32)
            a = 0
            for c in range(w):
                b = int(prev[c])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    cc = int(prev[c - 1]) if c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                a = (int(cur[c]) + pred) % 256
                rec[c] = a
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


def resize_nearest(pixels, dst_h: int, dst_w: int) -> np.ndarray:
    """Nearest-neighbor resample of a 2-D array: source index =
    floor((dst_index + 0.5) * src / dst), the standard pixel-center mapping
    (PIL's NEAREST)."""
    if dst_h < 1 or dst_w < 1:
        raise ValueError("target dimensions must be >= 1")
    arr = np.asarray(pixels)
    h, w = arr.shape
    rows = np.minimum(((np.arange(dst_h) + 0.5) * h / dst_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(dst_w) + 0.5) * w / dst_w).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def resize_bilinear(pixels, dst_h: int, dst_w: int) -> np.ndarray:
    """Bilinear resample of a 2-D array (align_corners=False convention:
    source coordinate = (dst + 0.5) * src/dst - 0.5, edge-clamped) —
    returns float64; round/cast at the call site."""
    if dst_h < 1 or dst_w < 1:
        raise ValueError("target dimensions must be >= 1")
    arr = np.asarray(pixels, dtype=np.float64)
    h, w = arr.shape
    ry = np.clip((np.arange(dst_h) + 0.5) * h / dst_h - 0.5, 0, h - 1)
    rx = np.clip((np.arange(dst_w) + 0.5) * w / dst_w - 0.5, 0, w - 1)
    y0 = np.floor(ry).astype(np.int64)
    x0 = np.floor(rx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ry - y0)[:, None]
    fx = (rx - x0)[None, :]
    top = arr[y0][:, x0] * (1 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (1 - fx) + arr[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def make_wav(
    n_samples: int, sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """A complete, valid PCM WAV (RIFF) file of silence."""
    if channels < 1 or sample_rate < 1 or bits % 8:
        raise ValueError("bad WAV parameters")
    block_align = channels * bits // 8
    data = bytes(n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """A complete, valid mono 16-bit PCM WAV from a 1-D int16 sample
    array."""
    arr = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    if arr.ndim != 1 or sample_rate < 1:
        raise ValueError("samples must be 1-D; sample_rate >= 1")
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit PCM WAV to ``(sample_rate, int16 array)`` by
    walking the RIFF chunks (same walk as parse_header, plus the payload)."""
    hdr = parse_header(payload)
    if (
        hdr.get("fmt") != "wav"
        or hdr.get("bit_depth") != 16
        or hdr.get("channels") != 1
    ):
        raise ValueError("decode_wav_pcm16 supports mono 16-bit PCM only")
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"data":
            raw = payload[i + 8 : i + 8 + clen]
            return hdr["sample_rate"], np.frombuffer(raw, dtype="<i2")
        i += 8 + clen + (clen & 1)
    raise ValueError("WAV has no data chunk")


def resample_linear(samples, n_out: int) -> np.ndarray:
    """Linear-interpolation resample of a 1-D signal to ``n_out`` samples
    (same pixel-center/align_corners=False mapping as resize_bilinear,
    edge-clamped). Returns float64; round/cast at the call site."""
    if n_out < 1:
        raise ValueError("n_out must be >= 1")
    arr = np.asarray(samples, dtype=np.float64)
    n = arr.shape[0]
    pos = np.clip((np.arange(n_out) + 0.5) * n / n_out - 0.5, 0, n - 1)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = pos - i0
    return arr[i0] * (1 - frac) + arr[i1] * frac


def parse_header(payload: bytes) -> dict:
    """Parse a media container header into typed metadata. Supported: PNG,
    GIF87a/89a, JPEG (SOF dims), WAV. Unknown payloads fall back to byte
    stats (fmt='bin') — the pre-round-3 stub behavior, kept so arbitrary
    binaries still produce a row instead of an error.

    Returned keys (absent → None at the call site): fmt, width, height,
    channels, bit_depth, sample_rate, n_samples, duration_ms, n_bytes.
    """
    n = len(payload)
    out: dict = {"fmt": "bin", "n_bytes": n}
    if n >= 24 and payload[:8] == PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        out.update(
            fmt="png",
            width=w,
            height=h,
            bit_depth=bit_depth,
            channels=_PNG_CHANNELS.get(color_type),
        )
        return out
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        out.update(fmt="gif", width=w, height=h, bit_depth=8)
        return out
    if n >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # SOF0..SOF15 (minus DHT/JPG/DAC): precision, h, w, channels
                prec = payload[i + 4]
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                out.update(
                    fmt="jpeg", width=w, height=h, bit_depth=prec,
                    channels=payload[i + 9],
                )
                return out
            i += 2 + seg_len
        out["fmt"] = "jpeg"  # SOI seen but no SOF before truncation
        return out
    if n >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12
        channels = rate = bits = None
        data_len = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                _, channels, rate, _, block_align, bits = struct.unpack(
                    "<HHIIHH", payload[i + 8 : i + 24]
                )
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        out.update(fmt="wav", channels=channels, sample_rate=rate, bit_depth=bits)
        if data_len is not None and channels and bits:
            n_samples = data_len // (channels * bits // 8)
            out["n_samples"] = n_samples
            if rate:
                out["duration_ms"] = n_samples * 1000 // rate
        return out
    # unknown container: deterministic byte stats (legacy stub surface)
    out["first_byte"] = payload[0] if n else 0
    out["byte_sum_mod"] = sum(payload) % 65536
    return out


# --- SGV1: a minimal indexed video container -------------------------------
# Real multimodal pipelines frame-sample mp4/webm via ffmpeg, which this
# container stands in for WITHOUT faking the pipeline shape: frames are
# genuine PNGs behind a length-indexed directory, so a sampler can seek to
# frame i and decode ONLY that frame — the property that makes
# frame-sampling cheap at scale (decode cost ∝ sampled frames, not video
# length). Layout:
#
#   b"SGV1" | uint32 n_frames | uint32 fps | n_frames × uint32 frame_len
#   | frame 0 PNG bytes | frame 1 PNG bytes | …
#
# (big-endian, like the PNG chunks it carries).

SGV_SIG = b"SGV1"


def encode_video_sgv(frames, fps: int) -> bytes:
    """A complete SGV1 container from a list of 2-D uint8 frames."""
    blobs = [encode_png_gray(f) for f in frames]
    head = SGV_SIG + struct.pack(">II", len(blobs), int(fps))
    index = b"".join(struct.pack(">I", len(b)) for b in blobs)
    return head + index + b"".join(blobs)


def parse_video_header(payload: bytes) -> dict:
    """``{n_frames, fps, frame_offsets}`` from the SGV1 directory — no
    frame bytes touched."""
    if len(payload) < 12 or payload[:4] != SGV_SIG:
        raise ValueError("not an SGV1 container")
    n_frames, fps = struct.unpack(">II", payload[4:12])
    need = 12 + 4 * n_frames
    if len(payload) < need:
        raise ValueError("SGV1 directory truncated")
    lens = struct.unpack(f">{n_frames}I", payload[12:need])
    offsets = []
    pos = need
    for ln in lens:
        offsets.append((pos, ln))
        pos += ln
    if pos > len(payload):
        raise ValueError("SGV1 frame data truncated")
    return {"n_frames": n_frames, "fps": fps, "frame_offsets": offsets}


def decode_video_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode ONLY frame ``idx`` (directory seek + one PNG decode) — other
    frames' bytes are never inflated, the on-demand property the
    frame-sample operator's cost model rests on."""
    hdr = parse_video_header(payload)
    if not 0 <= idx < hdr["n_frames"]:
        raise IndexError(f"frame {idx} of {hdr['n_frames']}")
    pos, ln = hdr["frame_offsets"][idx]
    return decode_png_gray(payload[pos : pos + ln])
