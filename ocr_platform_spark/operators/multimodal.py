"""Multimodal payload handling: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY.md S2 — the reference's MIME map and
category classification, ``ocr_backend/app/utils/gemini_ocr.py:10-91``,
re-expressed Spark-first).

Design
------
- **Type sniffing is pure column expressions** (magic bytes via binary
  ``substring`` comparisons — whole-stage codegen, no Python).
- **Container metadata** (image dimensions, audio sample rate/duration)
  is parsed from header bytes in a ``mapInPandas`` kernel — pure-Python
  parsers over the first KB of each payload, no media libraries needed.
- **Content features** (byte-histogram embedding) come from a vectorized
  numpy kernel; the 256-dim output is a real ``array<float>`` column that
  plugs straight into operators/ann.py (LSH buckets, cosine top-k).
- **Decode-dependent transforms** (pixel resize, audio resample, video
  frame extraction) need codecs this container doesn't ship. The Spark
  plumbing — schema, batching, partitioning — is real and tested; the
  codec call itself is STUBBED: it raises ``NotImplementedError`` unless
  ``fake=True`` selects the deterministic stand-in (clearly marked).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# --- media-type sniffing (column expressions; mirrors gemini_ocr.py:50-91) --

# (mime, category) by magic bytes; checked in order.
_MAGIC_RULES: list[tuple[int, bytes, str, str]] = [
    # (1-based offset, magic, mime, category)
    (1, b"\x89PNG\r\n\x1a\n", "image/png", "image"),
    (1, b"\xff\xd8\xff", "image/jpeg", "image"),
    (1, b"GIF8", "image/gif", "image"),
    (1, b"%PDF-", "application/pdf", "document"),
    (1, b"ID3", "audio/mpeg", "audio"),
    (1, b"OggS", "audio/ogg", "audio"),
    (5, b"ftyp", "video/mp4", "video"),
]


def media_mime(col: Column | str) -> Column:
    """MIME from magic bytes — JVM-side binary substring comparisons.
    RIFF containers disambiguate on the format tag at offset 9."""
    c = F.col(col) if isinstance(col, str) else col
    # One chained CASE in the SAME priority order as the Python twin
    # `_sniff_py` (RIFF family first, then _MAGIC_RULES first-match-wins) so
    # the expression and the kernel classify ambiguous payloads identically.
    riff = F.substring(c, 1, 4) == F.lit(b"RIFF")
    expr = F.when(riff & (F.substring(c, 9, 4) == F.lit(b"WEBP")), "image/webp").when(
        riff & (F.substring(c, 9, 4) == F.lit(b"WAVE")), "audio/wav"
    )
    for off, magic, mime, _cat in _MAGIC_RULES:
        expr = expr.when(F.substring(c, off, len(magic)) == F.lit(magic), mime)
    return expr.otherwise(F.lit("application/octet-stream"))


_MIME_CATEGORY = {
    "image/png": "image", "image/jpeg": "image", "image/gif": "image",
    "image/webp": "image", "audio/wav": "audio", "audio/mpeg": "audio",
    "audio/ogg": "audio", "video/mp4": "video", "application/pdf": "document",
}


def media_category(mime_col: Column | str) -> Column:
    """image|video|audio|document classification (gemini_ocr.py:70-91)."""
    c = F.col(mime_col) if isinstance(mime_col, str) else mime_col
    expr = F.lit("document")  # reference default category
    for mime, cat in _MIME_CATEGORY.items():
        expr = F.when(c == mime, cat).otherwise(expr)
    return expr


def with_media_type(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    m = media_mime(payload_col)
    return df.withColumn("mime", m).withColumn("category", media_category(F.col("mime")))


# --- header-metadata kernel (pure-Python parsers, mapInPandas) --------------


def parse_png_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    return None


def parse_jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """Scan JPEG segments for a SOFn marker carrying the frame dimensions."""
    if len(data) < 4 or data[:3] != b"\xff\xd8\xff":
        return None
    i = 2
    while i + 9 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > len(data):
            return None
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= len(data):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return w, h
            return None
        i += 2 + seglen
    return None


def parse_wav_meta(data: bytes) -> tuple[int, int] | None:
    """(sample_rate, duration_ms) from the fmt/data chunks."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    rate = None
    block_align = None
    duration_ms = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        clen = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(data):
            rate = struct.unpack("<I", data[i + 12 : i + 16])[0]
            block_align = struct.unpack("<H", data[i + 20 : i + 22])[0]
        elif cid == b"data" and rate and block_align:
            duration_ms = int(clen / block_align / rate * 1000)
        i += 8 + clen + (clen % 2)
    return (rate, duration_ms) if rate is not None else None


_META_SCHEMA = (
    "media_id string, mime string, category string, n_bytes long, "
    "width int, height int, sample_rate int, duration_ms int"
)


def extract_media_metadata(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """One row of typed metadata per payload. Sniffing/parsing happens in
    Arrow-batched Python over header bytes only (the kernel never copies
    the payload beyond slicing)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.operators.multimodal import (  # executor import
            _sniff_py, parse_jpeg_dims, parse_png_dims, parse_wav_meta,
        )

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(data) if data is not None else b""
                mime, cat = _sniff_py(data)
                w = h = rate = dur = None
                if mime == "image/png":
                    d = parse_png_dims(data)
                    w, h = d if d else (None, None)
                elif mime == "image/jpeg":
                    d = parse_jpeg_dims(data)
                    w, h = d if d else (None, None)
                elif mime == "audio/wav":
                    d = parse_wav_meta(data)
                    rate, dur = d if d else (None, None)
                rows.append((mid, mime, cat, len(data), w, h, rate, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "category", "n_bytes",
                    "width", "height", "sample_rate", "duration_ms",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(kernel, _META_SCHEMA)


def _sniff_py(data: bytes) -> tuple[str, str]:
    """Python twin of ``media_mime``/``media_category`` (kernel-side)."""
    if data[:4] == b"RIFF":
        if data[8:12] == b"WEBP":
            return "image/webp", "image"
        if data[8:12] == b"WAVE":
            return "audio/wav", "audio"
    for off, magic, mime, cat in _MAGIC_RULES:
        if data[off - 1 : off - 1 + len(magic)] == magic:
            return mime, cat
    return "application/octet-stream", "document"


# --- content features: byte-histogram embedding (numpy kernel) --------------


def with_byte_histogram(
    df: DataFrame, payload_col: str = "payload", out_col: str = "embedding", dim: int = 256
) -> DataFrame:
    """Append a normalized byte-frequency embedding (``array<float>``) —
    a deterministic, codec-free content signature that feeds the ANN /
    near-duplicate operators directly (operators/ann.py)."""

    def kernel(s: pd.Series) -> pd.Series:
        out = []
        for data in s:
            b = np.frombuffer(bytes(data) if data is not None else b"", dtype=np.uint8)
            hist = np.bincount(b, minlength=256)[:dim].astype(np.float64)
            total = hist.sum()
            if total > 0:
                hist /= total
            out.append(hist.astype(np.float32).tolist())
        return pd.Series(out)

    udf = F.pandas_udf(kernel, f"array<float>")
    return df.withColumn(out_col, udf(F.col(payload_col)))


# --- decode-dependent transforms (STUBBED codecs, real plumbing) ------------


class DecoderUnavailable(NotImplementedError):
    """Raised where a real codec (Pillow/ffmpeg/librosa) would be invoked.
    This container ships no media libraries; the Spark-side contract
    (schema, batching, determinism) is exercised via the ``fake=True``
    deterministic stand-in."""


def _fake_bytes(tag: str, key: str, n: int = 64) -> bytes:
    """Deterministic stand-in payload: sha256 stream keyed by (tag, key)."""
    out = b""
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}:{key}:{counter}".encode()).digest()
        counter += 1
    return out[:n]


_RESIZE_SCHEMA = "media_id string, width int, height int, payload binary"


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image resize over ``mapInPandas``. The pixel work is the stub; the
    distributed shape (id-preserving, per-batch, deterministic) is real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.operators.multimodal import DecoderUnavailable, _fake_bytes

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise DecoderUnavailable(
                        "image decode requires Pillow/libvips — not in this container"
                    )
                rows.append((mid, width, height, _fake_bytes("resize", f"{mid}:{width}x{height}")))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    return df.select(id_col, payload_col).mapInPandas(kernel, _RESIZE_SCHEMA)


_FRAME_SCHEMA = "media_id string, frame_index int, ts_ms int, payload binary"


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling (UDTF-shaped: N output rows per input video)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.operators.multimodal import DecoderUnavailable, _fake_bytes

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise DecoderUnavailable(
                        "video decode requires ffmpeg — not in this container"
                    )
                # deterministic frame count from payload length
                n = min(max_frames, max(1, len(bytes(data)) // 1024))
                for k in range(n):
                    rows.append((mid, k, k * every_ms, _fake_bytes("frame", f"{mid}:{k}")))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "ts_ms", "payload"])

    return df.select(id_col, payload_col).mapInPandas(kernel, _FRAME_SCHEMA)


# --- deterministic synthetic media corpus (fixtures; stdlib only) -----------


def synth_png(seed_key: str, width: int = 16, height: int = 8) -> bytes:
    """A real, decodable PNG (IHDR + zlib IDAT) with deterministic pixels."""
    raw = b""
    rnd = hashlib.sha256(seed_key.encode()).digest() * ((width * 3 + 16) // 32 + 2)
    for y in range(height):
        raw += b"\x00" + rnd[y : y + width * 3]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_jpeg(seed_key: str, width: int = 32, height: int = 24) -> bytes:
    """Header-valid JPEG (SOI + SOF0 with dims + EOI); dims parse, pixels fake."""
    sof = struct.pack(">HBHHB", 8 + 3 * 3, 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    body = hashlib.sha256(seed_key.encode()).digest()
    return b"\xff\xd8\xff\xe0\x00\x07JFIF\x00" + b"\xff\xc0" + sof + body + b"\xff\xd9"


def synth_wav(seed_key: str, rate: int = 8000, ms: int = 250) -> bytes:
    """A real PCM WAV with deterministic samples."""
    n = rate * ms // 1000
    samples = hashlib.sha256(seed_key.encode()).digest() * (n * 2 // 32 + 1)
    data = samples[: n * 2]
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_mp4(seed_key: str) -> bytes:
    body = hashlib.sha256(seed_key.encode()).digest() * 8
    return struct.pack(">I", 20) + b"ftypisom" + b"\x00\x00\x02\x00isom" + body


def media_corpus(spark, n: int, seed: int = 42) -> DataFrame:
    """n deterministic media rows cycling PNG/JPEG/WAV/MP4 (+ PDF-bytes)."""
    builders = [
        lambda k: synth_png(k, 16 + (hash_mod(k, 48)), 8 + hash_mod(k, 24)),
        lambda k: synth_jpeg(k, 32 + hash_mod(k, 64), 24 + hash_mod(k, 48)),
        lambda k: synth_wav(k, 8000, 125 + hash_mod(k, 500)),
        lambda k: synth_mp4(k),
        lambda k: b"%PDF-1.4\n" + hashlib.sha256(k.encode()).digest(),
    ]
    rows = []
    for i in range(n):
        key = f"media-{seed}-{i}"
        rows.append((f"m{i:06d}", builders[i % len(builders)](key)))
    return spark.createDataFrame(rows, "media_id string, payload binary")


def hash_mod(key: str, mod: int) -> int:
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "big") % mod
