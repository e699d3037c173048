"""Multimodal columns: binary payloads + typed metadata, decode plumbing.

Large-scale training pipelines carry image/audio/video as opaque
``binary`` columns with typed metadata, decoding inside Arrow-batched
UDFs.  Everything Spark-side is real and tested: schema, partition-size
control, UDF signatures, Arrow batch shapes, and the mapInPandas
streaming contract (never materialize a whole partition of blobs in
memory).

Decode kernels: raster formats whose compression exists in the stdlib
are decoded for real — 24-bit BMP (BITMAPINFOHEADER, uncompressed),
binary PGM (P5), and 8-bit PNG (DEFLATE via stdlib ``zlib`` + numpy
scanline unfiltering) — exercising the full decode → pixel-stats
feature path with no codec libraries.  Only transform-coded formats
(JPEG-class image codecs, audio/video codecs) have no decoder in this
container and FALL BACK TO A STUB (deterministic fake features, clearly
marked); swap ``_decode_image_stub`` for a PIL/torchvision kernel on a
real cluster — no plan shape changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Pure-numpy decode of an uncompressed 24-bit BMP → HxWx3 uint8 (RGB).

    Supports the common BITMAPINFOHEADER layout: bottom-up rows, 4-byte
    row padding, BGR byte order, BI_RGB (no compression).  Returns None
    for any other BMP flavor (caller falls back to the stub).
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    flip = height > 0  # positive height = bottom-up row order
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row_bytes * h
    if len(payload) < need:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_pgm(payload: bytes) -> np.ndarray | None:
    """Pure-numpy decode of a binary PGM (P5) → HxWx3 uint8 (gray
    replicated to RGB so downstream features are format-agnostic)."""
    if len(payload) < 10 or payload[:2] != b"P5":
        return None
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (with optional '#' comment lines), then ONE whitespace byte, then raw
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(payload[start:pos])
    if len(fields) < 3:
        return None
    try:
        width, height, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if width <= 0 or height <= 0 or not (0 < maxval < 256):
        return None
    pos += 1  # the single whitespace byte after maxval
    if len(payload) < pos + width * height:
        return None
    gray = np.frombuffer(payload, dtype=np.uint8, count=width * height, offset=pos)
    if maxval != 255:
        gray = (gray.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return np.repeat(gray.reshape(height, width, 1), 3, axis=2)


def decode_png(payload: bytes) -> np.ndarray | None:
    """Pure-Python/numpy decode of an 8-bit non-interlaced PNG → HxWx3 uint8.

    PNG's only compression is DEFLATE, which is stdlib ``zlib`` — so unlike
    JPEG this format IS decodable without codec libraries: parse the chunk
    stream (IHDR → IDAT* → IEND), inflate, then undo the per-scanline
    filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Supports bit depth
    8 and color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA);
    gray replicates to RGB and alpha is dropped so downstream features are
    format-agnostic (same contract as decode_pgm).  Returns None for any
    other flavor (interlaced, paletted, 16-bit) — caller falls back.
    """
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if (
        channels is None or bit_depth != 8 or interlace != 0
        or width <= 0 or height <= 0
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    lines = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    filters, data = lines[:, 0], lines[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f = int(filters[y])
        cur = data[y].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-neighbor recurrence
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0  # left (reconstructed)
                b = prior[x]  # up
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
    px = out.reshape(height, width, channels)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px.copy()
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA → drop alpha


def pixel_features(pixels: np.ndarray) -> np.ndarray:
    """16-dim feature from an HxWx3 uint8 image: per-channel mean/std (6),
    luminance mean/std (2), 8-bin luminance histogram (8) — the
    deterministic stand-in for a model forward pass, computed from REAL
    decoded pixels."""
    px = pixels.astype(np.float64)
    lum = px.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    hist = hist / max(1, lum.size)
    return np.concatenate(
        [
            px.reshape(-1, 3).mean(axis=0) / 255.0,
            px.reshape(-1, 3).std(axis=0) / 255.0,
            [lum.mean() / 255.0, lum.std() / 255.0],
            hist,
        ]
    )


def _decode_image(payload: bytes | None) -> np.ndarray | None:
    """Feature kernel: REAL decode for uncompressed rasters (BMP/PGM),
    stub fallback for formats with no decoder in this container."""
    if payload is None:
        return None
    pixels = decode_bmp(payload)
    if pixels is None:
        pixels = decode_pgm(payload)
    if pixels is None:
        pixels = decode_png(payload)
    if pixels is not None:
        return pixel_features(pixels)
    return _decode_image_stub(payload)


def _decode_image_stub(payload: bytes | None) -> np.ndarray | None:
    """STUB decode kernel — deterministic fake feature from payload bytes.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) → resize →
    normalize → model forward.  Not available in this container
    (no image libs); the fake keeps determinism so the plumbing is
    testable end-to-end.
    """
    if payload is None:
        return None
    arr = np.frombuffer(payload[:1024], dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    out = np.zeros(FEATURE_DIM)
    idx = np.arange(arr.size) % FEATURE_DIM
    np.add.at(out, idx, arr)
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def image_features(media: DataFrame, batch_limit: int = 256) -> DataFrame:
    """Decode/feature-extract images via mapInPandas (Arrow-batched).

    The iterator contract streams Arrow record batches: peak memory is
    one batch of payloads, not a partition — the property that matters
    when payloads are MBs each and partitions are GBs.
    """
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if f is None else [float(x) for x in f]
                for f in (_decode_image(p) for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads (1→N UDTF shape).

    STUB kernel: "frames" are byte slices at fixed strides (a real kernel
    would use pyav/ffmpeg keyframe extraction).  Shape — explode one blob
    row into N frame rows inside mapInPandas — is the production shape.
    """
    src = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio decode stub with the same contract as image_features.

    Real kernel: soundfile/torchaudio decode → resample → fbank.
    """
    src = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if f is None else [float(x) for x in f]
                for f in (_decode_image_stub(p) for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
