"""Multimodal columns: binary payloads + typed metadata, decode plumbing.

Large-scale training pipelines carry image/audio/video as opaque
``binary`` columns with typed metadata, decoding inside Arrow-batched
UDFs.  This container has no codec libraries, so the DECODE KERNELS ARE
STUBBED (deterministic fake features, clearly marked) — but everything
Spark-side is real and tested: schema, partition-size control, UDF
signatures, Arrow batch shapes, and the mapInPandas streaming contract
(never materialize a whole partition of blobs in memory).

Swap ``_decode_image_stub`` for a PIL/torchvision kernel on a real
cluster; no plan shape changes.
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
