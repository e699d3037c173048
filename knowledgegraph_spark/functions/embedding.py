"""Deterministic local text embedding (feature-hashing) as an Arrow UDF.

Replaces the reference's network embedders (ollama_embedder.py:12-51 HTTP
calls; embedder.py:12-26 HuggingFace mean pooling) with a deterministic,
dependency-free stand-in: hashed bag-of-tokens with signed feature
hashing, L2-normalized — the classic "hashing trick" embedding.  Not a
semantic model, but it is a *real* vectorized pipeline component with the
exact shape (StringType → ArrayType(FloatType), model-free, executor-local,
Arrow-batched) that a production sentence-transformer UDF would have; swap
the body for a broadcast ONNX/torch model on a real cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def embed_text_py(text: str | None, dim: int = DEFAULT_DIM) -> list[float] | None:
    """Pure-Python reference implementation (unit tests / oracle)."""
    if text is None:
        return None
    v = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        d = hashlib.md5(tok.encode()).digest()
        idx = int.from_bytes(d[:4], "little") % dim
        sign = 1.0 if d[4] & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return [float(x) for x in v]


def _embed_batch(texts: pd.Series) -> pd.Series:
    return pd.Series([embed_text_py(t) for t in texts], dtype="object")


def embedding(col: Column, dim: int = DEFAULT_DIM) -> Column:
    """Column expression: deterministic embedding of a text column."""
    udf = F.pandas_udf(_embed_batch, T.ArrayType(T.FloatType()))
    return udf(col)
