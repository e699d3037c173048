"""Similarity search vs numpy oracles (brute-force + LSH recall)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.similarity import (
    ann_topk_lsh,
    cosine,
    embedding_near_dup_pairs,
    topk_cosine,
    topk_cosine_batch,
)

DIM = 16
N = 200


def _vecs(seed=3):
    rng = random.Random(seed)
    out = []
    for i in range(N):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        out.append((i, v))
    # plant a near-dup of vector 0
    v0 = out[0][1]
    out.append((N, [x + rng.gauss(0, 0.01) for x in v0]))
    return out


def _np_topk(vectors, q, k):
    M = np.array([v for _, v in vectors])
    qv = np.array(q)
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(range(len(vectors)), key=lambda i: (-sims[i], vectors[i][0]))
    return [vectors[i][0] for i in order[:k]]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(_vecs(), "vec_id long, embedding array<double>")


def test_topk_matches_numpy(spark, vec_df):
    vectors = _vecs()
    q = vectors[5][1]
    got = [r.vec_id for r in topk_cosine(vec_df, q, k=10).collect()]
    want = _np_topk(vectors, q, 10)
    assert got == want


def test_topk_plan_is_take_ordered(spark, vec_df):
    plan = topk_cosine(vec_df, _vecs()[0][1], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_batch_topk(spark, vec_df):
    vectors = _vecs()
    queries = spark.createDataFrame(
        [(i, vectors[i][1]) for i in (1, 2)], "query_id long, query_vec array<double>"
    )
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in topk_cosine_batch(vec_df, queries, k=3).collect()
    }
    for qid in (1, 2):
        want = _np_topk(vectors, vectors[qid][1], 3)
        assert [got[(qid, r)] for r in (1, 2, 3)] == want
    # a vector is its own nearest neighbor
    assert got[(1, 1)] == 1


def _planes(n, seed=7):
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(n)]


def test_ann_lsh_finds_planted_near_dup(spark, vec_df):
    vectors = _vecs()
    q = vectors[0][1]
    got = [r.vec_id for r in ann_topk_lsh(vec_df, q, _planes(4), k=5).collect()]
    assert 0 in got and N in got  # query vector and its planted near-dup


def test_embedding_near_dup_pairs(spark, vec_df):
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_pairs(vec_df, _planes(4), threshold=0.98).collect()
    }
    assert (0, N) in pairs
    assert pairs[(0, N)] > 0.99
