"""Dedup operators vs pure-Python oracles (MinHash, SimHash, LSH recall)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_near_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different text about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "  The   Quick Brown fox jumps over the lazy dog "),  # normalized dup of 0
    (5, "spark engines power completely different text about"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_hash64(value: str, seed: int = 0) -> int:
    h = hashlib.md5(f"{seed}|{value}".encode()).hexdigest()
    return int(h[:15], 16)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_duplicates(spark, docs_df):
    groups = {r.fingerprint: r for r in exact_duplicates(docs_df).collect()}
    assert len(groups) == 1
    g = next(iter(groups.values()))
    assert g.keep_id == 0
    assert sorted(g.member_ids) == [0, 3, 4]


def test_minhash_matches_python_oracle(spark, docs_df):
    got = {r.id: list(r.sig) for r in minhash_signatures(docs_df, num_hashes=4).collect()}
    for doc_id, text in DOCS:
        want = [min(_py_hash64(s, i) for s in _py_shingles(text)) for i in range(4)]
        assert got[doc_id] == want, doc_id


def test_minhash_identical_docs_same_sig(spark, docs_df):
    got = {r.id: tuple(r.sig) for r in minhash_signatures(docs_df, num_hashes=8).collect()}
    assert got[0] == got[3] == got[4]
    assert got[0] != got[2]


def test_lsh_recall_on_near_dups(spark, docs_df):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs_df, num_hashes=16, bands=8).collect()}
    # exact dups always collide in every band; near-dup 0-1 shares 6/7 shingles
    assert (0, 3) in pairs and (0, 4) in pairs and (3, 4) in pairs
    assert (0, 1) in pairs  # high-jaccard near-dup caught by banding
    assert (0, 2) not in pairs


def test_ngram_jaccard_values(spark, docs_df):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs_df, threshold=0.0, max_shingle_df=None).collect()
    }
    a, b = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[1][1])
    want = len(a & b) / len(a | b)
    assert abs(pairs[(0, 1)] - want) < 1e-9
    assert pairs[(0, 3)] == 1.0


def test_simhash_dups_and_distance(spark, docs_df):
    sigs = {r.id: r.simhash for r in simhash(docs_df).collect()}
    assert sigs[0] == sigs[3] == sigs[4]
    ham01 = bin(sigs[0] ^ sigs[1]).count("1")
    ham02 = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def test_simhash_near_pairs(spark, docs_df):
    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(docs_df).collect()}
    assert (0, 3) in pairs and (0, 4) in pairs


def test_shingle_df_guard(spark, docs_df):
    # with a df cap of 1, every shared shingle is dropped → no pairs
    assert ngram_jaccard_pairs(docs_df, threshold=0.0, max_shingle_df=1).count() == 0
