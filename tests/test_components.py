"""Connected components vs a union-find oracle (chains, stars, random)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraph_spark.operators.components import (
    assign_components,
    connected_components,
)


def _oracle(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _run_cc(spark, nodes, edges):
    edf = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    got = {r.node: r.component for r in assign_components(ndf, edf).collect()}
    return got


@pytest.mark.parametrize(
    "edges,n_nodes",
    [
        ([("a", "b"), ("b", "c"), ("c", "d")], 4),                 # chain
        ([("hub", f"n{i}") for i in range(10)], 11),               # star
        ([("a", "b"), ("c", "d")], 5),                             # disjoint + isolate
        ([("a", "a"), ("a", "b")], 2),                             # self-loop
        ([], 3),                                                   # all isolated
    ],
)
def test_cc_basic_shapes(spark, edges, n_nodes):
    names = sorted({x for e in edges for x in e})
    while len(names) < n_nodes:
        names.append(f"iso{len(names)}")
    want = _oracle(names, edges)
    got = _run_cc(spark, names, edges)
    assert got == want


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        nodes = [f"v{i:03d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(20, 120))
        ]
        want = _oracle(nodes, edges)
        got = _run_cc(spark, nodes, edges)
        assert got == want, f"trial {trial}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=0, max_size=60
    )
)
def test_cc_property(spark, pairs):
    nodes = [f"n{i:02d}" for i in range(26)]
    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    want = _oracle(nodes, edges)
    got = _run_cc(spark, nodes, edges)
    assert got == want


def test_cc_compressed_ids_equal_string_path(spark):
    """The hash-compressed loop (8-byte shuffle keys) must produce exactly
    the string-path assignments, including the min-string labels."""
    rng = random.Random(17)
    nodes = [f"Type|entity {i:03d}" for i in range(80)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    fast = {
        (r.node, r.component)
        for r in connected_components(
            edf, compress_ids=True, min_compress_nodes=1
        ).collect()
    }
    slow = {(r.node, r.component) for r in connected_components(edf, compress_ids=False).collect()}
    assert fast == slow


def test_cc_long_chain_converges_fast(spark):
    # a 64-node path: alternating star rounds must converge in O(log n)
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(63)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    asg = connected_components(edf)
    comps = {r.component for r in asg.collect()}
    assert comps == {"c000"}
