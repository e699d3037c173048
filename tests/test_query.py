"""Query layer (semantic search / lookup / 1-hop / stats) over a built KG."""

import pytest

from knowledgegraph_spark.plans.pipeline import build_kg
from knowledgegraph_spark.query import (
    entity_details,
    one_hop,
    semantic_search,
    stats,
    with_embeddings,
)


@pytest.fixture(scope="module")
def kg(spark, pages_df):
    return build_kg(spark, pages_df)


def test_stats_counts(kg, corpus):
    from knowledgegraph_spark.corpus import oracle_entities, oracle_triples

    rows = {r.type: r.n for r in stats(kg.entities, kg.triples).collect()}
    want_by_type = {}
    for e in oracle_entities(corpus):
        want_by_type[e["type"]] = want_by_type.get(e["type"], 0) + 1
    for t, n in want_by_type.items():
        assert rows[t] == n
    assert rows["__relations__"] == len(oracle_triples(corpus))


def test_point_lookup(kg):
    e = kg.entities.filter("type='Person'").first()
    got = entity_details(kg.entities, e.name, "Person").collect()
    assert len(got) == 1 and got[0].name == e.name
    assert entity_details(kg.entities, "No Such Entity").count() == 0


def test_one_hop_directions(kg):
    t = kg.triples.first()
    out = one_hop(kg.triples, t.subj, limit=50).collect()
    assert any(r.direction == "out" and r.neighbor == t.obj for r in out)
    inc = one_hop(kg.triples, t.obj, limit=50).collect()
    assert any(r.direction == "in" and r.neighbor == t.subj for r in inc)


def test_semantic_search_self_top(kg):
    ents = with_embeddings(kg.entities)
    e = kg.entities.filter("type='Organization'").first()
    top = semantic_search(ents, e.name, k=3).collect()
    assert top[0].entity_name == e.name  # exact text → highest cosine
    assert semantic_search(ents, "", k=2).count() == 2  # zero-vector query: no crash


def test_two_hop_paths(kg):
    from knowledgegraph_spark.query import two_hop

    from pyspark.sql import functions as F

    t = kg.triples.first()
    paths = two_hop(kg.triples, t.subj, limit=10**6).collect()
    assert all(p.neighbor != t.subj for p in paths)
    # t.obj is a 1-hop neighbor: it appears as a mid iff it has any onward
    # (undirected) edge to a node other than the origin
    onward = kg.triples.filter(
        ((F.col("subj") == t.obj) & (F.col("obj") != t.subj))
        | ((F.col("obj") == t.obj) & (F.col("subj") != t.subj))
    ).count()
    assert (onward > 0) == any(p.mid == t.obj for p in paths)


def test_neighborhood_subgraph(kg):
    from knowledgegraph_spark.query import neighborhood_subgraph, one_hop

    t = kg.triples.first()
    sub = neighborhood_subgraph(kg.triples, t.subj).collect()
    # contains every edge incident to the node
    incident = [r for r in sub if r.subj == t.subj or r.obj == t.subj]
    assert len(incident) == one_hop(kg.triples, t.subj, limit=10**6).count()
    # and only edges whose endpoints are in the closed neighborhood
    nodes = {t.subj} | {r.obj for r in incident} | {r.subj for r in incident}
    assert all(r.subj in nodes and r.obj in nodes for r in sub)
