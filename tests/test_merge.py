"""Merge strategies (table-driven) + fold determinism under repartition."""

import pytest
from pyspark.sql import functions as F

from knowledgegraph_spark.config import (
    APPEND_UNIQUE,
    PRESERVE_EXISTING,
    REPLACE_ALWAYS,
    REPLACE_IF_BETTER,
)
from knowledgegraph_spark.operators.merge import merge_strategy_expr, upsert_entities


@pytest.mark.parametrize(
    "strategy,old,new,expected",
    [
        (PRESERVE_EXISTING, "a", "b", "a"),
        (PRESERVE_EXISTING, None, "b", "b"),
        (PRESERVE_EXISTING, "a", None, "a"),
        (REPLACE_ALWAYS, "a", "b", "b"),
        (REPLACE_ALWAYS, "a", None, "a"),
        (REPLACE_IF_BETTER, "short", "longer!", "longer!"),
        (REPLACE_IF_BETTER, "longest", "tiny", "longest"),
        (REPLACE_IF_BETTER, None, "x", "x"),
    ],
)
def test_scalar_strategies(spark, strategy, old, new, expected):
    df = spark.createDataFrame([(old, new)], "old string, new string")
    got = df.select(
        merge_strategy_expr(F.col("old"), F.col("new"), strategy).alias("out")
    ).collect()[0]["out"]
    assert got == expected


@pytest.mark.parametrize(
    "old,new,expected",
    [
        (["a", "b"], ["b", "c"], ["a", "b", "c"]),
        (None, ["x"], ["x"]),
        (["x"], None, ["x"]),
        (None, None, []),
    ],
)
def test_append_unique(spark, old, new, expected):
    df = spark.createDataFrame(
        [(old, new)], "old array<string>, new array<string>"
    )
    got = df.select(
        merge_strategy_expr(F.col("old"), F.col("new"), APPEND_UNIQUE).alias("out")
    ).collect()[0]["out"]
    assert got == expected


def test_upsert_entities_semantics(spark):
    existing = spark.createDataFrame(
        [("Person", "Alice Johnson", ["A. Johnson"], ["a@x.example"], None)],
        "type string, name string, aliases array<string>, emails array<string>, domain string",
    )
    incoming = spark.createDataFrame(
        [
            ("Person", "Alice Johnson", ["Ally J"], ["a2@x.example"], None),
            ("Organization", "Acme Corp", [], [], "acme.example"),
        ],
        "type string, name string, aliases array<string>, emails array<string>, domain string",
    )
    out = {
        (r.type, r.name): r.asDict()
        for r in upsert_entities(existing, incoming).collect()
    }
    alice = out[("Person", "Alice Johnson")]
    assert sorted(alice["aliases"]) == ["A. Johnson", "Ally J"]
    assert sorted(alice["emails"]) == ["a2@x.example", "a@x.example"]
    assert ("Organization", "Acme Corp") in out
    # idempotence: upserting the same incoming twice changes nothing
    again = {
        (r.type, r.name): r.asDict()
        for r in upsert_entities(
            upsert_entities(existing, incoming), incoming
        ).collect()
    }
    for k in out:
        a, b = out[k], again[k]
        for f in ("aliases", "emails"):
            assert sorted(a[f] or []) == sorted(b[f] or [])


def test_fold_order_invariance(spark, corpus, pages_df):
    """Shuffled input partitions ⇒ identical canonical output (SURVEY §5.3)."""
    from knowledgegraph_spark.plans.pipeline import build_kg

    r1 = build_kg(spark, pages_df, persist=False)
    r2 = build_kg(spark, pages_df.repartition(13).sortWithinPartitions("lang"), persist=False)
    t1 = {(r.subj, r.pred, r.obj) for r in r1.triples.collect()}
    t2 = {(r.subj, r.pred, r.obj) for r in r2.triples.collect()}
    assert t1 == t2
    e1 = {(r.name, r.type, tuple(r.aliases)) for r in r1.entities.collect()}
    e2 = {(r.name, r.type, tuple(r.aliases)) for r in r2.entities.collect()}
    assert e1 == e2
