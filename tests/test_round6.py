"""Round-6 optimization gates: the rewrites must be invisible in results.

Each optimization that changed an operator's internals gets a focused
equivalence or plan-shape test here:

  * tokens()/shingle_array(): lambda F.filter → array_remove;
  * mention_match_keys(): ArrayFilter HOF → explode + codegen'd Filter;
  * connected_components(): input checkpoint + one-round-early stop on
    already-canonical (hub-star) edge sets;
  * pipeline surface: distinct → groupBy carrying n_mentions, feeding the
    salt decision (n_salts_for_max_rows ≡ pick_n_salts);
  * canonical_mapping(surface=): structurally no mention-stream re-scan
    (the round-5 fusion, gated per the round-5 verdict).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


TRICKY_TEXTS = [
    "plain words here",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\r\nmixed",
    "many    internal     spaces",
    "",
    " ",
    "one",
    "a b",  # shorter than a 3-shingle
    "ends with punctuation .",
]


def _tricky_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY_TEXTS)], "doc_id long, text string"
    )


def test_tokens_matches_lambda_filter(spark):
    """array_remove(split, '') must equal the old lambda filter exactly."""
    from knowledgegraph_spark.operators.textstats import tokens

    df = _tricky_df(spark)
    old = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    rows = df.select(
        tokens(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        assert r.new == r.old


def test_shingle_array_matches_lambda_filter(spark):
    from knowledgegraph_spark.operators.dedup import shingle_array
    from knowledgegraph_spark.operators.dedup import normalized_text
    from knowledgegraph_spark.operators.textstats import tokens

    # ≥3 tokens only: sequence(0, size-3) is descending below 3 tokens and
    # slice then rejects start 0 — a pre-existing property of BOTH the old
    # and new formulation (the corpus never produces such docs), not part
    # of this round's rewrite.
    df = _tricky_df(spark).filter(
        F.size(F.array_remove(F.split(F.trim("text"), r"\s+"), "")) >= 3
    )
    toks = tokens(normalized_text(F.col("text")))
    idx = F.sequence(F.lit(0), F.size(toks) - 3)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    old = F.filter(F.array_distinct(sh), lambda s: s != "")
    rows = df.select(
        shingle_array(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        assert r.new == r.old


def _mention_frame(spark):
    return spark.createDataFrame(
        [
            ("u1", "Alice Johnson", "Person", "a@x.example", None),
            ("u1", "Acme Corp", "Organization", None, "acme.example"),
            ("u2", "Alice Johnson", "Person", None, None),
            ("u2", "No Rules Here", "UnknownType", None, None),  # all-null rule hits
        ],
        "url string, name string, type string, email string, domain string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01"))).withColumn(
        "ord", F.lit(0)
    )


def test_match_keys_plan_has_no_interpreted_lambda(spark):
    """The key explode must stay on the codegen path: no higher-order
    function (lambdafunction) anywhere in the physical plan."""
    from knowledgegraph_spark.operators.linking import mention_match_keys

    keys = mention_match_keys(_mention_frame(spark))
    plan = keys._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan, plan


def test_match_keys_equal_old_hof_formulation(spark):
    """Explode-then-filter returns exactly the rows the old
    filter-then-explode produced — including dropping mentions with no
    applicable rule."""
    from knowledgegraph_spark.config import MATCHING_RULES
    from knowledgegraph_spark.operators.linking import (
        _RULE_SOURCE_COL,
        _key_space,
        _norm,
        mention_match_keys,
        with_node,
    )

    m = with_node(_mention_frame(spark))
    rule_structs = []
    for etype, rules in MATCHING_RULES.items():
        for rule in rules:
            src_col = _RULE_SOURCE_COL.get(rule["field"])
            if src_col is None or src_col not in m.columns:
                continue
            rule_structs.append(
                F.when(
                    (F.col("type") == etype) & F.col(src_col).isNotNull(),
                    F.struct(
                        F.concat_ws(
                            "|",
                            F.col("type"),
                            F.lit(_key_space(rule["field"])),
                            _norm(F.col(src_col)),
                        ).alias("match_key"),
                        F.lit(rule["priority"]).alias("priority"),
                        F.lit(float(rule["confidence"])).alias("confidence"),
                    ),
                )
            )
    old = (
        m.select(
            "node",
            F.explode(
                F.filter(F.array(*rule_structs), lambda s: s.isNotNull())
            ).alias("k"),
        )
        .select(
            "node",
            F.col("k.match_key").alias("match_key"),
            F.col("k.priority").alias("priority"),
            F.col("k.confidence").alias("confidence"),
        )
        .distinct()
    )
    new = mention_match_keys(_mention_frame(spark))
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b and len(a) > 0


def test_cc_canonical_star_input_converges_correctly(spark):
    """The one-round-early stop: already-canonical hub-star edges (what
    match_edges emits) must still yield exact components."""
    from knowledgegraph_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("e", "d"), ("f", "d")], "src string, dst string"
    )
    out = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert out == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("d", "d"), ("e", "d"), ("f", "d"),
    }


def test_cc_non_canonical_input_still_iterates(spark):
    """A chain (NOT a canonical star) must survive the early-stop check."""
    from knowledgegraph_spark.operators.components import connected_components

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    out = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert out == {(f"n{i}", "n0") for i in range(9)}


def test_salt_decision_matches_probe(spark):
    """n_salts_for_max_rows (surface-count path) must reproduce
    pick_n_salts (probe path) on the same data, incl. both thresholds."""
    from knowledgegraph_spark.operators.skew import (
        n_salts_for_max_rows,
        pick_n_salts,
    )

    for n_rows, n_keys in [(3000, 3), (4000, 4000)]:
        df = spark.range(n_rows).select(
            (F.col("id") % n_keys).cast("string").alias("k")
        )
        mx = df.groupBy("k").count().agg(F.max("count")).collect()[0][0]
        assert pick_n_salts(df, ["k"]) == n_salts_for_max_rows(int(mx))
    # threshold edges of the decision rule itself
    assert n_salts_for_max_rows(1_999_999) == 0
    assert n_salts_for_max_rows(2_000_000) >= 2
    assert n_salts_for_max_rows(10**9) == 64  # max_salts clamp


def test_canonical_mapping_with_surface_never_scans_mentions(spark):
    """Structural fusion gate (round-5 verdict item 3): with canon+surface
    given, canonical_mapping must not touch the mention stream at all —
    proven by passing mentions=None."""
    from knowledgegraph_spark.operators.merge import canonical_mapping

    surface = spark.createDataFrame(
        [("Person", "alice johnson", "Person|alice johnson")],
        "type string, norm_name string, node string",
    )
    asg = spark.createDataFrame(
        [("Person|alice johnson", "Person|alice johnson")],
        "node string, component string",
    )
    canon = spark.createDataFrame(
        [("Person|alice johnson", "Alice Johnson")], "component string, name string"
    )
    out = canonical_mapping(None, asg, canon=canon, surface=surface).collect()
    assert [(r.type, r.norm_name, r.canonical) for r in out] == [
        ("Person", "alice johnson", "Alice Johnson")
    ]


def test_pipeline_passes_surface_to_mapping():
    """Source-level gate that the fusion stays wired: both pipeline
    entrypoints must call canonical_mapping with surface=."""
    import inspect

    from knowledgegraph_spark.plans import pipeline

    src_build = inspect.getsource(pipeline.build_kg)
    src_run = inspect.getsource(pipeline.run_pipeline)
    assert "surface=surface" in src_build
    assert "surface=surface" in src_run
    # and the surface must carry the fused salt-probe counts
    assert 'F.count("*").alias("n_mentions")' in src_build
    assert 'F.count("*").alias("n_mentions")' in src_run


def test_node_key_type_vocabulary_has_no_separator():
    """node = type|norm_name must be injective over (type, norm_name):
    no extractor type value (or matching-rule entity type) may contain
    the '|' separator (round-5 advice item 1 — the fused surface table
    depends on this bijection)."""
    from knowledgegraph_spark.config import MATCHING_RULES
    from knowledgegraph_spark.operators.extraction import _pattern_table

    types = set(MATCHING_RULES)
    for _pat, handler, _tag, _lit in _pattern_table():
        pass  # handlers emit types from the closed sets below
    types |= {
        "Person", "Organization", "Repository", "Issue", "CodeChangeRequest",
        "Branch", "Team", "Project", "Topic", "Event",
    }
    assert all("|" not in t for t in types), sorted(t for t in types if "|" in t)


def test_upsert_one_sided_seen_with_attrless_legacy_frame(spark):
    """Round-5 advice item 3: an existing frame that lacks the attr
    column entirely must not raise when the incoming side carries the
    Seen* origin keys — the incoming value and keys win."""
    from knowledgegraph_spark.operators.merge import upsert_entities

    existing = spark.createDataFrame(
        [("Person", "Alice Johnson", ["A. J."], ["a@x.example"], None, ["u0"])],
        "type string, name string, aliases array<string>, emails array<string>,"
        " domain string, sources array<string>",
    )
    incoming = spark.createDataFrame(
        [
            (
                "Person", "Alice Johnson", [], [], None, ["u1"],
                "Acme", "2024-02-01 00:00:00", "u1", 3,
            )
        ],
        "type string, name string, aliases array<string>, emails array<string>,"
        " domain string, sources array<string>, worksAt string,"
        " worksAtSeenTs string, worksAtSeenUrl string, worksAtSeenOrd int",
    ).withColumn("worksAtSeenTs", F.to_timestamp("worksAtSeenTs"))
    out = upsert_entities(existing, incoming).collect()
    assert len(out) == 1
    row = out[0]
    assert row.worksAt == "Acme"
    assert row.worksAtSeenUrl == "u1" and row.worksAtSeenOrd == 3
    assert sorted(row.sources) == ["u0", "u1"]


def test_sparse_ledger_modulus_recovery_verified(spark, tmp_path):
    """Round-5 verdict item 4 / advice item 2, sparse power-of-two case:
    a modulus-64 ledger whose occupied buckets are all < 32 loses its
    meta; the dir-based guess (32) happens to be a CONSISTENT relabeling
    (h%32 == h%64 whenever h%64 < 32), and the new verification must
    prove that consistency against the stored rows — and resume must
    skip every ledgered url under the adopted modulus."""
    import os

    from pyspark.sql import Row

    from knowledgegraph_spark.config import PAGES_SCHEMA
    from knowledgegraph_spark.corpus import generate_corpus
    from knowledgegraph_spark.plans.pipeline import run_pipeline
    from knowledgegraph_spark.sources.catalog import Catalog

    c = generate_corpus(60, seed=7)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)

    urls = pages.select("url").distinct()
    led = urls.select(
        "url",
        F.lit("a").alias("session_id"),
        F.lit("ok").alias("status"),
        F.current_timestamp().alias("processed_at"),
        F.pmod(F.xxhash64("url"), F.lit(64)).cast("int").alias("bucket"),
    ).filter(F.col("bucket") < 32)
    pre = {r.url for r in led.select("url").collect()}
    assert len(pre) > 5  # the fixture must actually exercise the sparse case
    cat.write(led, "checkpoint_ledger", partition_by=["bucket"],
              meta={"n_buckets": 64, "partition_col": "bucket"})
    os.remove(os.path.join(os.path.realpath(cat.path("checkpoint_ledger")),
                           "_kg_meta.json"))

    cat2 = run_pipeline(spark, pages, wh, session_id="b")
    meta = cat2.get_meta("checkpoint_ledger")
    assert meta is not None
    n_rec = int(meta["n_buckets"])
    led2 = cat2.read("checkpoint_ledger")
    # the adopted modulus is VERIFIED-consistent with every stored row
    bad = led2.filter(
        F.col("bucket") != F.pmod(F.xxhash64("url"), F.lit(n_rec)).cast("int")
    ).count()
    assert bad == 0
    # no ledgered url was re-processed under the adopted layout
    re_done = led2.filter(F.col("session_id") == "b").select("url").distinct()
    assert {r.url for r in re_done.collect()}.isdisjoint(pre)
    # and all urls are ledgered exactly once overall
    assert led2.select("url").distinct().count() == urls.count()


def test_mixed_modulus_ledger_fails_loudly(spark, tmp_path):
    """Round-5 advice item 2, the unrepairable case: a legacy
    NON-power-of-two layout (or mixed moduli) with lost meta fits no
    candidate modulus; resume must refuse loudly (pointing at
    admin.compact_ledger) instead of silently mis-pruning."""
    import os

    import pytest as _pytest
    from pyspark.sql import Row

    from knowledgegraph_spark.config import PAGES_SCHEMA
    from knowledgegraph_spark.corpus import generate_corpus
    from knowledgegraph_spark.plans.pipeline import run_pipeline
    from knowledgegraph_spark.sources.catalog import Catalog

    c = generate_corpus(40, seed=9)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    led = pages.select("url").distinct().select(
        "url",
        F.lit("a").alias("session_id"),
        F.lit("ok").alias("status"),
        F.current_timestamp().alias("processed_at"),
        F.pmod(F.xxhash64("url"), F.lit(48)).cast("int").alias("bucket"),
    )
    cat.write(led, "checkpoint_ledger", partition_by=["bucket"],
              meta={"n_buckets": 48, "partition_col": "bucket"})
    os.remove(os.path.join(os.path.realpath(cat.path("checkpoint_ledger")),
                           "_kg_meta.json"))
    with _pytest.raises(ValueError, match="compact_ledger"):
        run_pipeline(spark, pages, wh, session_id="b")


def test_catalog_heal_prefers_legacy_generation(spark, tmp_path):
    """Round-5 advice item 4: a crash in the legacy-migration window
    (real dir renamed to gen-legacy*, new gen written, link never landed)
    must roll BACK to the legacy dir — the last durably committed state —
    not commit the in-flight write by newest mtime."""
    import os
    import time

    from knowledgegraph_spark.sources.catalog import Catalog

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    cat = Catalog(spark, wh)
    old = spark.createDataFrame([(1, "committed")], "id long, v string")
    new = spark.createDataFrame([(2, "in-flight")], "id long, v string")
    # simulate the crash window by hand: no link, two gens, legacy older
    old.write.parquet(os.path.join(wh, "t.gen-legacyaaaa0000"))
    time.sleep(1.1)  # make the in-flight gen strictly newer by mtime
    new.write.parquet(os.path.join(wh, "t.gen-bbbb1111"))
    healed = Catalog(spark, wh)  # init heal runs here
    rows = healed.read("t").collect()
    assert [(r.id, r.v) for r in rows] == [(1, "committed")]
    assert not os.path.isdir(os.path.join(wh, "t.gen-bbbb1111"))


def test_quiet_daemon_module_resolves_on_workers(spark):
    """The configured daemon module must be importable and a UDF stage
    must actually run through it."""
    import importlib.util

    assert (
        spark.conf.get("spark.python.daemon.module")
        == "knowledgegraph_spark.quiet_daemon"
    )
    assert importlib.util.find_spec("knowledgegraph_spark.quiet_daemon")
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint parser rejects
    def _plus1(s):
        return s + 1

    plus1 = pandas_udf(_plus1, "long")
    assert spark.range(100).select(plus1("id")).count() == 100
