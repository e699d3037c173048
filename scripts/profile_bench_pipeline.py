#!/usr/bin/env python
"""Stage-level wall profile of the bench.py kg_pipeline at bench scale.

Reproduces _pipeline_bench's exact setup (persisted corpus, warmed Python
workers, local[$SPARK_GRAFT_CPUS]) and then times each stage of build_kg
separately by materializing stage boundaries — the guide-§1 breakdown for
the headline query.  Separate from the frozen bench.py.

Usage: python scripts/profile_bench_pipeline.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from knowledgegraph_spark import get_spark
    from knowledgegraph_spark.corpus import pages_dataframe
    from knowledgegraph_spark.operators.components import assign_components
    from knowledgegraph_spark.operators.extraction import (
        extract_mentions_and_triples,
        mentions_of,
        triples_of,
    )
    from knowledgegraph_spark.operators.html_text import with_extracted_text
    from knowledgegraph_spark.operators.linking import (
        match_edges,
        mention_match_keys,
        node_key,
    )
    from knowledgegraph_spark.operators.merge import (
        canonical_mapping,
        fold_entities,
        resolve_and_fold_triples,
    )
    from knowledgegraph_spark.operators.skew import n_salts_for_max_rows

    spark = get_spark(
        "profile_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    pages = pages_dataframe(spark, n_pages, seed=42).persist()
    pages.count()
    extract_mentions_and_triples(with_extracted_text(pages.limit(256))).count()

    t: dict[str, float] = {}

    def clock(name):
        def deco(fn):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            r = fn()
            t[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            print(json.dumps({name: t[name]}), flush=True)
            return r

        return deco

    total0 = time.time()

    ext = extract_mentions_and_triples(with_extracted_text(pages))
    ext = clock("extract_persist")(lambda: ext.persist())
    clock("extract_count")(lambda: ext.count())

    mentions = mentions_of(ext)
    raw_triples = triples_of(ext)

    keys = mention_match_keys(mentions)
    edges = match_edges(keys)

    surface = (
        mentions.select("type", F.lower(F.trim(F.col("name"))).alias("norm_name"))
        .groupBy("type", "norm_name")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("node", node_key(F.col("type"), F.col("norm_name")))
    )
    surface = clock("surface")(lambda: surface.persist())
    clock("surface_count")(lambda: surface.count())

    n_salts = clock("auto_salts")(
        lambda: n_salts_for_max_rows(
            int(surface.agg(F.max("n_mentions").alias("mx")).collect()[0]["mx"] or 0)
        )
    )

    assignments = clock("cc")(
        lambda: assign_components(
            surface.select("node"), edges, nodes_distinct=True
        ).persist()
    )
    clock("cc_count")(lambda: assignments.count())

    entities = clock("fold_e")(
        lambda: fold_entities(mentions, assignments, n_salts=n_salts).persist()
    )
    clock("fold_e_count")(lambda: entities.count())

    mapping = clock("mapping")(
        lambda: canonical_mapping(
            mentions, assignments, canon=entities, surface=surface
        ).localCheckpoint(eager=True)
    )
    triples = resolve_and_fold_triples(raw_triples, mapping, n_salts=n_salts)
    clock("fold_t_count")(lambda: triples.count())

    n_raw = clock("raw_count")(
        lambda: ext.filter(F.col("kind") == "triple").count()
    )
    t["total"] = round(time.time() - total0, 3)
    t["n_salts"] = n_salts
    t["n_raw"] = n_raw
    t["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    main()
