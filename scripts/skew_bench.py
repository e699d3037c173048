#!/usr/bin/env python
"""Skew-salting bench point: the same entity fold over a deliberately
skewed mention table, single-phase vs the adaptively picked salt count.

Synthetic table: one head entity carrying ``head_rows`` mentions (each
from a distinct url — the web-scale head-org shape) plus a uniform tail.
Times ``fold_entities`` (provenance_cap=64, the 100-TB posture) at
n_salts=0 and at the ``skew.pick_n_salts`` choice, materializing through
the noop writer so the full aggregation executes without sink IO.

Prints one JSON line and appends a row to BENCH/BASELINE.md.

Usage: python scripts/skew_bench.py [head_rows] [tail_entities] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    head_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    tail_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from knowledgegraph_spark import get_spark
    from knowledgegraph_spark.operators.linking import with_node
    from knowledgegraph_spark.operators.merge import fold_entities
    from knowledgegraph_spark.operators.skew import pick_n_salts

    spark = get_spark(
        "skew-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    head = spark.range(head_rows).select(
        F.concat(F.lit("https://head/"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("warc_ts"),
        F.lit(0).alias("ord"),
        F.lit("Head Corp").alias("name"),
        F.lit("Organization").alias("type"),
        F.lit(None).cast("string").alias("email"),
        F.lit("head.example").alias("domain"),
    )
    tail = spark.range(tail_entities * 10).select(
        F.concat(F.lit("https://tail/"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("warc_ts"),
        F.lit(0).alias("ord"),
        F.concat(F.lit("Tail Org "), F.col("id") % tail_entities).alias("name"),
        F.lit("Organization").alias("type"),
        F.lit(None).cast("string").alias("email"),
        F.lit(None).cast("string").alias("domain"),
    )
    mentions = head.unionAll(tail).persist()
    n = mentions.count()
    assignments = (
        with_node(mentions).select("node", F.col("node").alias("component")).distinct().persist()
    )
    assignments.count()

    frac = min(1.0, 500_000 / n)
    picked = pick_n_salts(with_node(mentions).select("node"), ["node"], sample_frac=frac)

    def run(n_salts: int) -> float:
        t0 = time.time()
        fold_entities(
            mentions, assignments, provenance_cap=64, n_salts=n_salts
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # interleave a warmup of the cheaper plan so JIT/page-cache effects
    # don't favor whichever variant runs second
    run(0)
    t_plain = run(0)
    t_salted = run(picked)

    out = {
        "head_rows": head_rows,
        "tail_rows": tail_entities * 10,
        "cpus": cpus,
        "picked_n_salts": picked,
        "sec_single_phase": round(t_plain, 2),
        "sec_salted": round(t_salted, 2),
        "speedup": round(t_plain / t_salted, 2) if t_salted else None,
    }
    print(json.dumps(out))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(md, "a") as f:
        f.write(
            f"\nSkew bench ({stamp}): head entity {head_rows} mentions vs "
            f"{tail_entities} uniform entities, local[{cpus}], provenance_cap=64 — "
            f"single-phase fold {t_plain:.1f}s vs salted(n={picked}) "
            f"{t_salted:.1f}s ({t_plain / t_salted:.2f}x; pick_n_salts chose "
            f"{picked} automatically, 0 on the uniform tail alone).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
