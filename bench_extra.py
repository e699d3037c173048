#!/usr/bin/env python
"""Round-6 measurement harness (guide §1) — separate from the frozen bench.py.

Per-query isolation for every declared bench headliner (plus the other
oracle-gated queries on demand):
  * wall time of .count() (the driver's methodology) AND of a noop sink
    (guide §1.4 — forces every column, no optimizer pruning surprises);
  * `.explain("formatted")` dumped to plans/r06/<query>_<tag>.txt;
  * input scan partition counts (the sf parquet files are single row
    groups — scan parallelism is a first-class suspect).

Usage:
  python bench_extra.py --tag before [--queries a,b,c] [--repeat 2] [--plans-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HEADLINERS = [
    "kg_extract_triples",
    "kg_entity_attrs",
    "kg_relation_tags",
    "term_graph",
    "minhash_sigs",
    "minhash_fast",
    "simhash",
    "ngram_jaccard",
    "knn_batch",
    "near_dup_lsh",
    "label_centroids",
    "dim_join",
    "entity_fold",
    "relation_group",
    "text_quality",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--noop", action="store_true", help="also time a noop sink")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from knowledgegraph_spark import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qmap = entry_mod.queries()
    names = args.queries.split(",") if args.queries else HEADLINERS

    os.makedirs("plans/r06", exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        df = qmap[name](spark, sf_dir)
        with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        if args.plans_only:
            continue
        rec: dict = {}
        spark.sparkContext.setJobDescription(f"{name}: count")
        times = []
        for _ in range(args.repeat):
            t0 = time.time()
            n = qmap[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        rec["count_s"] = times
        rec["rows"] = n
        if args.noop:
            spark.sparkContext.setJobDescription(f"{name}: noop")
            times = []
            for _ in range(args.repeat):
                t0 = time.time()
                qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            rec["noop_s"] = times
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"tag": args.tag, "load": os.getloadavg()[0], "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
