#!/usr/bin/env python
"""Per-stage scaling profile: which pipeline stage stops scaling N→4N?

Runs the KG pipeline stage by stage at two taskset-pinned parallelism
levels over the same parquet input, materializing each stage boundary so
each timing covers exactly one stage:

  extract   html→text + mention/triple UDF (write stage parquet)
  link      match keys → star edges (count)
  cc        connected components to fixpoint (write assignments)
  fold_e    entity fold (count)
  fold_t    endpoint resolve + triple fold (count)

Prints one JSON line with per-stage seconds at each level and the
per-stage scaling efficiency — the diagnosis tool for the serial
component S(input) observed in BENCH/BASELINE.md.

Usage: python scripts/profile_stages.py [n_pages] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from knowledgegraph_spark import get_spark
from knowledgegraph_spark.corpus import pages_dataframe
spark = get_spark("gen", master="local[8]", extra_conf={{"spark.ui.showConsoleProgress": "false"}})
# 128 fine files — parquet splits are gated by row-group boundaries, so
# a coarse 8-file corpus pins map parallelism at 8 regardless of
# maxPartitionBytes (see scaling_run.py GEN)
pages_dataframe(spark, int(sys.argv[1]), scaled={scaled}).repartition(128).write.mode("overwrite").parquet(sys.argv[2])
spark.stop()
"""

CHILD = r"""
import json, os, sys, time, tempfile
sys.path.insert(0, {repo!r})
from knowledgegraph_spark import get_spark
from knowledgegraph_spark.operators.extraction import (
    extract_mentions_and_triples, mentions_of, triples_of)
from knowledgegraph_spark.operators.html_text import with_extracted_text
from knowledgegraph_spark.operators.linking import (
    match_edges, mention_match_keys, with_node)
from knowledgegraph_spark.operators.components import assign_components
from knowledgegraph_spark.operators.merge import (
    canonical_mapping, fold_entities, resolve_and_fold_triples)

cpus = int(sys.argv[1]); path = sys.argv[2]
conf = {{"spark.ui.showConsoleProgress": "false"}}
mpc = os.environ.get("KG_SCALE_MEM_PER_CORE", "4")
if mpc and int(mpc) > 0:
    conf["spark.driver.memory"] = f"{{int(mpc) * cpus}}g"
# fine-grained splits — see scaling_run.py (8-file inputs would pin map
# parallelism at 8 and make every stage straggler-gated on the hi leg)
conf["spark.sql.files.maxPartitionBytes"] = os.environ.get("KG_SCALE_SPLIT_MB", "16") + "m"
# ...and the same rule for stage tables WE write (splits can't cross
# row-group boundaries — scaling_run.py)
conf["spark.hadoop.parquet.block.size"] = str(16 * 1024 * 1024)
# tmpfs local dir (shuffle + stage parquet): holds per-core IO constant
# across legs on this single-disk box (scaling_run.py KG_SCALE_TMPFS)
ldir = os.environ.get("KG_SCALE_LOCAL_DIR")
if ldir:
    conf["spark.local.dir"] = ldir
spark = get_spark("profile", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4,
                  extra_conf=conf)
pages = spark.read.parquet(path)
extract_mentions_and_triples(with_extracted_text(pages.limit(256))).count()  # warm
from pyspark.sql import functions as F
pages.agg(F.sum(F.length("html")), F.sum(F.length("text"))).collect()  # warm page cache

tmp = tempfile.mkdtemp(prefix="kg_prof_", dir=ldir or None)
t = {{}}

t0 = time.time()
ext = extract_mentions_and_triples(with_extracted_text(pages))
ext.write.mode("overwrite").parquet(f"{{tmp}}/ext")
t["extract"] = time.time() - t0

ext = spark.read.parquet(f"{{tmp}}/ext")
mentions = mentions_of(ext)
raw_triples = triples_of(ext)

t0 = time.time()
keys = mention_match_keys(mentions)
edges = match_edges(keys)
edges.write.mode("overwrite").parquet(f"{{tmp}}/edges")
t["link"] = time.time() - t0

edges = spark.read.parquet(f"{{tmp}}/edges")
# fused-surface posture (plans/pipeline.py): ONE mention-stream distinct
# yields (node, type, norm_name), shared by the CC node set and the
# canonical mapping — the cc timing covers building it, the fold_t
# timing gets it for free, exactly as the pipeline runs.
t0 = time.time()
from knowledgegraph_spark.operators.linking import node_key
surface = (mentions
           .select("type", F.lower(F.trim(F.col("name"))).alias("norm_name"))
           .distinct()
           .withColumn("node", node_key(F.col("type"), F.col("norm_name"))))
surface.write.mode("overwrite").parquet(f"{{tmp}}/surface")
surface = spark.read.parquet(f"{{tmp}}/surface")
assignments = assign_components(surface.select("node"), edges, nodes_distinct=True)
assignments.write.mode("overwrite").parquet(f"{{tmp}}/asg")
t["cc"] = time.time() - t0

assignments = spark.read.parquet(f"{{tmp}}/asg")
# fold posture = the scaling run's: provenance_cap=64 + adaptive salts
from knowledgegraph_spark.plans.pipeline import _auto_salts
t0 = time.time()
n_salts = _auto_salts(mentions, capped=True)
t["salt_probe"] = time.time() - t0
t0 = time.time()
ents = fold_entities(mentions, assignments, provenance_cap=64, n_salts=n_salts)
ents.write.mode("overwrite").parquet(f"{{tmp}}/ents")
t["fold_e"] = time.time() - t0

ents = spark.read.parquet(f"{{tmp}}/ents")
t0 = time.time()
mapping = canonical_mapping(mentions, assignments, canon=ents, surface=surface).localCheckpoint(eager=True)
n = resolve_and_fold_triples(raw_triples, mapping, provenance_cap=64, n_salts=n_salts).count()
t["fold_t"] = time.time() - t0

t["n_triples"] = n
print(json.dumps({{"cpus": cpus, "stages": t}}))
spark.stop()
"""


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scaled = os.environ.get("KG_SCALE_WORLD", "scaled") != "legacy"

    reuse = os.environ.get("KG_SCALE_PAGES_DIR")
    tmp = tempfile.mkdtemp(prefix="kg_profpages_")
    # _swf = scaled world, fine 128-file layout (shared with scaling_run)
    stem = f"pages_{n_pages}_swf" if scaled else f"pages_{n_pages}"
    pages = os.path.join(reuse, stem) if reuse else os.path.join(tmp, "pages")
    try:
        if not os.path.isdir(pages):
            subprocess.run(
                [sys.executable, "-c", GEN.format(repo=REPO, scaled=scaled),
                 str(n_pages), pages],
                check=True, cwd=REPO, timeout=7200, capture_output=True, text=True,
            )

        def run(cpus):
            n_host = os.cpu_count() or 32
            cmd = [
                "taskset", "-c", f"{n_host - cpus}-{n_host - 1}",
                sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), pages,
            ]
            env = dict(os.environ)
            ldir = None
            if os.environ.get("KG_SCALE_TMPFS", "1") != "0" and os.path.isdir("/dev/shm"):
                ldir = tempfile.mkdtemp(prefix=f"kg_prof_local_{cpus}_", dir="/dev/shm")
                env["KG_SCALE_LOCAL_DIR"] = ldir
            try:
                out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env,
                                     timeout=int(os.environ.get("KG_SCALE_TIMEOUT", "5400")))
            finally:
                if ldir:
                    shutil.rmtree(ldir, ignore_errors=True)
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(out.stderr[-2000:])
            return json.loads(lines[-1])

        r_lo, r_hi = run(lo), run(hi)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    stages = [k for k in r_lo["stages"] if k != "n_triples"]
    eff = {
        k: round(r_lo["stages"][k] / (hi / lo * r_hi["stages"][k]), 3)
        for k in stages
    }
    print(json.dumps({
        "n_pages": n_pages,
        f"sec_local{lo}": {k: round(r_lo["stages"][k], 1) for k in stages},
        f"sec_local{hi}": {k: round(r_hi["stages"][k], 1) for k in stages},
        "stage_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
