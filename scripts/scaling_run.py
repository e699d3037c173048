#!/usr/bin/env python
"""Scaling-efficiency evidence: the same KG pipeline job at two
parallelism levels on identical input.

Sandbox proxy for BASELINE.json's "N → 4N executors, throughput scaling
efficiency ≥ 0.8" criterion (no real cluster available).  This host
carries persistent external load (~8-12 cores of 32 busy from outside
this session — see BENCH/BASELINE.md), so the honest core pair is
local[2] vs local[8]: both fit in the free cores; local[32] would be
oversubscribed by the co-tenant load, measuring contention, not the
engine.

Protocol:
  1. corpus generated ONCE (distributed render) and written to parquet —
     both levels read the identical input;
  2. each level runs in a fresh JVM subprocess;
  3. Python worker pool warmed outside the timed region;
  4. timed region = full build_kg (extract → link → CC → fold) + counts.

Appends to BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from knowledgegraph_spark import get_spark
from knowledgegraph_spark.corpus import pages_dataframe
spark = get_spark("gen", master="local[8]", extra_conf={{"spark.ui.showConsoleProgress": "false"}})
# scaled=True: the NON-SATURATING world — entities/facts grow with
# n_pages (as real crawls do), so the link/CC key spaces scale with the
# corpus instead of pinning at the fixture world's fixed pools (round-3
# verdict item 1).  KG_SCALE_WORLD=legacy reverts to the fixture world.
# 128 output files: parquet SPLITS are gated by row-group boundaries, not
# spark.sql.files.maxPartitionBytes — an 8-file corpus written with the
# default 128 MB row groups yields 8 effective splits no matter how small
# maxPartitionBytes is set (each nominal split only reads row groups whose
# midpoint falls inside it).  That made the round-4 "16 MB split" protocol
# fix a NO-OP: the hi leg still ran one 8-task wave per map stage.  128
# files × ~3 MB × one row group each give both legs real wave smoothing.
pages_dataframe(spark, int(sys.argv[1]), scaled={scaled}).repartition({files}).write.mode("overwrite").parquet(sys.argv[2])
spark.stop()
"""

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from knowledgegraph_spark import get_spark
from knowledgegraph_spark.plans.pipeline import build_kg
from knowledgegraph_spark.operators.extraction import extract_mentions_and_triples
from knowledgegraph_spark.operators.html_text import with_extracted_text
cpus = int(sys.argv[1]); path = sys.argv[2]
conf = {{"spark.ui.showConsoleProgress": "false"}}
# KG_SCALE_MEM_PER_CORE=<GiB> (default 4): hold memory-per-core constant
# across the two levels.  A real N->4N cluster scales TOTAL memory with
# executor count; a fixed driver heap would give the hi level 1/4 the
# memory per core and charge the resulting GC pressure against scaling
# efficiency — measuring the sandbox's single-JVM artifact, not the
# engine (round-2 profile: 16g->32g cut stage walls 35-41% at BOTH
# levels).  Set to 0/empty to force a fixed heap.
mpc = os.environ.get("KG_SCALE_MEM_PER_CORE", "4")
if mpc and int(mpc) > 0:
    conf["spark.driver.memory"] = f"{{int(mpc) * cpus}}g"
# KG_SCALE_LOCAL_DIR (set by the parent, tmpfs by default): shuffle files,
# localCheckpoints, and stage parquet go to RAM-backed storage.  A real
# N->4N cluster scales LOCAL DISK with executor count (each node brings
# its own SSD); this box has ONE ~530 MB/s virtual disk, so the 8-core
# leg gets 1/4 the per-core IO bandwidth of the 2-core leg — charging a
# single-box artifact against the engine's scaling, exactly like a fixed
# total heap would (see KG_SCALE_MEM_PER_CORE above).  tmpfs holds
# per-core IO constant across legs.  Set KG_SCALE_TMPFS=0 to disable.
ldir = os.environ.get("KG_SCALE_LOCAL_DIR")
if ldir:
    conf["spark.local.dir"] = ldir
# Fine-grained file splits (default 128 MB would cut the ~400 MB input
# and ~800 MB stage tables into ≤8 splits = EXACTLY the hi leg's core
# count): every map stage then runs one wave of coarse tasks whose
# slowest straggler gates the stage, while the lo leg load-balances over
# 4 waves — a partition-sizing artifact, not engine scaling.  16 MB
# splits give both legs enough waves to smooth stragglers; stage tails
# shrink from ~one coarse task to ~one fine task across every stage of
# the job.  (This is the spark.sql.files.maxPartitionBytes sizing rule
# any real deployment applies.)
conf["spark.sql.files.maxPartitionBytes"] = os.environ.get("KG_SCALE_SPLIT_MB", "16") + "m"
# ...and the same rule for files WE write: splits can't cross row-group
# boundaries, so stage tables written with the default 128 MB row groups
# would re-coarsen downstream scans regardless of maxPartitionBytes.
conf["spark.hadoop.parquet.block.size"] = str(
    int(os.environ.get("KG_SCALE_BLOCK_MB", "16")) * 1024 * 1024)
spark = get_spark("scale", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4,
                  extra_conf=conf)
pages = spark.read.parquet(path)
extract_mentions_and_triples(with_extracted_text(pages.limit(256))).count()  # warm workers
# Warm the OS page cache over the FULL input before the timed region:
# the first leg to touch a freshly-generated (or freshly-evicted) parquet
# pays cold reads the second leg doesn't — an asymmetry that distorts the
# ratio in either direction.  One untimed scan of the big column makes
# both legs start warm (the input fits host RAM at these sizes).
from pyspark.sql import functions as F
pages.agg(F.sum(F.length("html")), F.sum(F.length("text"))).collect()

# Stage boundaries go to parquet (the run_pipeline posture), not memory
# persists: cached stage frames make the low-core leg cache-spill-bound
# (same bytes, fewer cores to re-derive evicted blocks), understating
# its throughput and inflating apparent "scaling".
def _steal_s():
    # hypervisor steal time (seconds, all vcpus): invisible to loadavg
    # but it contends the pinned cores — record it so every measurement
    # carries its own noise floor
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

stages = tempfile.mkdtemp(prefix="kg_scale_stages_", dir=ldir or None)
steal0 = _steal_s()
load0 = os.getloadavg()[0]  # co-tenant CPU pressure at leg start
t0 = time.time()
# provenance_cap=64: the 100-TB posture.  Uncapped provenance grows the
# head entity's sources/descriptions sets linearly with the corpus; with
# the cap, salted partials ship <=cap urls into the final shuffle and the
# exact n_sources count is kept — the configuration a web-scale run would
# actually use (bench.py reports both postures at sf0.1).
res = build_kg(spark, pages, stage_path=stages, provenance_cap=64)
nt = res.triples.count(); ne = res.entities.count()
dt = time.time() - t0
steal = _steal_s() - steal0
load1 = os.getloadavg()[0]
shutil.rmtree(stages, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "sec": dt, "n_triples": nt, "n_entities": ne,
                   "triples_per_sec": nt / dt, "steal_s": round(steal, 1),
                   "loadavg": [round(load0, 2), round(load1, 2)]}}))
spark.stop()
"""


def _settle_loadavg(limit: float = 1.0, max_wait: int = 600) -> float:
    """Wait for the 1-min loadavg to decay under ``limit`` (≤ max_wait s)
    and return the reading.  The loadavg measured DURING a leg counts our
    own JVM's runnable threads (a local[8] leg reads ~8 by construction),
    so the EXTERNAL-pressure signal must be sampled before the leg starts
    — after the previous leg's own contribution has decayed (1-min
    loadavg decays as e^(-t/60): 3 min shrinks an 8-core leg's residue
    to ~0.4)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        la = os.getloadavg()[0]
        if la <= limit:
            return la
        time.sleep(15)
    return os.getloadavg()[0]


def noise_flags(lo: dict, hi: dict) -> list[str]:
    """Asymmetric external noise makes the ratio meaningless in either
    direction; flag legs differing >2× in steal or pre-leg loadavg (with
    floors — 1.5s steal / 0.5 loadavg — below which the signal is idle
    jitter).  Round-3 verdict item 8: a quiet row must be self-certifying
    on BOTH signals, and the 04:14 near-symmetric-steal artifact showed
    symmetric steal alone does not certify quietness — so also flag any
    leg over the absolute quiet bounds (steal > 20s, external loadavg >
    1 at leg start)."""
    flags = []
    s_lo = float(lo.get("steal_s") or 0.0)
    s_hi = float(hi.get("steal_s") or 0.0)
    l_lo = float(lo.get("ext_loadavg") or 0.0)
    l_hi = float(hi.get("ext_loadavg") or 0.0)
    s_a, s_b = sorted([max(s_lo, 1.5), max(s_hi, 1.5)])
    if s_b / s_a > 2.0:
        flags.append(f"steal-asymmetric {s_lo:.1f}s vs {s_hi:.1f}s")
    l_a, l_b = sorted([max(l_lo, 0.5), max(l_hi, 0.5)])
    if l_b / l_a > 2.0:
        flags.append(f"loadavg-asymmetric {l_lo:.1f} vs {l_hi:.1f}")
    if max(s_lo, s_hi) > 20.0:
        flags.append(f"steal-high {max(s_lo, s_hi):.1f}s")
    if max(l_lo, l_hi) > 1.0:
        flags.append(f"loadavg-high {max(l_lo, l_hi):.1f}")
    return flags


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo_cpus = int(os.environ.get("KG_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("KG_SCALE_HI", "8"))
    scaled = os.environ.get("KG_SCALE_WORLD", "scaled") != "legacy"

    # KG_SCALE_PAGES_DIR: reuse a pre-generated pages parquet across runs
    # (the corpus render is deterministic in (n_pages, seed, world mode),
    # so the input is identical); generated there on first use.  The
    # scaled-world input lives under a distinct name — the two corpora
    # are different data.
    reuse = os.environ.get("KG_SCALE_PAGES_DIR")
    tmp = tempfile.mkdtemp(prefix="kg_scale_")
    # "swf": scaled world, FINE layout (KG_SCALE_FILES output files — see
    # GEN; default 128).  Distinct stem from the round-4 "_sw" cache:
    # same rows, different physical layout, and the layout is part of
    # the protocol.  Task-granularity rule: aim for ~4 waves on the hi
    # leg (files ≈ 4 × hi_cpus); too-fine splits trade straggler
    # smoothing for per-task overhead (128 × ~3 MB tasks measurably
    # slowed BOTH legs ~5% vs the 8-file layout at 2M pages).
    files = int(os.environ.get("KG_SCALE_FILES", "128"))
    if scaled:
        stem = f"pages_{n_pages}_swf" if files == 128 else f"pages_{n_pages}_swf{files}"
    else:
        stem = f"pages_{n_pages}"
    pages_path = os.path.join(reuse, stem) if reuse else os.path.join(tmp, "pages")
    try:
        if not os.path.isdir(pages_path):
            subprocess.run(
                [sys.executable, "-c", GEN.format(repo=REPO, scaled=scaled, files=files),
                 str(n_pages), pages_path],
                check=True, cwd=REPO, timeout=7200, capture_output=True, text=True,
            )

        def run_level(cpus: int) -> dict:
            # settle + sample EXTERNAL loadavg before the leg (the in-leg
            # reading counts our own JVM; see _settle_loadavg)
            ext = _settle_loadavg()
            env = dict(os.environ)
            ldir = None
            if os.environ.get("KG_SCALE_TMPFS", "1") != "0" and os.path.isdir("/dev/shm"):
                ldir = tempfile.mkdtemp(prefix=f"kg_scale_local_{cpus}_", dir="/dev/shm")
                env["KG_SCALE_LOCAL_DIR"] = ldir
            # taskset pins the whole JVM (task threads + GC + shuffle IO) to
            # exactly `cpus` cores — local[N] alone only caps task slots,
            # and JVM utility threads would otherwise spill onto extra
            # cores, corrupting the N-vs-4N comparison.
            n_host = os.cpu_count() or 32
            cmd = [
                "taskset", "-c", f"{n_host - cpus}-{n_host - 1}",
                sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), pages_path,
            ]
            try:
                out = subprocess.run(
                    cmd,
                    capture_output=True, text=True, cwd=REPO, env=env,
                    timeout=int(os.environ.get("KG_SCALE_TIMEOUT", "3600")),
                )
            finally:
                if ldir:
                    shutil.rmtree(ldir, ignore_errors=True)
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(out.stderr[-2000:])
            res = json.loads(lines[-1])
            res["ext_loadavg"] = round(ext, 2)
            res["tmpfs_local"] = bool(ldir)
            return res

        lo = run_level(lo_cpus)
        hi = run_level(hi_cpus)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    eff = hi["triples_per_sec"] / (
        (hi_cpus / lo_cpus) * lo["triples_per_sec"]
    )
    mpc = os.environ.get("KG_SCALE_MEM_PER_CORE", "4")
    flags = noise_flags(lo, hi)
    summary = {
        "n_pages": n_pages,
        f"local{lo_cpus}": {"sec": round(lo["sec"], 2), "tps": round(lo["triples_per_sec"], 1),
                           "steal_s": lo.get("steal_s"), "ext_loadavg": lo.get("ext_loadavg"),
                           "in_leg_loadavg": lo.get("loadavg")},
        f"local{hi_cpus}": {"sec": round(hi["sec"], 2), "tps": round(hi["triples_per_sec"], 1),
                            "steal_s": hi.get("steal_s"), "ext_loadavg": hi.get("ext_loadavg"),
                            "in_leg_loadavg": hi.get("loadavg")},
        "scaling_efficiency": round(eff, 3),
        "n_triples": hi["n_triples"],
        "world": "scaled" if scaled else "legacy",
        "protocol": f"mem_per_core={mpc}g, parquet-staged stages"
        + (", tmpfs-local" if lo.get("tmpfs_local") else ""),
        "noise_flags": flags,
        "certified_quiet": not flags,
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    header = not os.path.exists(md)
    with open(md, "a") as f:
        if header:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "Scaling evidence per BASELINE.json: same job, identical parquet\n"
                "input, two parallelism levels in fresh JVMs (sandbox proxy for\n"
                "N vs 4N executors — no real cluster in this environment).\n"
                "NOTE: this host carries persistent external load (~8-12 of 32\n"
                "cores busy from co-tenants; /proc/loadavg ~8-12 at idle), so the\n"
                "core pair is chosen to fit the free cores (local[2] vs local[8]\n"
                "by default); local[32] measures co-tenant contention, not the\n"
                "engine.\n\n"
                "| when | pages | cores lo | sec lo | t/s lo | cores hi | sec hi | t/s hi | efficiency lo→hi |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        steal = (
            f", steal {lo.get('steal_s', '?')}/{hi.get('steal_s', '?')}s"
            if "steal_s" in lo or "steal_s" in hi
            else ""
        )
        la = (
            f", ext-loadavg {lo.get('ext_loadavg', 0):.1f}/{hi.get('ext_loadavg', 0):.1f}"
            if "ext_loadavg" in lo or "ext_loadavg" in hi
            else ""
        )
        world = ", scaled-world" if scaled else ""
        world += ", tmpfs-local" if lo.get("tmpfs_local") else ""
        flag_txt = f" **FLAGGED: {'; '.join(flags)}**" if flags else " certified-quiet"
        f.write(
            f"| {stamp} (mpc={mpc}g, staged{steal}{la}{world}{flag_txt}) | {n_pages} | {lo_cpus} | {lo['sec']:.1f} | {lo['triples_per_sec']:.1f} "
            f"| {hi_cpus} | {hi['sec']:.1f} | {hi['triples_per_sec']:.1f} | {eff:.3f} |\n"
        )


if __name__ == "__main__":
    main()
