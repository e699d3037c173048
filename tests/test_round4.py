"""Round-4 gates: sliced portable hash, minhash_fast dual-derivation,
BM25 entry top-k plan, derived ANN plane counts, real BMP/PGM decode,
bucketed checkpoint ledger, per-attribute origin-order pseudo-mentions,
bucket-meta backfill."""

import hashlib
import os
import random
import struct

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledgegraph_spark.config import PAGES_SCHEMA


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# sliced portable hash (verdict item 2)
# ---------------------------------------------------------------------------


def _py_hash_sliced(value: str, seed: int = 0) -> int:
    g, j = divmod(seed, 4)
    h = hashlib.md5(f"{g}|{value}".encode()).hexdigest()
    return int(h[8 * j : 8 * j + 8], 16)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different text about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_portable_hash_sliced_matches_python(spark):
    from knowledgegraph_spark.operators.textstats import portable_hash_sliced

    vals = ["alpha", "beta gamma", ""]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(
        *[portable_hash_sliced(F.col("v"), seed=i).alias(f"h{i}") for i in range(8)]
    ).collect()
    for row, v in zip(got, vals):
        for i in range(8):
            assert row[f"h{i}"] == _py_hash_sliced(v, i), (v, i)


def test_minhash_sliced_matches_python_oracle(spark, docs_df):
    from knowledgegraph_spark.operators.dedup import minhash_signatures
    from knowledgegraph_spark.operators.textstats import portable_hash_sliced

    got = {
        r.id: list(r.sig)
        for r in minhash_signatures(
            docs_df, num_hashes=8, hash_fn=portable_hash_sliced
        ).collect()
    }
    for doc_id, text in DOCS:
        want = [min(_py_hash_sliced(s, i) for s in _py_shingles(text)) for i in range(8)]
        assert got[doc_id] == want, doc_id
    assert got[0] == got[3]  # exact dups share signatures


def test_minhash_fast_dual_derivations_agree(spark, docs_df):
    """The explode+groupBy plan and the per-row array-expression plan must
    produce identical xxhash64 signatures (the minhash_fast oracle gate)."""
    import __spark_entry__ as entry_mod

    tmp_docs = docs_df  # entry helper reads parquet; replicate inline
    from knowledgegraph_spark.operators.dedup import minhash_signatures, shingle_array
    from knowledgegraph_spark.operators.textstats import fast_hash64

    sig = minhash_signatures(tmp_docs, num_hashes=8, hash_fn=fast_hash64)
    alt = tmp_docs.select(
        F.col("doc_id").alias("id"),
        *[
            F.array_min(
                F.transform(
                    shingle_array(F.col("text")),
                    (lambda i: (lambda s: F.xxhash64(F.lit(i), s)))(i),
                )
            ).alias(f"g{i}")
            for i in range(8)
        ],
    )
    joined = sig.join(alt, "id").collect()
    assert len(joined) == len(DOCS)
    for r in joined:
        assert list(r.sig) == [r[f"g{i}"] for i in range(8)], r.id


# ---------------------------------------------------------------------------
# BM25 entry top-k plan (verdict item 4)
# ---------------------------------------------------------------------------


def test_entry_bm25_is_take_ordered_topk(spark):
    """The gated entry query must rank through TakeOrderedAndProject with
    k=10 — not a global sort of the full scored set."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["bm25_search"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "limit=[10]" in plan or "limit=10" in plan, plan[:500]


def test_bm25_score_round_matches_post_round(spark):
    """Rounding inside the top-k equals ranking on pre-rounded scores."""
    from knowledgegraph_spark.operators.fulltext import (
        bm25_search,
        doc_lengths,
        token_index,
    )

    df = spark.createDataFrame(
        [(i, f"data term{i % 7} join data") for i in range(40)],
        "doc_id long, text string",
    )
    idx, lens = token_index(df), doc_lengths(df)
    fast = [
        (r.id, r.score)
        for r in bm25_search(idx, lens, ["data"], k=10, score_round=4).collect()
    ]
    slow = [
        (r.id, r.score)
        for r in bm25_search(idx, lens, ["data"], k=1_000_000)
        .select("id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.col("id"))
        .limit(10)
        .collect()
    ]
    assert fast == slow


# ---------------------------------------------------------------------------
# derived ANN plane count (verdict item 5)
# ---------------------------------------------------------------------------


def test_n_planes_for_arithmetic():
    from knowledgegraph_spark.operators.similarity import n_planes_for

    assert n_planes_for(100, target_bucket=10_000) == 1
    assert n_planes_for(10_000, target_bucket=10_000) == 1
    assert n_planes_for(80_000, target_bucket=10_000) == 3
    assert n_planes_for(10**9, target_bucket=10_000) == 17
    assert n_planes_for(10**12, target_bucket=10_000) == 27


def test_n_planes_for_bucket_bounds_and_recall(spark):
    """At the derived plane count the buckets actually split the corpus
    (expected occupancy ≈ target) and multi-probe recall stays useful."""
    from knowledgegraph_spark.operators.similarity import (
        ann_topk_lsh,
        n_planes_for,
        topk_cosine,
    )

    dim, n = 16, 200
    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    target = 25
    p = n_planes_for(n, target_bucket=target)
    assert p == 3  # ceil(log2(200/25))
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(p)]

    from knowledgegraph_spark.operators.similarity import hyperplane_signatures

    sizes = [
        r.n
        for r in hyperplane_signatures(df, planes)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert sum(sizes) == n
    assert len(sizes) > 1  # the corpus is actually split
    assert max(sizes) < n * 0.6  # no bucket holds (nearly) everything

    q = rows[5][1]
    exact = [r.vec_id for r in topk_cosine(df, q, k=10).collect()]
    approx = [
        r.vec_id for r in ann_topk_lsh(df, q, planes, k=10, probes=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, recall


# ---------------------------------------------------------------------------
# real BMP / PGM decode kernels (verdict item 6)
# ---------------------------------------------------------------------------


def _bmp_bytes(pixels) -> bytes:
    """Minimal 24-bit BITMAPINFOHEADER BMP; ``pixels`` = rows (top-down) of
    (r, g, b) tuples."""
    h, w = len(pixels), len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    img = b""
    for row in reversed(pixels):  # file stores bottom-up
        raw = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        img += raw + b"\x00" * (row_bytes - len(raw))
    header = b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return header + dib + img


def test_decode_bmp_exact_pixels():
    from knowledgegraph_spark.operators.multimodal import decode_bmp

    pixels = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (10, 20, 30)],
    ]
    arr = decode_bmp(_bmp_bytes(pixels))
    assert arr is not None and arr.shape == (2, 2, 3)
    assert arr.tolist() == [[list(p) for p in row] for row in pixels]
    assert decode_bmp(b"not a bmp at all....") is None


def test_decode_pgm_exact_pixels():
    from knowledgegraph_spark.operators.multimodal import decode_pgm

    payload = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 64, 128, 255])
    arr = decode_pgm(payload)
    assert arr is not None and arr.shape == (2, 2, 3)
    assert arr[:, :, 0].tolist() == [[0, 64], [128, 255]]
    assert (arr[:, :, 0] == arr[:, :, 1]).all() and (arr[:, :, 0] == arr[:, :, 2]).all()
    assert decode_pgm(b"P6\n2 2\n255\n" + b"\x00" * 12) is None  # P6 = PPM


def test_image_features_real_decode_via_spark(spark):
    """image_features produces REAL pixel statistics for BMP payloads (and
    still falls back to the stub for undecodable bytes)."""
    from knowledgegraph_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        image_features,
        pixel_features,
    )

    bmp = _bmp_bytes([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    rows = [
        ("m1", "image", bmp, "image/bmp", 2, 2, None),
        ("m2", "image", b"\xff\xd8 jpeg-ish junk", "image/jpeg", None, None, None),
        ("m3", "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(media).collect()}
    want = pixel_features(decode_bmp(bmp))
    assert np.allclose(got["m1"].feature, want, atol=1e-6)
    # mean red channel: (255 + 0 + 0 + 255) / 4 / 255
    assert abs(got["m1"].feature[0] - 0.5) < 1e-6
    assert got["m2"].feature is not None and len(got["m2"].feature) == 16  # stub path
    assert got["m3"].feature is None
    assert got["m1"].n_bytes == len(bmp)


# ---------------------------------------------------------------------------
# bucketed checkpoint ledger (verdict item 7)
# ---------------------------------------------------------------------------


def test_ledger_is_bucketed_and_resume_scan_prunes(spark, tmp_path):
    from knowledgegraph_spark.corpus import generate_corpus
    from knowledgegraph_spark.plans.pipeline import run_pipeline

    c = generate_corpus(30, seed=7)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    wh = str(tmp_path / "wh")
    cat = run_pipeline(spark, pages, wh, session_id="a")

    lpath = cat.path("checkpoint_ledger")
    assert any(d.startswith("bucket=") for d in os.listdir(lpath)), os.listdir(lpath)
    meta = cat.get_meta("checkpoint_ledger")
    assert meta and meta["partition_col"] == "bucket" and meta["n_buckets"] > 0

    # the resume-side read: a bucket IN-filter must reach the scan as a
    # PartitionFilter (only the batch's bucket dirs listed/read)
    led = cat.read("checkpoint_ledger")
    assert "bucket" in led.columns
    plan = _plan(led.filter(F.col("bucket").isin([0, 1, 2])).select("url"))
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan

    # resume is a no-op (ledger consulted through the bucketed path)
    cat2 = run_pipeline(spark, pages, wh, session_id="b")
    led2 = cat2.read("checkpoint_ledger")
    assert led2.count() == pages.count()  # no second generation of rows


def test_compact_ledger_migrates_legacy_to_bucketed(spark, tmp_path):
    from knowledgegraph_spark.admin import compact_ledger
    from knowledgegraph_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    legacy = spark.createDataFrame(
        [(f"u{i}", "s1", "ok") for i in range(50)],
        "url string, session_id string, status string",
    ).withColumn("processed_at", F.current_timestamp())
    cat.append(legacy, "checkpoint_ledger")
    assert "bucket" not in cat.read("checkpoint_ledger").columns

    out = compact_ledger(cat, n_buckets=8)
    assert out["rows_after"] == 50
    led = cat.read("checkpoint_ledger")
    assert "bucket" in led.columns
    assert cat.get_meta("checkpoint_ledger")["n_buckets"] == 8
    # buckets consistent with the pipeline's url-hash
    chk = led.filter(
        F.col("bucket") != F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")
    )
    assert chk.count() == 0


# ---------------------------------------------------------------------------
# per-attribute origin-order pseudo-mentions (round-3 advice item 1)
# ---------------------------------------------------------------------------


def _page(url: str, ts: str, sentence: str) -> dict:
    return {
        "url": url,
        "warc_ts": __import__("datetime").datetime.fromisoformat(ts),
        "html": None,
        "text": f"Note\n\n{sentence}",
        "lang": "en",
    }


def test_incremental_attr_origin_order_matches_oneshot(spark, tmp_path):
    """The advice scenario: batch 2 carries a worksAt mention ordered
    BETWEEN the entity's firstSeen and the attribute's true origin.
    One-shot picks the earlier-ordered batch-2 value; incremental must too
    (the round-3 pseudo-row carried the attr at firstSeen and kept the
    stale value)."""
    from knowledgegraph_spark.plans.pipeline import run_pipeline

    a = _page("https://x.example/a", "2024-01-01T00:00:00+00:00",
              "Alice Johnson works on Project Apollo.")
    c = _page("https://x.example/c", "2024-01-01T02:00:00+00:00",
              "Alice Johnson works at Acme Corp as a Senior Engineer.")
    b = _page("https://x.example/b", "2024-01-01T01:00:00+00:00",
              "Alice Johnson works at Borealis Labs as a Staff Engineer.")

    batch1 = spark.createDataFrame([Row(**a), Row(**c)], schema=PAGES_SCHEMA)
    batch2 = spark.createDataFrame([Row(**b)], schema=PAGES_SCHEMA)
    all3 = spark.createDataFrame([Row(**p) for p in (a, b, c)], schema=PAGES_SCHEMA)

    wh_inc = str(tmp_path / "inc")
    run_pipeline(spark, batch1, wh_inc, session_id="s1")
    cat_inc = run_pipeline(spark, batch2, wh_inc, session_id="s2")
    wh_one = str(tmp_path / "one")
    cat_one = run_pipeline(spark, all3, wh_one, session_id="x")

    def alice(cat):
        r = [
            e for e in cat.read("entity_nodes").collect()
            if e.name == "Alice Johnson" and e.type == "Person"
        ]
        assert len(r) == 1
        return r[0]

    one, inc = alice(cat_one), alice(cat_inc)
    assert one.worksAt == "Borealis Labs"  # earliest-ordered attr mention wins
    assert inc.worksAt == one.worksAt
    assert inc.worksAtSeenUrl == one.worksAtSeenUrl == "https://x.example/b"


def test_fold_entities_records_attr_origin_keys(spark):
    """worksAtSeen*/titleSeen* carry the order key of the mention the
    value came from (≥ firstSeen), in both salted and unsalted folds."""
    from knowledgegraph_spark.operators.components import assign_components
    from knowledgegraph_spark.operators.linking import with_node
    from knowledgegraph_spark.operators.merge import fold_entities

    import datetime as dt

    def ts(h):
        return dt.datetime(2024, 1, 1, h)

    mentions = spark.createDataFrame(
        [
            ("u1", ts(0), 0, "Ann Lee", "Person", None, None, None, None),
            ("u2", ts(1), 0, "Ann Lee", "Person", None, None, None, "Tech Lead"),
            ("u3", ts(2), 0, "Ann Lee", "Person", None, None, "Acme Corp", None),
        ],
        "url string, warc_ts timestamp, ord int, name string, type string, "
        "email string, domain string, worksAt string, title string",
    )
    nodes = with_node(mentions).select("node")
    asg = assign_components(nodes, nodes.limit(0).select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    ))
    for n_salts in (0, 4):
        e = fold_entities(mentions, asg, n_salts=n_salts).collect()[0]
        assert e.worksAt == "Acme Corp" and e.worksAtSeenUrl == "u3", n_salts
        assert e.title == "Tech Lead" and e.titleSeenUrl == "u2", n_salts
        assert e.firstSeenUrl == "u1", n_salts


# ---------------------------------------------------------------------------
# bucket-meta backfill (round-3 advice item 2)
# ---------------------------------------------------------------------------


def test_missing_bucket_meta_backfilled_on_incremental(spark, tmp_path):
    from knowledgegraph_spark.corpus import generate_corpus
    from knowledgegraph_spark.plans.pipeline import run_pipeline
    from knowledgegraph_spark.sources.catalog import Catalog

    c = generate_corpus(40, seed=9)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    half1 = pages.filter("warc_ts < timestamp'2024-01-01 00:45:00'")
    wh = str(tmp_path / "wh")
    run_pipeline(spark, half1, wh, session_id="a", n_buckets=32)
    cat = Catalog(spark, wh)
    assert cat.get_meta("entity_nodes")["n_buckets"] == 32  # atomic with write

    # simulate a pre-meta table (or a lost meta file)
    for t in ("entity_nodes", "triples"):
        os.remove(os.path.join(cat.path(t), "_kg_meta.json"))
    run_pipeline(spark, pages, wh, session_id="b", n_buckets=32)
    for t in ("entity_nodes", "triples"):
        meta = cat.get_meta(t)
        assert meta and meta["n_buckets"] == 32, t


# ---------------------------------------------------------------------------
# non-saturating scaled corpus (verdict item 1)
# ---------------------------------------------------------------------------


def test_scaled_world_grows_with_pages():
    from knowledgegraph_spark.corpus import build_world_and_pool

    w1, p1 = build_world_and_pool(300, scaled=True)
    w2, p2 = build_world_and_pool(3000, scaled=True)
    assert len(w2.people) == 10 * len(w1.people)
    assert len(w2.orgs) == 10 * len(w1.orgs)
    assert len(p2) == 10 * len(p1)
    # O(1) broadcast regardless of scale
    import pickle

    assert len(pickle.dumps(p2)) < 10_000
    # derived surface forms stay inside the extraction grammar
    from knowledgegraph_spark.operators.extraction import _ORG_PARSE, _PERSON_PARSE

    for i in (0, 7, 123, len(w2.people) - 1):
        p = w2.people[i]
        assert _PERSON_PARSE.match(p.name), p.name
        assert _PERSON_PARSE.match(f"{p.name} ({p.email})"), p.email
    for j in (0, 5, len(w2.orgs) - 1):
        o = w2.orgs[j]
        assert _ORG_PARSE.match(o.name), o.name
        assert _ORG_PARSE.match(f"{o.alias} [{o.domain}]"), o.alias


def test_scaled_corpus_pr_gate(spark):
    """Triple P/R ≥ 0.95 and entity exactness hold under the scaled
    (non-saturating) corpus parameters — the oracle-gate requirement of
    round-3 verdict item 1."""
    from knowledgegraph_spark.corpus import (
        generate_corpus,
        oracle_entities,
        oracle_triples,
    )
    from knowledgegraph_spark.plans.pipeline import build_kg

    c = generate_corpus(150, seed=42, scaled=True)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    kg = build_kg(spark, pages)

    got = {(r.subj, r.pred, r.obj) for r in kg.triples.collect()}
    want = {(t["subj"], t["pred"], t["obj"]) for t in oracle_triples(c)}
    tp = len(got & want)
    assert tp / len(got) >= 0.95, f"precision {tp / len(got):.4f}"
    assert tp / len(want) >= 0.95, f"recall {tp / len(want):.4f}"

    got_e = {
        (r.name, r.type): (tuple(r.aliases), tuple(r.emails), r.domain)
        for r in kg.entities.collect()
    }
    want_e = {
        (e["name"], e["type"]): (tuple(e["aliases"]), tuple(e["emails"]), e["domain"])
        for e in oracle_entities(c)
    }
    assert got_e == want_e


def test_scaled_distributed_render_matches_driver(spark):
    """pages_dataframe(scaled=True) is byte-identical to the sequential
    driver-side generator (the property the scaling runs rely on)."""
    from knowledgegraph_spark.corpus import generate_corpus, pages_dataframe

    c = generate_corpus(60, seed=11, scaled=True)
    want = {
        p["url"]: (p["warc_ts"], p["html"], p["text"], p["lang"]) for p in c["pages"]
    }
    got = {
        r.url: (
            r.warc_ts.replace(tzinfo=__import__("datetime").timezone.utc),
            bytes(r.html) if r.html is not None else None,
            r.text,
            r.lang,
        )
        for r in pages_dataframe(spark, 60, seed=11, scaled=True).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][1] == want[u][1], u  # html bytes identical
        assert got[u][2] == want[u][2], u
        assert got[u][3] == want[u][3], u
