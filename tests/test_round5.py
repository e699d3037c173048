"""Round-5 verdict/advice gates.

Covers the features commit 8bba072/b8481d1 landed:
  - pure-Python PNG decode (verdict item 3): exact pixels vs hand-built
    PNGs exercising every filter type, plus image_features end-to-end.
  - catalog generation snapshots (verdict item 7): a reader resolved
    pre-swap keeps computing on its generation while a writer swaps.
  - derived ledger bucket count + meta-first commit + bucket-dir layout
    recovery (verdict item 8 / advice item 2).
  - legacy Seen-less upsert origin keys (advice item 1): the kept value's
    origin key follows the WINNING side, synthesized from firstSeen*.
  - ANN derived-plane library default (verdict item 5): planes=None
    equals the explicit derive_planes path.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledgegraph_spark.config import PAGES_SCHEMA


# ---------------------------------------------------------------------------
# PNG decode (round-4 verdict item 3)
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_bytes(pixels: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Encode an HxWxC uint8 array as a non-interlaced 8-bit PNG, using
    the given per-scanline filter type for each row (RFC 2083 §6)."""
    h, w, c = pixels.shape
    bpp = c
    raw = bytearray()
    prior = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * c):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            cc = int(prior[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - ((a + b) >> 1)
            else:
                v = line[x] - _paeth(a, b, cc)
            raw.append(int(v) & 0xFF)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _test_pixels(h: int, w: int, c: int) -> np.ndarray:
    # deterministic, covers the byte range, no RNG object needed
    return (np.arange(h * w * c, dtype=np.int64) * 131 % 256).astype(np.uint8).reshape(
        h, w, c
    )


def test_decode_png_exact_pixels_every_filter():
    from knowledgegraph_spark.operators.multimodal import decode_png

    px = _test_pixels(5, 4, 3)
    # one row per filter type: None, Sub, Up, Average, Paeth
    png = _png_bytes(px, color_type=2, filters=[0, 1, 2, 3, 4])
    got = decode_png(png)
    assert got is not None and got.shape == (5, 4, 3)
    assert np.array_equal(got, px)


def test_decode_png_gray_and_rgba_contracts():
    from knowledgegraph_spark.operators.multimodal import decode_png

    gray = _test_pixels(3, 3, 1)
    got = decode_png(_png_bytes(gray, color_type=0, filters=[0, 1, 2]))
    assert got is not None and got.shape == (3, 3, 3)
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))  # gray → RGB

    rgba = _test_pixels(3, 2, 4)
    got = decode_png(_png_bytes(rgba, color_type=6, filters=[4, 3, 1]))
    assert got is not None and got.shape == (3, 2, 3)
    assert np.array_equal(got, rgba[:, :, :3])  # alpha dropped


def test_decode_png_rejects_unsupported_flavors():
    from knowledgegraph_spark.operators.multimodal import decode_png

    px = _test_pixels(2, 2, 3)
    good = _png_bytes(px, color_type=2, filters=[0])
    assert decode_png(b"not a png") is None
    assert decode_png(good[:20]) is None  # truncated
    # corrupt the IHDR bit depth to 16 (offset: 8 sig + 8 len/type + 8 w/h)
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    assert decode_png(bytes(bad_depth)) is None


def test_image_features_png_via_spark(spark):
    """PNG payloads take the REAL decode path through image_features —
    mirrors test_round4.py's BMP end-to-end gate (verdict item 3 done
    criterion)."""
    from knowledgegraph_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        image_features,
        pixel_features,
    )

    px = _test_pixels(6, 5, 3)
    png = _png_bytes(px, color_type=2, filters=[0, 1, 2, 3, 4, 2])
    rows = [
        ("p1", "image", png, "image/png", 5, 6, None),
        ("p2", "image", b"\xff\xd8 jpeg-ish junk", "image/jpeg", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(media).collect()}
    want = pixel_features(decode_png(png))
    assert np.allclose(got["p1"].feature, want, atol=1e-6)
    assert np.array_equal(decode_png(png), px)
    assert got["p2"].feature is not None and len(got["p2"].feature) == 16  # stub


# ---------------------------------------------------------------------------
# catalog generation snapshots (round-4 verdict item 7)
# ---------------------------------------------------------------------------


def test_reader_pinned_generation_survives_swap(spark, tmp_path):
    from knowledgegraph_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.write(spark.range(3).select(F.col("id").alias("v")), "t")
    reader = cat.read("t")  # resolves generation NOW
    assert os.path.islink(cat.path("t"))
    cat.write(spark.range(10, 14).select(F.col("id").alias("v")), "t")
    # the pinned plan still computes on the old generation's files
    assert sorted(r.v for r in reader.collect()) == [0, 1, 2]
    # a fresh resolve sees the new generation
    assert sorted(r.v for r in cat.read("t").collect()) == [10, 11, 12, 13]


def test_catalog_init_heals_generations(spark, tmp_path):
    """A crash that left extra .gen- dirs (or a gen dir with no link) is
    healed at init: non-target generations dropped, missing link
    restored."""
    from knowledgegraph_spark.sources.catalog import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.write(spark.range(2).select(F.col("id").alias("v")), "t")
    target = os.path.basename(os.path.realpath(cat.path("t")))
    # simulate an uncommitted generation left by a crash
    orphan = os.path.join(wh, "t.gen-deadbeef")
    os.makedirs(orphan)
    cat2 = Catalog(spark, wh)  # init sweep
    assert not os.path.exists(orphan)
    assert os.path.basename(os.path.realpath(cat2.path("t"))) == target
    # simulate the legacy-migration window: link missing, one gen present
    os.remove(cat2.path("t"))
    cat3 = Catalog(spark, wh)
    assert os.path.islink(cat3.path("t"))
    assert sorted(r.v for r in cat3.read("t").collect()) == [0, 1]


# ---------------------------------------------------------------------------
# derived ledger bucket count + layout recovery (verdict item 8, advice 2)
# ---------------------------------------------------------------------------


def test_ledger_buckets_for_arithmetic():
    from knowledgegraph_spark.admin import ledger_buckets_for

    assert ledger_buckets_for(30) == 16  # clamped floor
    assert ledger_buckets_for(10_000_000) == 256  # 10M·16/1M = 160 → 2^8
    assert ledger_buckets_for(10**9) == 4096  # clamped ceiling
    # power of two, monotone
    prev = 0
    for n in (1, 10**4, 10**6, 10**7, 10**8, 10**9):
        b = ledger_buckets_for(n)
        assert b & (b - 1) == 0 and b >= prev
        prev = b


def test_ledger_meta_derived_and_recovered_from_bucket_dirs(spark, tmp_path):
    """First pipeline write derives the ledger layout from the batch and
    commits meta BEFORE the append; if the meta file is lost, the next
    run recovers the modulus from the bucket= dirs instead of a run
    parameter, so stored bucket values never mix moduli."""
    from knowledgegraph_spark.corpus import generate_corpus
    from knowledgegraph_spark.plans.pipeline import run_pipeline

    c = generate_corpus(40, seed=11)
    pages = spark.createDataFrame([Row(**p) for p in c["pages"]], schema=PAGES_SCHEMA)
    batch1 = pages.limit(25)
    wh = str(tmp_path / "wh")
    cat = run_pipeline(spark, batch1, wh, session_id="a")
    meta = cat.get_meta("checkpoint_ledger")
    assert meta is not None and meta["n_buckets"] == 16  # derived, not the 64 default
    # every stored bucket honors the derived modulus
    led = cat.read("checkpoint_ledger")
    bad = led.filter(
        F.col("bucket") != F.pmod(F.xxhash64("url"), F.lit(16)).cast("int")
    ).count()
    assert bad == 0
    # lose the meta file (pre-round-5 crash window), run the second batch
    meta_path = os.path.join(os.path.realpath(cat.path("checkpoint_ledger")), "_kg_meta.json")
    os.remove(meta_path)
    cat2 = run_pipeline(spark, pages, wh, session_id="b")
    meta2 = cat2.get_meta("checkpoint_ledger")
    assert meta2 is not None and meta2["n_buckets"] == 16  # recovered from dirs
    led2 = cat2.read("checkpoint_ledger")
    bad2 = led2.filter(
        F.col("bucket") != F.pmod(F.xxhash64("url"), F.lit(16)).cast("int")
    ).count()
    assert bad2 == 0
    # resume worked under the recovered layout: batch-1 urls were not
    # re-processed (ledger has exactly one 'a' row set and the delta)
    n_urls = led2.select("url").distinct().count()
    assert n_urls == pages.select("url").distinct().count()


# ---------------------------------------------------------------------------
# legacy Seen-less upsert origin keys (round-4 advice item 1)
# ---------------------------------------------------------------------------


def test_legacy_seenless_upsert_keys_follow_winning_side(spark):
    """Existing table predates worksAtSeen*: the kept existing value must
    carry a key synthesized from the EXISTING side's firstSeen*, not the
    losing incoming mention's key — and never a null key (which would
    sort first and permanently outrank real mentions on later runs)."""
    from knowledgegraph_spark.operators.merge import upsert_entities

    existing = spark.createDataFrame(
        [
            ("Person", "alice", "Acme", "2024-01-01", "u-old", 1),
            ("Person", "bob", "Initech", "2024-02-02", "u-bob", 3),
        ],
        "type string, name string, worksAt string, "
        "firstSeenTs string, firstSeenUrl string, firstSeenOrd int",
    )
    incoming = spark.createDataFrame(
        [
            (
                "Person", "alice", "BetaCorp",
                "2025-05-05", "u-new", 9,
                "2025-06-06", "u-attr", 7,
            ),
            (
                "Person", "carol", "Globex",
                "2025-01-01", "u-carol", 2,
                "2025-01-03", "u-carol2", 4,
            ),
        ],
        "type string, name string, worksAt string, "
        "firstSeenTs string, firstSeenUrl string, firstSeenOrd int, "
        "worksAtSeenTs string, worksAtSeenUrl string, worksAtSeenOrd int",
    )
    out = {r.name: r for r in upsert_entities(existing, incoming).collect()}

    # alice: existing value wins (PRESERVE_EXISTING fallback); its key is
    # synthesized from the existing side's firstSeen*, NOT u-attr/u-new
    assert out["alice"].worksAt == "Acme"
    assert out["alice"].worksAtSeenTs == "2024-01-01"
    assert out["alice"].worksAtSeenUrl == "u-old"
    assert out["alice"].worksAtSeenOrd == 1

    # bob: existing-only row — key synthesized, not null
    assert out["bob"].worksAt == "Initech"
    assert out["bob"].worksAtSeenTs == "2024-02-02"
    assert out["bob"].worksAtSeenUrl == "u-bob"

    # carol: incoming-only row — keeps its own attr origin key
    assert out["carol"].worksAt == "Globex"
    assert out["carol"].worksAtSeenTs == "2025-01-03"
    assert out["carol"].worksAtSeenUrl == "u-carol2"

    # firstSeen provenance still takes the minimum across sides
    assert out["alice"].firstSeenTs == "2024-01-01"


# ---------------------------------------------------------------------------
# ANN derived-plane library default (round-4 verdict item 5)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (f"v{i}", [((i * 37 + j * 11) % 19 - 9) / 9.0 for j in range(8)])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id string, embedding array<float>")


def test_ann_derived_planes_equal_literal(spark, vectors):
    from knowledgegraph_spark.operators.similarity import (
        ann_topk_lsh,
        derive_planes,
        n_planes_for,
    )

    q = [((5 * 37 + j * 11) % 19 - 9) / 9.0 for j in range(8)]
    planes = derive_planes(vectors)
    assert len(planes) == n_planes_for(60)  # corpus-sized, here the floor
    default = ann_topk_lsh(vectors, q, planes=None, k=5).collect()
    literal = ann_topk_lsh(vectors, q, planes=planes, k=5).collect()
    assert [r.vec_id for r in default] == [r.vec_id for r in literal]
    assert np.allclose(
        [r.cosine_sim for r in default], [r.cosine_sim for r in literal]
    )


def test_near_dup_derived_planes_equal_literal(spark, vectors):
    from knowledgegraph_spark.operators.similarity import (
        derive_planes,
        embedding_near_dup_pairs,
    )

    planes = derive_planes(vectors)
    default = sorted(
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            vectors, planes=None, threshold=0.98
        ).collect()
    )
    literal = sorted(
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            vectors, planes=planes, threshold=0.98
        ).collect()
    )
    assert default == literal
