"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Training-data-pipeline operators over a documents table (id, text).  All
shuffle-bounded DataFrame plans:

  * exact:           hash-groupBy on a normalized fingerprint — one shuffle.
  * ngram Jaccard:   shingle explode → self-join on shingle → pair agg.
                     The self-join is the scale risk (head shingles); the
                     ``max_shingle_df`` knob drops ultra-common shingles
                     (stopword shingles carry no dedup signal), bounding
                     join fan-out exactly like dropping head keys in the
                     linking stage.
  * MinHash + LSH:   k portable 60-bit hashes per shingle set → min per
                     hash → band signatures → bucket join.  Only documents
                     sharing a band bucket are paired: candidate pairs
                     scale with bucket occupancy, not n².
  * SimHash:         weighted bit-vote over token hashes → 64-bit
                     signature; near-dups = equal signature (or banded
                     Hamming via 4×16-bit keys).
  * embedding:       cosine over ArrayType(float) via zip_with/aggregate —
                     see operators.similarity.

Hashes use the md5-derived portable_hash64 so the DuckDB oracle can
reproduce them bit-for-bit; swap for xxhash64 at scale via ``hash_fn``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.textstats import fast_hash64, portable_hash64, tokens


def normalized_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (fingerprint, keep_id, dup_ids, n_dups): keep = min id, the
    deterministic survivor.  One hash aggregation; at 100 TB this is the
    cheapest dedup pass and always runs first to shrink later stages.
    """
    fp = df.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
            F.count("*").alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def shingle_array(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column as an array expression."""
    toks = tokens(normalized_text(text_col))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # array_remove, not a lambda filter: ArrayFilter's per-element lambda
    # binding is ~4-14× slower interpreted (see textstats.tokens)
    return F.array_remove(F.array_distinct(sh), "")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs — distinct word n-grams per document."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_array(F.col(text_col), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Document pairs with shingle-set Jaccard ≥ threshold.

    |A∩B| from the shingle self-join; |A| and |B| joined in from per-doc
    shingle counts; J = inter / (|A|+|B|-inter).  ``max_shingle_df`` caps
    shingle document frequency before the self-join (skew guard).
    """
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    hash_fn=portable_hash64,
) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash signature over shingle sets.

    One explode + one groupBy: hash h_i(shingle) for all i computed as
    column expressions over the exploded shingles, min-aggregated per doc.
    """
    sh = shingles(df, id_col, text_col, n)
    # hashes are PROJECTED before the aggregation (not computed inside the
    # min() aggregate expressions): ProjectExec's subexpression elimination
    # then dedupes shared digests (portable_hash_sliced derives 4 seeds
    # from one md5), and the partial aggregation runs over plain bigint
    # columns instead of re-evaluating hash expressions per update.
    proj = sh.select(
        "id", *[hash_fn(F.col("shingle"), seed=i).alias(f"_h{i}") for i in range(num_hashes)]
    )
    agg = proj.groupBy("id").agg(
        *[F.min(f"_h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn=fast_hash64,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    ``bands`` bands of ``num_hashes/bands`` rows; docs sharing any band
    bucket become candidates.  Returns distinct (id_a, id_b) candidates —
    feed into ngram_jaccard_pairs or a verify UDF for exact similarity.

    Band composition is STRIDED: band ``b`` takes hashes
    ``{b, b+bands, b+2·bands, …}`` rather than a contiguous run.  The
    banding probability model (1-(1-s^r)^b) assumes the rows within a
    band are independent hash functions; with ``portable_hash_sliced``
    (seed i = slice i%4 of digest i//4) a CONTIGUOUS band of 4 rows is
    four slices of the same md5 digest — fully correlated.  Striding puts
    one slice of a different digest in each band row (e.g. bands=4,
    rows=4: band b gets slice b of digests 0..3), restoring row
    independence with zero extra digests (round-4 advice item 3; the
    index-swap alternative would 4× the digest count of the
    ``num_hashes=4`` signature path).  For seed-independent families
    (fast_hash64) any partition of the hashes into bands is equally
    valid, so the stride is harmless there.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, hash_fn=hash_fn)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":", *[F.col("sig")[b + r * bands] for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn=portable_hash64,
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    Explode tokens → per-token portable hash → per-bit vote (+1/-1) via
    bit tests → sign-aggregate → reassemble.  Pure expressions + one
    groupBy; no UDF.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("tok"),
    )
    h = hash_fn(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select("id", sig.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash band in any of 4 bands
    (Hamming ≤ 3 guaranteed recall by pigeonhole)."""
    sig = simhash(df, id_col, text_col)
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = bands.select(F.col("id").alias("id_a"), "band", "bucket")
    b = bands.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
