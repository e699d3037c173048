"""Text analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (no Python UDFs in the hot path): language
ID by stopword-hit heuristic, quality scoring, token counting (whitespace
and a BPE-ish regex), and md5-based document fingerprinting.  Each has an
exact ANSI-SQL twin for the DuckDB oracle gate (__spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword signatures (deterministic heuristic langid).
LANG_SIGNATURES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "was"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "war"),
    "fr": ("le", "la", "les", "et", "de", "est", "avec", "une"),
    "es": ("el", "la", "los", "y", "de", "es", "con", "una"),
}

# BPE-ish token regex: words, numbers, or single non-space punctuation —
# the split used by sub-word tokenizers before merges.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens (empty strings filtered).

    ``array_remove(split(...), '')`` rather than a lambda ``F.filter``:
    the ArrayFilter higher-order function binds its lambda variable per
    element in interpreted mode, measured ~14× slower than non-lambda
    collection expressions on this hot path (guide §1 empirical loop;
    identical output — split yields no nulls, so removing '' is exactly
    the old predicate)."""
    return F.array_remove(F.split(col, r"\s+"), "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish lexical units via regexp_extract_all."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    sig = LANG_SIGNATURES[lang]
    toks = tokens(F.lower(col))
    return F.size(F.filter(toks, lambda t: t.isin(*sig)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features, all codegen'd expressions.

    n_tokens, mean_token_len, stopword_ratio, punct_ratio, upper_ratio —
    the standard pre-training quality filters (length / punctuation /
    stopword heuristics).
    """
    c = F.col(text_col)
    toks = tokens(c)
    n = F.size(toks)
    return df.select(
        "*",
        n.alias("n_tokens"),
        (F.length(F.regexp_replace(c, r"\s", "")) / F.greatest(n, F.lit(1))).alias(
            "mean_token_len"
        ),
        (stopword_hits(c, "en") / F.greatest(n, F.lit(1))).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length(c), F.lit(1))
        ).alias("punct_ratio"),
    )


def detect_lang(col: Column) -> Column:
    """Heuristic langid: argmax of stopword hits across signatures; 'und'
    when nothing matches."""
    hits = [
        F.struct(stopword_hits(col, lang).alias("h"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_SIGNATURES)
    ]
    best = F.greatest(*hits) if len(hits) > 1 else hits[0]
    return F.when(best["h"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: Column, n_chunks: int = 4) -> Column:
    """Deterministic document fingerprint: md5 over normalized text.

    Normalization: lowercase + whitespace collapapsed — robust to
    formatting-only edits; portable (md5 exists in DuckDB for the oracle).
    """
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """60-bit deterministic hash portable across Spark and DuckDB:
    first 15 hex chars of md5(seed || value) as a BIGINT.

    Spark: conv(substring(md5(...),1,15),16,10).  DuckDB twin:
    CAST('0x'||substr(md5(...),1,15) AS BIGINT).  Used wherever the
    DuckDB oracle must reproduce hashing exactly (minhash, simhash);
    xxhash64 stays the scale path where portability is not needed.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), col)), 1, 15), 16, 10
    ).cast("bigint")


def portable_hash_sliced(col: Column, seed: int = 0) -> Column:
    """Portable hash family amortizing ONE md5 digest across 4 seeds.

    Seed ``i`` reads the 8-hex-char (32-bit) slice ``i % 4`` of
    ``md5((i // 4) || '|' || value)`` — a k-seed MinHash family costs
    ``ceil(k/4)`` digests per value instead of k (the per-(value, seed)
    md5 of ``portable_hash64`` was the dominant cost of the portable
    MinHash path).  32 bits per hash is ample for MinHash: the only
    requirement is that *distinct shingles* rarely collide, and both
    engines compute identical slices, so the DuckDB oracle stays
    bit-for-bit:  CAST(('0x' || substr(md5('g|' || v), 1+8*j, 8)) AS
    BIGINT).  The scale path remains ``fast_hash64`` (xxhash64).

    Slices of one digest are NOT independent hash functions; consumers
    that assume row independence across a GROUP of seeds (banded LSH's
    1-(1-s^r)^b model) must not put seeds 4g..4g+3 in the same group —
    ``dedup.minhash_lsh_pairs`` strides its bands for exactly this
    reason.  Plain MinHash sketching (per-seed min) is unaffected: each
    seed's min is taken independently.
    """
    group, slot = divmod(seed, 4)
    digest = F.md5(F.concat(F.lit(str(group) + "|"), col))
    return F.conv(F.substring(digest, 1 + 8 * slot, 8), 16, 10).cast("bigint")


def fast_hash64(col: Column, seed: int = 0) -> Column:
    """Scale-path 64-bit hash: xxhash64 (JVM-native, ~10× cheaper than the
    md5-derived portable hash).  Not reproducible in DuckDB — use
    portable_hash64 wherever an oracle must match bit-for-bit."""
    return F.xxhash64(F.lit(seed), col)
