"""Skew handling: salted two-phase aggregation + head-key detection.

The north_rule requires head-entity skew handled explicitly: a frequent
organization appearing in a large fraction of pages makes groupBy(name)
partitions lopsided.  Remedies, composable:

  * AQE skew-join splitting — on by default (session.py).
  * ``salted_agg`` — two-phase aggregation: key+salt partial agg, then
    final agg on the key.  Bounds any single task at ~1/n_salts of the
    head key's rows.  Use for collect_set/array folds where the partial
    results stay small relative to inputs.
  * ``head_keys`` — approx frequency probe to decide which keys need the
    salted path (sampling + count; at scale use this on a 1% sample).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def head_keys(df: DataFrame, key_cols: Sequence[str], min_count: int) -> DataFrame:
    """Keys whose row count ≥ min_count — candidates for salting."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("key_count"))
        .filter(F.col("key_count") >= min_count)
    )


def pick_n_salts(
    df: DataFrame,
    key_cols: Sequence,
    sample_frac: float = 1.0,
    target_rows_per_task: int = 500_000,
    min_rows_to_salt: int = 2_000_000,
    max_salts: int = 64,
    seed: int = 42,
) -> int:
    """Adaptive salt count from an (optionally sampled) head-key probe.

    Estimates the max rows-per-key from a seeded sample and returns the
    power-of-two salt count that bounds any single reducer task to
    ``target_rows_per_task`` rows of the head key — or 0 when no key is
    estimated above ``min_rows_to_salt`` (no head keys ⇒ the two-phase
    fold is pure overhead and the caller should run single-phase).

    Thresholds are calibrated from measurement, not guessed: at 2M pages
    (head key ~1.5M mention rows) the two-phase fold costs 2.4× the
    single-phase one on 8 cores (37.7 s vs 15.8 s — BENCH/BASELINE.md
    round-3 notes) because a ~1M-row reducer is only ~1-2 s of single-task
    work; salting starts paying once the head reducer alone approaches a
    task-minute, i.e. several million rows.  Hence salt only above 2M
    rows per key, sized so no reducer sees more than ~500k head rows.

    Deterministic (seeded sample), one small aggregation job; callers run
    it over an already-materialized stage so the probe costs ~a narrow
    scan, not a recompute.  ``key_cols`` accepts names or Columns.
    """
    s = df.sample(fraction=sample_frac, seed=seed) if sample_frac < 1.0 else df
    row = (
        s.groupBy(*key_cols)
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]
    )
    mx = int(row["mx"] or 0)
    est = mx / sample_frac if sample_frac > 0 else mx
    return n_salts_for_max_rows(
        est,
        target_rows_per_task=target_rows_per_task,
        min_rows_to_salt=min_rows_to_salt,
        max_salts=max_salts,
    )


def n_salts_for_max_rows(
    est_max_rows_per_key: float,
    target_rows_per_task: int = 500_000,
    min_rows_to_salt: int = 2_000_000,
    max_salts: int = 64,
) -> int:
    """The ``pick_n_salts`` decision rule on an already-known head-key size.

    Callers that compute per-key counts as part of an existing aggregation
    (the pipeline's surface table carries them for free — the surface
    groupBy ships the same bytes as the old distinct) use this directly
    and skip the probe's dedicated scan+shuffle entirely.
    """
    import math

    if est_max_rows_per_key < min_rows_to_salt:
        return 0
    return int(
        min(
            max_salts,
            2 ** math.ceil(math.log2(max(est_max_rows_per_key / target_rows_per_task, 2.0))),
        )
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``partial_aggs()`` aggregates raw rows within (key, salt);
    ``final_aggs()`` merges the per-salt partials per key.  The salt is
    derived from a high-cardinality column when given (deterministic) or
    a random int otherwise.

    Example — skew-proof distinct-source count:
        salted_agg(df, ["name"],
                   lambda: [F.collect_set("url").alias("urls")],
                   lambda: [F.array_distinct(F.flatten(F.collect_list("urls"))).alias("urls")])
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else (F.rand() * n_salts).cast("int")
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*partial_aggs())
    )
    return partial.groupBy(*key_cols).agg(*final_aggs()).drop("__salt")
