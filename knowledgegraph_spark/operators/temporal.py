"""Temporal operators: as-of join and sessionization.

Neither exists in the reference (its only time handling is a timestamp
filter), but both are table-stakes for event/web-crawl analytics at
scale, and both compose from built-in Spark operators (SURVEY's
"composition of existing DataFrame ops" tier — no UDF needed).

  * ``asof_join`` — for each left row, the most recent right row with
    ``right.ts <= left.ts`` sharing the key.  Implemented as the
    union-and-carry-forward window pattern: one shuffle on (key), one
    window pass — no range-explosion, no per-key loops.  This is the
    plan shape that survives 10^9-row event tables (a naive
    theta-join ``r.ts <= l.ts`` is quadratic).

  * ``sessionize`` — gap-based session ids per key (session window):
    lag + cumulative sum of gap-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left timestamp.

    ``right_cols``: right columns to carry (default: all non-key/ts).
    Rows with no prior right match keep nulls (left join semantics).

    All carried columns come from ONE struct with a single
    last(ignorenulls) — so the output is always a consistent snapshot of
    one right row, never a column-wise mix of different right rows (a
    NULL field in the latest right row stays NULL rather than leaking a
    stale value from an older row).

    ``right_tiebreak``: right column ordering ties among right rows at
    equal (key, ts) — the row with the greatest tiebreak wins.  Without
    it, equal-timestamp right rows resolve in partition order
    (nondeterministic at scale).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    r_struct = F.struct(*[F.col(c) for c in right_cols])
    tb_type = right.schema[right_tiebreak].dataType if right_tiebreak else "int"
    l_tag = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(right.select(r_struct.alias("__r")).schema["__r"].dataType).alias("__r"),
        F.lit(None).cast(tb_type).alias("__tb"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        r_struct.alias("__r"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(None).cast("int")).alias("__tb"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts so "at-or-before"
    # includes ties; among tied right rows the greatest tiebreak is last
    # in the frame and therefore the one last(...) carries.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__is_left"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__cf")
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns] + [
        F.col("__cf")[c].alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)


def sessionize(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key (classic session windowing).

    ``tiebreak``: secondary order column for equal timestamps.  Without
    it, a tie group straddling a gap boundary assigns sessions in
    partition order — nondeterministic (at web scale equal timestamps
    are certain).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.unix_timestamp(F.col(ts).cast("timestamp")).cast("double")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn(
        "session_id", F.concat_ws("#", F.col(key).cast("string"), F.col("session_seq"))
    )
