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
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left timestamp.

    ``right_cols``: right columns to carry (default: all non-key/ts).
    Rows with no prior right match keep nulls (left join semantics).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    l_tag = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts so "at-or-before" includes ties
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__cf_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns] + [
        F.col(f"__cf_{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)


def sessionize(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign gap-based session ids per key (classic session windowing)."""
    w = Window.partitionBy(key).orderBy(ts)
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
