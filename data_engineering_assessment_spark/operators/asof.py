"""Generic as-of join (time-series point-in-time lookup).

``asof_join(left, right, ...)`` attaches to every left row the
nearest right row of the same key at-or-before (backward) /
at-or-after (forward) its timestamp, optionally within a tolerance.

Formulation: union the two inputs into one stream and take a running
``last``/``first`` over a (key-partitioned, time-ordered) window —
ONE shuffle on the key, no row explosion, state O(1) per row.  The
naive inequality join is O(left × right) per key and is what this
operator exists to avoid at 100 TB.  Matches pandas.merge_asof
semantics (verified against it in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` ← ``right`` on time column ``on`` within
    key column ``by``.

    ``value_cols`` — right columns to attach (default: all except
    ``on``/``by``); ``tolerance`` — max |left.on − right.on| to accept
    a match (same units as ``on``); ``direction`` — 'backward'
    (most recent at-or-before) or 'forward' (earliest at-or-after).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(F.col(on).alias("_r_on"), *value_cols).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_rvals"),
    )
    r = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_lrow"),
        F.struct(F.col(on).alias("_r_on"), *value_cols).alias("_rvals"),
    )
    u = l.unionByName(r)

    if direction == "backward":
        # right rows at the same instant sort BEFORE left rows so an
        # equal-timestamp right row is visible (merge_asof semantics)
        w = (
            Window.partitionBy("_by")
            .orderBy(F.asc("_on"), F.desc("_src"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(F.when(F.col("_src") == 1, F.col("_rvals")), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_by")
            .orderBy(F.desc("_on"), F.desc("_src"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(F.when(F.col("_src") == 1, F.col("_rvals")), ignorenulls=True).over(w)

    out = (
        u.withColumn("_m", matched)
        .filter(F.col("_src") == 0)
    )
    if tolerance is not None:
        gap = (
            (F.col("_on") - F.col("_m._r_on"))
            if direction == "backward"
            else (F.col("_m._r_on") - F.col("_on"))
        )
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(tolerance), F.col("_m"))
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
