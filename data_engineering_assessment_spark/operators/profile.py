"""One-pass column profiler.

Data profiling is the first query anyone runs on an unfamiliar 100 TB
table, so it must be ONE scan: every per-column statistic (null count,
exact distinct count) is an aggregate expression in a single agg —
Catalyst plans the distincts with one expand + partial aggregation —
and the wide single-row result is unpivoted to one row per column with
``stack`` (a generator expression, not a driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_null, n_distinct)``.

    All counts are exact BIGINTs (engine-portable); for approximate
    profiling at extreme cardinality swap ``count_distinct`` for
    ``approx_count_distinct`` at the call site."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__dist_{c}`" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (col_name, n_null, n_distinct)",
        "__n as n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct")
