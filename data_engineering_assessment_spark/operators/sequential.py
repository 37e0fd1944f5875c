"""Grouped sequential algorithms via ``applyInPandas``.

The one operator family where dropping to Python is the RIGHT call:
order-dependent dynamic programming over each group's sequence, which
no composition of joins/windows/higher-order functions expresses
(SQL window frames see a fixed-size neighborhood; LIS state depends
on the whole prefix in value order).  The batch grouped-map form —
``groupBy(key).applyInPandas`` — ships each group to Python ONCE as
an Arrow batch, so the cost is one shuffle plus O(n log n) per group,
not a per-row interpreter round-trip.

Scale: parallelism is per group (user); state never leaves the
worker; skewed users are bounded by the largest single sequence, the
same bound any per-entity algorithm has.
"""

from __future__ import annotations

import bisect

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

LIS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("lis_len", T.IntegerType()),
    ]
)


def lis_length(values) -> int:
    """Longest strictly-increasing subsequence length via patience
    sorting (O(n log n)); ``bisect_left`` makes equal values NON-
    extending, i.e. strict increase."""
    tails: list = []
    for v in values:
        i = bisect.bisect_left(tails, v)
        if i == len(tails):
            tails.append(v)
        else:
            tails[i] = v
    return len(tails)


def lis_per_user(events: DataFrame) -> DataFrame:
    """Per-user LIS length of event values in time order.

    Input columns: user_id, ts_s, event_id, value.  Rows inside each
    pandas group are sorted on (ts_s, event_id) — a total order, so
    the result is deterministic under any shuffle layout.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_s", "event_id"])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "lis_len": [lis_length(pdf["value"].tolist())],
            }
        )

    return events.groupBy("user_id").applyInPandas(fn, schema=LIS_SCHEMA)
