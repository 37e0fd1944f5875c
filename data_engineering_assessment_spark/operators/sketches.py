"""Frequency sketches: Misra–Gries candidate generation with exact
verification.

The two-pass heavy-hitter pattern for 100 TB token streams:

1. **Candidate pass** — each partition folds its token stream into a
   bounded Misra–Gries summary (capacity ``m`` counters, O(m) memory,
   no shuffle).  MG's guarantee: any item with partition frequency
   > n_p/(m+1) survives the partition's summary.  By averaging, an
   item with GLOBAL count > N/k has frequency > 1/k ≥ 1/(m+1) in at
   least one partition (for m+1 ≥ k), so the union of per-partition
   survivors is a provable SUPERSET of the true global heavy hitters
   — no cross-partition merge is even required for the superset
   property.  The driver sees only P·m candidate tokens.
2. **Verify pass** — exact counts of the candidates only (broadcast
   semi-join, then a shuffle over ≤ P·m keys, not the full token
   stream), filtered by the exact integer predicate
   ``count · k > N``.

The final output is therefore EXACT and deterministic — independent
of partitioning, batch boundaries, and MG eviction order (any
candidate superset yields the same verified answer) — which is what
makes a sketch-guided operator oracle-checkable.  Contrast with
``token_topk``, which shuffles every distinct token; here the full
token stream is scanned twice but never shuffled.

MG summary maintenance is the mergeable-summaries formulation
(combine counts, then subtract the (m+1)-th largest and drop ≤ 0) —
vectorized per Arrow batch via ``value_counts`` rather than
per-token Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(acc: dict[str, int], batch: dict[str, int], capacity: int) -> dict[str, int]:
    """Merge a batch of exact counts into an MG summary of bounded size.

    Standard mergeable-summary step (Agarwal et al., "Mergeable
    Summaries"): add counts, and if more than ``capacity`` counters
    remain, subtract the (capacity+1)-th largest count from all and
    drop the non-positive ones.  Estimates only ever undercount, by
    at most the total subtracted — enough to preserve the superset
    guarantee used here."""
    for t, c in batch.items():
        acc[t] = acc.get(t, 0) + int(c)
    if len(acc) > capacity:
        kth = sorted(acc.values(), reverse=True)[capacity]
        acc = {t: c - kth for t, c in acc.items() if c > kth}
    return acc


def _mg_partition(capacity: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, int] = {}
        for pdf in batches:
            counts = pdf["tok"].value_counts()
            acc = mg_merge(acc, counts.to_dict(), capacity)
        yield pd.DataFrame({"tok": list(acc.keys())})

    return run


def heavy_hitters(
    tokens: DataFrame, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact tokens with count·k > N from a one-column ``tok`` frame,
    via MG candidates + exact verification (module docstring)."""
    capacity = capacity or 2 * k
    candidates = tokens.mapInPandas(
        _mg_partition(capacity), schema="tok string"
    ).distinct()
    total = tokens.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tokens.join(F.broadcast(candidates), "tok", "semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) > F.col("n_total"))
        .select("tok", F.col("n").cast("long").alias("n"))
    )
