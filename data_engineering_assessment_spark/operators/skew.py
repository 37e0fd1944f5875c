"""Skew-mitigation join: explicit key salting.

AQE's skew-join split handles most skew at runtime; explicit salting
is the deterministic fallback for the pathological case — one join
key carrying a large fraction of all rows (power-law user_ids, null
buckets, default/sentinel keys), where even a split partition is a
straggler.  The transform is results-neutral: every fact row keeps
exactly one salt, every dim row is replicated across all salts, so
(key, salt) equi-join ≡ key equi-join.

Cost model: dim side inflates ×`salts` (keep it the smaller input);
fact shuffle keys widen from `key` to `(key, salt)`, spreading each
hot key over `salts` reducers.  Pick `salts` ≈ ceil(hot-key rows /
target-partition rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salts: int = 8,
    how: str = "inner",
    fact_salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join ``fact.fact_key == dim.dim_key`` with ``salts``-way
    key salting.

    ``fact_salt_source`` — expression the per-row salt is derived
    from (deterministic; defaults to a hash of the whole fact row).
    Any distribution works for correctness; uniform spreads best.
    """
    if fact_salt_source is None:
        fact_salt_source = F.xxhash64(*[F.col(c) for c in fact.columns])
    f = fact.withColumn("_salt", F.pmod(fact_salt_source, F.lit(salts)).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how
    )
    return out.drop("_salt")
