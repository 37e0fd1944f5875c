"""Corpus parquet sources.

Parquet scans are the engine's primary source (reference ``02.py:123``).
Everything goes through ``spark.read.parquet`` so Catalyst gets
predicate pushdown / column pruning / partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CORPUS_TABLES


def _table_fingerprint(path: str) -> tuple:
    """(size, mtime_ns) fingerprint of a corpus entry — a single file
    or a Spark-written directory (top-level data files)."""
    if os.path.isdir(path):
        out = []
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            out.append((f, st.st_size, st.st_mtime_ns))
        return tuple(out)
    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. ``name`` must be a known table.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; we read nanos as LONG (runtime legacy conf) and
    normalize to a proper TimestampType column via integer division —
    `ts div 1000` stays in exact 64-bit arithmetic (a double division
    would lose precision above 2^53 nanos).

    PERF (r15, guide §6): ``spark.read.parquet(path)`` pays a
    driver-side file listing + footer schema inference on EVERY call
    (~110 ms here) — per-query-build overhead that a catalog-backed
    table never pays (a metastore serves the schema; inference happens
    once at registration).  The analyzed DataFrame (immutable plan
    metadata, never data or results) is therefore memoized per
    (session, path, file fingerprint): first call infers, later calls
    reuse the plan.  The size+mtime fingerprint invalidates the memo
    if a corpus file is regenerated in place mid-session — the same
    staleness rule the scratch layouts use (corpus_fingerprint)."""
    if name not in CORPUS_TABLES:
        raise KeyError(f"unknown corpus table {name!r}; know {CORPUS_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    memo = getattr(spark, "_dea_table_memo", None)
    if memo is None:
        memo = {}
        spark._dea_table_memo = memo
    key = (path, _table_fingerprint(path))
    hit = memo.get(key)
    if hit is not None:
        return hit
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    memo[key] = df
    return df


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the source is under-partitioned for the cluster.

    Single-row-group parquet files (the local test corpus) scan as ONE
    task, serializing every downstream narrow stage.  On production
    data with many splits/row groups this is a no-op — the check reads
    the planned partition count, so a well-partitioned 100 TB input is
    never reshuffled.  Use on the fact side of compute-heavy operators
    whose first stage does real work before any exchange."""
    spark = df.sparkSession
    min_parts = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def register_corpus(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view (reference
    ``02.py:126-127`` pattern) and return the DataFrames.

    PERF (r15): re-registering an identical DataFrame under the same
    view name is a no-op — skip the catalog RPC when this session
    already registered this exact (memoized) frame.  A different
    ``sf_dir`` (or a regenerated corpus file) produces a different
    memoized frame, so the view is correctly re-pointed.  The skip is
    additionally guarded by a catalog existence check (ADVICE r15: if
    any future code drops or shadows a corpus view name, the identity
    memo alone would silently skip re-registration and spark.table()
    would resolve stale/missing data)."""
    views = getattr(spark, "_dea_view_memo", None)
    if views is None:
        views = {}
        spark._dea_view_memo = views
    out: dict[str, DataFrame] = {}
    for name in CORPUS_TABLES:
        df = load_table(spark, sf_dir, name)
        if views.get(name) is not df or not spark.catalog.tableExists(name):
            df.createOrReplaceTempView(name)
            views[name] = df
        out[name] = df
    return out
