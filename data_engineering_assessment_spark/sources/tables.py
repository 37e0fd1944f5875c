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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. ``name`` must be a known table.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; we read nanos as LONG (runtime legacy conf) and
    normalize to a proper TimestampType column via integer division —
    `ts div 1000` stays in exact 64-bit arithmetic (a double division
    would lose precision above 2^53 nanos)."""
    if name not in CORPUS_TABLES:
        raise KeyError(f"unknown corpus table {name!r}; know {CORPUS_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


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
    ``02.py:126-127`` pattern) and return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in CORPUS_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
