"""Additional source/sink formats: JSON-lines, ORC, and quoted CSV.

All are thin wrappers over Spark's native readers/writers — explicit
schemas always (streams and 100 TB batch jobs never infer), and the
reader path is split-parallel (JSONL/ORC/CSV are all splittable, so
a 1000-executor cluster scans one large file as many tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Write as JSON-lines (one object per line, splittable text)."""
    df.write.mode(mode).json(path)
    return path


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read JSON-lines with an explicit schema (no inference pass —
    inference would require an extra full scan of 100 TB)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Write as ORC (columnar, predicate-pushdown-capable)."""
    df.write.mode(mode).orc(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC — schema comes from the file footer (self-describing,
    like parquet); pushdown/pruning work the same way."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Write as RFC-4180 quoted CSV with a header row.

    Unlike the reference's unquoted green-taxi contract, the generic
    sink quotes/escapes so commas and quotes inside values round-trip
    byte-exactly; ``emptyValue=""`` distinguishes the empty string
    from null (written unquoted-empty)."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .option("emptyValue", '""')
        .csv(path)
    )
    return path


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read quoted CSV with an explicit schema (no inference scan);
    mirror options of :func:`write_csv` so the round trip is exact."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("escape", '"')
        .option("emptyValue", '""')
        .csv(path)
    )
