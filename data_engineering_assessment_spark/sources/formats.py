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


def write_csv_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """`write_csv` with gzip codec — the compressed-export contract.
    Gzip is NOT splittable: each .csv.gz file reads back as ONE task,
    so the writer keeps the input's many part files (parallelism from
    file count, the standard workaround) rather than coalescing."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("compression", "gzip")
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


# ---------------------------------------------------------------------------
# Fixed-width text (mainframe/COBOL-style flat files)
# ---------------------------------------------------------------------------

FixedWidthSpec = list[tuple[str, int, str]]
"""Ordered (column, width, type) field layout; types are Spark DDL
strings ("long", "string", ...).  Widths must cover the rendered
value — the writer REFUSES to truncate (truncation is silent data
loss; a too-narrow layout is a schema bug, not a formatting choice)."""


def write_fixed_width(
    df: DataFrame, path: str, spec: FixedWidthSpec, mode: str = "overwrite"
) -> str:
    """Render rows as fixed-width lines (space right-padded fields,
    concatenated in spec order) and write as plain text.

    Entirely native expressions: rpad+concat per field, so rendering
    runs inside whole-stage codegen at scan speed.  A value wider
    than its field raises at write time via the length guard column
    (raise_error inside a when-otherwise), never truncates silently.
    Splittable text output — the reader parallelizes like CSV/JSONL.
    """
    from pyspark.sql import functions as F

    fields = []
    for name, width, _typ in spec:
        s = F.col(name).cast("string")
        guarded = F.when(
            F.length(s) > width,
            F.raise_error(
                F.concat(
                    F.lit(f"fixed-width overflow in column {name!r} (width {width}): "),
                    s,
                )
            ),
        ).otherwise(F.rpad(s, width, " "))
        fields.append(guarded)
    df.select(F.concat(*fields).alias("value")).write.mode(mode).text(path)
    return path


def read_fixed_width(spark: SparkSession, path: str, spec: FixedWidthSpec) -> DataFrame:
    """Parse fixed-width lines back into typed columns: substring by
    the spec's offsets, trim the pad, cast to the declared type.  All
    native expressions (no UDF) — at 100 TB this parses at scan speed
    with full codegen, and column pruning drops unreferenced
    substrings before they are ever sliced.

    Format limitation (inherent to space-padded fixed-width, not this
    reader): a string value's own TRAILING spaces are indistinguishable
    from pad and are stripped on read.  Use a digest/escaped encoding
    for trailing-space-significant data (the round-trip key ships text
    as its fixed-32-hex md5 for exactly this reason)."""
    from pyspark.sql import functions as F

    cols, off = [], 1
    for name, width, typ in spec:
        cols.append(
            F.rtrim(F.substring("value", off, width)).cast(typ).alias(name)
        )
        off += width
    return spark.read.text(path).select(*cols)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> str:
    """Write as XML (Spark 4 native source — the spark-xml package
    folded into core).  One element per row under ``row_tag``; field
    values are XML-escaped by the writer and unescaped by the reader,
    so content round-trips byte-exactly for any XML-1.0-legal text."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
    return path


def read_xml(spark: SparkSession, path: str, schema, row_tag: str = "row") -> DataFrame:
    """Read XML with an EXPLICIT schema (inference on XML is even less
    stable than on JSON — attributes vs elements, numeric widening)."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )
