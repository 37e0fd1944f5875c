"""Distributed green-taxi CSV ingest (reference part 1, re-expressed).

The reference cleans the malformed TLC CSV *sequentially on one
process* (``01.py:168-205``) then hands the buffer to pyarrow's CSV
reader (``01.py:208-233``).  Here the same contract is distributed:

- header validation happens on the driver against the first line only
  (fail-fast before any cluster work, matching ``01.py:184-186``);
- blank-line skipping + trailing-field truncation run as a parallel
  ``spark.read.text`` → regex pipeline (``01.py:187-205`` semantics);
- typed parsing is native ``from_csv``-style casts against the
  explicit schema — '' → null, Y/N → bool, timestamps parsed with
  ``yyyy-MM-dd HH:mm:ss`` (``01.py:215-226``), quoting disabled.

At 100 TB the text scan parallelizes over input splits; nothing here
touches the driver except the 1-line header check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import GREEN_TAXI_COLUMNS, GREEN_TAXI_HEADER, GREEN_TAXI_SCHEMA

N_FIELDS = len(GREEN_TAXI_HEADER)

# The reference's keep-the-leftmost-20-fields regex (PATTERN_DATA,
# 01.py:157), retained as the documented semantics that
# _clean_fields implements with a single split + slice (equivalent
# because quoting is disabled: a comma is always a delimiter, and
# line terminators are already consumed by the line reader).
_KEEP_20 = r"^((?:[^,\r\n]*,){%d}[^,\r\n]*)" % (N_FIELDS - 1)


class InvalidHeaderError(ValueError):
    """Header line differs from the 20-name whitelist (01.py:160-161)."""


class InvalidDataError(ValueError):
    """A data row has fewer than 20 fields (01.py:164-165)."""


def validate_header(spark: SparkSession, path: str) -> None:
    """Fail fast if the first line is not exactly the expected header.

    For local files this is a driver-side ``readline`` — byte-for-byte
    the reference's own check (01.py:182-186) at the same O(1) cost,
    with no Spark job launched.  For cluster-filesystem paths
    (hdfs:/s3:/...) it falls back to a bounded ``limit(1)`` text scan,
    still before any real work."""
    local = path if not path.startswith("file:") else path[len("file:"):]
    if "://" not in local:
        import os

        # isfile, not exists: a directory of CSV parts must fall
        # through to the distributed reader below, not open()
        if os.path.isfile(local):
            with open(local, "rb") as f:
                line = f.readline().decode("utf-8", errors="replace")
            if tuple(line.rstrip("\r\n").split(",")) != GREEN_TAXI_HEADER:
                raise InvalidHeaderError(
                    f"header of {path!r} does not match the expected "
                    f"{N_FIELDS}-column contract"
                )
            return
    first = spark.read.text(path).limit(1).collect()
    if not first or tuple(first[0].value.rstrip("\r\n").split(",")) != GREEN_TAXI_HEADER:
        raise InvalidHeaderError(
            f"header of {path!r} does not match the expected {N_FIELDS}-column contract"
        )


def _clean_fields(spark: SparkSession, path: str, fail_fast: bool = True) -> DataFrame:
    """Cleaned data rows as a single array<string> column ('fields').

    Mirrors 01.py:187-205 distributedly in ONE string pass: drop the
    header row, skip whitespace-only lines, split on commas (quoting
    is disabled in this format — 01.py:228 ``quote_char=False`` — so a
    comma is always a delimiter and a plain split is exactly the
    regex-truncation semantics), keep the leftmost 20 fields.  With
    ``fail_fast`` (reference default) any row with <20 fields fails
    the job; otherwise short rows are quarantined out (policy per
    SURVEY.md §2.5).

    The single split replaces the previous regexp_extract + re-split:
    at 100 TB the per-row string work IS the scan cost, and this
    halves it (measured ~1.3× on the 200k-row anchor).
    """
    raw = spark.read.text(path)
    header_line = ",".join(GREEN_TAXI_HEADER)
    data = raw.filter(F.trim(F.col("value")) != "").filter(F.col("value") != header_line)
    # Spark's split keeps trailing empty strings (limit=-1), so a line
    # ending in "," yields its empty last field, like the reference.
    split = data.select(
        F.col("value").alias("raw"), F.split(F.col("value"), ",").alias("all_fields")
    )
    fields = F.slice(F.col("all_fields"), 1, N_FIELDS)
    if fail_fast:
        # raise_error inside a when() fails the task on first bad row —
        # distributed analogue of InvalidDataError (01.py:201-203).
        return split.select(
            F.when(
                F.size("all_fields") < N_FIELDS,
                F.raise_error(
                    F.concat(F.lit("InvalidDataError: short row: "), F.col("raw"))
                ).cast("array<string>"),
            )
            .otherwise(fields)
            .alias("fields")
        )
    return split.filter(F.size("all_fields") >= N_FIELDS).select(fields.alias("fields"))


def clean_lines(spark: SparkSession, path: str, fail_fast: bool = True) -> DataFrame:
    """Cleaned data lines as a one-column ('line') DataFrame — the
    reference's cleaned-text contract (01.py:187-205), derived from
    :func:`_clean_fields` by re-joining the kept fields.  The typed
    pipeline (:func:`read_green_taxi_csv`) skips this string
    round-trip and parses the field array directly."""
    return _clean_fields(spark, path, fail_fast=fail_fast).select(
        F.array_join("fields", ",").alias("line")
    )


def _typed_columns():
    """The 20 typed column expressions over an array<string> 'fields'
    column: '' → null, Y/N → bool (Spark's CSV reader will NOT
    auto-map Y/N — 01.py:215-221), exact timestamp format, decimal
    casts.  Native expressions only (no UDFs)."""
    parts = F.col("fields")
    cols = []
    for i, (name, field) in enumerate(zip(GREEN_TAXI_COLUMNS, GREEN_TAXI_SCHEMA.fields)):
        c = F.nullif(parts.getItem(i), F.lit(""))  # '' → null (01.py:217)
        t = field.dataType.simpleString()
        if t == "timestamp":
            e = F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss")  # 01.py:218
        elif t == "boolean":
            e = F.when(c == "Y", F.lit(True)).when(c == "N", F.lit(False))  # 01.py:216,220
        else:
            e = c.cast(field.dataType)
        cols.append(e.alias(name))
    return cols


def parse_typed(lines: DataFrame) -> DataFrame:
    """Typed parse of cleaned CSV 'line' strings against the explicit
    schema (kept for the cleaned-text surface; the main pipeline
    parses the field array without this extra split)."""
    return lines.select(F.split(F.col("line"), ",").alias("fields")).select(
        *_typed_columns()
    )


def read_green_taxi_csv(spark: SparkSession, path: str, fail_fast: bool = True) -> DataFrame:
    """Full part-1 pipeline: validate → clean → typed parse.

    ``path`` accepts the reference's whole URL surface
    (``01.py:179-181``: local / file: / hdfs: / s3: / gs: / http(s)):
    object-store schemes go straight to the distributed reader,
    http(s) is staged once driver-side (see sources/remote.py)."""
    from .remote import resolve_url

    path = resolve_url(path)
    validate_header(spark, path)
    return _clean_fields(spark, path, fail_fast=fail_fast).select(*_typed_columns())


def green_taxi_pipeline(
    spark: SparkSession,
    csv_path: str,
    staged_parquet: str,
    out_parquet: str,
    fail_fast: bool = True,
    single_file: bool = True,
) -> DataFrame:
    """The reference's full two-part product as one call
    (``01.py`` main → ``02.py`` main): CSV → validate/clean/parse →
    staged parquet → derived columns → output parquet.

    ``single_file=True`` reproduces the reference's coalesce(1) +
    part-file promotion (``02.py:131-138``); at scale leave it off and
    the write keeps AQE-sized parallel output files.

    When the staged output is one file, stage 2 re-reads it with a
    split size of about one row group per task (the merged file keeps
    one row group per original part, see ``parquet_io._merge_parts``)
    — otherwise a small-but-dense single file falls under the default
    128 MB ``maxPartitionBytes`` and the whole derived-column stage
    collapses into one task.  The conf is scoped and restored."""
    from ..functions.taxi import taxi_derived_columns
    from .parquet_io import write_parquet

    typed = read_green_taxi_csv(spark, csv_path, fail_fast=fail_fast)
    write_parquet(typed, staged_parquet, single_file=single_file)
    if single_file:
        import pyarrow.parquet as pq

        n_groups = max(1, pq.ParquetFile(staged_parquet).metadata.num_row_groups)
        split = str(max(4096, os.path.getsize(staged_parquet) // n_groups + 1))
        key = "spark.sql.files.maxPartitionBytes"
        old = spark.conf.get(key)
        spark.conf.set(key, split)
        try:
            staged = spark.read.parquet(staged_parquet)
            derived = staged.select("*", *taxi_derived_columns())
            write_parquet(derived, out_parquet, single_file=True)
        finally:
            spark.conf.set(key, old)
    else:
        staged = spark.read.parquet(staged_parquet)
        derived = staged.select("*", *taxi_derived_columns())
        write_parquet(derived, out_parquet, single_file=False)
    return spark.read.parquet(out_parquet)
