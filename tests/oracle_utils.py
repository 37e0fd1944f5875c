"""Local replica of the driver's DuckDB-oracle comparison.

Registers the corpus parquet as DuckDB views, runs a query's oracle
SQL, and compares against the Spark result: row count, column names,
and order-insensitive exact values (columns sorted by name, rows
sorted by canonical string form) — the strictest plausible reading of
the driver's value-hash, so passing here should imply passing there.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from data_engineering_assessment_spark.schemas import CORPUS_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"{type(v).__name__[0]}:{v}"


def _rowset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    oracle = con.sql(sql)
    o_cols = list(oracle.columns)
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_set = _rowset(s_rows, s_cols)
    o_set = _rowset(o_rows, o_cols)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs (spark vs oracle): {diffs}")
