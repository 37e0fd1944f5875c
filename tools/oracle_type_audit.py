#!/usr/bin/env python
"""Audit every oracle's DuckDB OUTPUT TYPES for hash-portability.

Theory under test (round 6): the driver's value-hash canonicalization
diverges from local replay exactly on DuckDB output columns whose type
is not in the portable set {BIGINT, INTEGER, VARCHAR, BOOLEAN, DATE,
TIMESTAMP*}.  DuckDB's SUM(BIGINT) returns HUGEINT (INT128) even when
every value fits in 64 bits — so a bare top-level SUM in an oracle is
predicted red, while CAST(SUM(..) AS BIGINT) is predicted green.

Runs each oracle at sf0.001 (fast) via DESCRIBE, prints every key whose
result schema contains a non-portable type, and cross-references the
folded CORRECTNESS_r01..r05 verdicts.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
PORTABLE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "BOOLEAN",
            "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"}


def folded_verdicts() -> dict:
    """Latest-wins verdict fold, shared with tools/rotation.py (which
    handles arbitrary round numbers — a local r0* glob would silently
    drop CORRECTNESS_r10.json and later)."""
    spec = importlib.util.spec_from_file_location(
        "rotation", "/root/repo/tools/rotation.py"
    )
    rotation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rotation)
    verdicts, _vintage, _next_round = rotation.fold_verdicts()
    return {k: (v, "folded") for k, v in verdicts.items()}


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = entry.oracle_sql()
    verdicts = folded_verdicts()

    flagged = {}
    errors = {}
    for key, sql in oracles.items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            errors[key] = str(e).splitlines()[0][:120]
            continue
        bad = [(name, typ) for name, typ, *_ in desc if typ not in PORTABLE]
        if bad:
            flagged[key] = bad

    print(f"oracles audited: {len(oracles)}, flagged: {len(flagged)}, errors: {len(errors)}")
    print("\n=== flagged keys (non-portable DuckDB output types) ===")
    for key, bad in flagged.items():
        v = verdicts.get(key)
        if v is None:
            status = "NEVER-GRADED"
        else:
            d, src = v
            status = ("GREEN" if d.get("hash_match") else "RED") + f" ({src})"
        print(f"  {key:32s} {status:24s} {bad}")

    print("\n=== theory cross-check: graded ∩ flagged should ALL be red ===")
    graded_flagged = {k for k in flagged if k in verdicts}
    reds = {k for k, (d, _) in verdicts.items() if d.get("hash_match") is False}
    print(f"  flagged & graded: {sorted(graded_flagged)}")
    print(f"  all reds:         {sorted(reds)}")
    print(f"  flagged&graded that are GREEN (theory violations): "
          f"{sorted(graded_flagged - reds)}")
    print(f"  reds NOT flagged (unexplained reds): {sorted(reds - set(flagged))}")
    if errors:
        print("\n=== describe errors ===")
        for k, e in errors.items():
            print(f"  {k}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
