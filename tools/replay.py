#!/usr/bin/env python
"""Driver-contract replay: simulate the external grader locally.

Runs ``__spark_entry__.entry`` for smoke, then every ``queries()`` key
against its ``oracle_sql()`` DuckDB oracle at the given sf dir (default
sf0.01 — the driver's grading scale), comparing with the same
order-insensitive canonical-value rule as ``tests/oracle_utils.compare``.

Usage:
  python tools/replay.py                      # all keys at sf0.01
  python tools/replay.py --first 50           # only the grading-window prefix
  python tools/replay.py --sf /root/testdata/sf0.1 --keys agg_group join_inner
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=0, help="only the first N keys")
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--skip-smoke", action="store_true")
    ap.add_argument(
        "--shuffle",
        type=int,
        default=None,
        metavar="SEED",
        help="run keys in a seeded-random order — catches cross-key "
        "coupling (temp-view collisions, leaked runtime confs) that "
        "registry-order runs mask",
    )
    ap.add_argument(
        "--arrow-fetch",
        action="store_true",
        help="fetch oracle results via .arrow() — the closest emulation "
        "of the grading driver's typed fetch; the deliberate "
        "non-portable control key is then asserted to DIVERGE",
    )
    ap.add_argument(
        "--cpus",
        type=int,
        default=8,
        help="local[N] cores — vary to catch partition-count-dependent "
        "results (the grader's parallelism is unknown)",
    )
    ap.add_argument(
        "--parts",
        type=int,
        default=8,
        help="spark.sql.shuffle.partitions — vary alongside --cpus",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("replay")
        # hostile timezone on purpose: queries must neutralize it
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", str(args.parts))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as E
    from tests.oracle_utils import NONPORTABLE_ORACLE_KEYS, compare, duck_connection

    if not args.skip_smoke:
        n = len(E.entry(spark).collect())
        print(f"smoke: entry() -> {n} rows")
        assert n > 0

    queries = E.queries()
    oracles = E.oracle_sql()
    keys = args.keys or list(queries)
    if args.first:
        keys = keys[: args.first]
    if args.shuffle is not None:
        import random

        random.Random(args.shuffle).shuffle(keys)

    con = duck_connection(args.sf)
    failures: list[str] = []
    for i, key in enumerate(keys):
        t0 = time.time()
        try:
            df = queries[key](spark, args.sf)
            if key in oracles:
                nonportable = key in NONPORTABLE_ORACLE_KEYS
                if args.arrow_fetch and nonportable:
                    # the control probe MUST diverge under typed fetch
                    # — a pass here would mean the emulation (or the
                    # round-6 theory) no longer detects the class
                    try:
                        compare(
                            df, con, oracles[key],
                            allow_nonportable=True, arrow_fetch=True,
                        )
                    except AssertionError:
                        status = "pass (control diverged as predicted)"
                    else:
                        raise AssertionError(
                            "non-portable control key PASSED under "
                            "arrow fetch — typed-fetch emulation no "
                            "longer detects the HUGEINT class"
                        )
                else:
                    compare(
                        df,
                        con,
                        oracles[key],
                        allow_nonportable=nonportable,
                        arrow_fetch=args.arrow_fetch,
                    )
                    status = "pass"
            else:
                rows = df.collect()
                status = f"rows-only ({len(rows)} rows)"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(key)
            traceback.print_exc()
        print(f"[{i + 1}/{len(keys)}] {key}: {status} ({time.time() - t0:.1f}s)")

    print(f"\n{len(keys) - len(failures)}/{len(keys)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
