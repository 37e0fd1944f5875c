#!/usr/bin/env python
"""A/B the graph_khop_reach frontier-lineage shape (VERDICT r10 #5).

Variant A (graded default): frontiers/visited stay a nested lazy
lineage — frontier k's subtree re-evaluates every earlier hop inside
the one output action.
Variant B: each per-hop frontier is eagerly localCheckpointed right
after its distinct + anti-join (post-shuffle, so the blocks are the
reliable 32-partition kind per the khop NOTE on ``e``).

Prints best-of-N wall per variant per SF dir.  Run after building the
scratch notches:
    python tools/make_sf10x.py                    # sf0.1 -> .scratch/sf1
    python tools/make_sf10x.py --src /root/repo/.scratch/sf1 \
        --out /root/repo/.scratch/sf10 --stride-scale 10 --doc-tag "W{c}y"
    python tools/ab_khop.py --sfs /root/testdata/sf0.1 \
        /root/repo/.scratch/sf1 /root/repo/.scratch/sf10
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sfs",
        nargs="+",
        default=["/root/testdata/sf0.1", "/root/repo/.scratch/sf1"],
    )
    args = ap.parse_args()

    # Historical headroom note: before round 12 each khop invocation
    # localCheckpointed a fresh |E| edge frame and eighteen of those
    # OOM'd a 16g driver at sf10.  Round 12 moved the edge set to a
    # persisted bucketed layout (plans/analytics.py:_trade_edges) so
    # only the node-sized per-hop frontiers checkpoint now; the
    # headroom stays for the A-variant's nested lineage at big SFs.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from data_engineering_assessment_spark import plans
    from data_engineering_assessment_spark.plans import analytics
    from data_engineering_assessment_spark.session import get_spark

    spark = get_spark()
    q = plans.queries()["graph_khop_reach"]
    # warm scan infra once
    q(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()

    # restore the module's graded default afterwards — leaving the
    # harness's last-set value in place would make any later
    # in-process khop call silently measure a non-graded variant
    orig_flag = analytics.KHOP_CHECKPOINT_FRONTIERS
    try:
        for sf_dir in args.sfs:
            for label, flag in (("A lineage", False), ("B ckpt-frontier", True)):
                analytics.KHOP_CHECKPOINT_FRONTIERS = flag
                best, rows = float("inf"), None
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    got = q(spark, sf_dir).collect()
                    best = min(best, time.perf_counter() - t0)
                    rows = sorted((r["hop"], r["n_reached"]) for r in got)
                    # let ContextCleaner reap the dead checkpoint blocks
                    spark.sparkContext._jvm.System.gc()
                    time.sleep(1.0)
                print(f"{sf_dir}  {label:16s}  best-of-{args.runs} {best:7.2f} s  {rows}", flush=True)
    finally:
        analytics.KHOP_CHECKPOINT_FRONTIERS = orig_flag


if __name__ == "__main__":
    main()
