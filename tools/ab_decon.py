#!/usr/bin/env python
"""Best-of-N wall for one registry key, runnable against ANY repo tree
(VERDICT r11 #4: adjudicate the decontaminate_overlap r10→r11 bench
drift by timing the SAME key from the r10-HEAD and r11-HEAD trees on
a quiet box).

Usage:
    python tools/ab_decon.py --tree /tmp/ab_r10 --key decontaminate_overlap
    python tools/ab_decon.py --tree /root/repo --runs 5

One process per tree (fresh JVM; no cross-tree module bleed): run the
script once per tree and compare the printed best-of-N.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument("--key", default="decontaminate_overlap")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    from data_engineering_assessment_spark import plans
    from data_engineering_assessment_spark.session import get_spark

    spark = get_spark()
    q = plans.queries()[args.key]
    # warm scan infra once at the grading scale (excluded from timing)
    q(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        q(spark, args.sf).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(
        f"{args.tree}  {args.key}  best-of-{args.runs} "
        f"{min(walls):.3f} s  all={['%.3f' % w for w in walls]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
