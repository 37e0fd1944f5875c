#!/usr/bin/env python
"""Round-15 optimization profiler.

Per key: best-of-N wall time split into BUILD (the queries[name]()
builder call — driver loops with their per-round actions run here)
and EXEC (the noop-sink write of the returned frame), plus the
`.explain("formatted")` text written to plans/r16/<key>_<tag>.txt.

Usage:
  python tools/profile_r16.py --keys graph_kcore graph_triangle_count --tag before
  python tools/profile_r16.py --top 30 --tag before   # slowest 30 from BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write plans/r16/<key>_<tag>.txt")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from data_engineering_assessment_spark import plans
    from data_engineering_assessment_spark.session import get_spark

    keys = list(args.keys or [])
    if args.top:
        detail = json.load(open("/root/repo/BENCH_DETAIL.json"))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        keys += [k for k, _ in ranked[: args.top] if k not in keys]

    spark = get_spark(app_name="dea-spark-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()
    # warmup, same as bench.py
    qs["scan_parquet"](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in keys:
        builds, execs = [], []
        df = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r16-profile:{name}:build")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"r16-profile:{name}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        spark.sparkContext.setJobDescription(None)
        rec = {
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
            "total": round(min(b + e for b, e in zip(builds, execs)), 3),
        }
        out[name] = rec
        print(f"{rec['total']:7.3f}  build={rec['build']:7.3f} exec={rec['exec']:7.3f}  {name}", flush=True)
        if args.tag and df is not None:
            os.makedirs("/root/repo/plans/r16", exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"/root/repo/plans/r16/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
