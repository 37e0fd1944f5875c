#!/usr/bin/env python
"""A/B: pre-r16 alternating-CC round body vs the shipped r16 rewrite,
and pre-r16 propagation-CC edge partitioning vs the shipped x-repartition.

Old shapes reconstructed inline (verbatim pre-r16 bodies).  Same
session, alternating order, best-of-N over the full graph_cc_alternating
/ graph_connected_components builder+exec (the loops run at build time).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_assessment_spark.operators.graph import (  # noqa: E402
    edge_fingerprint,
)
from data_engineering_assessment_spark.session import get_spark  # noqa: E402
from data_engineering_assessment_spark.sources.tables import load_table  # noqa: E402


def _edges(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("ss"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, x -> transform("
                    "filter(ss, y -> y != x), y -> struct(x AS x, y AS y))))"
                )
            ).alias("pr")
        )
        .select("pr.x", "pr.y")
        .distinct()
        .localCheckpoint(eager=False)
    )


def old_cc_alternating(edges, max_iter=20):
    """Pre-r16 operator body with edges_distinct=True semantics."""
    raw = edges.select(F.col("x").alias("u"), F.col("y").alias("v"))
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    e = raw.filter(F.col("u") != F.col("v"))
    prev = edge_fingerprint(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        bi = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bi.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("u"), F.col("mn")).alias("m")
        )
        large = (
            bi.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        hi = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smins = hi.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            hi.join(smins, "u")
            .select(
                F.explode(F.array(F.col("u"), F.col("v"))).alias("u"),
                F.col("m").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = edge_fingerprint(small)
        e = small
        if cur == prev:
            break
        prev = cur
    final = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("lbl"))
    labels = all_nodes.join(final, "node", "left").select(
        "node",
        F.least(F.coalesce(F.col("lbl"), F.col("node")), F.col("node")).alias(
            "component"
        ),
    )
    return labels, rounds


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-ccalt")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    from data_engineering_assessment_spark.operators.graph import (
        connected_components_alternating,
    )

    def run(tag, fn):
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"ab:{tag}")
            t0 = time.perf_counter()
            lab, rounds = fn()
            lab.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{tag}: best {min(ts):.3f}  rounds={rounds}  reps {[round(t,2) for t in ts]}",
            flush=True,
        )

    for _ in range(2):
        run("old", lambda: old_cc_alternating(_edges(spark, sf)))
        run(
            "new",
            lambda: connected_components_alternating(
                _edges(spark, sf),
                src="x",
                dst="y",
                edges_distinct=True,
                edges_symmetric=True,
            ),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
