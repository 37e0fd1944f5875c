#!/usr/bin/env python
"""A/B: old full-inverted-index ngram join vs r16 prefix-filtered path.

Old path reconstructed inline (the pre-r16 operator body, verbatim
shape); new path is the shipped operator.  Same session, alternating
order, best-of-N, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_assessment_spark.operators.dedup import (  # noqa: E402
    _materialized,
    _shingled,
    ngram_jaccard_pairs,
)
from data_engineering_assessment_spark.session import get_spark  # noqa: E402
from data_engineering_assessment_spark.sources.tables import load_table  # noqa: E402


def old_ngram_jaccard_pairs(docs, threshold=0.5):
    sh = _materialized(_shingled(docs, "doc_id", "text", 3))
    ex = sh.select(
        "doc", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("sh")
    )
    a, b = ex.alias("a"), ex.alias("b")
    t = float(threshold)
    size_ok = (F.col("a.n_sh") >= F.col("b.n_sh") * t) & (
        F.col("b.n_sh") >= F.col("a.n_sh") * t
    )
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")) & size_ok,
        )
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    union = (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("long")
    jacc = F.col("inter").cast("double") / union.cast("double")
    return pairs.select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("long").alias("inter"),
        union.alias("n_union"),
        jacc.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-prefix")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf, "documents")
    # warmup
    docs.write.format("noop").mode("overwrite").save()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def run(tag, builder):
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"ab:{tag}")
            t0 = time.perf_counter()
            builder().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: best {min(ts):.3f}  reps {[round(t,2) for t in ts]}", flush=True)

    for _ in range(2):
        run("old", lambda: old_ngram_jaccard_pairs(docs))
        run("new", lambda: ngram_jaccard_pairs(docs, threshold=0.5))
    spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
