#!/usr/bin/env python
"""A/B the persisted MinHash band-index storage shape (VERDICT r13 #3).

Shape A (the graded layout, plans/pipeline.py:dedup_minhash_incremental):
ONE bucketed-by-``bkey`` table ``(bkey, doc, sig)`` — the 16-element
signature array is repeated once per band (4 bands => ~4x the
signature bytes stored and shuffled at build time), buying signature
LOCALITY at scoring time: candidates carry both signatures straight
out of the band join, no second join.

Shape B (the split shape the verdict asked to measure): a narrow
``(bkey, doc)`` probe index bucketed by ``bkey`` plus a ``(doc, sig)``
side table bucketed by ``doc`` — each signature stored ONCE, fetched
for surviving candidates via one extra bucketed (exchange-free on the
table side) join.

Measures, per shape and SF dir: index build wall, on-disk bytes, and
probe wall (the full incremental scoring — cross base x delta + intra
delta, est_jaccard >= 0.5 — driven to a count()).  Build cost of
shape B is reported as the sum of both tables' builds; a production
writer would derive both from one signature pass, so the build column
is an upper bound for B.

Run after building the scratch notches (see tools/ab_khop.py):
    python tools/ab_bandindex.py --sfs /root/repo/.scratch/sf10
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def du_bytes(path: str) -> int:
    return int(subprocess.check_output(["du", "-sb", path], text=True).split()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", nargs="+", default=["/root/repo/.scratch/sf10"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.operators.dedup import (
        _materialized,
        minhash_banded,
        minhash_est_jaccard,
        minhash_signatures,
    )
    from data_engineering_assessment_spark.session import get_spark
    from data_engineering_assessment_spark.sources.layout import (
        scratch_bucketed_table,
    )
    from data_engineering_assessment_spark.sources.tables import load_table

    spark = get_spark()
    results = []

    def score(deltab, cand_cross):
        """Union intra-delta candidates and score; both shapes share
        this tail so only the index side differs."""
        d, e = deltab.alias("d"), deltab.alias("e")
        intra = d.join(
            e, (F.col("d.bkey") == F.col("e.bkey")) & (F.col("d.doc") < F.col("e.doc"))
        ).select(
            F.col("d.doc").alias("doc_a"),
            F.col("e.doc").alias("doc_b"),
            F.col("d.sig").alias("sig_a"),
            F.col("e.sig").alias("sig_b"),
        )
        cand = cand_cross.unionAll(intra).dropDuplicates(["doc_a", "doc_b"])
        est = minhash_est_jaccard(F.col("sig_a"), F.col("sig_b"))
        return (
            cand.select("doc_a", "doc_b", est.alias("est"))
            .filter(F.col("est") >= 0.5)
            .count()
        )

    for sf_dir in args.sfs:
        docs = load_table(spark, sf_dir, "documents")
        h1 = F.md5(F.col("doc_id").cast("string").cast("binary")).substr(1, 1)
        base = docs.filter(h1 < "c")

        # ---- shape A: (bkey, doc, sig), sig repeated per band ----
        t0 = time.perf_counter()
        idx_a, _ = scratch_bucketed_table(
            spark,
            "abmha",
            sf_dir,
            lambda: minhash_banded(base).select("bkey", "doc", "sig"),
            key="bkey",
            n_buckets=32,
            schema_sql="bkey BIGINT, doc BIGINT, sig ARRAY<BIGINT>",
        )
        build_a = time.perf_counter() - t0
        bytes_a = du_bytes(_layout_path(sf_dir, "abmha"))

        probes_a = []
        for _ in range(args.reps):
            deltab = _materialized(minhash_banded(docs.filter(h1 >= "c")))
            d, i = deltab.alias("d"), idx_a.alias("i")
            cross = d.join(i, "bkey").select(
                F.least(F.col("d.doc"), F.col("i.doc")).alias("doc_a"),
                F.greatest(F.col("d.doc"), F.col("i.doc")).alias("doc_b"),
                F.col("d.sig").alias("sig_a"),
                F.col("i.sig").alias("sig_b"),
            )
            t0 = time.perf_counter()
            n_a = score(deltab, cross)
            probes_a.append(time.perf_counter() - t0)
            deltab.unpersist()

        # ---- shape B: (bkey, doc) probe + (doc, sig) side table ----
        t0 = time.perf_counter()
        idx_b, _ = scratch_bucketed_table(
            spark,
            "abmhbp",
            sf_dir,
            lambda: minhash_banded(base).select("bkey", "doc"),
            key="bkey",
            n_buckets=32,
            schema_sql="bkey BIGINT, doc BIGINT",
        )
        side_b, _ = scratch_bucketed_table(
            spark,
            "abmhbs",
            sf_dir,
            lambda: minhash_signatures(base).select("doc", "sig"),
            key="doc",
            n_buckets=32,
            schema_sql="doc BIGINT, sig ARRAY<BIGINT>",
        )
        build_b = time.perf_counter() - t0
        bytes_b = du_bytes(_layout_path(sf_dir, "abmhbp")) + du_bytes(
            _layout_path(sf_dir, "abmhbs")
        )

        probes_b = []
        for _ in range(args.reps):
            deltab = _materialized(minhash_banded(docs.filter(h1 >= "c")))
            d, i = deltab.alias("d"), idx_b.alias("i")
            pairs = (
                d.join(i, "bkey")
                .select(
                    F.col("d.doc").alias("ddoc"),
                    F.col("i.doc").alias("bdoc"),
                    F.col("d.sig").alias("sig_a"),
                )
                .dropDuplicates(["ddoc", "bdoc"])
            )
            cross = pairs.join(
                side_b.select(F.col("doc").alias("bdoc"), F.col("sig").alias("sig_b")),
                "bdoc",
            ).select(
                F.least(F.col("ddoc"), F.col("bdoc")).alias("doc_a"),
                F.greatest(F.col("ddoc"), F.col("bdoc")).alias("doc_b"),
                "sig_a",
                "sig_b",
            )
            t0 = time.perf_counter()
            n_b = score(deltab, cross)
            probes_b.append(time.perf_counter() - t0)
            deltab.unpersist()

        assert n_a == n_b, (n_a, n_b)  # same candidates, same scores
        row = {
            "sf_dir": sf_dir,
            "pairs": n_a,
            "A": {"build_s": round(build_a, 2), "bytes": bytes_a,
                  "probe_s": [round(t, 2) for t in probes_a]},
            "B": {"build_s": round(build_b, 2), "bytes": bytes_b,
                  "probe_s": [round(t, 2) for t in probes_b]},
        }
        results.append(row)
        print(json.dumps(row))

        if not args.keep:
            for fam in ("abmha", "abmhbp", "abmhbs"):
                p = _layout_path(sf_dir, fam)
                spark.sql(f"DROP TABLE IF EXISTS {os.path.basename(p)}")
                subprocess.run(["rm", "-rf", p], check=False)

    print(json.dumps({"all": results}))


def _layout_path(sf_dir: str, family: str) -> str:
    """Resolve the one existing layout dir for (family, corpus)."""
    import glob
    import hashlib

    corp = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    hits = glob.glob(f"/root/repo/.scratch/{family}_{corp}_*")
    assert len(hits) == 1, hits
    return hits[0]


if __name__ == "__main__":
    main()
