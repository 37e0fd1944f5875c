"""Behavioral guarantees of the round-4 curation plans that the
oracle hash can't state directly: NTILE's equal-depth guarantee, the
spine's gaplessness, the sample's exact-K contract, and that the
corrupt-scan fixture is genuinely unreadable without tolerance."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from data_engineering_assessment_spark.plans import curation
from tests.conftest import SF_DIR


def test_equidepth_bins_differ_by_at_most_one(spark):
    rows = curation.agg_histogram_equidepth(spark, SF_DIR).collect()
    sizes = [r.n for r in rows]
    assert len(rows) == 8
    assert max(sizes) - min(sizes) <= 1
    # bins tile the value range in order without overlap
    by_bin = sorted(rows, key=lambda r: r.bin)
    for lo, hi in zip(by_bin, by_bin[1:]):
        assert lo.hi_cents <= hi.lo_cents


def test_spine_has_no_gaps_and_zero_days_are_explicit(spark):
    rows = sorted(
        curation.ts_spine_zero_fill(spark, SF_DIR).collect(), key=lambda r: r.day_s
    )
    diffs = {b.day_s - a.day_s for a, b in zip(rows, rows[1:])}
    assert diffs == {86400}
    assert all(r.n_events >= 0 for r in rows)


def test_reservoir_is_exactly_k_and_stable(spark):
    a = curation.sample_reservoir(spark, SF_DIR).collect()
    b = curation.sample_reservoir(spark, SF_DIR).collect()
    assert len(a) == curation.RESERVOIR_K
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_group_holdout_never_splits_a_source(spark):
    from data_engineering_assessment_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tagged = docs.select(
        "source",
        F.when(F.substring(F.md5("source"), 1, 1).isin("0", "1"), "eval")
        .otherwise("train")
        .alias("split"),
    )
    spans = tagged.groupBy("source").agg(F.countDistinct("split").alias("k"))
    assert spans.filter(F.col("k") > 1).count() == 0


def test_corrupt_fixture_is_genuinely_unreadable(spark):
    """Guards the scan_corrupt_tolerant key against a vacuous pass: if
    staging ever stopped truncating the shard, a strict read would
    succeed and this test would fail."""
    curation.scan_corrupt_tolerant(spark, SF_DIR).collect()  # stages + corrupts
    in_dir = f"/root/repo/.scratch/corrupt_scan_{curation._scratch_tag(SF_DIR)}/in"
    assert len(glob.glob(f"{in_dir}/shard*.parquet")) == 4
    with pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(
            f"{in_dir}/shard3.parquet"
        ).collect()
