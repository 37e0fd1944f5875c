"""Semantic invariants for the round-7 corpus-curation keys
(plans/mlcorpus.py) — value-exactness is covered by the oracle-parity
sweep in test_correctness.py; these assert the properties the
docstrings promise (funnel monotonicity, budget bounds, balance,
normalization) that a hash match alone would not explain."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def test_survivorship_funnel_is_monotone(spark):
    r = QUERIES["dedup_survivorship"](spark, SF_DIR).collect()[0]
    assert (
        r.n_total >= r.n_after_exact >= r.n_after_prefix >= r.n_after_jaccard >= 1
    )


def test_quality_gate_splits_and_is_threshold_consistent(spark):
    rows = QUERIES["quality_weighted_gate"](spark, SF_DIR).collect()
    assert all((r.score >= 600000) == r["pass"] for r in rows)
    # the gate must actually separate (an all-true/all-false bit is a
    # degenerate classifier)
    kinds = {r["pass"] for r in rows}
    assert kinds == {True, False}


def test_tokenize_pack_shard_manifest_consistency(spark):
    rows = QUERIES["tokenize_pack_shard"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 16  # md5 first hex nibble
    for r in rows:
        assert r.n_docs >= 1 and r.n_packs >= 1
        # a pack id is off div 512, so packs can never exceed docs and
        # the token mass must cover (n_packs - 1) full chunk starts
        assert r.n_packs <= r.n_docs
        assert r.total_tokens > (r.n_packs - 1) * 512


def test_mix_temperature_weights_normalize(spark):
    rows = QUERIES["mix_temperature_weights"](spark, SF_DIR).collect()
    total = sum(r.weight_ppm for r in rows)
    # integer floor division loses < 1 ppm per source
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    # temperature flattening: every weight strictly inside (0, 1)
    assert all(0 < r.weight_ppm < 1_000_000 for r in rows)


def test_lang_balance_cuts_every_lang_to_the_min(spark):
    rows = QUERIES["lang_balance_resample"](spark, SF_DIR).collect()
    target = min(r.n_docs for r in rows)
    assert all(r.n_kept == target for r in rows)
    assert all(r.kept_tokens > 0 for r in rows)


def test_length_curriculum_stages_partition_by_length(spark):
    rows = sorted(
        QUERIES["length_curriculum"](spark, SF_DIR).collect(), key=lambda r: r.stage
    )
    assert [r.stage for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert a.max_tok <= b.min_tok  # quartiles are length-ordered
        assert b.cum_tokens == a.cum_tokens + b.stage_tokens
    assert rows[0].cum_tokens == rows[0].stage_tokens


def test_zstd_sample_respects_byte_budget(spark):
    rows = QUERIES["zstd_dict_sample"](spark, SF_DIR).collect()
    for r in rows:
        assert r.n_selected <= r.n_candidates
        assert r.bytes_selected <= 4000
        assert (r.n_selected == 0) == (r.bytes_selected == 0)


def test_semantic_clusters_cover_corpus(spark):
    rows = QUERIES["dedup_semantic_cluster"](spark, SF_DIR).collect()
    assert sorted(r.cluster_id for r in rows) == list(range(8))
    n = QUERIES["dedup_prefix_exact"](spark, SF_DIR).collect()[0].n_docs
    assert sum(r.n_members for r in rows) == n  # embeddings ≡ documents count
    for r in rows:
        assert 0 <= r.n_near < r.n_members  # the seed itself never counts


def test_tv_drift_and_ttr_are_valid_ratios(spark):
    for r in QUERIES["source_token_tv_drift"](spark, SF_DIR).collect():
        assert 0 <= r.tv_ppm <= 1_000_000
    deciles = QUERIES["text_ttr_buckets"](spark, SF_DIR).collect()
    assert sorted(r.decile for r in deciles) == list(range(1, 11))
    for r in deciles:
        assert 0 < r.ttr_ppm <= 1_000_000
        assert r.n_types <= r.n_tokens


def test_event_burst_bounds(spark):
    for r in QUERIES["event_burst_windows"](spark, SF_DIR).collect():
        assert 1 <= r.max_burst_5m <= r.n_events


def test_reorder_interval_gap_arithmetic(spark):
    for r in QUERIES["orders_reorder_interval"](spark, SF_DIR).collect():
        assert r.n_gaps == r.n_orders - 1
        assert r.min_gap_days <= r.max_gap_days
        assert r.min_gap_days * r.n_gaps <= r.sum_gap_days
        assert r.sum_gap_days <= r.max_gap_days * r.n_gaps
