"""Query plan registry — import side-effect registers all query keys."""

from . import analytics, curation, parity, pipeline, relational, spatial, training, warehouse  # noqa: F401
from .registry import oracles, queries, set_priority  # noqa: F401

# Grading-window rotation (round 4).  The external grader issues
# correctness verdicts for a ~50-key prefix of this registry per
# round; verdicts persist across rounds, so the prefix holds exactly
# the keys that still need one.  Rounds 1-3 left every graded key
# green (CORRECTNESS_r03: 49 hash-pass + 1 no-oracle-by-design), so
# this round's prefix is purely the 64 keys added in round 3 that
# have never received a driver verdict (ordered by tools/rotation.py:
# oracle-checked first, rows-only-by-design last).  ~50 fit the
# window this round; the overflow tail rotates forward in round 5.
set_priority(
    [
        "doc_length_quartiles",
        "quantile_normalize",
        "dedup_incremental",
        "source_overlap_matrix",
        "corpus_build_pipeline",
        "dup_text_fraction",
        "multimodal_quality_join",
        "scan_csv_roundtrip",
        "event_sliding_window",
        "event_funnel",
        "event_retention",
        "event_paths_topk",
        "scd_type2",
        "agg_bitwise",
        "sink_parquet_single",
        "scan_url_source",
        "merge_upsert",
        "ts_resample_ffill",
        "layout_zorder",
        "profile_table",
        "agg_boolean",
        "join_interval_overlap",
        "stream_tumbling_counts",
        "stream_join_attribution",
        "stream_stateful_totals",
        "stream_dedup_ids",
        "stream_sessionize",
        "key_skew_profile",
        "snapshot_diff",
        "market_basket_pairs",
        "ts_gap_detect",
        "stream_upsert_sink",
        "constraint_check",
        "incremental_agg_merge",
        "subquery_multi_exists",
        "join_dim_snapshot",
        "event_dwell_time",
        "layout_compact",
        "schema_evolution_scan",
        "pareto_revenue_share",
        "event_error_hotspots",
        "multi_format_union",
        "agg_mom_change",
        "agg_histogram_log2",
        "stream_sliding_counts",
        "join_dpp_prune",
        "seq_lis_per_user",
        "join_argmin_supplier",
        "agg_share_having",
        "agg_argmax_revenue",
        "codec_roundtrip",
        "agg_weighted_median",
        "set_ops_all",
        "array_explode_outer",
        "shard_assign",
        "quality_bins",
        "corpus_mix",
        "split_train_eval",
        "chunk_overlap",
        "repetition_stats",
        "global_shuffle",
        "vocab_coverage",
        "seq_pack_chunks",
        "bpe_pair_counts",
    ]
)
