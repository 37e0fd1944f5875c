"""Query plan registry — import side-effect registers all query keys."""

from . import (  # noqa: F401
    analytics,
    curation,
    insights,
    metrics,
    mlcorpus,
    parity,
    pipeline,
    relational,
    robust,
    spatial,
    training,
    warehouse,
)
from .registry import oracles, queries, set_priority  # noqa: F401

# Grading-window rotation (round 15).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist.  This window is
# COMPUTED by `python tools/rotation.py`; the hand-authored part is
# only the summary-invisible tier the tool's PLANS.md row diff cannot
# see.  In order:
#   1. the new round-15 key (never graded): the bounded-output
#      dedup_embed_incremental_summary (VERDICT r14 what's-wrong #2 —
#      per-delta-doc keep-best verdicts so degenerate duplication
#      degrades to O(docs) output; rows-only, containment pytest),
#   2. the 11 keys whose PLANS.md row changed (plan change => window,
#      the round-11 policy): vocab_growth_curve plus the ten keys
#      rewritten on the round-15 range-partitioned global-rank
#      operator (operators/rankstats.py) or TakeOrderedAndProject —
#      the VERDICT r14 #5 unpartitioned-window audit,
#   3. hand-listed summary-invisible changes: key_skew_profile (its
#      top-20 rewrite left the summary row identical) and the four
#      ORACLE-BACKED layout-tag-bumped keys (every layout.py edit —
#      this round: SCRATCH_ROOT derivation + the newest-mtime temp
#      reaper gate — bumps every versioned_scratch_tag by design);
#      the two rows-only layout-bumped keys (dedup_minhash_incremental,
#      dedup_embed_incremental) are deliberately NOT re-windowed: a
#      no_oracle verdict adds nothing over their recall/containment/
#      immutability pytests, and the round-9 policy keeps verdicted
#      rows-only keys out of the window,
#   4. freshness re-grades, OLDEST VINTAGE FIRST per rotation.py:
#      ALL 32 remaining r7-vintage keys (two of the r7 tier —
#      length_curriculum, text_ttr_buckets — moved up into the
#      plan-changed tier), then r8 alphabetically to the 50-slot
#      edge.
# Exactly 50 names for ~50 slots; after this round the oldest
# evidence vintage advances to r8 (48 r8-vintage keys defer to r16).
WINDOW_PRIORITY = [
    # --- round-15 addition (never graded) ---
    "dedup_embed_incremental_summary",
    # --- plan-changed this round (rotation.py PLANS.md row diff) ---
    "agg_decile_profile",
    "agg_histogram_equidepth",
    "array_explode_outer",
    "customer_pareto_coverage",
    "customer_rfm_segments",
    "length_curriculum",
    "orders_abc_class",
    "pareto_revenue_share",
    "subquery_multi_exists",
    "text_ttr_buckets",
    "vocab_growth_curve",
    # --- summary-invisible changes (hand-listed) ---
    "key_skew_profile",
    "dedup_substring_incremental",
    "text_bigram_lm_incremental",
    "graph_khop_reach",
    "graph_shortest_cost_k",
    # --- freshness re-grades, oldest vintage first (rotation.py) ---
    # r7 (all 32 remaining)
    "dedup_survivorship",
    "embed_quantize_int8",
    "event_attribution",
    "event_burst_windows",
    "event_markov_transitions",
    "join_customer_360",
    "join_disjunctive",
    "join_lateral_topn",
    "lang_balance_resample",
    "lang_id_confusion",
    "mix_temperature_weights",
    "multi_join_profit",
    "orders_fulfillment_lag",
    "orders_reorder_interval",
    "probe_hugeint_sum",
    "quality_weighted_gate",
    "recursive_cte_chain",
    "scan_binary_files",
    "scan_json_variant",
    "source_drift_ks",
    "source_token_tv_drift",
    "stream_file_intake",
    "subquery_semi_agg",
    "text_char_diversity",
    "text_tfidf_topk",
    "token_drift_slices",
    "tokenize_pack_shard",
    "tokenizer_fertility",
    "ts_ohlc_downsample",
    "ts_rolling_anomaly",
    "window_nth_value",
    "zstd_dict_sample",
    # r8 (alphabetical fill to the 50-slot edge)
    "calibration_bins",
]
set_priority(WINDOW_PRIORITY)
