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

# Grading-window rotation (round 14).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist.  This window is
# COMPUTED by `python tools/rotation.py` (recalibrated this round,
# VERDICT r13 #1/#2: plan diff against the latest verdicts' commit,
# achievable stale-debt threshold, oldest-vintage health metric) —
# the hand-authored part is only the summary-invisible layout tier,
# which the tool can't see.  In order:
#   1. the new round-14 key (never graded): dedup_embed_incremental
#      (the embedding tier completing the incremental-ingest ladder,
#      VERDICT r13 #3),
#   2. the six keys whose PLAN or persisted layout changed this
#      round and therefore owe a fresh verdict regardless of vintage
#      (plan change => window, the round-11 policy): both substring
#      coverage keys now persist dupw (round-14 ADVICE — it fed two
#      aggregations, so the digest semi-join subtree ran twice), and
#      the four layout-backed keys (incremental MinHash, both graph
#      loops, the incremental bigram-LM) rebuilt their scratch
#      tables under the round-14 layout hardening (recursive corpus
#      fingerprint, TOCTOU re-check, per-call temp dirs, narrowed
#      rename-race handling — every layout.py edit bumps every
#      versioned_scratch_tag by design),
#   3. 43 freshness re-grades, OLDEST VINTAGE FIRST per rotation.py:
#      all 30 r6-vintage keys, then r7-vintage alphabetically to the
#      50-slot edge.
# Exactly 50 names for ~50 slots; 34 of the 47 r7-vintage keys and
# the r8 tier (49 keys) are deferred to r15+ by the tool's budget
# arithmetic.
WINDOW_PRIORITY = [
    # --- round-14 addition (never graded) ---
    "dedup_embed_incremental",
    # --- plan/layout-changed this round ---
    "dedup_substring_spans",
    "dedup_substring_incremental",
    "dedup_minhash_incremental",
    "graph_khop_reach",
    "graph_shortest_cost_k",
    "text_bigram_lm_incremental",
    # --- freshness re-grades, oldest vintage first (rotation.py) ---
    # r6
    "grid_density_topk",
    "grid_radius_join",
    "join_dpp_prune",
    "join_exists_late",
    "join_priority_class",
    "multi_join_nation_flow",
    "multimodal_arrow_digest",
    "observe_metrics",
    "orders_cohort_ltv",
    "probe_lineitem_totals",
    "sample_reservoir",
    "sample_weighted",
    "scan_corrupt_tolerant",
    "schema_widen_scan",
    "split_group_holdout",
    "split_kfold",
    "stream_late_watermark",
    "stream_tablelog_source",
    "tablelog_delete_rows",
    "tablelog_optimize",
    "tablelog_stats_prune",
    "tablelog_update_rows",
    "tablelog_wap_publish",
    "text_boilerplate_cov",
    "text_hapax_ratio",
    "token_heavy_hitters",
    "ts_spine_zero_fill",
    "udtf_dynamic_melt",
    "udtf_sentence_split",
    "vocab_growth_curve",
    # r7 (alphabetical fill to the 50-slot edge)
    "agg_antijoin_avg",
    "agg_decile_profile",
    "agg_filtered_revenue",
    "agg_hll_partitioned",
    "agg_kll_quantiles",
    "agg_order_fanout_hist",
    "agg_theta_customer_overlap",
    "bigram_lift_topk",
    "contamination_matrix",
    "corpus_quota_fill",
    "customer_rfm_segments",
    "dedup_prefix_exact",
    "dedup_semantic_cluster",
]
set_priority(WINDOW_PRIORITY)
