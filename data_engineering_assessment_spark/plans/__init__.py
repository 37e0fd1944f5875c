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

# Grading-window rotation (round 13).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist.  This window is
# now COMPUTED by `python tools/rotation.py` (VERDICT r12 #2: a
# max-age tier classifies stale evidence, oldest-first, and prints
# the projected budget) — the hand-authored part is only the
# plan-changed tier, which the tool can't know.  In order:
#   1. the new round-13 key (never graded):
#      dedup_minhash_incremental (the near-dup tier of the
#      incremental-ingest ladder, VERDICT r12 #4),
#   2. the five keys whose PLAN or persisted layout changed this
#      round and therefore owe a fresh verdict regardless of vintage
#      (plan change => window, the round-11 policy): both substring
#      coverage keys moved to the explode+distinct islands shape
#      (VERDICT r12 #3 — no per-doc array buffer), and the three
#      layout-backed keys (both graph loops + the incremental
#      bigram-LM) rebuilt their scratch tables under the round-13
#      layout hardening (bucket spec in the version tag, atomic
#      build, src fingerprinting — ADVICE r12),
#   3. 44 stale re-grades, OLDEST VINTAGE FIRST per rotation.py: the
#      3 r4 stragglers the r12 window displaced (seq_lis_per_user,
#      ts_gap_detect, ts_resample_ffill — VERDICT r12 #1), all 22
#      r5-vintage keys, then r6-vintage alphabetically to fill.
# Exactly 50 names for ~50 slots; 71 further stale keys (r6-r7
# vintage) are deferred to r14+ by the tool's budget arithmetic.
WINDOW_PRIORITY = [
    # --- round-13 addition (never graded) ---
    "dedup_minhash_incremental",
    # --- plan/layout-changed this round ---
    "dedup_substring_spans",
    "dedup_substring_incremental",
    "graph_khop_reach",
    "graph_shortest_cost_k",
    "text_bigram_lm_incremental",
    # --- stale re-grades, oldest vintage first (rotation.py) ---
    # r4 (the three keys r12's 53-name window displaced)
    "seq_lis_per_user",
    "ts_gap_detect",
    "ts_resample_ffill",
    # r5
    "agg_benford_digits",
    "agg_weighted_median",
    "array_explode_outer",
    "bpe_pair_counts",
    "chunk_overlap",
    "codec_roundtrip",
    "corpus_mix",
    "event_user_churn",
    "global_shuffle",
    "multimodal_frames",
    "orders_backlog_aging",
    "probe_env_quantize",
    "probe_lineitem_cents_dec",
    "probe_lineitem_cents_round",
    "quality_bins",
    "repetition_stats",
    "scan_bloom_index",
    "seq_pack_chunks",
    "set_ops_all",
    "shard_assign",
    "split_train_eval",
    "vocab_coverage",
    # r6 (alphabetical fill to the 50-slot edge)
    "agg_argmax_revenue",
    "agg_custdist",
    "agg_histogram_equidepth",
    "agg_market_share",
    "agg_promo_share",
    "agg_share_having",
    "agg_supplier_distinct",
    "cogroup_order_reconcile",
    "constraint_suite",
    "corpus_token_budget",
    "dedup_cluster_rep",
    "dedup_containment",
    "dedup_threshold_curve",
    "embed_centroid_label",
    "embed_knn_classify",
    "embed_matryoshka_overlap",
    "embed_outlier_topk",
    "event_interarrival_hist",
    "event_seasonality_profile",
]
set_priority(WINDOW_PRIORITY)
