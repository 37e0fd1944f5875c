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

# Grading-window rotation (round 10).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist, so the prefix
# holds exactly the keys still needing one (tools/rotation.py folds
# CORRECTNESS_r01..r09 and prints this list).  Round-9 result: all
# 356 registered keys hold a verdict (339 hash-exact green + 17
# rows-only no_oracle by design, 0 red ever) — the window opens
# EMPTY.  This round's window:
#   1. new round-10 keys, appended as they are built,
#   2. leftover slots refreshed with the keys whose only green
#      verdict dates from rounds 2-3 (freshness re-grades, VERDICT r9
#      item 7) — appended at the end of the round.
# Rows-only-by-design keys enter the prefix ONCE to land their
# no_oracle verdict, then stay out permanently; ``set_priority``
# additionally sinks every no-oracle tail key behind the oracle-backed
# tail so they can never drift back into the window.
set_priority(
    [
        # --- round-10 additions appended below as they are built ---
        "dedup_substring_spans",
        "dedup_substring_removal",
        "dedup_longest_dup_span",
        "dedup_window_freq_spectrum",
        "graph_khop_reach",
        "session_path_topk",
        # --- freshness re-grades: keys whose only green verdict dates
        # from rounds 2-3 (VERDICT r9 #7); the first 46 in registration
        # order, filling the window behind the 4 new round-10 keys ---
        "scan_csv_header_check",
        "scan_csv_clean",
        "scan_csv_typed",
        "one_hot_hour",
        "one_hot_dow",
        "one_hot_dow_corrected",
        "duration_seconds",
        "flag_bbox",
        "project_extend",
        "text_stats",
        "token_count",
        "text_lang_id",
        "doc_fingerprint",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_embed_cosine",
        "embed_cosine_topk",
        "multimodal_meta",
        "multimodal_decode",
        "multimodal_resize",
        "dedup_clusters",
        "sample_hash",
        "sample_stratified",
        "text_quality_filter",
        "token_topk",
        "text_pii_scrub",
        "decontaminate_overlap",
        "embed_dim_stats",
        "dedup_fuzzy_blocked",
        "scan_parquet",
        "scan_jsonl",
        "scan_orc",
        "agg_group",
        "agg_distinct",
        "agg_rollup",
        "agg_cube",
        "join_inner",
        "join_broadcast",
        "join_semi",
        "join_anti",
        "join_range",
        "join_asof",
        "window_rank",
        "window_running_sum",
    ]
)
