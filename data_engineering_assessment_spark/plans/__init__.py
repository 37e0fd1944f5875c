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

# Grading-window rotation (round 11 — the FRESHNESS round, VERDICT r10
# "Next round" #1).  The driver grades a ~50-key prefix of the registry
# per round; verdicts persist, so after r10's all-green window the
# rotation owes nothing and the full window is spent on verdict
# freshness: 94 keys entered this round carrying r2–r4-vintage
# verdicts.  This window re-grades, in order:
#   1. the new round-11 key(s) (never graded),
#   2. ALL 6 r2-vintage keys — rows-only-by-design survivors whose
#      no_oracle verdicts date from round 2; re-grading cannot improve
#      the verdict CLASS but refreshes the rows-level evidence at HEAD
#      (explicitly requested by VERDICT r10 #1, and listed EXPLICITLY
#      here — the rows-only hygiene rule only bars tail-DRIFT, see
#      tests/test_plans.py::test_rows_only_verdicted_keys_stay_out...),
#   3. ALL 41 r3-vintage keys (incl. the §2 items sort_limit and
#      topk_per_group the verdict names).
# The r4-vintage top-ups the verdict also named (the S6/S9 sink key,
# the S1 URL source) were displaced to round 12 when the two late
# round-11 keys took the head slots — never-graded keys outrank
# re-grades under the window-hygiene policy, and those two are the
# youngest debt in the freshness queue.
WINDOW_PRIORITY = [
    # --- round-11 additions, appended as they are built (never-graded
    # keys lead the window per the rotation-hygiene policy pinned by
    # tests/test_plans.py::test_rotation...; the two r4-vintage
    # top-ups the verdict named were displaced to round 12 to make
    # room — they are the youngest debt in the freshness queue) ---
    "graph_shortest_cost_k",
    "split_time_holdout",
    "text_bigram_lm_score",
    # --- r2-vintage freshness re-grades (rows-only by design) ---
    "agg_approx_distinct",
    "dedup_embed_lsh",
    "dedup_minhash",
    "dedup_simhash",
    "embed_ann_ivf",
    "embed_ann_lsh",
    # --- all 41 r3-vintage freshness re-grades ---
    "agg_approx_percentile",
    "agg_collect_sorted",
    "agg_conditional",
    "agg_corr",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_mode",
    "agg_percentile",
    "array_ops",
    "date_arith",
    "event_rollup_hierarchy",
    "event_session_window",
    "event_tumbling_window",
    "join_asof_tolerance",
    "join_bucketed",
    "join_null_safe",
    "join_outer",
    "join_salted",
    "json_extract",
    "map_ops",
    "multi_join_pricing",
    "multi_join_region",
    "multi_join_topn",
    "pivot_counts",
    "scan_partitioned",
    "sessionize_lag",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_limit",
    "sql_entrypoint",
    "string_funcs",
    "subquery_exists",
    "subquery_in_having",
    "subquery_scalar",
    "topk_per_group",
    "unpivot_metrics",
    "window_lag",
    "window_ntile",
    "window_range_frame",
    "window_rank_dense",
]
set_priority(WINDOW_PRIORITY)
