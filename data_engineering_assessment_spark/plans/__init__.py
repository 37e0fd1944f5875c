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
    spatial,
    training,
    warehouse,
)
from .registry import oracles, queries, set_priority  # noqa: F401

# Grading-window rotation (round 8).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist, so the prefix
# holds exactly the keys still needing one (tools/rotation.py folds
# CORRECTNESS_r01..r07 and prints this list).  Round-7 result: 45
# green / 0 red / 5 err (4 expected no_oracle rows-only verdicts +
# embed_pca_project, whose array<double> output column crashed the
# driver canonicalizer — fixed this round: the graded projection now
# emits scalar pc{i}_milli BIGINT columns).  This window:
#   1. embed_pca_project — the r07 erroring key, first so its verdict
#      finally lands,
#   2. the 29 round-7b/7c keys registered behind the r07 window
#      (metrics/eval layer, scan variants, window/graph additions),
#   3. the 15 round-8 insight keys (plans/insights.py: sessionized
#      attribution + bounce, seasonality, dedup dashboards, join
#      planning statistics, Pareto/slope/lag/momentum, connected
#      components, embedding drift, IVF-PQ, streaming attribution)
#      appended behind them — 45 of the ~50 slots.
# Rows-only-by-design keys enter the prefix ONCE to land their
# no_oracle verdict (ivfpq + stream attribution here, like
# graph_pagerank_converged and embed_ann_pq before them), then stay
# out permanently.
set_priority(
    [
        "embed_pca_project",
        "quality_score_auc",
        "calibration_bins",
        "gate_agreement_kappa",
        "ts_cusum_changepoint",
        "ts_lagged_covariance",
        "session_max_concurrency",
        "dedup_levenshtein_block",
        "token_gini_concentration",
        "embed_silhouette",
        "cumulative_distinct_users",
        "split_leakage_check",
        "graph_degree_assortativity",
        "event_ab_test_lift",
        "fk_violation_audit",
        "supplier_hhi_by_nation",
        "events_control_chart",
        "events_fano_factor",
        "skyline_pareto_frontier",
        "interval_coverage_union",
        "graph_triangle_count",
        "table_checksum_groups",
        "money_proration_lrm",
        "sequence_gap_audit",
        "window_reset_running",
        "scan_csv_multiline",
        "scan_fixed_width",
        "join_asof_forward",
        "window_cume_dist",
        "graph_pagerank_converged",
        # --- round-8 insight keys (plans/insights.py), behind the tail ---
        "event_first_touch_attribution",
        "session_bounce_rate",
        "event_hour_seasonality",
        "dedup_rate_by_source",
        "dup_cluster_size_hist",
        "join_cardinality_estimate",
        "join_key_skew_topn",
        "customer_pareto_coverage",
        "discount_quantity_slope",
        "ship_lag_bands",
        "orders_monthly_momentum",
        "graph_connected_components",
        "embed_slice_drift",
        "embed_ann_ivfpq",
        "stream_session_attribution",
        "events_user_mode_type",
        "orders_priority_mix_shift",
        "interarrival_gap_p90",
        "events_dau_wau_stickiness",
        "returns_by_brand",
    ]
)
