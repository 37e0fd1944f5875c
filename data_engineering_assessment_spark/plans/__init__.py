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

# Grading-window rotation (round 9).  The driver grades a ~50-key
# prefix of the registry per round; verdicts persist, so the prefix
# holds exactly the keys still needing one (tools/rotation.py folds
# CORRECTNESS_r01..r08 and prints this list).  Round-8 result: all 50
# window keys green (332 distinct keys graded across r1-r8, 0 red).
# This window:
#   1. the 8 round-8b keys registered behind the r08 window (anomaly
#      MAD, session histograms/conversion/churn, revenue share,
#      time-weighted average, funnel timing, XML round-trip) — the
#      only registered keys without a driver verdict,
#   2. new round-9 keys appended behind them as they land.
# Rows-only-by-design keys enter the prefix ONCE to land their
# no_oracle verdict, then stay out permanently.
set_priority(
    [
        "events_anomaly_mad",
        "session_duration_hist",
        "customer_churn_by_segment",
        "session_conversion_rate",
        "revenue_share_of_parent",
        "ts_time_weighted_avg",
        "funnel_time_to_convert",
        "scan_xml_roundtrip",
        # --- round-9 additions appended below as they are built ---
        "graph_cc_alternating",
        "events_seasonal_residual_anomaly",
        "ts_seasonal_decompose",
        "discount_theilsen_slope",
        "events_props_facet_topk",
        "graph_kcore",
        "grid_knn_join",
        "stream_left_outer_join",
        "events_value_halflife",
        "scan_csv_gzip_roundtrip",
        "sink_dynamic_partition_overwrite",
        "grid_dbscan_core",
        "orders_abc_class",
        "udaf_trimmed_mean",
        "sql_parameterized",
        "scan_bucket_prune",
    ]
)
