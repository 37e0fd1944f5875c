#!/usr/bin/env python
"""Benchmark headline queries; prints ONE compact JSON line (last).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).

Each query executes fully (noop sink — no driver collect cost) and is
timed wall-clock; `value` is the total seconds across headline
queries.  Session startup and the one-time warmup scan are excluded:
at 100 TB the fixed JVM cost is noise, per-query execution is what
scales.

The driver captures only a bounded TAIL of stdout (~2 KB): round 4's
116-query line overflowed it and the bench gate recorded
``parsed: null``.  So the printed line carries totals + anchor +
per-query timings for the CORE set only (the round-3 53-query
headline — keeps round-over-round comparison possible), and the full
per-query detail for every headline query is written to
``BENCH_DETAIL.json`` instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_engineering_assessment_spark import plans
from data_engineering_assessment_spark.session import get_spark

HEADLINE = [
    "scan_parquet",
    "agg_group",
    "agg_distinct",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "join_asof_tolerance",
    "join_salted",
    "multi_join_pricing",
    "multi_join_region",
    "multi_join_topn",
    "window_running_sum",
    "window_lag",
    "window_range_frame",
    "topk_per_group",
    "agg_percentile",
    "agg_conditional",
    "subquery_scalar",
    "token_topk",
    "event_tumbling_window",
    "event_session_window",
    "event_rollup_hierarchy",
    "json_extract",
    "one_hot_hour",
    "duration_seconds",
    "text_stats",
    "token_count",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_embed_lsh",
    "embed_cosine_topk",
    "embed_dim_stats",
    "text_pii_scrub",
    "decontaminate_overlap",
    "multimodal_decode",
    "shard_assign",
    "seq_pack_chunks",
    "chunk_overlap",
    "repetition_stats",
    "event_funnel",
    "event_retention",
    "merge_upsert",
    "global_shuffle",
    "vocab_coverage",
    "scd_type2",
    "snapshot_diff",
    "quantile_normalize",
    "market_basket_pairs",
    "corpus_build_pipeline",
    "join_dpp_prune",
    "subquery_multi_exists",
    "ts_gap_detect",
    "join_exists_late",
    "multi_join_nation_flow",
    "agg_market_share",
    "join_priority_class",
    "agg_custdist",
    "agg_promo_share",
    "agg_supplier_distinct",
    "join_disjunctive",
    "subquery_semi_agg",
    "agg_antijoin_avg",
    "tokenizer_fertility",
    "ts_rolling_anomaly",
    "ts_ohlc_downsample",
    "text_rarity_score",
    "embed_pca_project",
    "scan_json_variant",
    "agg_hll_partitioned",
    "recursive_cte_chain",
    "join_lateral_topn",
    "source_drift_ks",
    "event_attribution",
    "agg_filtered_revenue",
    "multi_join_profit",
    "embed_quantize_int8",
    "customer_rfm_segments",
    "scan_binary_files",
    "stream_file_intake",
    "text_tfidf_topk",
    "event_markov_transitions",
    "lang_id_confusion",
    # graph_pagerank (fixed 8 rounds) was swapped for the converged
    # variant in round 8 (VERDICT r07 #8): the early-exit key is the
    # production shape and removes the bench's last weak perf entry;
    # the fixed-round key stays registered + graded, just not timed.
    "graph_pagerank_converged",
    "text_novelty_by_doc",
    "feature_hash_bow",
    "ts_interpolate_linear",
    "event_cooccurrence",
    "event_attribution_linear",
    "join_bloom_prune",
    "scan_table_version",
    "embed_ann_pq",
    "scan_stats_prune",
    "incremental_join_delta",
    "agg_moments_skew",
    "event_distinct_sliding",
    "agg_gini_impurity",
    "sample_reservoir",
    "split_group_holdout",
    "agg_histogram_equidepth",
    "ts_spine_zero_fill",
    "dedup_cluster_rep",
    "grid_radius_join",
    "grid_density_topk",
    "dedup_containment",
    "token_heavy_hitters",
    "cogroup_order_reconcile",
    "text_boilerplate_cov",
    "scan_bloom_index",
    "multimodal_arrow_digest",
    "dedup_threshold_curve",
    "orders_cohort_ltv",
    "embed_outlier_topk",
    "constraint_suite",
    "tablelog_stats_prune",
    "event_interarrival_hist",
    # round-7 mlcorpus additions
    "dedup_semantic_cluster",
    "dedup_prefix_exact",
    "dedup_survivorship",
    "quality_weighted_gate",
    "tokenize_pack_shard",
    "contamination_matrix",
    "token_drift_slices",
    "length_curriculum",
    "zstd_dict_sample",
    "text_char_diversity",
    "bigram_lift_topk",
    "mix_temperature_weights",
    "text_ttr_buckets",
    "corpus_quota_fill",
    "source_token_tv_drift",
    "lang_balance_resample",
    "window_nth_value",
    "event_burst_windows",
    "orders_reorder_interval",
    # round-7b metrics additions
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
    "scan_fixed_width",
    "scan_csv_multiline",
    "fk_violation_audit",
    "supplier_hhi_by_nation",
    "events_control_chart",
    "join_asof_forward",
    "window_cume_dist",
    "events_fano_factor",
    "skyline_pareto_frontier",
    "interval_coverage_union",
    "graph_triangle_count",
    "table_checksum_groups",
    # round-7c last-commit keys (VERDICT r07 #3 ledger sync)
    "money_proration_lrm",
    "sequence_gap_audit",
    "window_reset_running",
    # round-8 insight keys (plans/insights.py)
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
    # round-8b additions (queued for the r9 grading rotation)
    "scan_xml_roundtrip",
    "events_anomaly_mad",
    "session_duration_hist",
    "customer_churn_by_segment",
    "session_conversion_rate",
    "revenue_share_of_parent",
    "ts_time_weighted_avg",
    "funnel_time_to_convert",
    # round-9 additions
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
    # round-10 additions
    "dedup_substring_spans",
    "dedup_substring_removal",
    "dedup_longest_dup_span",
    "dedup_window_freq_spectrum",
    "graph_khop_reach",
    "session_path_topk",
    "graph_shortest_cost_k",
    # round-11 additions
    "split_time_holdout",
    "text_bigram_lm_score",
    # round-12 additions
    "dedup_substring_incremental",
    "text_bigram_lm_incremental",
    # round-13 additions
    "dedup_minhash_incremental",
    # round-14 additions
    "dedup_embed_incremental",
]

# The round-3 53-query headline — the stable cross-round comparison
# set whose per-query timings go on the printed line (everything in
# HEADLINE goes to BENCH_DETAIL.json).  Frozen BY NAME, not by list
# position: inserting or reordering HEADLINE entries cannot silently
# change the cross-round comparison set (tests/test_plans.py asserts
# CORE ⊆ HEADLINE and that this tuple never changes length).
CORE = (
    "scan_parquet",
    "agg_group",
    "agg_distinct",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "join_asof_tolerance",
    "join_salted",
    "multi_join_pricing",
    "multi_join_region",
    "multi_join_topn",
    "window_running_sum",
    "window_lag",
    "window_range_frame",
    "topk_per_group",
    "agg_percentile",
    "agg_conditional",
    "subquery_scalar",
    "token_topk",
    "event_tumbling_window",
    "event_session_window",
    "event_rollup_hierarchy",
    "json_extract",
    "one_hot_hour",
    "duration_seconds",
    "text_stats",
    "token_count",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_embed_lsh",
    "embed_cosine_topk",
    "embed_dim_stats",
    "text_pii_scrub",
    "decontaminate_overlap",
    "multimodal_decode",
    "shard_assign",
    "seq_pack_chunks",
    "chunk_overlap",
    "repetition_stats",
    "event_funnel",
    "event_retention",
    "merge_upsert",
    "global_shuffle",
    "vocab_coverage",
    "scd_type2",
    "snapshot_diff",
    "quantile_normalize",
    "market_basket_pairs",
    "corpus_build_pipeline",
    "join_dpp_prune",
    "subquery_multi_exists",
    "ts_gap_detect",
)


ANCHOR_ROWS = 200_000


def _anchor_csv(n_rows: int = ANCHOR_ROWS) -> str:
    """Materialize (once) a synthetic green-taxi CSV: the committed
    3-row fixture tiled to ``n_rows`` data rows.  Gives the
    reference-equivalent pipeline a body of work whose wall time is a
    same-box anchor for "within 2x of baseline" — the reference's own
    repo publishes no numbers, so the anchor IS the baseline."""
    from data_engineering_assessment_spark.plans.parity import FIXTURE_CSV

    path = f"/root/repo/.scratch/green_taxi_anchor_{n_rows}.csv"
    if os.path.exists(path):
        return path
    with open(FIXTURE_CSV) as f:
        header, *rows = [ln.rstrip("\n") for ln in f if ln.strip()]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    block = "".join(r + "\n" for r in rows)
    reps = n_rows // len(rows)
    with open(path + ".tmp", "w") as out:
        out.write(header + "\n")
        out.write(block * reps)
    os.replace(path + ".tmp", path)
    return path


def _time_anchor(spark) -> float:
    """Best-of-3 wall time of the full reference product (CSV →
    validate/clean/typed parse → staged parquet → derived columns →
    output parquet), single-file output exactly like the reference's
    coalesce(1) + part promotion."""
    from data_engineering_assessment_spark.sources.green_taxi import green_taxi_pipeline

    csv = _anchor_csv()
    best = float("inf")
    for i in range(3):
        staged = f"/root/repo/.scratch/anchor_staged_{i}.parquet"
        out = f"/root/repo/.scratch/anchor_out_{i}.parquet"
        t0 = time.perf_counter()
        green_taxi_pipeline(spark, csv, staged, out, single_file=True)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _time_anchor_parallel(spark) -> float:
    """Best-of-3 of the same end-to-end work WITHOUT the single-file
    constraint — parallel output files, the only correct shape beyond
    laptop scale (the reference has no parallel variant: its stage 1
    is a single-process BytesIO pass by construction)."""
    from data_engineering_assessment_spark.sources.green_taxi import green_taxi_pipeline

    csv = _anchor_csv()
    best = float("inf")
    for i in range(3):
        staged = f"/root/repo/.scratch/anchorp_staged_{i}.parquet"
        out = f"/root/repo/.scratch/anchorp_out_{i}.parquet"
        t0 = time.perf_counter()
        green_taxi_pipeline(spark, csv, staged, out, single_file=False)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _time_reference(spark) -> float | None:
    """Best-of-3 wall time of the REFERENCE's own 01.py+02.py run
    verbatim on the same anchor CSV (tools/ref_baseline.py) — the
    measured baseline the anchor previously stood in for.  Returns
    None when the reference checkout is unavailable; the bench line
    must never die on its absence."""
    try:
        sys.path.insert(0, "/root/repo/tools")
        import ref_baseline

        ref01, ref02 = ref_baseline.load_reference()
        scratch = "/root/repo/.scratch/ref_baseline"
        os.makedirs(scratch, exist_ok=True)
        b1, b2 = ref_baseline.measure_reference(
            spark, ref01, ref02, _anchor_csv(),
            f"{scratch}/bench_01.parquet", f"{scratch}/bench_02.parquet",
        )
        return round(b1 + b2, 3)
    except Exception as e:  # noqa: BLE001 — absent checkout, version drift
        # a silently-null baseline is undiagnosable (ADVICE r06) —
        # leave the reason on stderr without touching the JSON line
        print(f"ref baseline skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="dea-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = plans.queries()
    # Warmup: one scan (file listing, codegen infra) and one trivial
    # mapInPandas (Python worker pool spin-up + pandas import) so no
    # single query pays the one-time environment cost.
    queries["scan_parquet"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Reduction rule (documented for cross-round comparability,
    # VERDICT r06 #5): best-of-N wall clock per query — min is the
    # standard steady-state metric (later runs measure JIT / shuffle
    # buffers; single runs on this box vary 3-4x under identical
    # conditions).  N=5 for the frozen CORE comparison set (its
    # round-over-round deltas are what regressions are called on, so
    # it gets the extra noise damping); N=3 for the rest of HEADLINE.
    #
    # MEASUREMENT-HARNESS CHANGES (round 16, announced per the brief's
    # "say so explicitly" rule; both are additions to HOW timings are
    # sampled, not to what any query computes):
    #
    # 1. CacheManager sweep after each key (VERDICT r15 #7, guide §5):
    #    the session previously accumulated every key's `_materialized`
    #    persists for the whole 220-key run — cross-query memory
    #    pressure, and a key ordered after a sibling that cached the
    #    same index (e.g. dedup_threshold_curve after
    #    dedup_ngram_jaccard) was silently timed against a warm cache
    #    it did not build.  `clearCache()` after each key's rep loop
    #    makes every key pay for (exactly) its own caches; within-key
    #    rep reuse is unchanged.  Keys that previously drafted behind a
    #    sibling's cache will read slower THIS round — that is the
    #    measurement becoming honest, flagged in OPTIMIZATION_r16.md.
    #
    # 2. Second CORE pass (VERDICT r15 #3: "min-of-2 full runs" — this
    #    box's noise regime drifts within a session, and r15's real
    #    wins were invisible in one 32-core run while an 8-core run at
    #    the same HEAD beat the prior round).  After the full HEADLINE
    #    loop, the 53 CORE keys run again (2 reps each, same noop-sink
    #    methodology ~100 keys of session-time later); the published
    #    per-key number is the min across BOTH passes.  Pass-1-only
    #    values (the pre-r16 methodology) are kept in
    #    BENCH_DETAIL.json under "core_pass1" for comparability.
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    core_set = set(CORE)
    for name in HEADLINE:
        reps: list[float] = []
        for _ in range(5 if name in core_set else 3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        spreads[name] = [round(min(reps), 3), round(max(reps), 3)]
        spark.catalog.clearCache()  # sweep this key's persists (see above)

    core_pass1 = {k: timings[k] for k in CORE}
    for name in CORE:
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        timings[name] = round(min(timings[name], min(reps)), 3)
        spreads[name] = [
            round(min(spreads[name][0], min(reps)), 3),
            round(max(spreads[name][1], max(reps)), 3),
        ]

    anchor_sec = _time_anchor(spark)
    anchor_par_sec = _time_anchor_parallel(spark)
    reference_sec = _time_reference(spark)

    total = round(sum(timings.values()), 3)
    core_timings = {k: timings[k] for k in CORE}
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "n_queries": len(HEADLINE),
        "queries": timings,
        "core_sec": round(sum(core_timings.values()), 3),
        "sf": sf,
        # pre-r16 methodology (pass-1-only best-of-5) for the CORE
        # set, kept for cross-round comparability of the r15->r16 diff
        "core_pass1": core_pass1,
        "core_pass1_sec": round(sum(core_pass1.values()), 3),
        # Machine-readable noise annotation (round 14, VERDICT r13
        # #5): [min, max] across this run's own repetitions of each
        # query.  A cross-round delta on a key whose plan did not
        # change is NOISE whenever it is within that key's intra-run
        # spread — the per-round bench diff adjudicates itself
        # instead of flagging 0.2-0.6 s sub-second keys every round.
        "rep_spread": spreads,
        "noise_rule": "delta(best_r{N}, best_r{N-1}) <= "
        "(rep_spread[k][1] - rep_spread[k][0]) of either round, with "
        "an unchanged PLANS.md row => measurement noise, not a "
        "regression",
        "anchor": {
            "name": "green_taxi_pipeline",
            "rows": ANCHOR_ROWS,
            "sec": anchor_sec,
            "par_sec": anchor_par_sec,
            "ref_sec": reference_sec,
            "note": "sec = this repo's reference-equivalent end-to-end "
            "(CSV->clean->typed->parquet->derived->parquet, "
            "single-file); par_sec = same work, parallel output files "
            "(the shape that scales); ref_sec = the reference's own "
            "01.py+02.py run verbatim on the same CSV, same box, same "
            "session (tools/ref_baseline.py) — the measured baseline",
        },
    }
    with open("/root/repo/BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
    # The LAST stdout line must fit the driver's bounded tail capture
    # (~2 KB; the r03 53-query line at 1.69 KB is the proven size, the
    # r04 116-query line at ~4 KB overflowed).  Per-query timings are
    # 2-decimal here; 3-decimal detail lives in BENCH_DETAIL.json.
    summary = dict(detail, queries={k: round(v, 2) for k, v in core_timings.items()})
    # the noise annotation lives in BENCH_DETAIL.json only — on the
    # printed line it would overflow the driver's ~2 KB tail capture
    # and shed the core per-query map (the r03-size contract)
    summary.pop("rep_spread", None)
    summary.pop("noise_rule", None)
    # pass-1 CORE map lives in BENCH_DETAIL.json only (line-size budget)
    summary.pop("core_pass1", None)
    summary["anchor"] = {
        "name": "green_taxi_pipeline",
        "rows": ANCHOR_ROWS,
        "sec": anchor_sec,
        "par_sec": anchor_par_sec,
        "ref_sec": reference_sec,
    }
    # Degrade, never die: a benchmark that ran to completion must
    # always print its line (an assert here would reproduce the very
    # parsed:null failure it was meant to prevent).  If the summary
    # outgrows the driver's tail capture, shed the per-query map —
    # full detail is already in BENCH_DETAIL.json, and the remaining
    # fixed-size fields (totals + compact anchor) are ~250 chars,
    # far inside the bound.
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) >= 1750:
        summary["queries"] = {}
        summary["queries_note"] = "shed: see BENCH_DETAIL.json"
        line = json.dumps(summary, separators=(",", ":"))
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    sys.exit(main())
