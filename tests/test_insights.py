"""Semantic invariants for the round-8 insight keys
(plans/insights.py) — value-exactness is covered by the oracle-parity
sweep in test_correctness.py; these assert the conservation laws and
brute-force agreements the docstrings promise."""

from __future__ import annotations

import duckdb
import numpy as np

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def _duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_attribution_conserves_events_and_value(spark):
    """Every event lands in exactly one session; attributed value is
    the sum of ALL event cents."""
    rows = QUERIES["event_first_touch_attribution"](spark, SF_DIR).collect()
    (n_ev, cents) = _duck(
        f"""SELECT COUNT(*), SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            FROM '{SF_DIR}/events.parquet'"""
    )[0]
    assert sum(r.n_events for r in rows) == n_ev
    assert sum(r.total_value_cents for r in rows) == cents
    assert all(r.n_sessions <= r.n_events for r in rows)


def test_bounce_consistent_with_attribution(spark):
    att = {r.entry_type: r for r in QUERIES["event_first_touch_attribution"](spark, SF_DIR).collect()}
    for r in QUERIES["session_bounce_rate"](spark, SF_DIR).collect():
        assert r.n_sessions == att[r.entry_type].n_sessions
        assert 0 <= r.n_bounce <= r.n_sessions
        assert 0 <= r.bounce_milli <= 1000


def test_seasonality_partitions_the_stream(spark):
    rows = QUERIES["event_hour_seasonality"](spark, SF_DIR).collect()
    (n_ev,) = _duck(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")[0]
    assert {r.hour_utc for r in rows} <= set(range(24))
    assert sum(r.n_events for r in rows) == n_ev
    # floor-truncated shares can undershoot by at most one per bucket
    assert 1_000_000 - len(rows) < sum(r.share_ppm for r in rows) <= 1_000_000


def test_dedup_rate_survivors_count_distinct_texts(spark):
    rows = QUERIES["dedup_rate_by_source"](spark, SF_DIR).collect()
    (n_docs, n_texts) = _duck(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM '{SF_DIR}/documents.parquet'"
    )[0]
    assert sum(r.n_docs for r in rows) == n_docs
    # each distinct text has exactly one survivor, attributed to one source
    assert sum(r.n_survivors for r in rows) == n_texts
    for r in rows:
        assert r.n_survivors <= r.n_distinct_texts <= r.n_docs
        assert 0 <= r.dup_rate_milli <= 1000


def test_cluster_hist_is_a_partition_of_docs(spark):
    rows = QUERIES["dup_cluster_size_hist"](spark, SF_DIR).collect()
    (n_docs, n_texts) = _duck(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM '{SF_DIR}/documents.parquet'"
    )[0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_clusters for r in rows) == n_texts
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_join_cardinality_estimate_is_exact(spark):
    """The histogram product really equals the materialized join."""
    r = QUERIES["join_cardinality_estimate"](spark, SF_DIR).collect()[0]
    (actual,) = _duck(
        f"""SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"""
    )[0]
    assert r.join_rows == actual
    assert r.n_matched_keys <= min(r.n_keys_orders, r.n_keys_lineitem)
    assert 0 <= r.containment_milli <= 1000


def test_skew_topn_descending_and_bounded(spark):
    rows = QUERIES["join_key_skew_topn"](spark, SF_DIR).collect()
    assert len(rows) == 10
    contribs = [r.join_rows for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    for r in rows:
        assert r.join_rows == r.c_orders * r.c_lineitem
        assert 0 <= r.share_ppm <= 1_000_000


def test_pareto_coverage_is_minimal(spark):
    """The reported count reaches >= 80%, and one customer fewer
    (greedy order) does not — recomputed literally."""
    r = QUERIES["customer_pareto_coverage"](spark, SF_DIR).collect()[0]
    revs = sorted(
        (
            v
            for (v,) in _duck(
                f"""SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    FROM '{SF_DIR}/orders.parquet' GROUP BY o_custkey"""
            )
        ),
        reverse=True,
    )
    total = sum(revs)
    thr = -(-total * 800 // 1000)  # ceil
    assert r.n_customers == len(revs) and r.total_cents == total
    greedy = revs[: r.covering_customers]
    assert sum(greedy) >= thr
    assert r.covering_customers == 0 or sum(greedy[:-1]) < thr
    assert sum(greedy) == r.covered_cents
    assert r.coverage_milli >= 800


def test_slope_matches_float_least_squares(spark):
    r = QUERIES["discount_quantity_slope"](spark, SF_DIR).collect()[0]
    xy = _duck(
        f"""SELECT CAST(FLOOR(l_discount * 1000 + 0.5) AS BIGINT),
                   CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet'"""
    )
    x = np.array([a for a, _ in xy], dtype=np.float64)
    y = np.array([b for _, b in xy], dtype=np.float64)
    slope = np.polyfit(x, y, 1)[0]
    assert abs(r.slope_milli - slope * 1000) <= 1.0
    assert r.slope_den > 0


def test_lag_bands_partition_lineitem(spark):
    rows = QUERIES["ship_lag_bands"](spark, SF_DIR).collect()
    (n_lines,) = _duck(f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'")[0]
    assert sum(r.n_lines for r in rows) == n_lines
    assert {r.band for r in rows} <= {"00-07", "08-30", "31-90", "90+"}


def test_momentum_sign_matches_direction(spark):
    rows = QUERIES["orders_monthly_momentum"](spark, SF_DIR).collect()
    for r in rows:
        if r.rev_cents > r.prev_cents:
            assert r.delta_milli >= 0
        elif r.rev_cents < r.prev_cents:
            assert r.delta_milli <= 0
        else:
            assert r.delta_milli == 0


def test_connected_components_match_union_find(spark):
    """Distributed label propagation agrees with a literal driver-side
    union-find on the same co-supply edges."""
    r = QUERIES["graph_connected_components"](spark, SF_DIR).collect()[0]
    sups = [s for (s,) in _duck(f"SELECT s_suppkey FROM '{SF_DIR}/supplier.parquet'")]
    edges = _duck(
        f"""WITH su AS (SELECT DISTINCT l_orderkey o, l_suppkey s
                        FROM '{SF_DIR}/lineitem.parquet')
            SELECT DISTINCT a.s, b.s FROM su a JOIN su b
            ON a.o = b.o AND a.s < b.s"""
    )
    parent = {s: s for s in sups}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes: dict = {}
    for s in sups:
        sizes[find(s)] = sizes.get(find(s), 0) + 1
    assert r.n_nodes == len(sups)
    assert r.n_edges == len(edges)
    assert r.n_components == len(sizes)
    assert r.largest_component == max(sizes.values())
    assert r.singleton_components == sum(1 for v in sizes.values() if v == 1)


def test_slice_drift_matches_numpy_quantized_cosine(spark):
    rows = QUERIES["embed_slice_drift"](spark, SF_DIR).collect()
    embs = _duck(f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'")
    by_slice: dict = {}
    for vid, e in embs:
        q = np.floor(np.asarray(e, dtype=np.float64) * 1000 + 0.5).astype(np.int64)
        by_slice.setdefault(vid // 16, []).append(q)
    cents = {}
    for s, qs in by_slice.items():
        tot = np.sum(qs, axis=0)
        n = len(qs)
        cents[s] = np.where(tot >= 0, tot // n, -((-tot) // n))
    for r in rows:
        a, b = cents[r.slice_a], cents[r.slice_b]
        assert r.dot == int(np.dot(a, b))
        assert r.na == int(np.dot(a, a)) and r.nb == int(np.dot(b, b))
        assert -1000 <= r.cos_sq_milli <= 1000


def test_ivfpq_recall_and_exact_rescore(spark):
    """IVF-PQ: the pruned+compressed scan still recovers most true
    neighbors, and every returned neighbor carries its TRUE cosine
    (exact-rescore property — pruning and ADC error can cost recall,
    never score accuracy)."""
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.operators.pq import ivfpq_ann_topk
    from data_engineering_assessment_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    brute = cosine_topk(emb, q, k=3).collect()
    bs: dict = {}
    for r in brute:
        bs.setdefault(r.q_id, set()).add(r.neighbor_id)
    got = ivfpq_ann_topk(
        emb, q, k=3, n_clusters=16, nprobe=6, m=16, ksub=32, n_iter=3, refine=16
    ).collect()
    ps: dict = {}
    for r in got:
        ps.setdefault(r.q_id, set()).add(r.neighbor_id)
    recall = [len(bs[k] & ps.get(k, set())) / len(bs[k]) for k in bs]
    assert sum(recall) / len(recall) >= 0.7

    truth = {
        (r.q_id, r.neighbor_id): r.cosine_micro
        for r in cosine_topk(emb, q, k=49).collect()
    }
    for r in got:
        if (r.q_id, r.neighbor_id) in truth:
            assert abs(r.cosine_micro - truth[(r.q_id, r.neighbor_id)]) <= 2


def test_stream_attribution_matches_batch_recompute(spark):
    """The streaming rollup equals a literal driver recompute under
    session_window semantics (microsecond gaps, a gap of exactly the
    threshold starts a new session, min-(ts, event_id) entry)."""
    rows = {
        r.entry_type: r
        for r in QUERIES["stream_session_attribution"](spark, SF_DIR).collect()
    }
    ev = _duck(
        f"""SELECT user_id, event_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT),
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    )
    by_user: dict = {}
    for uid, eid, et, tus, cents in ev:
        by_user.setdefault(uid, []).append((tus, eid, et, cents))
    gap_us = 1800 * 1_000_000
    expect: dict = {}
    for uid, evs in by_user.items():
        evs.sort()
        sess: list = []
        for e in evs:
            if sess and e[0] - sess[-1][0] >= gap_us:
                entry = min(sess)[2]
                agg = expect.setdefault(entry, [0, 0, 0])
                agg[0] += 1
                agg[1] += len(sess)
                agg[2] += sum(x[3] for x in sess)
                sess = []
            sess.append(e)
        if sess:
            entry = min(sess)[2]
            agg = expect.setdefault(entry, [0, 0, 0])
            agg[0] += 1
            agg[1] += len(sess)
            agg[2] += sum(x[3] for x in sess)
    assert set(rows) == set(expect)
    for et, (ns, nev, cents) in expect.items():
        r = rows[et]
        assert (r.n_sessions, r.n_events, r.total_value_cents) == (ns, nev, cents), et


def test_user_mode_counts_all_users(spark):
    rows = QUERIES["events_user_mode_type"](spark, SF_DIR).collect()
    (n_users,) = _duck(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )[0]
    assert sum(r.n_users for r in rows) == n_users
    # brute-force mode for every user
    per = _duck(
        f"""SELECT user_id, event_type, COUNT(*) FROM '{SF_DIR}/events.parquet'
            GROUP BY user_id, event_type"""
    )
    by_user: dict = {}
    for uid, et, c in per:
        by_user.setdefault(uid, []).append((-c, et))
    expect: dict = {}
    for uid, lst in by_user.items():
        mode = min(lst)[1]
        expect[mode] = expect.get(mode, 0) + 1
    assert {r.mode_type: r.n_users for r in rows} == expect


def test_priority_mix_shift_shares_and_sign(spark):
    rows = QUERIES["orders_priority_mix_shift"](spark, SF_DIR).collect()
    (n_orders,) = _duck(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")[0]
    assert sum(r.n_before + r.n_after for r in rows) == n_orders
    assert 1_000_000 - len(rows) < sum(r.share_before_ppm for r in rows) <= 1_000_000
    assert 1_000_000 - len(rows) < sum(r.share_after_ppm for r in rows) <= 1_000_000
    for r in rows:
        raw = r.share_after_ppm - r.share_before_ppm
        # shift is the exact cross-multiplied form; floor-truncated
        # shares can disagree by at most 1 ppm either side
        assert abs(r.shift_ppm - raw) <= 2


def test_gap_p90_matches_bruteforce_percentile(spark):
    r = QUERIES["interarrival_gap_p90"](spark, SF_DIR).collect()[0]
    gaps = sorted(
        g
        for (g,) in _duck(
            f"""WITH o AS (
                  SELECT o_custkey,
                         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS t,
                         o_orderkey
                  FROM '{SF_DIR}/orders.parquet')
                SELECT (t - LAG(t) OVER (PARTITION BY o_custkey
                  ORDER BY t, o_orderkey)) // 86400
                FROM o"""
        )
        if g is not None
    )
    assert r.n_gaps == len(gaps)
    # smallest value whose cumulative count reaches ceil(k/10 * n)
    def pct(k):
        need = -(-len(gaps) * k // 10)
        return gaps[need - 1]

    assert r.p50_days == pct(5)
    assert r.p90_days == pct(9)
    assert r.max_days == gaps[-1]


def test_dau_wau_bounds_and_bruteforce(spark):
    rows = QUERIES["events_dau_wau_stickiness"](spark, SF_DIR).collect()
    du = set(
        _duck(
            f"""SELECT DISTINCT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400,
                       user_id FROM '{SF_DIR}/events.parquet'"""
        )
    )
    days = {d for d, _ in du}
    for r in rows:
        assert r.epoch_day in days
        dau = sum(1 for d, _ in du if d == r.epoch_day)
        wau = len({u for d, u in du if r.epoch_day - 6 <= d <= r.epoch_day})
        assert (r.dau, r.wau) == (dau, wau)
        assert r.dau <= r.wau
        assert 0 < r.stickiness_milli <= 1000


def test_returns_by_brand_partitions_lineitem(spark):
    rows = QUERIES["returns_by_brand"](spark, SF_DIR).collect()
    (n_lines, n_ret) = _duck(
        f"""SELECT COUNT(*), SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            FROM '{SF_DIR}/lineitem.parquet'"""
    )[0]
    assert sum(r.n_lines for r in rows) == n_lines
    assert sum(r.n_returned for r in rows) == n_ret
    for r in rows:
        assert 0 <= r.return_milli <= 1000


def test_anomaly_mad_matches_literal_recompute(spark):
    r = QUERIES["events_anomaly_mad"](spark, SF_DIR).collect()[0]
    daily = sorted(
        n
        for (n,) in _duck(
            f"""SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'
                GROUP BY CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400"""
        )
    )
    lower_median = lambda xs: sorted(xs)[-(-len(xs) // 2) - 1]
    med = lower_median(daily)
    mad = lower_median([abs(n - med) for n in daily])
    assert (r.n_days, r.median_daily, r.mad_daily) == (len(daily), med, mad)
    assert r.n_anomalous_days == sum(1 for n in daily if abs(n - med) > 3 * mad)


def test_session_duration_hist_conserves_sessions(spark):
    rows = QUERIES["session_duration_hist"](spark, SF_DIR).collect()
    att = QUERIES["event_first_touch_attribution"](spark, SF_DIR).collect()
    assert sum(r.n_sessions for r in rows) == sum(a.n_sessions for a in att)
    for r in rows:
        if r.bucket_log2 == 0:
            assert r.min_secs == r.max_secs == 0
        else:
            lo, hi = 2 ** (r.bucket_log2 - 1) - 1, 2**r.bucket_log2 - 2
            assert lo <= r.min_secs <= r.max_secs <= hi


def test_churn_by_segment_covers_ordering_customers(spark):
    rows = QUERIES["customer_churn_by_segment"](spark, SF_DIR).collect()
    (n_cust,) = _duck(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )[0]
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 0 <= r.n_churned <= r.n_customers
        assert 0 <= r.churn_milli <= 1000


def test_xml_roundtrip_is_byte_exact(spark):
    """The digest column equals the digest of the ORIGINAL parquet
    text — the escape/unescape cycle loses nothing."""
    rows = {
        r.doc_id: r.text_md5
        for r in QUERIES["scan_xml_roundtrip"](spark, SF_DIR).collect()
    }
    orig = dict(
        _duck(f"SELECT doc_id, md5(text) FROM '{SF_DIR}/documents.parquet'")
    )
    assert rows == orig


def test_conversion_consistent_with_bounce_frame(spark):
    """Same sessionizer: session counts per entry type agree with the
    bounce key; conversions recomputed from raw events."""
    conv = {r.entry_type: r for r in QUERIES["session_conversion_rate"](spark, SF_DIR).collect()}
    bounce = {r.entry_type: r for r in QUERIES["session_bounce_rate"](spark, SF_DIR).collect()}
    assert set(conv) == set(bounce)
    for et, r in conv.items():
        assert r.n_sessions == bounce[et].n_sessions
        assert 0 <= r.n_converted <= r.n_sessions
        assert 0 <= r.conversion_milli <= 1000


def test_share_of_parent_partitions(spark):
    rows = QUERIES["revenue_share_of_parent"](spark, SF_DIR).collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    for region, rs in by_region.items():
        # floor-truncated shares undershoot by < 1 ppm per nation
        assert 1_000_000 - len(rs) < sum(x.share_of_region_ppm for x in rs) <= 1_000_000
    assert 1_000_000 - len(rows) < sum(r.share_of_total_ppm for r in rows) <= 1_000_000
    (total,) = _duck(
        f"""SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            FROM '{SF_DIR}/orders.parquet'"""
    )[0]
    assert sum(r.revenue_cents for r in rows) == total


def test_twap_matches_float_recompute(spark):
    rows = QUERIES["ts_time_weighted_avg"](spark, SF_DIR).collect()
    ev = _duck(
        f"""SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT),
                   event_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    )
    by_type: dict = {}
    for et, t, eid, c in ev:
        by_type.setdefault(et, []).append((t, eid, c))
    for r in rows:
        evs = sorted(by_type[r.event_type])
        segs = [
            (evs[i + 1][0] - evs[i][0], evs[i][2])
            for i in range(len(evs) - 1)
            if evs[i + 1][0] - evs[i][0] > 0
        ]
        tot = sum(d for d, _ in segs)
        wsum = sum(d * c for d, c in segs)
        assert (r.n_segments, r.total_secs, r.weighted_cent_secs) == (
            len(segs),
            tot,
            wsum,
        )
        assert r.twap_cents == wsum // tot


def test_time_to_convert_percentiles(spark):
    r = QUERIES["funnel_time_to_convert"](spark, SF_DIR).collect()[0]
    lags = sorted(
        s
        for (s,) in _duck(
            f"""WITH e AS (SELECT user_id, event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
                   FROM '{SF_DIR}/events.parquet'),
                v AS (SELECT user_id, MIN(t) tv FROM e
                      WHERE event_type='view' GROUP BY user_id)
                SELECT MIN(e.t) - MIN(v.tv) FROM e JOIN v USING (user_id)
                WHERE e.event_type='purchase' AND e.t >= v.tv
                GROUP BY e.user_id"""
        )
    )
    assert r.n_converters == len(lags)
    pct = lambda k: lags[-(-len(lags) * k // 10) - 1]
    assert (r.p50_secs, r.p90_secs, r.max_secs) == (pct(5), pct(9), lags[-1])


def test_session_path_topk_planted(spark, tmp_path):
    """Hand-built event log: user 1 runs two identical sessions
    (view>click>purchase... with a 4th event that must NOT enter the
    path), user 2 a single two-event session, user 3 one lone event;
    a >30-min gap splits user 1's sessions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from data_engineering_assessment_spark.plans.insights import session_path_topk

    base = 1_700_000_000
    rows = [
        # user 1, session A: view>click>purchase + extra (rn=4 dropped)
        (1, 1, "view", base + 0),
        (2, 1, "click", base + 60),
        (3, 1, "purchase", base + 120),
        (4, 1, "view", base + 180),
        # user 1, session B (gap > 1800 s): same opening
        (5, 1, "view", base + 4000),
        (6, 1, "click", base + 4060),
        (7, 1, "purchase", base + 4120),
        # user 2: one two-event session
        (8, 2, "view", base + 0),
        (9, 2, "click", base + 10),
        # user 3: a lone event
        (10, 3, "purchase", base + 0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "t"])
    df["ts"] = pd.to_datetime(df.pop("t"), unit="s")
    df["value"] = 1.0
    df["props"] = "{}"
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = [
        (r["rank"], r["path"], r["n_sessions"])
        for r in session_path_topk(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, "view>click>purchase", 2),
        (2, "purchase", 1),
        (3, "view>click", 1),
    ]


def test_edge_fingerprint_exact_integer_accumulation(spark):
    """ADVICE r9 regression pin for operators/graph.py:edge_fingerprint:
    the hash term accumulates as exact BIGINT, never double.  Pins
    (a) the Python-side type (a double-sum regression surfaces as
    float), (b) bit-equality with an independently DECIMAL(38,0)-
    accumulated twin over a 6M-edge frame (2³¹-magnitude terms — the
    regime the r9 fix targets), and (c) partition-order invariance,
    which only exact accumulation can promise."""
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.operators.graph import edge_fingerprint

    df = spark.range(6_000_000).select(
        F.col("id").alias("u"), (F.col("id") * 31 + 7).alias("v")
    )
    fp = edge_fingerprint(df)
    assert all(isinstance(x, int) for x in fp), f"non-integer fingerprint: {fp!r}"
    exact = df.agg(
        F.sum(
            (F.xxhash64("u", "v") % F.lit(2**31)).cast("decimal(38,0)")
        ).alias("h")
    ).collect()[0]["h"]
    assert fp[0] == 6_000_000
    assert fp[3] == int(exact)
    assert fp == edge_fingerprint(df.repartition(17)), (
        "fingerprint must be partition-order invariant"
    )
