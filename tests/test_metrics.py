"""Semantic invariants for the round-7b evaluation/monitoring keys
(plans/metrics.py) — value-exactness is covered by the oracle-parity
sweep in test_correctness.py; these assert the statistical properties
the docstrings promise (metric ranges, conservation laws, brute-force
agreement on small data) that a hash match alone would not explain."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def test_auc_matches_bruteforce_pair_count(spark):
    """2U really is the count of (pos, neg) pairs ordered correctly
    (×2, ties ×1) — recomputed pairwise from the raw rows."""
    r = QUERIES["quality_score_auc"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    scores = con.execute(
        f"""SELECT len(string_split(text, ' ')) AS s, lang = 'en' AS pos
            FROM '{SF_DIR}/documents.parquet'"""
    ).fetchall()
    con.close()
    pos = sorted(s for s, p in scores if p)
    neg = sorted(s for s, p in scores if not p)
    u2 = sum(2 if p > n else 1 if p == n else 0 for p in pos for n in neg)
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    assert r.u2 == u2
    assert 0 <= r.auc_milli <= 1000


def test_calibration_bins_partition_the_corpus(spark):
    rows = QUERIES["calibration_bins"](spark, SF_DIR).collect()
    assert {r.bin for r in rows} <= set(range(10))
    auc = QUERIES["quality_score_auc"](spark, SF_DIR).collect()[0]
    assert sum(r.n_docs for r in rows) == auc.n_pos + auc.n_neg
    assert sum(r.n_pos for r in rows) == auc.n_pos
    assert all(0 <= r.pos_rate_milli <= 1000 for r in rows)


def test_kappa_identities(spark):
    r = QUERIES["gate_agreement_kappa"](spark, SF_DIR).collect()[0]
    n = r.n11 + r.n10 + r.n01 + r.n00
    assert n > 0 and r.kappa_den > 0
    assert -1000 <= r.kappa_milli <= 1000
    # kappa_milli is the truncated-toward-zero milli of num/den
    q = abs(r.kappa_num) * 1000 // r.kappa_den
    assert r.kappa_milli == (q if r.kappa_num >= 0 else -q)


def test_cusum_conservation_and_bounds(spark):
    """The scaled deviations sum to zero over each series, so the
    cusum returns to ~0 at the final day; the peak is positive unless
    the series is perfectly flat."""
    rows = QUERIES["ts_cusum_changepoint"](spark, SF_DIR).collect()
    assert len(rows) == 5  # one per event_type
    for r in rows:
        assert r.n_days >= 1 and r.total_events >= r.n_days
        assert r.max_abs_cusum >= 0


def test_lagged_covariance_day_alignment(spark):
    rows = {r.lag: r for r in QUERIES["ts_lagged_covariance"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 7}
    # longer lags can only lose pair days
    assert rows[0].n_days >= rows[1].n_days >= rows[7].n_days
    # lag-0 pairs cover every day, so sums agree across lags' shared days
    assert rows[0].sum_x >= rows[1].sum_x >= rows[7].sum_x


def test_max_concurrency_bounds(spark):
    r = QUERIES["session_max_concurrency"](spark, SF_DIR).collect()[0]
    sess = QUERIES["sessionize_lag"](spark, SF_DIR).collect()
    assert r.n_sessions == len(sess)
    assert 1 <= r.max_concurrency <= r.n_sessions
    mins = [(s.start_s // 60, s.end_s // 60) for s in sess]
    # brute-force the sweep on collected sessions
    best = max(
        sum(1 for a, b in mins if a <= m <= b) for m in {a for a, _ in mins}
    )
    assert r.max_concurrency == best


def test_levenshtein_block_sanity(spark):
    r = QUERIES["dedup_levenshtein_block"](spark, SF_DIR).collect()[0]
    assert r.n_pairs >= 0 and r.n_near <= r.n_pairs
    if r.n_pairs == 0:
        assert r.min_dist == -1 and r.sum_dist == 0
    else:
        assert 0 <= r.min_dist <= r.sum_dist


def test_gini_range_and_totals(spark):
    r = QUERIES["token_gini_concentration"](spark, SF_DIR).collect()[0]
    assert r.n_tokens >= 1 and r.total_occ >= r.n_tokens
    assert 0 <= r.gini_num <= r.n_tokens * r.total_occ
    assert 0 <= r.gini_milli < 1000


def test_silhouette_consistent_with_cluster_assignment(spark):
    sil = {r.cluster_id: r for r in QUERIES["embed_silhouette"](spark, SF_DIR).collect()}
    clu = {r.cluster_id: r for r in
           QUERIES["dedup_semantic_cluster"](spark, SF_DIR).collect()}
    assert set(sil) == set(clu)
    for cid, r in sil.items():
        assert r.n_members == clu[cid].n_members
        assert 0 <= r.n_ambiguous <= r.n_members
        # margins are non-negative by construction (cos1 >= cos2)
        assert r.sum_margin_micro >= 0


def test_cumulative_distinct_is_monotone_and_totals(spark):
    rows = sorted(
        QUERIES["cumulative_distinct_users"](spark, SF_DIR).collect(),
        key=lambda r: r.day_idx,
    )
    assert rows[0].cum_users == rows[0].n_new
    for a, b in zip(rows, rows[1:]):
        assert b.cum_users == a.cum_users + b.n_new
    total_users = (
        QUERIES["event_ab_test_lift"](spark, SF_DIR).collect()[0]
    )
    assert rows[-1].cum_users == total_users.n_a + total_users.n_b


def test_leakage_check_totals(spark):
    r = QUERIES["split_leakage_check"](spark, SF_DIR).collect()[0]
    assert r.n_train_docs + r.n_eval_docs > 0
    assert 0 <= r.n_shared_fp <= min(r.n_train_docs, r.n_eval_docs)
    assert r.n_leaked_eval_docs <= r.n_eval_docs


def test_assortativity_is_a_correlation(spark):
    r = QUERIES["graph_degree_assortativity"](spark, SF_DIR).collect()[0]
    assert r.n_directed_edges > 0
    assert r.var_x_num > 0 and r.var_y_num > 0
    # symmetrized edge set => x and y marginals are identical
    assert r.var_x_num == r.var_y_num
    assert -1_000_000 <= r.assort_micro <= 1_000_000
    assert (r.assort_micro >= 0) == (r.cov_num >= 0)


def test_ab_lift_sign_matches_rates(spark):
    r = QUERIES["event_ab_test_lift"](spark, SF_DIR).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    exact_diff = r.conv_b * r.n_a - r.conv_a * r.n_b
    assert r.lift_num == exact_diff


def test_control_chart_integer_bound_equals_float_formula(spark):
    """The cross-multiplied integer inequality must agree with the
    textbook float 3-sigma bound day-by-day (the synthetic stream is
    in-control everywhere, so this proves the LOGIC, not just the
    all-false outcome), and the totals must reconcile."""
    rows = QUERIES["events_control_chart"](spark, SF_DIR).collect()
    assert len(rows) >= 28
    big_n = sum(r.n_d for r in rows)
    big_e = sum(r.e_d for r in rows)
    assert 0 < big_e < big_n
    p_bar = big_e / big_n
    for r in rows:
        float_flag = (
            abs(r.e_d / r.n_d - p_bar) > 3 * (p_bar * (1 - p_bar) / r.n_d) ** 0.5
        )
        assert r.out_of_control == float_flag, r
        # and the raw integer inequality itself
        dev = r.e_d * big_n - r.n_d * big_e
        assert r.out_of_control == (dev * dev > 9 * r.n_d * big_e * (big_n - big_e))


def test_fano_matches_float_recompute(spark):
    rows = QUERIES["events_fano_factor"](spark, SF_DIR).collect()
    assert len(rows) == 5
    daily = QUERIES["ts_cusum_changepoint"](spark, SF_DIR).collect()
    totals = {r.event_type: (r.n_days, r.total_events) for r in daily}
    for r in rows:
        d, tot = totals[r.event_type]
        assert (r.n_days, r.total) == (d, tot)
        # var_num = D^2 * population variance; fano = var/mean
        assert r.var_num >= 0
        assert r.fano_milli == r.var_num * 1000 // (r.n_days * r.total)


def test_fk_audit_is_clean_on_consistent_corpus(spark):
    rows = QUERIES["fk_violation_audit"](spark, SF_DIR).collect()
    assert len(rows) == 7
    by_edge = {r.edge: r for r in rows}
    # the synthetic star schema is referentially consistent
    assert all(r.n_orphans == 0 for r in rows), by_edge
    li = by_edge["lineitem.l_orderkey->orders"].n_child
    assert by_edge["lineitem.l_partkey->part"].n_child == li
    assert by_edge["lineitem.l_suppkey->supplier"].n_child == li


def test_hhi_bounds(spark):
    rows = QUERIES["supplier_hhi_by_nation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_suppliers >= 1 and r.total_q > 0
        # 1e6/n <= HHI_ppm <= 1e6 (floor can undershoot the lower
        # bound by at most 1)
        assert (1_000_000 // r.n_suppliers) - 1 <= r.hhi_ppm <= 1_000_000


def test_asof_forward_bruteforce_sample(spark):
    from pyspark.sql import functions as F

    got = {
        r.event_id: (r.next_purchase_ts, r.wait_s)
        for r in QUERIES["join_asof_forward"](spark, SF_DIR)
        .filter(F.col("user_id") < 5)
        .collect()
    }
    ev = (
        QUERIES["join_asof"](spark, SF_DIR).sparkSession.read.parquet(
            f"{SF_DIR}/events.parquet"
        )
    )
    # brute force on a few users using the raw table
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_id, user_id, event_type,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
            FROM '{SF_DIR}/events.parquet' WHERE user_id < 5"""
    ).fetchall()
    con.close()
    by_user: dict = {}
    for eid, uid, typ, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    n_checked = 0
    for uid, evs in by_user.items():
        evs.sort()
        for i, (ts, eid, typ) in enumerate(evs):
            if typ != "click":
                continue
            later_purchases = [t for t, _, ty in evs[i + 1:] if ty == "purchase"]
            want = min(later_purchases) if later_purchases else None
            assert got[eid] == (want, want - ts if want is not None else None), eid
            n_checked += 1
    assert n_checked > 10


def test_cume_dist_bounds_and_monotone(spark):
    rows = QUERIES["window_cume_dist"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.cume_milli <= 1000
        assert 0 <= r.pct_rank_milli <= 1000
        # (rank-1)/(n-1) <= rank/n  <=>  rank <= n, always; floor preserves <=
        assert r.pct_rank_milli <= r.cume_milli


def test_skyline_matches_bruteforce_dominance(spark):
    """The discretized per-size frontier really is the O(n^2) skyline:
    recompute dominance pairwise from the raw part rows."""
    rows = QUERIES["skyline_pareto_frontier"](spark, SF_DIR).collect()
    got = {(r.p_partkey, r.size, r.price_cents) for r in rows}
    con = duckdb.connect()
    parts = con.execute(
        f"""SELECT p_partkey, CAST(p_size AS BIGINT),
                   CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
            FROM '{SF_DIR}/part.parquet'"""
    ).fetchall()
    con.close()
    want = {
        (k, s, p)
        for k, s, p in parts
        if not any(
            s2 >= s and p2 <= p and (s2 > s or p2 < p) for _, s2, p2 in parts
        )
    }
    assert got == want and got


def test_skyline_is_strictly_monotone_frontier(spark):
    """Distinct frontier sizes must have strictly decreasing prices —
    the geometric shape of a maximal staircase."""
    rows = QUERIES["skyline_pareto_frontier"](spark, SF_DIR).collect()
    by_size: dict = {}
    for r in rows:
        by_size.setdefault(r.size, set()).add(r.price_cents)
    assert all(len(v) == 1 for v in by_size.values())
    seq = sorted((s, min(v)) for s, v in by_size.items())
    prices = [p for _, p in seq]
    # bigger size survives only at a strictly higher price (a bigger
    # part at an equal-or-lower price would dominate every smaller one)
    assert all(a < b for a, b in zip(prices, prices[1:]))


def test_interval_union_matches_bruteforce_merge(spark):
    """covered_sec / n_islands equal a literal sort-and-merge of each
    user's [ts, ts+300) intervals."""
    rows = QUERIES["interval_coverage_union"](spark, SF_DIR).collect()
    got = {r.user_id: (r.n_events, r.covered_sec, r.n_islands) for r in rows}
    con = duckdb.connect()
    evs = con.execute(
        f"""SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    con.close()
    by_user: dict = {}
    for uid, s in evs:
        by_user.setdefault(uid, []).append((s, s + 300))
    for uid, iv in by_user.items():
        iv.sort()
        covered = islands = 0
        cur_s = cur_e = None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e, islands = s, e, islands + 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert got[uid] == (len(iv), covered, islands), uid
    assert set(got) == set(by_user)


def test_triangle_count_matches_adjacency_bruteforce(spark):
    """Degree-ordered counting equals per-edge neighbor-set
    intersection on the raw co-purchase graph; wedge identity checked
    from degrees."""
    r = QUERIES["graph_triangle_count"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    pairs = con.execute(
        f"""WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                        FROM '{SF_DIR}/lineitem.parquet')
            SELECT DISTINCT a.p, b.p FROM op a
            JOIN op b ON a.o = b.o AND a.p < b.p"""
    ).fetchall()
    con.close()
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle is seen once per edge (3 edges x 1 common neighbor)
    tri = sum(len(adj[u] & adj[v]) for u, v in pairs) // 3
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(pairs)
    assert r.n_wedges == wedges
    assert r.n_triangles == tri
    if wedges:
        assert r.gcc_ppm == 3 * tri * 1_000_000 // wedges
    assert 0 <= r.gcc_ppm <= 1_000_000


def test_checksum_detects_any_single_field_change(spark):
    """The (count, xor, mod-prime-sum) triple is row-order-free and
    flips when any canonical field of any single row changes."""
    from data_engineering_assessment_spark.plans.metrics import (
        table_checksum_groups,
    )

    base = {
        (r.l_returnflag, r.l_linestatus): (r.n_rows, r.xor_sig, r.sum_sig)
        for r in table_checksum_groups(spark, SF_DIR).collect()
    }
    # row-order independence: same result off a shuffled, repartitioned copy
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    tmp = tempfile.mkdtemp(prefix="cksum_")
    try:
        shuffled_dir = f"{tmp}/li"
        src.orderBy(F.rand(7)).repartition(7).write.parquet(shuffled_dir)
        spark.read.parquet(shuffled_dir).createOrReplaceTempView("_cksum_shuf")
        # re-point the key at the shuffled copy by symlinking the layout
        import os

        os.makedirs(f"{tmp}/sf", exist_ok=True)
        for t in ("lineitem",):
            os.symlink(shuffled_dir, f"{tmp}/sf/{t}.parquet")
        got = {
            (r.l_returnflag, r.l_linestatus): (r.n_rows, r.xor_sig, r.sum_sig)
            for r in table_checksum_groups(spark, f"{tmp}/sf").collect()
        }
        assert got == base
        # sensitivity: perturb ONE row's quantity by one unit — target
        # an existing (orderkey, linenumber) pair (linenumbers are not
        # dense per order in the synthetic corpus)
        ok, ln = src.select("l_orderkey", "l_linenumber").head()
        perturbed = src.withColumn(
            "l_quantity",
            F.when(
                (F.col("l_orderkey") == ok) & (F.col("l_linenumber") == ln),
                F.col("l_quantity") + 1.0,
            ).otherwise(F.col("l_quantity")),
        )
        pdir = f"{tmp}/li2"
        perturbed.write.parquet(pdir)
        os.makedirs(f"{tmp}/sf2", exist_ok=True)
        os.symlink(pdir, f"{tmp}/sf2/lineitem.parquet")
        got2 = {
            (r.l_returnflag, r.l_linestatus): (r.n_rows, r.xor_sig, r.sum_sig)
            for r in table_checksum_groups(spark, f"{tmp}/sf2").collect()
        }
        assert got2 != base
        # counts unchanged -> the xor/sum signatures carried the signal
        assert {k: v[0] for k, v in got2.items()} == {
            k: v[0] for k, v in base.items()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_proration_conserves_pool_and_matches_hamilton(spark):
    """Per-order allocations sum exactly to the pool, each line gets
    floor-share or floor-share+1, and the +1s go to the largest
    remainders — recomputed with a literal Hamilton's method.

    Compared as per-order sorted MULTISETS, not dicts: the sf0.001
    fixture contains duplicate (linenumber, partkey, suppkey) triples
    within an order (e.g. order 1294), so a dict keyed on the triple
    silently collapses rows and corrupts the expected leftover."""
    rows = QUERIES["money_proration_lrm"](spark, SF_DIR).collect()
    got_by_order: dict = {}
    for r in rows:
        got_by_order.setdefault(r.l_orderkey, []).append(
            (r.l_linenumber, r.l_partkey, r.l_suppkey, r.alloc_cents)
        )
    con = duckdb.connect()
    li = con.execute(
        f"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT), l_partkey, l_suppkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()
    pools = dict(
        con.execute(
            f"""SELECT o_orderkey,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                         * 2 // 100
                FROM '{SF_DIR}/orders.parquet'"""
        ).fetchall()
    )
    con.close()
    by_order: dict = {}
    for ok, ln, pk, sk, p in li:
        by_order.setdefault(ok, []).append((ln, pk, sk, p))
    n_rows = 0
    for ok, lines in by_order.items():
        pool, s = pools[ok], sum(p for *_, p in lines)
        # engine tie-break: rem DESC, then (ln, pk, sk, p) ASC — total
        ranked = sorted(
            ((-(pool * p % s), ln, pk, sk, p) for ln, pk, sk, p in lines),
        )
        leftover = pool - sum(pool * p // s for *_, p in lines)
        want = [
            (ln, pk, sk, pool * p // s + (i < leftover))
            for i, (_, ln, pk, sk, p) in enumerate(ranked)
        ]
        assert sum(a for *_, a in want) == pool
        assert sorted(got_by_order[ok]) == sorted(want), ok
        n_rows += len(lines)
    assert sum(len(v) for v in got_by_order.values()) == n_rows


def test_gap_audit_two_level_equals_flat_lag(spark):
    """Bucketed intra+inter gaps equal the flat global-lag answer,
    and the gaps exactly tile the complement of the key set."""
    rows = QUERIES["sequence_gap_audit"](spark, SF_DIR).collect()
    got = sorted((r.gap_start, r.gap_end, r.gap_len) for r in rows)
    con = duckdb.connect()
    keys = sorted(
        k
        for (k,) in con.execute(
            f"""SELECT DISTINCT o_orderkey FROM '{SF_DIR}/orders.parquet'
                WHERE o_orderstatus = 'O'"""
        ).fetchall()
    )
    con.close()
    want = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(keys, keys[1:])
        if b - a > 1
    ]
    assert got == want and got
    covered = sum(g for _, _, g in got)
    assert covered == (keys[-1] - keys[0] + 1) - len(keys)


def test_reset_running_matches_per_user_replay(spark):
    """seg_idx/run_pos/purchases_since_reset equal a literal per-user
    replay with a counter that resets on every 'error'."""
    rows = QUERIES["window_reset_running"](spark, SF_DIR).collect()
    got = {r.event_id: (r.seg_idx, r.run_pos, r.purchases_since_reset) for r in rows}
    con = duckdb.connect()
    evs = con.execute(
        f"""SELECT event_id, user_id, event_type,
                   CAST(FLOOR(epoch(ts)) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    con.close()
    by_user: dict = {}
    for eid, uid, typ, s in evs:
        by_user.setdefault(uid, []).append((s, eid, typ))
    for uid, seq in by_user.items():
        seq.sort()
        seg = pos = pur = 0
        for s, eid, typ in seq:
            if typ == "error":
                seg, pos, pur = seg + 1, 0, 0
            pos += 1
            pur += typ == "purchase"
            assert got[eid] == (seg, pos, pur), eid
    assert len(got) == len(evs)


def test_triangle_count_zero_not_null_on_triangle_free_graph(spark, tmp_path):
    """ADVICE r9 regression pin: SUM over an empty closing frame is
    NULL, but a triangle-FREE co-purchase graph (a star here: every
    order pairs one hub part with one leaf) must report n_triangles=0
    and gcc_ppm=0 like the oracle — the pre-fix code (no coalesce at
    plans/metrics.py graph_triangle_count) returned NULL."""
    rows = [(i, 0) for i in range(1, 5)] + [(i, i) for i in range(1, 5)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = QUERIES["graph_triangle_count"](spark, str(tmp_path)).collect()[0]
    # star K(1,4): 5 nodes, 4 edges, C(4,2)=6 wedges at the hub, 0 triangles
    assert r.n_nodes == 5 and r.n_edges == 4 and r.n_wedges == 6
    assert r.n_triangles == 0, "triangle-free graph must report 0, not NULL"
    assert r.gcc_ppm == 0
