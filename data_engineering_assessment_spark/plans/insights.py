"""Round-8 pipeline-insight operators — the questions an operations
team asks OF the engine while it runs: where do sessions start and
what are they worth (first-touch attribution, bounce rate,
seasonality), how much duplication does each source contribute
(per-source dedup dashboard, cluster-size spectrum), what will a join
cost before running it (the AQE planning statistics: cardinality
estimate, key-skew top-N), and macro health series (monthly momentum,
Pareto revenue coverage, discount elasticity, ship-lag bands,
supplier co-supply connectivity).

Output contract (README round-3, plans/metrics.py module docstring):
graded columns are BIGINT / STRING fixed-point; money is exact cents
via ``FLOOR(x * 100 + 0.5)`` (one IEEE multiply-add on identical
operands — bit-identical in any engine); ratios are integer
milli/ppm; signed ratios truncate the ABSOLUTE value toward zero and
re-apply the sign explicitly (negative integer division is not
engine-portable).

Scale stance: sessionization is windowed BY USER (per-key frames,
never a global sort); dedup dashboards hash-group on the text digest
(one shuffle, map-side combined); the join statistics aggregate
per-key histograms — the estimate costs two groupBys and a key-sized
join instead of materializing the join itself; unpartitioned windows
appear only over value-domain or calendar-domain frames (distinct
dollar totals, months, 24 hours) that do not grow with row count.
The only iterative operator (connected components) loops over a
supplier-count-sized label frame with localCheckpoint lineage
truncation, never over lineitem rows.

The reference (01.py/02.py) has no analytics surface — this module
is part of the SURVEY.md §2.4 training-data/ops extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_deterministic_session
from ..sources.tables import load_table
from .registry import query


def _epoch_s(c) -> F.Column:
    """Timestamp → epoch seconds BIGINT (floor) — the portable
    contract shared with plans/metrics.py:39 (session pinned UTC;
    DuckDB twin is CAST(FLOOR(epoch(ts)) AS BIGINT))."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col.cast("timestamp").cast("double")).cast("long")


def _cents(c) -> F.Column:
    """Double money → exact integer cents, identical in both engines:
    FLOOR(x * 100 + 0.5) is a single IEEE multiply-add on the same
    operands (round-half-up; engines disagree on bankers' rounding,
    never on this)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# SQL fragment shared by the two sessionized keys: events → (user_id,
# session id, entry event_type, per-event cents).  30-minute
# inactivity gap; entry = first event by (t, event_id) — event_id
# makes the ordering total.
_SESSION_CTE = """
    e AS (
      SELECT user_id, event_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT *,
             CASE WHEN LAG(t) OVER w IS NULL
                    OR t - LAG(t) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), s AS (
      SELECT *,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), f AS (
      SELECT *,
             FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sid
               ORDER BY t, event_id) AS entry_type
      FROM s
    ), per_session AS (
      SELECT user_id, sid, entry_type,
             SUM(cents) AS scents, COUNT(*) AS nev
      FROM f GROUP BY user_id, sid, entry_type
    )
"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_SESSION_CTE``: one row per session with
    (user_id, sid, entry_type, scents, nev).  All three window passes
    share the same (user_id)/(t, event_id) partitioning+ordering, so
    Catalyst plans ONE sort per user partition and reuses it."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        _epoch_s("ts").alias("t"),
        _cents("value").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lag_t = F.lag("t").over(w)
    g = ev.withColumn(
        "new_s",
        F.when(lag_t.isNull() | (F.col("t") - lag_t > 1800), 1).otherwise(0),
    )
    s = g.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    f = s.withColumn(
        "entry_type",
        F.first("event_type").over(
            Window.partitionBy("user_id", "sid").orderBy("t", "event_id")
        ),
    )
    return f.groupBy("user_id", "sid", "entry_type").agg(
        F.sum("cents").alias("scents"), F.count(F.lit(1)).alias("nev")
    )


@query(
    "event_first_touch_attribution",
    oracle=f"""
    WITH {_SESSION_CTE}
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(nev) AS BIGINT) AS n_events,
           CAST(SUM(scents) AS BIGINT) AS total_value_cents
    FROM per_session
    GROUP BY entry_type
    ORDER BY entry_type
    """,
)
def event_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: sessionize the event stream per user
    (30-minute inactivity gap), credit each session's FULL value to
    the event type that opened it — the marketing/ops answer to
    "which entry point brings the revenue".  Streaming twin:
    [[stream_session_attribution]].

    Scale: the classic gap-sessionizer is three window passes all
    partitioned by user_id with one (t, event_id) ordering — per-user
    frames, map-side-combinable final rollup, no global sort
    anywhere.  Entry tie-break is total via event_id."""
    ensure_deterministic_session(spark)
    per = _sessionized(spark, sf_dir)
    return (
        per.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("nev").cast("long").alias("n_events"),
            F.sum("scents").cast("long").alias("total_value_cents"),
        )
        .orderBy("entry_type")
    )


@query(
    "session_bounce_rate",
    oracle=f"""
    WITH {_SESSION_CTE}
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN nev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           CAST(SUM(CASE WHEN nev = 1 THEN 1 ELSE 0 END) * 1000
                // COUNT(*) AS BIGINT) AS bounce_milli
    FROM per_session
    GROUP BY entry_type
    ORDER BY entry_type
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: the share of sessions that
    contain exactly one event — the canonical engagement-quality
    metric next to [[event_first_touch_attribution]] (same
    sessionizer, same windows, so the two dashboards share a cached
    stage when run together).

    Scale: identical shape to the attribution key — per-user window
    frames then a tiny entry-type rollup."""
    ensure_deterministic_session(spark)
    per = _sessionized(spark, sf_dir)
    return (
        per.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("nev") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounce"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_bounce",
            F.expr("n_bounce * 1000 div n_sessions").cast("long").alias("bounce_milli"),
        )
        .orderBy("entry_type")
    )


@query(
    "event_hour_seasonality",
    oracle="""
    WITH e AS (
      SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) % 24 AS hour_utc,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), per AS (
      SELECT hour_utc, COUNT(*) AS n, SUM(cents) AS c
      FROM e GROUP BY hour_utc
    )
    SELECT CAST(hour_utc AS BIGINT) AS hour_utc,
           CAST(n AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS value_cents,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_ppm
    FROM per
    ORDER BY hour_utc
    """,
)
def event_hour_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile: event count, value, and
    traffic share (ppm) per UTC hour — the load curve capacity
    planning reads before sizing a streaming job's executor pool.

    Scale: one 24-bucket hash aggregate (map-side combined); the
    share window runs over the 24-row hour domain — calendar-sized,
    never row-sized."""
    ensure_deterministic_session(spark)
    e = load_table(spark, sf_dir, "events").select(
        ((_epoch_s("ts") / 3600).cast("long") % 24).alias("hour_utc"),
        _cents("value").alias("cents"),
    )
    per = e.groupBy("hour_utc").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )
    return (
        per.withColumn("tot", F.sum("n").over(Window.partitionBy()))
        .select(
            F.col("hour_utc").cast("long").alias("hour_utc"),
            F.col("n").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("value_cents"),
            F.expr("n * 1000000 div tot").cast("long").alias("share_ppm"),
        )
        .orderBy("hour_utc")
    )


@query(
    "dedup_rate_by_source",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ), firsts AS (
      SELECT h, MIN(doc_id) AS keep FROM d GROUP BY h
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d.h) AS BIGINT) AS n_distinct_texts,
           CAST(SUM(CASE WHEN d.doc_id = f.keep THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors,
           CAST((COUNT(*) - SUM(CASE WHEN d.doc_id = f.keep THEN 1 ELSE 0 END))
                * 1000 // COUNT(*) AS BIGINT) AS dup_rate_milli
    FROM d JOIN firsts f USING (h)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup dashboard: how many documents each source
    contributes, how many distinct texts it carries, and how many of
    its rows SURVIVE global exact dedup (survivor = lowest doc_id per
    text digest, the [[dedup_exact]] keep rule) — the table a corpus
    owner reads to decide which feed is mostly recycled content.

    Scale: digest once, one hash groupBy for the keep set (key =
    digest, map-side combined), one digest-keyed equi-join back, one
    source-sized rollup.  No text ever compares pairwise; the join is
    on the 128-bit digest, not the document body."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("text")).alias("h")
    )
    firsts = d.groupBy("h").agg(F.min("doc_id").alias("keep"))
    j = d.join(firsts, "h")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct_texts"),
            F.sum(F.when(F.col("doc_id") == F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_survivors"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct_texts",
            "n_survivors",
            F.expr("(n_docs - n_survivors) * 1000 div n_docs")
            .cast("long")
            .alias("dup_rate_milli"),
        )
        .orderBy("source")
    )


@query(
    "dup_cluster_size_hist",
    oracle="""
    WITH c AS (
      SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY h
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM c GROUP BY sz ORDER BY sz
    """,
)
def dup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size spectrum: group documents by exact text
    digest, histogram the cluster sizes — the one-glance shape of a
    corpus's duplication (a long size-1 head means clean sources, a
    fat tail means boilerplate mills).  Complements
    [[dedup_rate_by_source]] (who duplicates) with HOW duplication
    clusters.

    Scale: two cascaded hash aggregates, both map-side combined; the
    second groups on cluster size — a domain of at most a few hundred
    distinct values regardless of corpus size."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents").select(F.md5("text").alias("h"))
    c = d.groupBy("h").agg(F.count(F.lit(1)).alias("sz"))
    return (
        c.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
        )
        .select(
            F.col("sz").cast("long").alias("cluster_size"), "n_clusters", "n_docs"
        )
        .orderBy("cluster_size")
    )


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH co AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY k
    ), cl AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k
    ), m AS (
      SELECT co.c AS c_o, cl.c AS c_l
      FROM co FULL OUTER JOIN cl USING (k)
    )
    SELECT CAST(SUM(CASE WHEN c_o IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keys_orders,
           CAST(SUM(CASE WHEN c_l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keys_lineitem,
           CAST(SUM(CASE WHEN c_o IS NOT NULL AND c_l IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_keys,
           CAST(SUM(COALESCE(c_o, 0) * COALESCE(c_l, 0)) AS BIGINT)
             AS join_rows,
           CAST(SUM(CASE WHEN c_o IS NOT NULL AND c_l IS NOT NULL
                    THEN 1 ELSE 0 END) * 1000
                // SUM(CASE WHEN c_o IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS containment_milli
    FROM m
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join cardinality from per-key histograms WITHOUT running
    the join: |orders ⋈ lineitem| = Σ_k cnt_o(k)·cnt_l(k) — the exact
    statistic a cost-based planner (and AQE's skew detector) wants
    before picking a join strategy, plus key containment (what share
    of order keys have any lineitem).

    Scale: two map-side-combined groupBys shrink both inputs to their
    KEY cardinality, then one key-sized full outer join and a single
    aggregate — the estimate costs O(distinct keys), the join it
    predicts costs O(join_rows).  That asymmetry is the whole point
    of the statistic."""
    ensure_deterministic_session(spark)
    co = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_o"))
    )
    cl = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_l"))
    )
    m = co.join(cl, "k", "full_outer")
    return m.agg(
        F.sum(F.when(F.col("c_o").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_keys_orders"),
        F.sum(F.when(F.col("c_l").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_keys_lineitem"),
        F.sum(
            F.when(F.col("c_o").isNotNull() & F.col("c_l").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_matched_keys"),
        F.sum(
            F.coalesce(F.col("c_o"), F.lit(0)) * F.coalesce(F.col("c_l"), F.lit(0))
        )
        .cast("long")
        .alias("join_rows"),
    ).select(
        "n_keys_orders",
        "n_keys_lineitem",
        "n_matched_keys",
        "join_rows",
        F.expr("n_matched_keys * 1000 div n_keys_orders")
        .cast("long")
        .alias("containment_milli"),
    )


@query(
    "join_key_skew_topn",
    oracle="""
    WITH co AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY k
    ), cl AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k
    ), m AS (
      SELECT co.k AS k, co.c AS c_o, cl.c AS c_l, co.c * cl.c AS contrib
      FROM co JOIN cl USING (k)
    ), tot AS (
      SELECT SUM(contrib) AS t FROM m
    )
    SELECT CAST(m.k AS BIGINT) AS k,
           CAST(m.c_o AS BIGINT) AS c_orders,
           CAST(m.c_l AS BIGINT) AS c_lineitem,
           CAST(m.contrib AS BIGINT) AS join_rows,
           CAST(m.contrib * 1000000 // tot.t AS BIGINT) AS share_ppm
    FROM m, tot
    ORDER BY m.contrib DESC, m.k
    LIMIT 10
    """,
)
def join_key_skew_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 join keys contributing the most output rows to
    orders ⋈ lineitem, with each key's ppm share of the total — the
    skew report that decides between a plain shuffle join, AQE skew
    splitting, and salting ([[join_salted]]).

    Scale: per-key histograms (two map-side groupBys), key-sized
    equi-join, a broadcast single-row total (the sanctioned
    scalar-crossJoin pattern), and a global top-10 — Spark plans
    TakeOrderedAndProject, a per-partition heap + driver merge of 10
    rows, never a full sort."""
    ensure_deterministic_session(spark)
    co = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_o"))
    )
    cl = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_l"))
    )
    m = co.join(cl, "k").withColumn("contrib", F.col("c_o") * F.col("c_l"))
    tot = m.agg(F.sum("contrib").alias("t"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("c_o").cast("long").alias("c_orders"),
            F.col("c_l").cast("long").alias("c_lineitem"),
            F.col("contrib").cast("long").alias("join_rows"),
            F.expr("contrib * 1000000 div t").cast("long").alias("share_ppm"),
        )
        .orderBy(F.col("join_rows").desc(), "k")
        .limit(10)
    )
