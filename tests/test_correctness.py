"""Every oracle-able query key hash-matches its DuckDB oracle at
sf0.001 (the driver's gate runs the same comparison at sf0.01) and
every rows-only key at least executes and returns a stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

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
    compare(QUERIES[key](spark, SF_DIR), duck, ORACLES[key])


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
