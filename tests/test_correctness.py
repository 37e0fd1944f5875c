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
