"""Behavioral tests for the spatial-grid and Python-integration plans
(values are oracle-checked in test_correctness; these pin the plan
shapes and the invariants the oracles can't see)."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from data_engineering_assessment_spark.plans.spatial import RADIUS, _reconcile
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def _plan(spark, key: str) -> str:
    df = QUERIES[key](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_radius_join_is_equi_join_not_cross_product(spark):
    plan = _plan(spark, "grid_radius_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_radius_join_pairs_within_radius_and_deduped(spark):
    rows = QUERIES["grid_radius_join"](spark, SF_DIR).collect()
    assert rows, "fixture should contain at least one close pair"
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b  # each unordered pair exactly once
        assert 0 <= r.d2 <= RADIUS * RADIUS
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))


def test_density_topk_is_take_ordered(spark):
    plan = _plan(spark, "grid_density_topk")
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort


def test_cogroup_reconcile_keeps_zero_line_orders():
    # the empty-lineitem branch must synthesize typed columns, not NaN
    odf = pd.DataFrame({"o_orderkey": [7], "total_cents": [12345], "bucket": [7]})
    out = _reconcile(odf, pd.DataFrame(columns=["l_orderkey", "line_cents"]))
    row = out.iloc[0]
    assert row.n_lines == 0 and row.gross_cents == 0 and row.diff_cents == 12345
    assert str(out["n_lines"].dtype) == "int64"
    assert str(out["gross_cents"].dtype) == "int64"


def test_cogroup_reconcile_diff_is_header_minus_lines(spark):
    df = QUERIES["cogroup_order_reconcile"](spark, SF_DIR)
    bad = df.where("diff_cents != total_cents - gross_cents").count()
    assert bad == 0


def test_udtf_sentences_cover_every_doc_with_text(spark):
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.sources.tables import load_table

    docs_with_period_content = (
        load_table(spark, SF_DIR, "documents")
        .where(F.length(F.regexp_replace("text", r"[. ]", "")) > 0)
        .count()
    )
    got = (
        QUERIES["udtf_sentence_split"](spark, SF_DIR)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert got == docs_with_period_content


def test_observe_metrics_rides_the_scan(spark):
    # the observed plan (inside the builder) is consumed by count();
    # the surfaced one-row result must agree with a direct aggregation
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.sources.tables import load_table

    row = QUERIES["observe_metrics"](spark, SF_DIR).collect()[0]
    direct = (
        load_table(spark, SF_DIR, "documents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .collect()[0]
    )
    assert (row.n_docs, row.total_chars, row.min_chars, row.max_chars) == (
        direct.n,
        direct.s,
        direct.lo,
        direct.hi,
    )


def test_radius_join_boundary_and_cross_cell_pairs(spark):
    """Crafted points: the radius predicate is inclusive at exactly
    d2 == R^2, just-outside pairs are excluded, and pairs straddling
    a cell boundary are still found (the 3x3 neighbor expansion's
    whole job)."""
    import pyspark.sql.types as T

    from data_engineering_assessment_spark.operators import similarity  # noqa: F401
    from data_engineering_assessment_spark.plans.spatial import RADIUS

    def emb(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = [
        (1, emb(0.000, 0.0)),   # cell (0,0)
        (2, emb(0.025, 0.0)),   # exactly R away from 1 -> included
        (3, emb(0.0525, 0.0)),  # ~27 milli from 2 -> excluded vs 2
        (4, emb(0.024, 0.0)),   # cell 0; 1 milli from 2 (cell 1) -> cross-cell pair
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    import data_engineering_assessment_spark.plans.spatial as spatial

    # drive the registered builder through a temp parquet dir so the
    # plan under test is exactly the graded one
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        got = {
            (r.id_a, r.id_b): r.d2
            for r in spatial.grid_radius_join(spark, d).collect()
        }
    assert got[(1, 2)] == RADIUS * RADIUS  # inclusive boundary
    assert (2, 3) not in got  # one milli outside
    assert got[(2, 4)] == 1  # cross-cell neighbors found
    assert got[(1, 4)] == 24 * 24


def test_dynamic_melt_udtf_is_polymorphic(spark):
    """The analyze()-based UDTF works unchanged on a second, totally
    different schema (orders), and plan-time validation rejects a
    table with no BIGINT id column."""
    import pytest

    # the graded key registers the function; invoke it on orders
    QUERIES["udtf_dynamic_melt"](spark, SF_DIR)
    from data_engineering_assessment_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("udtf_poly_orders_v")
    rows = spark.sql(
        "SELECT * FROM melt_strings_udtf(TABLE(udtf_poly_orders_v))"
    ).limit(10).collect()
    assert rows
    assert {r.col_name for r in rows} <= {"o_orderstatus", "o_orderpriority"}

    spark.createDataFrame([("a", "b")], "x string, y string").createOrReplaceTempView(
        "udtf_poly_bad_v"
    )
    with pytest.raises(Exception, match="BIGINT id"):
        spark.sql("SELECT * FROM melt_strings_udtf(TABLE(udtf_poly_bad_v))").collect()

    # row_id must be the VALIDATED bigint column even when a boolean
    # and a narrower int column precede it in column order (the
    # round-4 advisory bug: eval picked the first int-looking value)
    spark.createDataFrame(
        [(True, 7, 12345, "hello")], "flag boolean, small int, doc_id long, name string"
    ).createOrReplaceTempView("udtf_poly_order_v")
    rows = spark.sql(
        "SELECT * FROM melt_strings_udtf(TABLE(udtf_poly_order_v))"
    ).collect()
    assert [(r.row_id, r.col_name, r.val) for r in rows] == [(12345, "name", "hello")]
