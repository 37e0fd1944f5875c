"""Storage-layout guarantees: bucketed joins are shuffle-free,
partitioned layouts prune at the directory level."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_assessment_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from data_engineering_assessment_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "t_ord_bucketed", "l_orderkey", n_buckets=4)

    joined = bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"

    # and it computes the right thing
    expected = li.join(orders, "l_orderkey").count()
    assert joined.count() == expected


def test_partitioned_layout_prunes(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_parted")
    write_partitioned(ev, path, partition_by="event_type", sort_within="ts")

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1].splitlines()[0]

    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click
