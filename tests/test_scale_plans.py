"""Physical-plan assertions: the SCALE.md claims, executable.

These don't check values (the oracle does); they check that Catalyst
produces the plan SHAPE the 100 TB design depends on -- partition pruning
reaches the scan, bucketed joins drop the exchange, dim joins broadcast,
filters push into parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import sinks

from conftest import SF_SMOKE

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()

def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()

def test_partition_pruning_reaches_scan(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    path = sinks.partitioned_write(ev, ["day"])
    filtered = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = _optimized(filtered)
    assert "PartitionFilters" in plan
    # the day predicate must land in PartitionFilters, not the data filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "day" in pf

def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    sinks.bucketed_table(orders, "orders_b", "o_orderkey")
    sinks.bucketed_table(lineitem, "lineitem_b", "l_orderkey")
    # force the fact-to-fact path (at smoke SF Catalyst would broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        joined.collect()
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # bucketed scans co-locate: no shuffle on the join key
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "SelectedBucketsCount" in plan
        # sanity: the same join WITHOUT bucketing shuffles both sides
        unbucketed = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        unbucketed.collect()
        assert "Exchange hashpartitioning" in _plan(unbucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

def test_dim_join_broadcasts(spark):
    nation = load_table(spark, SF_SMOKE, "nation")
    customer = load_table(spark, SF_SMOKE, "customer")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    assert "BroadcastHashJoin" in _plan(joined)

def test_filter_pushes_into_parquet_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    q = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = _optimized(q)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_returnflag" in pushed
    # column pruning: ReadSchema carries only what the query needs
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema

def test_range_band_join_is_broadcast_nested_loop(spark):
    from real_time_financial_lakehouse_spark.operators import joins

    ev = load_table(spark, SF_SMOKE, "events")
    plan = _plan(joins.value_band_summary(ev))
    # the inequality-only join must broadcast the tiny band table, never
    # shuffle the fact side for the join itself
    assert "BroadcastNestedLoopJoin" in plan

def test_salted_join_spreads_hot_keys(spark):
    from real_time_financial_lakehouse_spark.operators import joins

    ev = load_table(spark, SF_SMOKE, "events")
    cust = load_table(spark, SF_SMOKE, "customer")
    plan = _plan(joins.segment_activity_salted(ev, cust))
    # the join key must include the salt, so each hot user_id spreads
    # over `salts` shuffle partitions
    assert "salt" in plan

def test_single_exchange_serves_both_window_specs(spark):
    from real_time_financial_lakehouse_spark.operators import joins

    orders = load_table(spark, SF_SMOKE, "orders")
    plan = _plan(joins.top_orders_per_customer(orders))
    # both window frames partition by o_custkey: exactly ONE
    # hashpartitioning exchange (the second Exchange is the final sort's
    # rangepartitioning)
    assert plan.count("Exchange hashpartitioning") == 1

def test_zscores_bucket_grouping_single_exchange(spark):
    from real_time_financial_lakehouse_spark.operators.grouped import user_zscores

    ev = load_table(spark, SF_SMOKE, "events")
    plan = _plan(user_zscores(ev))
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    # one exchange for the bucket grouping (+ the final presentation sort)
    assert plan.count("Exchange hashpartitioning") == 1
