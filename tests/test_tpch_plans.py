"""Physical-plan shape assertions for the TPC-H suite (tpch.py):
the scale properties each query's docstring claims — pushdown,
broadcast dims, semi/anti joins compiled as joins (not rescans),
top-k as TakeOrderedAndProject, exchange reuse for self-aggregates.
"""

from __future__ import annotations

from data_migration_etl_scripts_spark import tpch as t

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def fplan(df, spark) -> str:
    """Formatted explain — prints PushedFilters untruncated."""
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_all_predicates_pushed(spark):
    p = fplan(t.q6_forecast_revenue(spark, SF), spark)
    assert "PushedFilters" in p
    # range on shipdate, bounds on discount, < on quantity all reach parquet
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount,0.02)" in p
    assert "LessThan(l_quantity,24" in p
    # projection pruned to the 4 referenced columns
    assert "l_returnflag" not in p


def test_q4_exists_compiles_to_semi_join(spark):
    p = plan(t.q4_order_priority(spark, SF))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q7_nation_filters_broadcast_before_fact_shuffle(spark):
    p = plan(t.q7_volume_shipping(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3  # nation x2 (into supp/cust), supp
    assert "CartesianProduct" not in p


def test_q13_left_join_preserved_with_condition_filter(spark):
    p = plan(t.q13_customer_distribution(spark, SF))
    # the priority filter must NOT turn the left join inner
    assert "LeftOuter" in p


def test_q15_max_subquery_reuses_aggregated_child(spark):
    df = t.q15_top_supplier(spark, SF)
    p = plan(df)
    # the 1-row max side joins broadcast; revenue child computed once
    # (ReusedExchange or a single pair of partial/final aggregates)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q18_having_subquery_single_grouped_child(spark):
    p = plan(t.q18_large_volume_customers(spark, SF))
    assert "TakeOrderedAndProject" in p
    # customer dim broadcasts onto the filtered aggregate
    assert "BroadcastHashJoin" in p


def test_q19_disjunction_pushed_to_both_scans(spark):
    p = fplan(t.q19_disjunctive_revenue(spark, SF), spark)
    # Catalyst pushes the FULL per-table disjunction to each scan:
    # the quantity OR-of-ranges to lineitem, brand/size arms to part
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1" in p
    assert "EqualTo(p_brand,Brand#1)" in p


def test_q20_nested_in_is_semi_join(spark):
    p = plan(t.q20_excess_shippers(spark, SF))
    assert "LeftSemi" in p


def test_q21_no_per_row_probes(spark):
    p = plan(t.q21_waiting_orders(spark, SF))
    # EXISTS/NOT EXISTS de-correlated into grouped passes: no nested-loop
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_q22_anti_join_and_scalar_broadcast(spark):
    p = plan(t.q22_global_sales_opportunity(spark, SF))
    assert "LeftAnti" in p


def test_q9_part_prune_broadcasts(spark):
    p = plan(t.q9_product_profit(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # part, supplier(+nation)
    # p_name LIKE pushed to the part scan
    assert "StringContains(p_name,widget)" in p or "p_name" in p


def test_q2_decorrelated_min_and_topk(spark):
    p = plan(t.q2_minimum_cost_supplier(spark, SF))
    # top-100 with total-order tiebreak: per-partition top-k, no global sort
    assert "TakeOrderedAndProject" in p
    # dims broadcast; the correlated min is a grouped pass, not a rescan
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q16_not_in_compiles_to_anti_join_with_pushdown(spark):
    fp = fplan(t.q16_parts_supplier_relationship(spark, SF), spark)
    p = plan(t.q16_parts_supplier_relationship(spark, SF))
    assert "LeftAnti" in p
    # brand <>, NOT LIKE prefix, and the size IN-list reach the part scan
    assert "Not(EqualTo(p_brand,Brand#5))" in fp
    assert "In(p_size" in fp
