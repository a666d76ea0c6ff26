"""SQL entry surface: views registration, ad-hoc SQL, and parity with
the DataFrame API (shared planner)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import sql as esql

SF_DIR = "/root/testdata/sf0.001"


def test_register_views_normalizes_timestamps(spark):
    esql.register_views(spark, SF_DIR)
    ts_type = dict(spark.table("events").dtypes)["ts"]
    assert ts_type == "timestamp"  # never NTZ/bigint, whatever the vintage


def test_run_sql_matches_dataframe_api(spark):
    got = esql.run_sql(
        spark,
        SF_DIR,
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    ).collect()
    want = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_view_scan_still_prunes_and_pushes(spark):
    # a view is a named logical plan: filters/projections through it
    # must still reach the parquet scan
    esql.register_views(spark, SF_DIR)
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
