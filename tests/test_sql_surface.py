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


#: board queries whose ORACLE SQL text is portable ANSI enough to run
#: verbatim under Spark SQL — the strongest front-end proof available
#: for free: the identical SQL string drives DuckDB (driver oracle),
#: Spark SQL (here), and must row-match the DataFrame twin, so all
#: three surfaces share one pinned answer. Queries whose oracles lean
#: on DuckDB-only functions (list_inner_product, array_to_string, ...)
#: are exercised by tools/selfcheck.py instead.
SQL_PORTABLE_BOARD = [
    "q1_pricing_summary",
    "inner_join_brand_revenue",
    "anti_join_customers_no_orders",
    "semi_join_hot_orders",
    "group_sizes_events",
    "topk_parts_per_brand",
    "window_top1_part_per_brand",
    "cross_join_seed",
    "pivot_order_status",
    "nation_pair_revenue",
    "duplicate_detection",
    "backfill_earliest_ship",
    "date_offset_expiry",
    "recode_priority",
    # r6 widening: every further oracle that runs verbatim under Spark
    # SQL and row-matches its DataFrame twin (probed over all 100
    # oracle texts; the rest lean on DuckDB-only functions)
    "watermark_max",
    "fk_remap_orders_customer",
    "right_join_part_linecount",
    "preagg_join_order_totals",
    "dedup_distinct_pairs",
    "first_event_per_user",
    "running_total_supplier",
    "unpivot_measures",
    "checkout_repair",
    "rollup_acctbal",
    "set_ops_customers",
    "distinct_agg_supplier",
    "lag_lead_rank_prices",
    "cdc_batch_extract",
    "grouping_sets_revenue",
    "fuzzy_name_pairs",
    "session_windows_batch",
    "categories_shape",
    "fk_orphan_report",
    "range_join_click_windows",
    "sql_surface_revenue",
    "incremental_rollup_orders",
    "expectations_orders",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    # session-3 widening: the TPC-H suite + the analytics/IVM pack all
    # run verbatim (EXISTS/NOT EXISTS, CUBE, scalar subqueries, frame
    # windows); retention/gapfill/sft/weighted lean on DuckDB-only
    # datediff('day',..)/unnest/string_agg/hex-cast forms
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_balance",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_waiting_orders",
    "q22_global_sales_opportunity",
    "cube_revenue",
    "histogram_prices",
    "funnel_conversion",
    "mad_outlier_flags",
    "moving_avg_revenue",
    "ivm_join_orders_customer",
    "ivm_join_cdc_deletes",
    "bloom_prefilter_revenue",
    # r7 widening: verbatim passes found by re-probing the full oracle
    # set at HEAD, plus the r7 TPC-H completions
    "event_transition_matrix",
    "q2_minimum_cost_supplier",
    "q16_parts_supplier_relationship",
]

#: r7: oracle texts that run under Spark SQL through the DOCUMENTED
#: rename-only dialect shim (sql.translate_duckdb_sql — list_* /
#: unnest->explode / generate_series->sequence / VARCHAR /
#: datediff-unit / regex-global-flag / string_agg-WITHIN-GROUP
#: spellings, no argument reshaping) and row-match their DataFrame
#: twins. Together with SQL_PORTABLE_BOARD: 88 of the driver-oracle
#: texts drive DuckDB, Spark SQL, and the DataFrame API to one pinned
#: answer. (dimension_template_clean and string_clean_suite run under
#: the shim but row-MISMATCH — Java vs DuckDB regex semantics — and
#: stay off the board: the row-match gate exists exactly for that.)
SQL_COMPAT_BOARD = [
    "bm25_search",
    "clean_contact_phones",
    "dedup_exact",
    "drift_psi_order_value",
    "text_tfidf_topk",
    "top_tokens",
    "entity_clean_suite",
    "json_extract_events",
    "percentile_acctbal",
    "profile_customer",
    "retention_cohorts",
    "sample_deterministic",
    "sample_stratified",
    "sample_temperature_mix",
    "sessionization",
    "sft_pack_conversations",
    "sft_render_conversations",
    "skew_report_events",
    "snapshot_diff_orders",
    "trend_slope_revenue",
]


def _canon_rows(rows):
    out = []
    for r in rows:
        d = r.asDict()
        out.append(tuple(str(d[k]) for k in sorted(d)))
    return sorted(out)


def test_board_queries_through_sql_frontend(spark):
    """run_sql(oracle_text) == DataFrame twin for 64 board queries:
    the SQL front-end and the DataFrame API share the planner AND the
    answer — same rows, same column set, for the same SQL the DuckDB
    oracle pins."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in SQL_PORTABLE_BOARD:
        df_rows = _canon_rows(qs[name](spark, SF_DIR).collect())
        sql_rows = _canon_rows(esql.run_sql(spark, SF_DIR, oracles[name]).collect())
        assert sql_rows == df_rows, f"{name}: SQL front-end diverged"


def test_board_queries_through_duckdb_dialect_shim(spark):
    """run_sql(oracle_text, dialect='duckdb') == DataFrame twin for the
    oracle texts that only differ from Spark SQL by the documented
    rename-only spellings — the same one SQL text still pins DuckDB
    (verbatim, via the driver) and Spark (via the shim)."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in SQL_COMPAT_BOARD:
        df_rows = _canon_rows(qs[name](spark, SF_DIR).collect())
        sql_rows = _canon_rows(
            esql.run_sql(spark, SF_DIR, oracles[name], dialect="duckdb").collect()
        )
        assert sql_rows == df_rows, f"{name}: dialect shim diverged"


def test_translate_duckdb_sql_mappings():
    t = esql.translate_duckdb_sql
    assert t("SELECT list_distinct(x) FROM a") == "SELECT array_distinct(x) FROM a"
    assert t("CAST(x AS VARCHAR)") == "CAST(x AS STRING)"
    assert t("datediff('day', a, b)") == "datediff(day, a, b)"
    assert t("epoch_us(ts)") == "unix_micros(ts)"
    assert t("epoch(ts)") == "unix_timestamp(ts)"  # epoch_us untouched by epoch
    assert (
        t("string_agg(x, ',' ORDER BY y)")
        == "listagg(x, ',') WITHIN GROUP (ORDER BY y)"
    )
    assert t("SELECT unnest(x) FROM a") == "SELECT explode(x) FROM a"
    assert t("generate_series(a, b)") == "sequence(a, b)"
    assert t("regexp_replace(x, 'a', 'b', 'g')") == "regexp_replace(x, 'a', 'b')"
    # r8 (ADVICE): the 'g' strip is ANCHORED to regexp_replace — a
    # legitimate literal-'g' final argument elsewhere must survive
    assert t("split(col, 'g')") == "split(col, 'g')"
    assert t("contains(x, 'g')") == "contains(x, 'g')"
    # nested: inner call keeps its 'g' argument, outer flag drops
    assert (
        t("regexp_replace(concat(a, split(b, 'g')[1]), 'x', 'y', 'g')")
        == "regexp_replace(concat(a, split(b, 'g')[1]), 'x', 'y')"
    )
    # quoted paren/comma content can't desync the paren walk
    assert (
        t("regexp_replace(x, '(a,b)', '', 'g') || split(y, 'g')")
        == "regexp_replace(x, '(a,b)', '') || split(y, 'g')"
    )
    # sized VARCHAR(n) is not the bare type name: left intact
    assert t("CAST(x AS VARCHAR(10))") == "CAST(x AS VARCHAR(10))"
    # unknown names pass through untouched
    assert t("SELECT time_bucket(i, ts)") == "SELECT time_bucket(i, ts)"


def test_sql_view_scan_still_prunes_and_pushes(spark):
    # a view is a named logical plan: filters/projections through it
    # must still reach the parquet scan
    esql.register_views(spark, SF_DIR)
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
