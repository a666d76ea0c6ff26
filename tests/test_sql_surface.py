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

#: Oracle texts that run under Spark SQL through the DOCUMENTED
#: dialect shim (sql.translate_duckdb_sql) and row-match their
#: DataFrame twins under the driver's value canonicalization. r7
#: shipped the rename-only tier; r8 added the argument-reshaping tier
#: (bracket indexing/slicing, list literals, list_sum/inner_product
#: folds, struct_pack, hex casts, time_bucket, try_strptime, lateral
#: UNNEST, FILTER clause, // div, quoted identifiers, DuckDB's
#: unescaped string literals via escapedStringLiterals). r9 added the
#: tier-3 layer — rewrites AND executors for shapes Spark's
#: parser/planner refuses outright:
#:   - let-binding scalar subqueries ``(SELECT e FROM (SELECT v AS
#:     t))`` inlined textually (Spark's decorrelation rejects the
#:     shape; it is pure sugar) — this one idiom blocked 6 texts
#:     directly and nested inside all 5 recursive ones;
#:   - WITH RECURSIVE with UNION-distinct recursion: iterative
#:     materialization in sql._exec_recursive (per-round distinct +
#:     anti-join + localCheckpoint — the PageRank loop discipline),
#:     including recursive CTEs nested inside outer WITH blocks;
#:   - ASOF JOIN: sql._exec_asof (inequality join + row_number over a
#:     synthesized left-row id — the engine's as-of semantics);
#:   - generate_subscripts+unnest parallel zip -> LATERAL VIEW
#:     posexplode (1-based shift applied at the references);
#:   - generators nested in expressions (CAST(unnest(..) AS T)) ->
#:     hoisted LATERAL VIEW;
#:   - list(x ORDER BY k) -> transform(array_sort(collect_list(
#:     struct(k, x))), s -> s.__lav) — faithful sort-by-key (the r8
#:     element-sort shortcut is now only used when k IS x);
#:   - DuckDB struct-by-position z[N] on list_zip structs ->
#:     z['<field>'] using Spark's arrays_zip field-naming rule
#:     (bare column -> its name, expression -> 0-based position).
#:   - regexp_replace REPLACEMENT group refs: RE2/DuckDB spell them
#:     ``\1``, Java spells them ``$1`` (and reads ``\1`` as a
#:     literal '1') — the one "Java vs RE2 semantics" divergence was
#:     actually this mechanical spelling, closing the last text.
#: Together with SQL_PORTABLE_BOARD: ALL 166 driver-oracle texts
#: drive DuckDB, Spark SQL, and the DataFrame API to one pinned
#: answer (tools/sql_probe.py reproduces the census).
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
    # r8 widening: the argument-reshaping tier
    "ann_ivf2_cells",
    "ann_ivf_cells",
    "ann_recall_bucketed",
    "ann_recall_ivf",
    "ann_topk_bruteforce",
    "ann_topk_bucketed",
    "ann_topk_ivf",
    "ann_topk_ivf2",
    "ann_topk_ivf_probe4",
    "ann_topk_multitable",
    "chunk_documents",
    "cms_heavy_hitters",
    "collect_json_customer_orders",
    "collect_json_order_structs",
    "corpus_blocklist_filter",
    "corpus_clean",
    "corpus_composition",
    "decontaminate_fuzzy_docs",
    "dedup_embedding_neardup",
    "dedup_minhash_lsh",
    "dedup_remove_runs",
    "dedup_remove_runs_exact",
    "dedup_simhash",
    "dimension_template_clean",
    "dp_release_counts",
    "dup_graph_triangles",
    "duplicate_spans_docs",
    "embed_quantize_int8",
    "embed_random_projection",
    "entity_pagerank",
    "export_tar_manifest",
    "hard_negatives",
    "html_extract_text",
    "ingest_dedup",
    "multimodal_features",
    "pack_sequences",
    "parse_dates_multiformat",
    "quality_classifier_scores",
    "quality_quantile_filter",
    "quality_zscore_by_source",
    "sample_by_perplexity_bucket",
    "sample_cluster_balanced",
    "sample_weighted_priority",
    "select_token_budget",
    "set_validation_order_status",
    "string_clean_suite",
    "text_fingerprint",
    "text_language_id",
    "text_quality_score",
    "text_scrub_pii",
    "text_token_stats",
    "unigram_lm_score",
    "url_canonical_dedup",
    "warc_extract_text",
    "windowed_event_counts",
    "zorder_key_orders",
    # r9 widening: the tier-3 layer — let-binding scalar-subquery
    # inlining, recursive-CTE iterative materialization, ASOF JOIN
    # execution, posexplode laterals, nested-generator hoisting,
    # faithful list(x ORDER BY k) struct sort, zip-struct positional
    # fields
    "ann_topk_ivf_pq",
    "asof_purchase_attribution",
    "bigram_heldout_ppl",
    "bigram_lm_score",
    "chunk_token_stream_docs",
    "corpus_curate",
    "decontaminate_containment",
    "decontaminate_docs",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "dedup_paragraphs",
    "dedup_semantic",
    "embed_pq_codes",
    "entity_resolution_customers",
    "gapfill_monthly_revenue",
    "minhash_calibration",
    "markdown_extract_text",
    "pii_pseudonymize_consistent",
    # r9: the tier-3 executors' own oracle-board queries (the query
    # IS run_sql of the text; listed here so the board sweep keeps
    # exercising them through the shim path too)
    "sql_recursive_reachability",
    "sql_asof_attribution",
    "ppjoin_exact_pairs",
    "quality_repetition",
]


def _canon_rows(rows):
    """The driver's value canonicalization (floats rounded to 9
    digits, Decimal folded to float) — the SAME protocol the
    correctness gate hashes with, so board membership means exactly
    'would hash-match the oracle'. Raw str() would reject last-ULP
    double differences the official gate accepts."""
    from tools.selfcheck import canon

    out = []
    for r in rows:
        d = r.asDict()
        out.append(tuple(canon(d[k]) for k in sorted(d)))
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
    # (the r8 bracket pass also rewrites the [1] index)
    assert (
        t("regexp_replace(concat(a, split(b, 'g')[1]), 'x', 'y', 'g')")
        == "regexp_replace(concat(a, element_at(split(b, 'g'), 1)), 'x', 'y')"
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
    # r8: argument-reshaping tier
    assert t("SELECT t[3]") == "SELECT element_at(t, 3)"
    assert t("SELECT t[2:5]") == "SELECT slice(t, 2, greatest((5) - (2) + 1, 0))"
    assert t("SELECT ['a','b'][2]") == "SELECT element_at(array('a','b'), 2)"
    assert t("SELECT ELSE [] END") == "SELECT ELSE array() END"
    assert t("CAST(e AS DOUBLE[])") == "CAST(e AS ARRAY<DOUBLE>)"
    assert (t("CAST('0x' || substr(h, 1, 8) AS UBIGINT)")
            == "CAST(conv(substr(h, 1, 8), 16, 10) AS BIGINT)")
    assert (t("('0x' || substr(md5(x), 1, 15))::BIGINT")
            == "CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)")
    assert (t("struct_pack(a := x, b := f(y, 2))")
            == "named_struct('a', x, 'b', f(y, 2))")
    assert (t("list(x ORDER BY x)") == "sort_array(collect_list(x))")
    assert (t("list_slice(t, 1, n)")
            == "slice(t, 1, greatest((n) - (1) + 1, 0))")
    assert (t("time_bucket(INTERVAL '30 minutes', ts)")
            == "timestamp_seconds(CAST(floor(unix_timestamp(ts) / 1800)"
               " AS BIGINT) * 1800)")
    assert (t("try_strptime(d, '%m/%d/%Y')") == "try_to_timestamp(d, 'M/d/yyyy')")
    assert t("max(c) FILTER (w = 1)") == "max(c) FILTER (WHERE w = 1)"
    # the filter() higher-order function is NOT the FILTER clause
    assert t("filter(t, x -> x <> '')") == "filter(t, x -> x <> '')"
    assert t("a // b, 'http://x'") == "a  div  b, 'http://x'"
    assert t('SELECT "out"') == "SELECT `out`"
    assert t("SELECT * EXCLUDE (a) FROM t") == "SELECT * EXCEPT (a) FROM t"
    assert (t(", UNNEST([1]) AS u(b)")
            == " LATERAL VIEW explode(array(1)) u AS b")
    assert (t("string_agg(p, '' || chr(10) || '' ORDER BY k)")
            == "listagg(p, '' || char(10) || '') WITHIN GROUP (ORDER BY k)")
    assert (t("regexp_extract_all(md, '(?s)x')")
            == "regexp_extract_all(md, '(?s)x', 0)")
    assert (t("SELECT unnest(range(8)) AS m")
            == "SELECT explode(sequence(0, 7)) AS m")


def test_translate_is_idempotent_on_every_oracle_text():
    """Applying the shim twice equals applying it once, for all 164
    oracle texts — pins that no rewrite re-fires on its own output
    (e.g. the FILTER clause lookahead, div spacing, element_at/slice
    forms), so accidental double-translation can never corrupt a
    query."""
    import __spark_entry__ as entry

    for name, sql in entry.oracle_sql().items():
        once = esql.translate_duckdb_sql(sql)
        assert esql.translate_duckdb_sql(once) == once, name


def test_sql_view_scan_still_prunes_and_pushes(spark):
    # a view is a named logical plan: filters/projections through it
    # must still reach the parquet scan
    esql.register_views(spark, SF_DIR)
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_recursive_cte_deep_chain_collapses_accumulator(spark):
    """ADVICE r12 (low): a recursion deeper than the accumulator
    collapse interval (32 rounds) must still produce the full
    closure — the periodic acc re-checkpoint bounds union fan-in
    without changing results."""
    rows = ", ".join(f"({i}, {i + 1})" for i in range(40))
    sql = f"""
        WITH RECURSIVE r(node) AS (
            SELECT 0 AS node
            UNION
            SELECT e.dst FROM (VALUES {rows}) AS e(src, dst)
            JOIN r ON e.src = r.node
        )
        SELECT count(*) AS n, max(node) AS deepest FROM r
    """
    got = esql.run_sql(spark, SF_DIR, sql, dialect="duckdb").collect()[0]
    assert (got["n"], got["deepest"]) == (41, 40)
