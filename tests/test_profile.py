"""Table profiling: exact stats, approx sketches bounded vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import profile as pf

SF = "/root/testdata/sf0.001"


def test_profile_columns_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (4, None, 2.5)],
        "id long, s string, v double",
    )
    out = {r.column: r for r in pf.profile_columns(df).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert out["v"].min_s == "1.5" and out["v"].max_s == "2.5"
    assert out["s"].min_s == "a" and out["s"].max_s == "b"


def test_profile_is_single_aggregate_job_no_join(spark):
    df = spark.read.parquet(f"{SF}/customer.parquet")
    prof = pf.profile_columns(df, ["c_custkey", "c_name", "c_acctbal"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one pass, not a per-column union of scans
    assert plan.count("Scan parquet") == 1


def test_approx_profile_within_tolerance_of_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    approx = {
        r.event_type: r
        for r in pf.approx_profile(ev, "event_type", "user_id").collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("d"),
            F.expr("percentile(user_id, 0.5)").alias("p5"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        assert abs(a.approx_distinct - e.d) / e.d < 0.05  # HLL++ rsd
        # t-digest median within 5% of exact median of ids
        assert abs(a.p5 - e.p5) / max(e.p5, 1) < 0.05


def test_skew_report_flags_hot_key(spark):
    from data_migration_etl_scripts_spark.operators import profile as pf

    # one key with 900 rows, 100 keys with 1 row each
    rows = [(0,)] * 900 + [(k,) for k in range(1, 101)]
    df = spark.createDataFrame(rows, "k long")
    top = pf.skew_report(df, "k", top=3).collect()
    assert top[0].key == "0" and top[0].n == 900
    assert abs(top[0].row_share - 0.9) < 1e-6
    # mean count = 1000/101 ~ 9.9 -> skew factor ~ 90.9
    assert 90 < top[0].skew_factor < 92
    assert top[1].n == 1  # everything else is cold
