"""Declarative expectations: violation counts, enforce aborts, and the
one-scan plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import expectations as ex


def _report_dict(rep):
    return {r.check_name: r.n_violations for r in rep.collect()}


def test_expectation_report_counts_all_check_kinds(spark):
    facts = spark.createDataFrame(
        [(1, 10, "A"), (2, 10, "B"), (2, 99, "A"), (3, None, "Z"), (4, 30, None)],
        "k long, fk int, status string",
    )
    dim = spark.createDataFrame([(10,), (30,)], "d int")
    rep = ex.expectation_report(
        facts,
        row_checks={
            "fk_not_null": ex.not_null("fk"),
            "status_domain": ex.accepted_values("status", ["A", "B"]),
        },
        unique_keys={"k_unique": ["k"]},
        fk_checks={"fk_exists": (dim, "fk", "d")},
    )
    got = _report_dict(rep)
    assert got == {
        "fk_not_null": 1,     # k=3
        "status_domain": 1,   # 'Z' (NULL status is not a domain violation)
        "k_unique": 1,        # k=2 twice
        "fk_exists": 1,       # fk=99 (NULL fk is the not-null check's job)
    }


def test_enforce_raises_listing_failures_and_passes_clean(spark):
    df = spark.createDataFrame([(1,), (None,)], "x int")
    rep = ex.expectation_report(df, row_checks={"x_not_null": ex.not_null("x")})
    with pytest.raises(ex.ExpectationError, match="x_not_null: 1"):
        ex.enforce(rep)
    clean = spark.createDataFrame([(1,)], "x int")
    ex.enforce(
        ex.expectation_report(clean, row_checks={"x_not_null": ex.not_null("x")})
    )  # no raise


def test_expectation_report_is_one_scan(spark, tmp_path):
    # row + fk checks must fold into a single read of the fact table
    path = str(tmp_path / "facts")
    spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("fk")
    ).write.parquet(path)
    facts = spark.read.parquet(path)
    dim = spark.createDataFrame([(i,) for i in range(5)], "d long")
    rep = ex.expectation_report(
        facts,
        row_checks={"fk_not_null": ex.not_null("fk")},
        fk_checks={"fk_exists": (dim, "fk", "d")},
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_approx_unique_screens_without_expand(spark):
    df = spark.createDataFrame(
        [(k % 50, float(k)) for k in range(100)], "k int, x double"
    )
    # small cardinality: HLL++ sparse mode is exact, so counts agree
    checks = dict(
        row_checks={"x_null": ex.not_null("x")},
        unique_keys={"k_uniq": ["k"], "kx_uniq": ["k", "x"]},
    )
    exact = ex.expectation_report(df, **checks)
    approx = ex.expectation_report(df, **checks, approx_unique=True)
    assert _report_dict(exact) == {"x_null": 0, "k_uniq": 50, "kx_uniq": 0}
    # approx mode is a screen: estimates within HLL tolerance, floored
    # at zero, exact row-predicate counts untouched
    got = _report_dict(approx)
    assert got["x_null"] == 0
    assert abs(got["k_uniq"] - 50) <= 5
    assert got["kx_uniq"] <= 5
    # the scale property: several exact distincts plan an Expand
    # (duplicated scan rows); the approx mode must stay one plain pass
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


def test_fk_check_supports_composite_keys(spark):
    facts = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 9), (3, None, 1), (4, "b", 2)],
        "k long, acct string, item int",
    )
    dim = spark.createDataFrame([("a", 1), ("b", 2)], "d_acct string, d_item int")
    rep = ex.expectation_report(
        facts,
        fk_checks={"pair_fk": (dim, ["acct", "item"], ["d_acct", "d_item"])},
    )
    # (a,9) missing -> violation; (None,1) partially null -> NOT an fk
    # violation (that's a not_null check's job); (a,1),(b,2) match
    assert _report_dict(rep) == {"pair_fk": 1}
