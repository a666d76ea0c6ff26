"""Golden tests for the scalar function library (SURVEY.md §2.7).

Each Spark column expression is checked against an independently
written pure-Python oracle implementing the reference UDF's semantics
(reference: utils/tools.py:15-55) — reimplemented from the survey's
behavioral description, not copied.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_etl_scripts_spark import functions as ef


def _run_str_fn(spark, fn, values, in_type=T.StringType()):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType(
            [T.StructField("i", T.IntegerType()), T.StructField("x", in_type)]
        ),
    )
    rows = df.select("i", fn("x").alias("out")).orderBy("i").collect()
    return [r.out for r in rows]


# ------------------------------------------------------------ contact


def clean_contact_oracle(x):
    """Pure-python reference semantics (utils/tools.py:15-27 behavior):
    keep [+0-9]; nothing left -> None; strip leading zeros; 5* ->
    '+966' + first 12; 9* -> '+' + first 14; else first 15."""
    if x is None:
        return None
    kept = "".join(ch for ch in x if ch == "+" or ch.isdigit())
    if kept == "":
        return None
    nz = re.sub(r"^0+", "", kept)
    if nz.startswith("5"):
        return "+966" + nz[:12]
    if nz.startswith("9"):
        return "+" + nz[:14]
    return nz[:15]


def test_clean_contact_golden(spark):
    cases = [
        None,
        "",
        "no digits here",
        "0501234567",
        "  05 0123-4567 ",
        "9665essa01234567",
        "+966 512 345 678",
        "000",
        "0",
        "12345678901234567890",
        "5" * 20,
        "9" * 20,
        "+0+5abc",
    ]
    got = _run_str_fn(spark, ef.clean_contact, cases)
    want = [clean_contact_oracle(c) for c in cases]
    assert got == want


# ----------------------------------------------------------- cleaning


def test_strip_policies(spark):
    cases = ["  a  ", "   ", "", None, "b", "\tc\n"]
    assert _run_str_fn(spark, ef.strip_or_null, cases) == ["a", None, None, None, "b", "c"]
    assert _run_str_fn(spark, ef.strip_keep_empty, cases) == ["a", "", "", None, "b", "c"]
    assert _run_str_fn(spark, ef.scrub_null_literal, ["NULL", "null", "x", None]) == [
        None,
        "null",
        "x",
        None,
    ]


def test_normalized_key(spark):
    got = _run_str_fn(spark, ef.normalized_key, ["Main Store", " A B c ", None])
    assert got == ["mainstore", "abc", None]


def test_clean_string_columns_policy_map(spark):
    df = spark.createDataFrame(
        [("  x ", "  ", " NULL ")], ["a", "b", "c"]
    )
    out = ef.clean_string_columns(
        df, strip_to_null=["a", "b"], strip_keep=["c"], scrub_literals=["c"]
    ).collect()[0]
    assert (out.a, out.b, out.c) == ("x", None, None)


# -------------------------------------------------------------- dates


def parse_ts_oracle(x):
    if x is None:
        return None
    for fmt in ("%b %d %Y %I:%M%p", "%m/%d/%Y %I:%M:%S %p"):
        try:
            return datetime.datetime.strptime(x.strip(), fmt)
        except ValueError:
            continue
    return None


def test_parse_multiformat_ts_golden(spark):
    cases = [
        "May 29 2020 8:39AM",
        "Dec 1 1999 12:00PM",
        "3/3/2025 1:28:20 PM",
        "12/31/2024 11:59:59 AM",
        "not a date",
        "",
        None,
        "May 29 2020",  # missing time -> unparseable in both
    ]
    got = _run_str_fn(spark, ef.parse_multiformat_ts, cases)
    want = [parse_ts_oracle(c) for c in cases]
    assert got == want


def test_add_years(spark):
    df = spark.createDataFrame([("2020-02-29 10:00:00",)], ["s"])
    out = df.select(
        ef.add_years(F.col("s").cast("timestamp"), 1).alias("t")
    ).collect()[0].t
    # pandas DateOffset(years=1) on Feb 29 -> Feb 28 next year; add_months matches
    assert str(out) == "2021-02-28"


# ------------------------------------------------------------ numeric


def test_try_numeric_matches_pandas_coerce(spark):
    cases = ["12.5", " 13 ", "1e3", "x13", "", None, "-4.25", "nan", "1_000"]
    got = _run_str_fn(spark, ef.try_numeric, cases)
    # pandas to_numeric(errors='coerce') parity, except documented
    # deviations: none for these inputs ('nan' -> NaN in pandas, NULL in
    # Spark; both are "missing" downstream — treat equal here)
    want = [12.5, 13.0, 1000.0, None, None, None, -4.25, None, None]

    def norm(v):
        return None if v is None or (isinstance(v, float) and v != v) else v

    assert [norm(v) for v in got] == want


def test_bounded_abs(spark):
    df = spark.createDataFrame(
        [(1, 12.3456789), (2, -1000.5), (3, 999.0), (4, None)],
        T.StructType(
            [T.StructField("i", T.IntegerType()), T.StructField("x", T.DoubleType())]
        ),
    )
    rows = df.select("i", ef.bounded_abs("x", 999, scale=3).alias("o")).orderBy("i").collect()
    assert [r.o for r in rows] == [12.346, None, 999.0, None]


def derive_oracle(st, gt, tax, disc):
    """Independent oracle for the checkout repair (engine definition:
    present = non-null and non-zero; identity gt = st - disc + tax)."""
    d = disc or 0.0
    p = [v is not None and v != 0 for v in (st, gt, tax)]
    if sum(p) == 2:
        if not p[0]:
            st = gt - tax + d
        elif not p[1]:
            gt = st - d + tax
        else:
            tax = gt - st + d
    return st, gt, tax


def test_derive_missing_of_three_golden(spark):
    cases = [
        (0.0, 115.0, 15.0, 0.0),   # subtotal missing
        (100.0, 0.0, 15.0, 5.0),   # grand missing
        (100.0, 110.0, 0.0, 10.0), # tax missing
        (100.0, 110.0, 10.0, 0.0), # all present: untouched
        (0.0, 0.0, 15.0, 0.0),     # only one present: untouched
        (None, 115.0, 15.0, None), # nulls behave as absent
        (0.0, 0.0, 0.0, 0.0),      # nothing present
    ]
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        ["i", "st", "gt", "tax", "disc"],
    )
    st, gt, tax = ef.derive_missing_of_three(
        F.col("st"), F.col("gt"), F.col("tax"), F.col("disc")
    )
    rows = (
        df.select("i", st.alias("st2"), gt.alias("gt2"), tax.alias("tax2"))
        .orderBy("i")
        .collect()
    )
    for row, case in zip(rows, cases):
        assert (row.st2, row.gt2, row.tax2) == derive_oracle(*case)


# ------------------------------------------------------------- recode


def test_recode_with_default(spark):
    got = _run_str_fn(
        spark, lambda c: ef.recode(c, {"a": 1, "b": 2}, default=0), ["a", "b", "z", None]
    )
    assert got == [1, 2, 0, 0]


def test_recode_no_default_matches_pandas_map(spark):
    got = _run_str_fn(spark, lambda c: ef.recode(c, {"a": 1}), ["a", "z", None])
    assert got == [1, None, None]


def test_domain_restrict(spark):
    df = spark.createDataFrame([(1,), (2,), (7,), (None,)], ["x"])
    got = [r.o for r in df.select(ef.domain_restrict("x", [1, 2, 3]).alias("o")).collect()]
    assert sorted(v for v in got if v is not None) == [1, 2]
    assert got.count(None) == 2
