"""Property-based golden tests (hypothesis): the Column-expression
reimplementations must agree with their pure-Python oracles on
arbitrary inputs, not just the hand-picked vectors.

Each example sends a BATCH of generated values through one Spark job
(per-value jobs would be seconds each); max_examples is kept small for
the same reason.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.operators import textprep as tp

from tests.test_functions import clean_contact_oracle, parse_ts_oracle
from tests.test_functions import derive_oracle
from tests.test_operators import tokens_oracle

_SETTINGS = dict(max_examples=5, deadline=None)


def _run_batch(spark, fn, values, in_type=T.StringType()):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        T.StructType([T.StructField("i", T.IntegerType()), T.StructField("x", in_type)]),
    )
    return [r.out for r in df.select("i", fn("x").alias("out")).orderBy("i").collect()]


phone_chars = st.sampled_from(list("0123456789+- ()abc."))
phone_strings = st.text(alphabet=phone_chars, max_size=25)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), phone_strings), min_size=1, max_size=40))
def test_clean_contact_property(spark, values):
    got = _run_batch(spark, ef.clean_contact, values)
    want = [clean_contact_oracle(v) for v in values]
    assert got == want


text_strings = st.text(
    alphabet=st.sampled_from(list("abcXYZ012 \t-_!.,;/é")), max_size=60
)


@settings(**_SETTINGS)
@given(st.lists(text_strings, min_size=1, max_size=40))
def test_tokens_property(spark, values):
    got = _run_batch(spark, tp.tokens, values)
    want = [tokens_oracle(v) for v in values]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(text_strings, min_size=1, max_size=25), st.integers(2, 4))
def test_shingles_property(spark, values, n):
    got = _run_batch(
        spark, lambda c: tp.word_shingles(tp.tokens(c), n=n, distinct=False), values
    )
    for text, sh in zip(values, got):
        toks = tokens_oracle(text)
        want = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        assert sh == want


money = st.one_of(
    st.none(),
    st.just(0.0),
    st.floats(min_value=0.01, max_value=10_000, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(money, money, money, money), min_size=1, max_size=40))
def test_derive_missing_of_three_property(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "i int, st double, gt double, tax double, disc double",
    )
    s, g, t = ef.derive_missing_of_three(
        F.col("st"), F.col("gt"), F.col("tax"), F.col("disc")
    )
    got = (
        df.select("i", s.alias("s"), g.alias("g"), t.alias("t")).orderBy("i").collect()
    )
    for row, case in zip(got, rows):
        ws, wg, wt = derive_oracle(*case)

        def eq(a, b):
            if a is None or b is None:
                return a is b
            return abs(a - b) < 1e-9

        assert eq(row.s, ws) and eq(row.g, wg) and eq(row.t, wt)


datestr = st.one_of(
    st.none(),
    st.text(alphabet=st.sampled_from(list("0123456789/: AMPabcJun")), max_size=24),
    st.dates().map(lambda d: d.strftime("%b %-d %Y 8:39AM")),
    st.dates().map(lambda d: d.strftime("%-m/%-d/%Y 1:28:20 PM")),
)


@settings(**_SETTINGS)
@given(st.lists(datestr, min_size=1, max_size=40))
def test_parse_multiformat_property(spark, values):
    got = _run_batch(spark, ef.parse_multiformat_ts, values)
    want = [parse_ts_oracle(v) for v in values]
    assert got == want
