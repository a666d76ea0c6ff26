"""Incremental rollup maintenance: merge-of-partials equals the
one-shot aggregate, exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import rollup as ru


def test_merge_of_partials_equals_full_rollup(spark):
    df = spark.createDataFrame(
        [(k % 3, float(k * 7 % 11), k) for k in range(200)],
        "g int, x double, k long",
    )
    full = ru.rollup_partials(df, ["g"], ["x"])
    merged = ru.merge_partials(
        ru.rollup_partials(df.where(F.col("k") < 80), ["g"], ["x"]),
        ru.rollup_partials(df.where(F.col("k") >= 80), ["g"], ["x"]),
        ["g"],
        ["x"],
    )
    want = {r.g: (r.n_rows, r.sum_x, r.min_x, r.max_x) for r in full.collect()}
    got = {r.g: (r.n_rows, r.sum_x, r.min_x, r.max_x) for r in merged.collect()}
    assert got == want


def test_merge_with_empty_batch_is_identity(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0)], "g int, x double")
    base = ru.rollup_partials(df, ["g"], ["x"])
    empty = ru.rollup_partials(df.where(F.lit(False)), ["g"], ["x"])
    got = ru.merge_partials(base, empty, ["g"], ["x"]).collect()
    assert len(got) == 1 and got[0].n_rows == 2 and float(got[0].sum_x) == 6.0


def test_rollup_read_derives_avg_from_partials(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 10.0)], "g int, x double")
    out = {
        r.g: (r.avg_x, r.sum_x)
        for r in ru.rollup_read(
            ru.rollup_partials(df, ["g"], ["x"]), ["x"], avg_of=["x"]
        ).collect()
    }
    assert out[1] == (3.0, 6.0)
    assert out[2] == (10.0, 10.0)
