"""DP aggregates (operators/privacy.py): seeded determinism,
noise-scale behavior, seed separation, unbiasedness sanity, and the
privacy property that a re-run releases identical numbers.

Reference parity note: the privacy surface is LLM-data-pipeline
addendum (SURVEY.md) — scrub_pii masks spans inside the corpus;
dp_group_counts covers the publishable-statistics side."""

from __future__ import annotations

import statistics

from data_migration_etl_scripts_spark.operators.privacy import dp_group_counts


def _orders(spark, n=400):
    rows = [(i, ["A", "B", "C", "D"][i % 4], f"g{i % 10}")
            for i in range(n)]
    return spark.createDataFrame(rows, "oid long, status string, grp string")


def test_seeded_release_is_reproducible(spark):
    df = _orders(spark)
    a = {tuple(r)[:2]: r.n_noised
         for r in dp_group_counts(df, ["status", "grp"], eps=1.0).collect()}
    b = {tuple(r)[:2]: r.n_noised
         for r in dp_group_counts(
             df.repartition(7), ["status", "grp"], eps=1.0).collect()}
    assert a == b  # same seed + same data -> same release, any layout


def test_different_seed_different_noise(spark):
    df = _orders(spark)
    a = dp_group_counts(df, ["status"], eps=1.0, seed="r1").collect()
    b = dp_group_counts(df, ["status"], eps=1.0, seed="r2").collect()
    na = {r.status: r.n_noised for r in a}
    nb = {r.status: r.n_noised for r in b}
    assert any(na[k] != nb[k] for k in na)


def test_noise_scales_inversely_with_eps(spark):
    df = _orders(spark, n=2000)
    true = 2000 / 10

    def mean_abs_err(eps, seed_base):
        errs = []
        for s in range(12):
            rel = dp_group_counts(df, ["grp"], eps=eps,
                                  seed=f"{seed_base}-{s}").collect()
            errs.extend(abs(r.n_noised - true) for r in rel)
        return statistics.mean(errs)

    tight = mean_abs_err(2.0, "t")   # Lap scale 0.5 -> E|noise| = 0.5
    loose = mean_abs_err(0.25, "l")  # Lap scale 4   -> E|noise| = 4
    assert loose > 3 * tight
    assert 0.1 < tight < 1.5


def test_noise_roughly_centered(spark):
    df = _orders(spark, n=2000)
    errs = []
    for s in range(30):
        rel = dp_group_counts(df, ["grp"], eps=1.0, seed=f"c{s}").collect()
        errs.extend(r.n_noised - 200.0 for r in rel)
    assert abs(statistics.mean(errs)) < 0.6  # E[noise] = 0, scale 1
