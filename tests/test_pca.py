"""PCA whitening: identity-covariance property, known-answer fit on a
hand-built anisotropic cloud, sign-convention reproducibility, and
the map-side plan shape (no Exchange, no UDF in apply)."""

from __future__ import annotations

import math
import random

import pytest

from data_migration_etl_scripts_spark.operators import embed as em


def _cloud(spark, n=400, seed=5):
    """3-D cloud with variances ~ (9, 1, 0.01) along rotated axes."""
    rnd = random.Random(seed)
    s2 = 1 / math.sqrt(2)
    rows = []
    for i in range(n):
        a, b, c = rnd.gauss(0, 3), rnd.gauss(0, 1), rnd.gauss(0, 0.1)
        # rotate: x = a*(s2, s2, 0) + b*(-s2, s2, 0) + c*(0, 0, 1), shift
        rows.append((i, [a * s2 - b * s2 + 5.0, a * s2 + b * s2 - 2.0, c + 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_whitened_covariance_is_identity(spark):
    import numpy as np

    df = _cloud(spark)
    out = em.pca_whiten(df, in_dim=3, out_dim=2).collect()
    y = np.array([[r["pc_0"], r["pc_1"]] for r in out])
    cov = np.cov(y.T, bias=True)
    assert np.abs(cov - np.eye(2)).max() < 1e-3


def test_model_finds_the_planted_axes(spark):
    import numpy as np

    mean, w = em.pca_whiten_model(_cloud(spark), in_dim=3, out_dim=2)
    assert mean == pytest.approx([5.0, -2.0, 1.0], abs=0.3)
    # top direction ~ (s2, s2, 0), second ~ (-s2, s2, 0); sign-fixed
    s2 = 1 / math.sqrt(2)
    d0 = np.array(w[0]) / np.linalg.norm(w[0])
    d1 = np.array(w[1]) / np.linalg.norm(w[1])
    assert abs(abs(float(d0 @ [s2, s2, 0])) - 1.0) < 0.02
    assert abs(abs(float(d1 @ [-s2, s2, 0])) - 1.0) < 0.02


def test_fit_is_reproducible_across_partitionings(spark):
    df = _cloud(spark)
    m1, w1 = em.pca_whiten_model(df.repartition(1), in_dim=3, out_dim=2)
    m8, w8 = em.pca_whiten_model(df.repartition(8), in_dim=3, out_dim=2)
    import numpy as np

    assert np.allclose(m1, m8, atol=1e-9)
    assert np.allclose(w1, w8, atol=1e-6)


def test_apply_is_map_side(spark):
    df = _cloud(spark, n=50)
    mean, w = em.pca_whiten_model(df, in_dim=3, out_dim=2)
    out = em.pca_whiten_apply(df, mean, w)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
