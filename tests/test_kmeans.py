"""Lloyd's k-means codebook training: converges on separable clusters,
cost decreases, trained codebook slots into the IVF assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import similarity as sim


def _toy(spark):
    # 3 tight clusters on orthogonal-ish directions
    rows = []
    vid = 0
    for base in ([10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]):
        for j in range(10):
            rows.append((vid, [base[0] + (j % 3) * 0.1,
                               base[1] + (j % 2) * 0.1,
                               base[2] + 0.05 * j]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_converges_and_reduces_cost(spark):
    emb = _toy(spark)
    init = (
        emb.orderBy("vec_id").limit(3)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        .withColumn("cn", F.sqrt(F.aggregate(
            "cv", F.lit(0.0), lambda a, x: a + x * x)))
    )
    cost0 = sim.kmeans_cost(emb, init)
    cent = sim.train_kmeans_centroids(emb, n_centroids=3, n_iter=4)
    assert cent.count() == 3
    cost1 = sim.kmeans_cost(emb, cent)
    assert cost1 <= cost0 + 1e-9
    assert cost1 < 0.01  # tight clusters: near-zero within-cell spread


def test_kmeans_cells_separate_clusters(spark):
    emb = _toy(spark)
    cent = sim.train_kmeans_centroids(emb, n_centroids=3, n_iter=4)
    assigned = sim._assign_cells(
        emb.select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").cast("array<double>").alias("v"),
        ).withColumn("nrm", F.sqrt(F.aggregate(
            "v", F.lit(0.0), lambda a, x: a + x * x))),
        cent,
        "vid",
    )
    cells = {r.vid: r.centroid_id for r in assigned.collect()}
    # every true cluster lands in exactly one cell
    for lo in (0, 10, 20):
        assert len({cells[v] for v in range(lo, lo + 10)}) == 1
    assert len({cells[0], cells[10], cells[20]}) == 3
