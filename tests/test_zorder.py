"""Z-order clustering (operators/scale.py): Morton key bit math and
the multi-dimensional file-skipping payoff vs single-key clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import scale as sc


def test_zorder_key_is_morton_interleave(spark):
    # x,y in 0..3 with bits=2: rank == value; x bits land on even
    # positions, y bits on odd — the classic 4x4 Morton curve
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    got = {
        (r.x, r.y): r._zval for r in sc.zorder_key(df, ["x", "y"], bits=2).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_requires_two_columns(spark):
    df = spark.range(4).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="2 columns"):
        sc.zorder_key(df, ["x"])


def _file_boxes(spark, path):
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    return {
        r.f: (r.xmin, r.xmax, r.ymin, r.ymax)
        for r in df.groupBy("f")
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        )
        .collect()
    }


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    # 64x64 uniform grid, 16 files: z-order keeps every file's min/max
    # box tight in BOTH x and y; range-clustering on x alone leaves y
    # unconstrained (every file spans all of y)
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    sc.write_zorder_clustered(grid, zpath, ["x", "y"], num_files=16, bits=6)
    sc.write_range_clustered(grid, rpath, ["x"], num_files=16)
    zboxes, rboxes = _file_boxes(spark, zpath), _file_boxes(spark, rpath)
    assert len(zboxes) == 16

    def hits(boxes, x0, x1, y0, y1):
        return sum(
            1
            for (xmin, xmax, ymin, ymax) in boxes.values()
            if xmax >= x0 and xmin <= x1 and ymax >= y0 and ymin <= y1
        )

    # y-only predicate: x-range layout cannot prune at all
    assert hits(rboxes, 0, 63, 0, 7) == len(rboxes)
    # z-order prunes the same predicate to a fraction of the files
    assert hits(zboxes, 0, 63, 0, 7) <= len(zboxes) // 2
    # and a small 2-D box touches only a few files
    assert hits(zboxes, 0, 7, 0, 7) <= 4
    # layout change loses no rows
    assert spark.read.parquet(zpath).count() == 64 * 64
    # the key column does not leak into the written files
    assert set(spark.read.parquet(zpath).columns) == {"x", "y"}


def test_zorder_rejects_sign_bit_overflow(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="sign bit"):
        sc.zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_zorder_nulls_rank_at_minimum(spark):
    df = spark.createDataFrame(
        [(0, 0), (None, 0), (3, 3)], "x long, y long"
    )
    got = {(r.x, r.y): r._zval for r in sc.zorder_key(df, ["x", "y"], bits=2).collect()}
    assert got[(None, 0)] == got[(0, 0)] == 0  # NULL clusters with min, not NULL key


def test_hive_partitioned_write_prunes_directories(spark, tmp_path):
    """A partition-column predicate must surface as PartitionFilters in
    the scan (directory pruning at planning time) and read only the
    matching col=value directories; a too-fine partition key refuses."""
    import os

    import pytest

    from data_migration_etl_scripts_spark.operators import scale as sc

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    sc.write_hive_partitioned(orders, path, ["o_year"])
    years = {d for d in os.listdir(path) if d.startswith("o_year=")}
    assert len(years) >= 3  # data spans 1995-2001

    back = spark.read.parquet(path).where(F.col("o_year") == 1996)
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters", 1)[1][:200]
    # row parity with the unpartitioned source
    want = orders.where(F.col("o_year") == 1996).count()
    assert back.count() == want and want > 0

    with pytest.raises(ValueError, match="distinct partition values"):
        sc.write_hive_partitioned(
            orders, str(tmp_path / "bad"), ["o_orderkey"], max_partitions=100
        )


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Joining the partitioned fact to a FILTERED dim must plan a
    dynamicpruning subquery on the partition column — at 100 TB this
    skips whole fact directories based on the dim filter's runtime
    result, not just static predicates."""
    from data_migration_etl_scripts_spark.operators import scale as sc

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year_dpp")
    sc.write_hive_partitioned(orders, path, ["o_year"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1996, "focus year")], "o_year int, label string"
    )
    joined = fact.join(dim.where(F.col("label") == "focus year"), "o_year")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == orders.where(F.col("o_year") == 1996).count()
