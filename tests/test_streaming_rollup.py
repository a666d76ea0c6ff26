"""Streaming rollup maintenance: fold-per-batch equals one-shot
aggregate; restarts and crash replays cannot double-count."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import rollup as ru
from data_migration_etl_scripts_spark.streaming.rollup_stream import (
    fold_batch_into_rollup,
    read_rollup,
    stream_rollup_maintenance,
)

SCHEMA = "g string, x double"


def _write_wave(spark, src, name, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))


def _state(spark, state_dir):
    df = read_rollup(spark, os.path.join(state_dir, "rollup"))
    return {r.g: (r.n_rows, float(r.sum_x), r.min_x, r.max_x) for r in df.collect()}


def test_stream_rollup_across_waves_matches_one_shot(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    os.makedirs(src)
    all_rows = []

    wave1 = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    wave2 = [("a", 5.0), ("c", 2.0)]
    _write_wave(spark, src, "w1", wave1)
    all_rows += wave1
    stream_rollup_maintenance(spark, src, state, SCHEMA, ["g"], ["x"])

    _write_wave(spark, src, "w2", wave2)
    all_rows += wave2
    stream_rollup_maintenance(spark, src, state, SCHEMA, ["g"], ["x"])

    want = {
        r.g: (r.n_rows, float(r.sum_x), r.min_x, r.max_x)
        for r in ru.rollup_partials(
            spark.createDataFrame(all_rows, SCHEMA), ["g"], ["x"]
        ).collect()
    }
    assert _state(spark, state) == want

    # restart with nothing new: checkpoint skips everything, state unchanged
    stream_rollup_maintenance(spark, src, state, SCHEMA, ["g"], ["x"])
    assert _state(spark, state) == want


def test_fold_replay_of_same_batch_id_does_not_double_count(spark, tmp_path):
    rollup_dir = str(tmp_path / "rollup")
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], SCHEMA)
    b1 = spark.createDataFrame([("a", 4.0)], SCHEMA)
    fold_batch_into_rollup(spark, b0, 0, rollup_dir, ["g"], ["x"])
    fold_batch_into_rollup(spark, b1, 1, rollup_dir, ["g"], ["x"])
    once = _read(spark, rollup_dir)
    # crash between state write and checkpoint commit -> batch 1 replays
    fold_batch_into_rollup(spark, b1, 1, rollup_dir, ["g"], ["x"])
    assert _read(spark, rollup_dir) == once
    assert once["a"] == (2, 5.0)


def _read(spark, rollup_dir):
    df = read_rollup(spark, rollup_dir)
    return {r.g: (r.n_rows, float(r.sum_x)) for r in df.collect()}
