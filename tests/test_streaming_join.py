"""Streaming join-view maintenance: per-batch folds equal the one-shot
join, late dims retry only against orphans, crash replays of a batch id
are idempotent, and state never retains matched fact history."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from data_migration_etl_scripts_spark.streaming.join_stream import (
    fold_batch_into_join,
    read_join_view,
    stream_join_maintenance,
)

FACT_SCHEMA = "k int, fv int"


def _write_wave(spark, src, name, rows):
    df = spark.createDataFrame(rows, FACT_SCHEMA)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))


def _write_dim(spark, dim_dir, rows):
    spark.createDataFrame(rows, "k int, dv string").write.mode(
        "overwrite"
    ).parquet(dim_dir)


def _view(spark, state):
    df = read_join_view(spark, os.path.join(state, "join"))
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


def test_stream_join_waves_match_one_shot(spark, tmp_path):
    src, dim, state = (str(tmp_path / d) for d in ("src", "dim", "state"))
    os.makedirs(src)
    _write_dim(spark, dim, [(1, "a"), (2, "b")])
    _write_wave(spark, src, "w1", [(1, 10), (2, 20), (3, 30)])  # 3 = orphan
    stream_join_maintenance(spark, src, dim, state, FACT_SCHEMA, "k")
    assert _view(spark, state) == [(1, 10, "a"), (2, 20, "b")]

    # dim row 3 arrives late + a second fact wave
    _write_dim(spark, dim, [(1, "a"), (2, "b"), (3, "c")])
    _write_wave(spark, src, "w2", [(3, 31), (1, 11)])
    stream_join_maintenance(spark, src, dim, state, FACT_SCHEMA, "k")
    assert _view(spark, state) == [
        (1, 10, "a"), (1, 11, "a"), (2, 20, "b"),
        (3, 30, "c"),  # the orphan joined when its dim landed
        (3, 31, "c"),
    ]


def test_orphans_bounded_not_fact_history(spark, tmp_path):
    state = str(tmp_path / "join")
    dim = spark.createDataFrame([(1, "a")], "k int, dv string")
    f1 = spark.createDataFrame([(1, 10), (9, 90)], FACT_SCHEMA)
    fold_batch_into_join(spark, f1, 0, state, dim, "k")
    orphans = spark.read.parquet(os.path.join(state, "v=0", "orphans"))
    # only the unmatched fact persists — matched history is NOT state
    assert [tuple(r) for r in orphans.collect()] == [(9, 90)]


def test_replay_same_batch_id_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "join")
    dim = spark.createDataFrame([(1, "a")], "k int, dv string")
    f1 = spark.createDataFrame([(1, 10)], FACT_SCHEMA)
    f2 = spark.createDataFrame([(1, 11)], FACT_SCHEMA)
    fold_batch_into_join(spark, f1, 0, state, dim, "k")
    fold_batch_into_join(spark, f2, 1, state, dim, "k")
    before = _view_rows(spark, state)
    # crash replay: batch 1 runs again with the same input
    fold_batch_into_join(spark, f2, 1, state, dim, "k")
    assert _view_rows(spark, state) == before


def _view_rows(spark, state):
    df = read_join_view(spark, state)
    return sorted(tuple(r) for r in df.collect())
