"""Streaming CMS heavy hitters (streaming/sketch_stream.py): folded
counters == one-shot sketch (mergeability), heavy-hitter set matches
the exact frequent items, crash replays cannot double-count, and the
candidate set stays bounded."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import cms as cm
from data_migration_etl_scripts_spark.streaming.sketch_stream import (
    fold_batch_into_cms,
    read_cms,
    read_heavy_hitters,
    stream_cms_heavy_hitters,
)

SCHEMA = "key string"


def _write_wave(spark, src, name, keys):
    df = spark.createDataFrame([(k,) for k in keys], SCHEMA)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))


def _waves():
    # two heavy keys present in every wave, a long tail of singletons
    waves = []
    for w in range(3):
        keys = (["alpha"] * 30 + ["beta"] * 18
                + [f"tail{w}_{i}" for i in range(25)])
        waves.append(keys)
    return waves


def test_folded_sketch_equals_one_shot_and_hitters_exact(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    os.makedirs(src)
    waves = _waves()
    for i, keys in enumerate(waves):
        _write_wave(spark, src, f"w{i}", keys)
        stream_cms_heavy_hitters(
            spark, src, state, SCHEMA, "key", phi=0.05
        )
    # counters: folded == one-shot over the concatenation (mergeability)
    all_keys = [k for keys in waves for k in keys]
    one_shot = cm.cms_sketch(
        spark.createDataFrame([(k,) for k in all_keys], SCHEMA), "key"
    )
    folded = read_cms(spark, state)
    assert folded is not None
    diff = (
        folded.withColumnRenamed("c", "fc")
        .join(one_shot, ["d", "bucket"], "full")
        .where(
            F.coalesce("fc", F.lit(-1)) != F.coalesce("c", F.lit(-1))
        )
        .count()
    )
    assert diff == 0
    # heavy hitters: phi=0.05 of 219 keys = 10.95 -> alpha (90), beta (54)
    hh = {r.key: r.est for r in read_heavy_hitters(spark, state).collect()}
    assert set(hh) >= {"alpha", "beta"}
    assert hh["alpha"] >= 90 and hh["beta"] >= 54  # one-sided estimates
    # bounded: tail singletons only enter via CMS collision slack
    assert len(hh) <= 25


def test_replay_same_batch_id_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, SCHEMA)
    fold_batch_into_cms(spark, b0, 0, state, "key", phi=0.1)
    first = {(r.d, r.bucket): r.c for r in read_cms(spark, state).collect()}
    # crash replay of batch 0: identical input, same id -> same state
    fold_batch_into_cms(spark, b0, 0, state, "key", phi=0.1)
    again = {(r.d, r.bucket): r.c for r in read_cms(spark, state).collect()}
    assert first == again
    total = sum(c for (d, _b), c in first.items() if d == 0)
    assert total == 7  # depth-0 row carries exactly N increments


def test_candidate_reenters_on_next_appearance(spark, tmp_path):
    state = str(tmp_path / "state")
    # batch 0: x below threshold; batch 1: one more x pushes it over
    fold_batch_into_cms(
        spark,
        spark.createDataFrame([("x",)] * 2 + [("y",)] * 8, SCHEMA),
        0, state, "key", phi=0.5,
    )
    hh0 = {r.key for r in read_heavy_hitters(spark, state).collect()}
    assert hh0 == {"y"}  # x is 2/10 < 0.5
    fold_batch_into_cms(
        spark,
        spark.createDataFrame([("x",)] * 10, SCHEMA),
        1, state, "key", phi=0.5,
    )
    hh1 = {r.key for r in read_heavy_hitters(spark, state).collect()}
    assert hh1 == {"x"}  # 12/20 >= 0.5; y dropped at 8/20


def test_cms_estimate_unseen_keys_are_zero(spark):
    """r8 (ADVICE): a probe key never inserted into the sketch must
    come back est=0 (the CMS definition), not vanish from the output
    or overestimate by skipping its absent depth rows."""
    sketch = cm.cms_sketch(
        spark.createDataFrame([("a",), ("a",), ("b",)], SCHEMA), "key"
    )
    probe = spark.createDataFrame([("a",), ("never-seen",)], SCHEMA)
    got = {r.key: r.est for r in
           cm.cms_estimate(probe, sketch, "key").collect()}
    assert set(got) == {"a", "never-seen"}
    assert got["never-seen"] == 0
    assert got["a"] >= 2  # CMS is one-sided: est >= exact


def test_cms_merge_is_order_and_split_invariant(spark):
    """Property: any split of the key stream into sketches merges to
    the one-shot sketch, in any merge order — the property the
    streaming fold and a 1000-executor tree reduction both rely on."""
    import random

    rnd = random.Random(11)
    keys = [f"k{rnd.randrange(30)}" for _ in range(400)]
    one = {(r.d, r.bucket): r.c for r in cm.cms_sketch(
        spark.createDataFrame([(k,) for k in keys], SCHEMA), "key"
    ).collect()}
    for trial in range(3):
        cuts = sorted(rnd.sample(range(1, 400), 3))
        parts = [keys[a:b] for a, b in zip([0] + cuts, cuts + [400])]
        rnd.shuffle(parts)
        merged = None
        for p in parts:
            sk = cm.cms_sketch(
                spark.createDataFrame([(k,) for k in p], SCHEMA), "key"
            )
            merged = sk if merged is None else cm.cms_merge(merged, sk)
        got = {(r.d, r.bucket): r.c for r in merged.collect()}
        assert got == one, trial
