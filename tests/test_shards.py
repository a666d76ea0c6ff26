"""Tar-shard export/import (sources/shards.py): round-trip fidelity,
deterministic bytes, size/item bounds, staged-rename cleanliness."""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.sources import shards as sh


def _corpus(spark, n=100):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.repeat(F.lit("x"), (F.col("id") % 700).cast("int"))).alias(
            "text"
        ),
        F.to_json(F.struct(F.col("id").alias("k"), F.lit("en").alias("lang"))).alias("meta"),
    )


def test_tar_shards_round_trip_text_and_json_members(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _corpus(spark)
    manifest = sh.write_tar_shards(
        df, out, "doc_id", {"txt": "text", "json": "meta"}, n_shards=4
    ).collect()
    assert sum(m.n_items for m in manifest) == 100
    back = sh.read_tar_shards(spark, out)
    texts = {
        r.key: r.content.decode("utf-8") for r in back.where(F.col("ext") == "txt").collect()
    }
    metas = {
        r.key: r.content.decode("utf-8") for r in back.where(F.col("ext") == "json").collect()
    }
    orig = {r.doc_id: (r.text, r.meta) for r in df.collect()}
    assert set(texts) == set(orig) and set(metas) == set(orig)
    for k, (t, m) in orig.items():
        assert texts[k] == t and metas[k] == m
    # shard assignment is the deterministic key % n contract
    for row in manifest:
        assert row.key_min % 4 == row.shard and row.key_max % 4 == row.shard


def test_tar_shards_item_rolling_and_exact_size_math(spark, tmp_path):
    out = str(tmp_path / "shards")
    rows = sh.write_tar_shards(
        _corpus(spark), out, "doc_id", {"txt": "text"}, n_shards=2, max_items=16
    ).collect()
    # 50 docs per shard -> seq 0..3 (16,16,16,2)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        assert sorted(r.seq for r in shard_rows) == [0, 1, 2, 3]
        assert sorted((r.n_items for r in shard_rows), reverse=True) == [16, 16, 16, 2]
    # measured file size == pure block arithmetic over member sizes
    for r in rows:
        path = os.path.join(out, r.file)
        with tarfile.open(path) as tf:
            sizes = [i.size for i in tf.getmembers()]
        assert len(sizes) == r.n_items
        assert os.path.getsize(path) == sh.tar_file_bytes(sizes) == r.n_bytes


def test_tar_shards_byte_rolling_bounds_file_size(spark, tmp_path):
    out = str(tmp_path / "shards")
    rows = sh.write_tar_shards(
        _corpus(spark), out, "doc_id", {"txt": "text"}, n_shards=2, max_bytes=16 * 1024
    ).collect()
    assert len(rows) > 2  # actually rolled
    for r in rows:
        # bound holds up to one member of slack (a row is never split)
        assert r.n_bytes <= 16 * 1024 + 2048


def test_tar_shards_rerun_is_idempotent_and_deterministic(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _corpus(spark, 60)
    sh.write_tar_shards(df, out, "doc_id", {"txt": "text"}, n_shards=3).collect()

    def digest():
        return {
            os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(os.path.join(out, "shard-*.tar"))
        }

    first = digest()
    sh.write_tar_shards(df, out, "doc_id", {"txt": "text"}, n_shards=3).collect()
    assert digest() == first  # same files, byte-identical
    assert not glob.glob(os.path.join(out, "*.inprogress*"))  # staged names promoted


def test_export_tar_shards_persists_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = sh.export_tar_shards(
        _corpus(spark, 40), out, "doc_id", {"txt": "text"}, n_shards=2
    )
    assert manifest.count() == 2
    again = spark.read.parquet(os.path.join(out, "_manifest"))
    assert {r.file for r in again.collect()} == {
        os.path.basename(p) for p in glob.glob(os.path.join(out, "shard-*.tar"))
    }


def test_write_tar_shards_requires_members(spark, tmp_path):
    with pytest.raises(ValueError, match="members"):
        sh.write_tar_shards(_corpus(spark, 5), str(tmp_path), "doc_id", {})


def test_corpus_to_training_shards_members_are_valid_records(spark):
    # drive the composed corpus->shards query on the tiny sf and check
    # the emitted members are loadable training records
    import json

    from data_migration_etl_scripts_spark import queries as q

    manifest = q.all_queries()["corpus_to_training_shards"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(m.n_items for m in manifest) > 0
    out = "/tmp/dmess_shards/train_sf0.001"
    back = sh.read_tar_shards(spark, out).collect()
    # two members (json + int32-id bin) per sample
    assert len(back) == 2 * sum(m.n_items for m in manifest)
    bins = {r.key: bytes(r.content) for r in back if r.ext == "bin"}
    for r in [b for b in back if b.ext == "json"][:20]:
        rec = json.loads(r.content.decode("utf-8"))
        assert rec["doc_id"] == r.key
        assert rec["n_tokens"] == len(rec["tokens"]) > 0
        assert rec["pack_bin"] >= 0 and 0 <= rec["bin_offset"] < 2048
        # reconstruction: tokens spell the (lowercased) document back
        assert "".join(rec["tokens"]).count("</w>") >= 1
        # the binary member is the int32 packing of the same sequence
        assert len(bins[r.key]) == 4 * rec["n_tokens"]


def test_tar_file_bytes_matches_real_tarfile_output():
    # property: the manifest's pure block arithmetic == what Python's
    # tarfile actually writes, for arbitrary member size mixes
    import io
    import tarfile as tf

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=30))
    def prop(sizes):
        buf = io.BytesIO()
        with tf.open(fileobj=buf, mode="w", format=tf.USTAR_FORMAT) as t:
            for i, n in enumerate(sizes):
                info = tf.TarInfo(name=f"{i}.bin")
                info.size = n
                t.addfile(info, io.BytesIO(b"\x01" * n))
        assert len(buf.getvalue()) == sh.tar_file_bytes(sizes)

    prop()


def test_write_tar_shards_rejects_null_member_payloads(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="null member payload"):
        sh.write_tar_shards(df, str(tmp_path / "s"), "doc_id", {"txt": "text"}).collect()


def test_export_tar_shards_sweeps_stale_tars_on_reexport(spark, tmp_path):
    out = str(tmp_path / "shards")
    big = _corpus(spark, 100)
    sh.export_tar_shards(big, out, "doc_id", {"txt": "text"}, n_shards=2, max_items=16)
    n_before = len(glob.glob(os.path.join(out, "shard-*.tar")))
    # shrink the input: fewer seqs per shard; stale high-seq tars must go
    small = _corpus(spark, 20)
    manifest = sh.export_tar_shards(
        small, out, "doc_id", {"txt": "text"}, n_shards=2, max_items=16
    )
    files = {os.path.basename(p) for p in glob.glob(os.path.join(out, "shard-*.tar"))}
    assert files == {r.file for r in manifest.collect()}  # no phantoms
    assert len(files) < n_before
    assert sh.read_tar_shards(spark, out).count() == 20


def test_shards_to_table_inverts_the_export(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _corpus(spark, 30)
    sh.write_tar_shards(df, out, "doc_id", {"txt": "text", "json": "meta"}, n_shards=2).collect()
    table = {r.key: r for r in sh.shards_to_table(spark, out).collect()}
    for r in df.collect():
        assert table[r.doc_id].txt.decode() == r.text
        assert table[r.doc_id].json.decode() == r.meta


def test_incremental_export_ships_only_new_keys(spark, tmp_path):
    root = str(tmp_path / "inc")
    first = _corpus(spark, 30)
    m1 = sh.export_tar_shards_incremental(first, root, "doc_id", {"txt": "text"}, n_shards=2)
    assert sum(r.n_items for r in m1.collect()) == 30
    # 20 overlapping + 10 new keys
    second = _corpus(spark, 40)
    m2 = sh.export_tar_shards_incremental(second, root, "doc_id", {"txt": "text"}, n_shards=2)
    assert sum(r.n_items for r in m2.collect()) == 10
    back = sh.read_tar_shards(spark, os.path.join(root, "batch-*"))
    keys = sorted(r.key for r in back.collect())
    assert keys == list(range(40))  # union is exactly the 40 docs, once each
    # nothing new -> no new batch dir, empty manifest
    m3 = sh.export_tar_shards_incremental(second, root, "doc_id", {"txt": "text"}, n_shards=2)
    assert m3.count() == 0
    assert len(glob.glob(os.path.join(root, "batch-*"))) == 2
