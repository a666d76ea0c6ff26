"""Streaming media ingest (streaming/media.py): decode-gate +
perceptual dedup-admit loop across micro-batches — corrupt payloads
quarantined with their decoder error, within-batch and cross-wave
near-dups rejected with provenance, checkpoint replay safe."""

from __future__ import annotations

import math
import os

from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.streaming.media import (
    read_media_accepted,
    read_media_hashes,
    stream_media_ingest,
)


def _img(i, bright=0):
    # per-i spatial FREQUENCY (not offset): dHash is brightness-shift
    # invariant, so distinct images need distinct gradient structure
    px = [[(min(255, (x * (31 + 13 * i)) % 200 + bright),
            min(255, (y * (53 + 7 * i)) % 200 + bright), 64 + bright)
           for x in range(16)] for y in range(16)]
    return px


def _wav(freq):
    n = 5760
    samples = [
        0.5 * math.sin(2 * math.pi * freq * t / 16000.0)
        + 0.04 * math.sin(
            2 * math.pi * (300.0 + 5700.0 * t / (2.0 * n)) * t / 16000.0)
        for t in range(n)
    ]
    return mm.wav_encode(samples, rate=16000)


def _write_wave(spark, src, name, rows):
    # flat-file landing (the file-stream source lists FLAT files)
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))


def _accepted_ids(spark, state):
    if not os.path.isdir(os.path.join(state, "accepted")):
        return set()
    return {r.media_id for r in read_media_accepted(spark, state).collect()}


def test_media_ingest_gate_and_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)

    # wave 1: image 1 (BMP), same pixels as PNG (in-batch exact dup by
    # hash), distinct image 3, corrupt payload 4, audio 5
    _write_wave(spark, src, "w1", [
        (1, "image", bytearray(mm.bmp_encode(_img(0))), "{}"),
        (2, "image", bytearray(mm.png_encode(_img(0))), "{}"),
        (3, "image", bytearray(mm.bmp_encode(_img(9))), "{}"),
        (4, "image", bytearray(b"\x00not-an-image"), "{}"),
        (5, "audio", bytearray(_wav(440.0)), "{}"),
    ])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1, 3, 5}
    corrupt = spark.read.parquet(
        os.path.join(state, "corrupt", "batch-000000")
    ).collect()
    assert [r.media_id for r in corrupt] == [4]
    assert "Error" in corrupt[0].err or ":" in corrupt[0].err

    # wave 2: brightened near-dup of image 1, FLAC twin of audio 5,
    # fresh image 20
    from data_migration_etl_scripts_spark.operators.flac import flac_encode

    n = 5760
    ints = [max(-32768, min(32767, int((
        0.5 * math.sin(2 * math.pi * 440.0 * t / 16000.0)
        + 0.04 * math.sin(
            2 * math.pi * (300.0 + 5700.0 * t / (2.0 * n)) * t / 16000.0)
    ) * 32767))) for t in range(n)]
    _write_wave(spark, src, "w2", [
        (10, "image", bytearray(mm.bmp_encode(_img(0, bright=12))), "{}"),
        (11, "audio", bytearray(flac_encode([ints], rate=16000)), "{}"),
        (20, "image", bytearray(mm.bmp_encode(_img(5))), "{}"),
    ])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1, 3, 5, 20}
    dups = {r.media_id: r.dup_of for r in spark.read.parquet(
        os.path.join(state, "dups", "batch-000001")).collect()}
    assert dups == {10: 1, 11: 5}

    # drain again with nothing new: checkpoint skips, state unchanged
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1, 3, 5, 20}
    hashes = read_media_hashes(spark, state)
    assert {r.media_id for r in hashes.collect()} == {1, 3, 5, 20}


def test_media_ingest_video_and_bad_params(spark, tmp_path):
    import pytest

    from data_migration_etl_scripts_spark.operators.avi import avi_encode_mjpeg

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    frames = [_img(0), _img(1)]
    _write_wave(spark, src, "v1", [
        (1, "video", bytearray(avi_encode_mjpeg(frames, fps=5)), "{}"),
    ])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1}
    # re-encoded (quality-shifted) copy of the same video is a dup
    _write_wave(spark, src, "v2", [
        (2, "video",
         bytearray(avi_encode_mjpeg(frames, fps=5, quality=70)), "{}"),
    ])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1}
    with pytest.raises(ValueError, match="n_bands"):
        stream_media_ingest(spark, src, state, max_hamming=8, n_bands=8)


def test_media_ingest_layer3_payloads(spark, tmp_path):
    """r7: MP3 payloads flow through the streaming decode gate +
    perceptual dedup — a Layer III stream is accepted, its re-encoded
    twin (same tone, same operating point) dedups against it, and a
    truncated-to-garbage stream lands in quarantine."""
    from data_migration_etl_scripts_spark.operators.mpeg_layer3 import (
        layer3_encode,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    tone = [0.6 * math.sin(2 * math.pi * 995.0 * t / 32000.0)
            for t in range(1152 * 3)]
    mp3 = layer3_encode(tone, rate=32000)
    _write_wave(spark, src, "w1", [
        (1, "audio", bytearray(mp3), "{}"),
        (2, "audio", bytearray(b"\xff\xfb" + b"\x00" * 8), "{}"),  # garbage
    ])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1}
    corrupt = spark.read.parquet(
        os.path.join(state, "corrupt", "batch-000000")).collect()
    assert [r.media_id for r in corrupt] == [2]

    # wave 2: the SAME audio re-encoded (bit-different bytes, same
    # signal) must perceptual-dedup against item 1
    mp3b = layer3_encode(tone, rate=32000, bitrate_idx=9)
    _write_wave(spark, src, "w2", [(10, "audio", bytearray(mp3b), "{}")])
    stream_media_ingest(spark, src, state)
    assert _accepted_ids(spark, state) == {1}
    dups = {r.media_id: r.dup_of for r in spark.read.parquet(
        os.path.join(state, "dups", "batch-000001")).collect()}
    assert dups == {10: 1}
