"""Video near-dup detection (operators/videohash.py): per-frame
dHash extraction across GIF and AVI containers, the frame-level
banded pair rollup, threshold/validation behavior, and the Spark
pipeline over the known-structure fixture.

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows) — the last cell of the per-modality dedup matrix."""

from __future__ import annotations

import itertools

import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators import videohash as vhx
from data_migration_etl_scripts_spark.operators.avi import (
    avi_decode_frames,
    avi_encode_mjpeg,
)
from data_migration_etl_scripts_spark.operators.imagehash import dhash_bits


def _driver_hashes(n_base=3):
    out = {}
    for mid, _t, content, _m in vhx.synthetic_videohash_media_rows(n_base):
        b = bytes(content)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            _w, _h, frames = mm.gif_decode_frames(b, max_frames=64)
            px = [r for _d, r in frames]
        else:
            _w, _h, _f, frames = avi_decode_frames(b, max_frames=64)
            px = [r for _t2, r in frames]
        out[mid] = [dhash_bits(p) for p in px]
    return out


def test_fixture_structure():
    H = _driver_hashes()

    def ham(x, y):
        return bin(x ^ y).count("1")

    def matched(a, b):
        return sum(1 for x in H[a] if any(ham(x, y) <= 6 for y in H[b]))

    for k in range(3):
        base = 10 * k
        assert matched(base, base + 1) >= 2  # q92 vs q70
        assert matched(base, base + 2) >= 2  # AVI vs palette GIF
        assert matched(base + 1, base + 2) >= 2
        assert matched(base, base + 3) == 0  # unrelated
    for a, b in itertools.combinations(sorted(H), 2):
        if a // 10 != b // 10:
            assert matched(a, b) < 2, (a, b)


def test_pair_thresholds_rejected():
    # parameter validation happens before any Spark plan is built
    with pytest.raises(ValueError, match="pigeonhole"):
        vhx.video_neardup_pairs(None, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide"):
        vhx.video_neardup_pairs(None, max_hamming=4, n_bands=7)


def test_spark_pipeline_matches_driver_rollup(spark):
    media = spark.createDataFrame(
        vhx.synthetic_videohash_media_rows(3), mm.MEDIA_SCHEMA
    )
    hashes = vhx.video_frame_hashes(media)
    got_hashes = {}
    for r in hashes.collect():
        bits = r.fhash + (1 << 64) if r.fhash < 0 else r.fhash
        got_hashes.setdefault(r.media_id, {})[r.frame_idx] = bits
    H = _driver_hashes()
    assert {m: [h[i] for i in sorted(h)] for m, h in got_hashes.items()} == H

    pairs = vhx.video_neardup_pairs(hashes, min_matched_frames=2).collect()
    got = {(r.id_a, r.id_b, r.matched_frames) for r in pairs}

    def ham(x, y):
        return bin(x ^ y).count("1")

    want = set()
    for a, b in itertools.combinations(sorted(H), 2):
        m = sum(1 for x in H[a] if any(ham(x, y) <= 6 for y in H[b]))
        if m >= 2:
            want.add((a, b, m))
    assert got == want
    assert all(a // 10 == b // 10 for a, b, _m in got)


def test_frame_hashes_container_dispatch(spark):
    # a lone AVI and a lone GIF both hash; an unknown payload raises
    frames = [[[(x * 16, y * 16, 40) for x in range(16)]
               for y in range(16)]] * 2
    avi = avi_encode_mjpeg(frames, fps=5)
    gif = mm.gif_encode_frames(
        [[[(x * 16, y * 16, 40) for x in range(16)] for y in range(16)]] * 2,
        delay_ms=50,
    )
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi), "{}"), (2, "video", bytearray(gif), "{}")],
        mm.MEDIA_SCHEMA,
    )
    rows = vhx.video_frame_hashes(df).collect()
    assert {(r.media_id, r.frame_idx) for r in rows} == {
        (1, 0), (1, 1), (2, 0), (2, 1)
    }
    bad = spark.createDataFrame(
        [(3, "video", bytearray(b"\x00\x01rawvideo"), "{}")], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="ffmpeg"):
        vhx.video_frame_hashes(bad).collect()
