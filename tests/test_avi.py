"""AVI/MJPEG container (operators/avi.py): RIFF structure goldens,
encode -> decode round trips (per-frame baseline JPEG within DCT
tolerance), strh frame timing, chunk-padding and max_frames behavior,
corruption/unsupported-codec handling, and the multimodal
extract_frames dispatch on Spark.

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows)."""

from __future__ import annotations

import struct

import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators.avi import (
    avi_decode_frames,
    avi_encode_mjpeg,
)


def _frames(n=4, w=16, h=16, seed=0):
    return [
        [[((x * 31 + i * 17 + seed) % 256, (y * 29) % 256,
           (x * y + i * 5) % 256) for x in range(w)] for y in range(h)]
        for i in range(n)
    ]


# ------------------------------------------------------- round trips


def test_roundtrip_pixels_within_jpeg_tolerance():
    src = _frames(5)
    b = avi_encode_mjpeg(src, fps=10, quality=92)
    w, h, fps_milli, out = avi_decode_frames(b)
    assert (w, h, fps_milli) == (16, 16, 10000)
    assert len(out) == 5
    errs = [
        abs(a - c)
        for (t, rows), sf in zip(out, src)
        for r1, r2 in zip(rows, sf)
        for p1, p2 in zip(r1, r2)
        for a, c in zip(p1, p2)
    ]
    assert sum(errs) / len(errs) < 4.0
    assert max(errs) <= 40


def test_frame_timing_from_strh_clock():
    b = avi_encode_mjpeg(_frames(6), fps=25)
    _, _, fps_milli, out = avi_decode_frames(b)
    assert fps_milli == 25000
    assert [t for t, _ in out] == [0, 40, 80, 120, 160, 200]


def test_single_frame_and_odd_payload_padding():
    # JPEG payloads are frequently odd-length; the even-padding walk
    # must still land on the next chunk
    for q in (50, 85, 95):
        b = avi_encode_mjpeg(_frames(3, w=8, h=8), fps=5, quality=q)
        _, _, _, out = avi_decode_frames(b)
        assert len(out) == 3
    b = avi_encode_mjpeg(_frames(1), fps=1)
    w, h, _, out = avi_decode_frames(b)
    assert (w, h, len(out)) == (16, 16, 1)


def test_max_frames_truncates():
    b = avi_encode_mjpeg(_frames(6), fps=10)
    _, _, _, out = avi_decode_frames(b, max_frames=2)
    assert len(out) == 2


def test_non_multiple_of_8_dims():
    b = avi_encode_mjpeg(_frames(2, w=10, h=6), fps=10)
    w, h, _, out = avi_decode_frames(b)
    assert (w, h) == (10, 6)
    assert all(len(rows) == 6 and len(rows[0]) == 10 for _, rows in out)


# ----------------------------------------------------- RIFF structure


def test_riff_layout_golden():
    b = avi_encode_mjpeg(_frames(2), fps=10)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    # first LIST is hdrl, containing avih then LIST strl
    assert b[12:16] == b"LIST" and b[20:24] == b"hdrl"
    assert b[24:28] == b"avih"
    avih = b[32:32 + 56]
    usec, _, _, flags, total = struct.unpack_from("<5I", avih)
    assert usec == 100_000 and total == 2 and flags & 0x10
    width, height = struct.unpack_from("<II", avih, 32)
    assert (width, height) == (16, 16)
    assert b"vids" in b and b"MJPG" in b
    assert b"movi" in b and b"idx1" in b
    # every frame chunk is a standalone baseline JPEG
    pos = b.index(b"00dc")
    size = struct.unpack_from("<I", b, pos + 4)[0]
    frame = b[pos + 8:pos + 8 + size]
    assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"


def test_idx1_entries_point_at_frames():
    b = avi_encode_mjpeg(_frames(3), fps=10)
    movi_fourcc = b.index(b"movi")
    idx_pos = b.index(b"idx1")
    n_entries = struct.unpack_from("<I", b, idx_pos + 4)[0] // 16
    assert n_entries == 3
    for k in range(n_entries):
        ck, fl, off, size = struct.unpack_from(
            "<4sIII", b, idx_pos + 8 + 16 * k
        )
        assert ck == b"00dc" and fl == 0x10
        assert b[movi_fourcc + off:movi_fourcc + off + 4] == b"00dc"
        assert struct.unpack_from(
            "<I", b, movi_fourcc + off + 4)[0] == size


# ------------------------------------------------ corruption handling


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        avi_decode_frames(b"RIFX" + b"\x00" * 100)
    with pytest.raises(ValueError, match="magic"):
        avi_decode_frames(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 100)


def test_unsupported_codec_raises_at_plug_point():
    b = bytearray(avi_encode_mjpeg(_frames(2), fps=10))
    pos = b.index(b"vids") + 4
    b[pos:pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        avi_decode_frames(bytes(b))


def test_chunk_overrun_raises():
    b = bytearray(avi_encode_mjpeg(_frames(2), fps=10))
    pos = b.index(b"00dc")
    struct.pack_into("<I", b, pos + 4, 1 << 30)  # lie about chunk size
    with pytest.raises(ValueError, match="overruns"):
        avi_decode_frames(bytes(b))


def test_mismatched_frame_dims_rejected_on_encode():
    with pytest.raises(ValueError, match="dimensions"):
        avi_encode_mjpeg([_frames(1)[0], _frames(1, w=8, h=8)[0]])
    with pytest.raises(ValueError, match="at least one"):
        avi_encode_mjpeg([])


# ------------------------------------------- multimodal integration


def test_extract_frames_dispatch_avi(spark):
    media = mm.synthetic_video_media(spark, n=2, include_avi=True)
    frames = mm.extract_frames(media, every_n=2, decoder="real").collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {0, 1, 2, 3}  # 2 GIFs + 2 AVIs
    for mid in (2, 3):
        rows = sorted(by_id[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == [0, 2]
        assert [r.t_ms for r in rows] == [0, 200]
        assert all((r.width, r.height) == (16, 16) for r in rows)
        # frame payloads are decodable BMPs of the right shape
        for r in rows:
            w, h, px = mm.bmp_decode(bytes(r.frame_bmp))
            assert (w, h) == (16, 16) and len(px) == 16


def test_fixture_rows_deterministic():
    a = mm.synthetic_video_rows(4, include_avi=True)
    b = mm.synthetic_video_rows(4, include_avi=True)
    assert [bytes(x[2]) for x in a] == [bytes(x[2]) for x in b]
    assert [x[0] for x in a] == [0, 1, 2, 3, 4, 5]
