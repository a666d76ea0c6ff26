"""MP4/ISO-BMFF demux (operators/mp4.py): box walk, avcC parameter
sets, sync-sample offset arithmetic, Annex-B reassembly byte-identity
against the engine H.264 encoder, container-level corruption, and
multimodal dispatch."""

from __future__ import annotations

import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators import h264 as h
from data_migration_etl_scripts_spark.operators import mp4 as m
from data_migration_etl_scripts_spark.operators import multimodal as mm


def _stream(seed=1, w=20, hgt=12):
    rnd = random.Random(seed)
    px = [[(rnd.randrange(256),) * 3 for _ in range(w)] for _ in range(hgt)]
    return px, h.encode_ipcm(px)


def test_wrap_extract_annexb_byte_identity():
    _px, stream = _stream()
    wrapped = m.mp4_wrap_h264(stream, 20, 12)
    assert wrapped[4:8] == b"ftyp"
    assert m.mp4_extract_h264(wrapped) == stream


def test_mp4_first_frame_decodes():
    px, stream = _stream(seed=4)
    wrapped = m.mp4_wrap_h264(stream, 20, 12)
    w, hgt, rows = h.decode_iframe(m.mp4_extract_h264(wrapped))
    assert (w, hgt) == (20, 12)
    for y in range(hgt):
        for x in range(w):
            for c in range(3):
                assert abs(rows[y][x][c] - px[y][x][c]) <= 2


def test_wrap_extract_identity_property():
    """Property (hypothesis): wrap->extract is byte-identical for any
    engine stream over random dims/content."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        rnd = data.draw(st.randoms(use_true_random=False))
        w = 2 * data.draw(st.integers(2, 16))
        hgt = 2 * data.draw(st.integers(2, 12))
        px = [[(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
               for _ in range(w)] for _ in range(hgt)]
        stream = h.encode_ipcm(px)
        assert m.mp4_extract_h264(m.mp4_wrap_h264(stream, w, hgt)) == stream

    run()


def test_box_walk_handles_64bit_and_to_eof_sizes():
    inner = m._box(b"free", b"xyz")
    big = (struct.pack(">I", 1) + b"skip"
           + struct.pack(">Q", 16 + len(inner)) + inner)
    tail = struct.pack(">I", 0) + b"tail" + b"payload"
    boxes = list(m.mp4_boxes(big + tail))
    assert [b[0] for b in boxes] == [b"skip", b"tail"]
    assert big[boxes[0][1]: boxes[0][2]] == inner


def test_non_bmff_raises():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        m.mp4_extract_h264(b"\x00" * 40)


# ------------------------------------------------ fragmented MP4 (r9)

def test_fmp4_wrap_extract_byte_identity():
    _px, stream = _stream(seed=2)
    wrapped = m.mp4_wrap_h264(stream, 20, 12, fragmented=True)
    # the fragmented layout really is fragmented: a moof precedes mdat
    kinds = [t for t, _s, _e in m.mp4_boxes(wrapped)]
    assert b"moof" in kinds
    assert m.mp4_extract_h264(wrapped) == stream


def test_fmp4_wrap_extract_identity_property():
    """Property (hypothesis): moof/traf/trun wrap->extract is
    byte-identical for any engine stream (I_PCM and quantized) over
    random dims/content — pins tfhd default-base-is-moof addressing
    and trun data_offset/size arithmetic."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        rnd = data.draw(st.randoms(use_true_random=False))
        w = 2 * data.draw(st.integers(2, 16))
        hgt = 2 * data.draw(st.integers(2, 12))
        px = [[(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
               for _ in range(w)] for _ in range(hgt)]
        if data.draw(st.booleans()):
            stream = h.encode_ipcm(px)
        else:
            stream = h.encode_quantized(px, qp=data.draw(st.integers(6, 24)))
        got = m.mp4_extract_h264(
            m.mp4_wrap_h264(stream, w, hgt, fragmented=True))
        assert got == stream

    run()


def test_fmp4_skips_non_sync_leading_samples():
    """A trun whose first sample is flagged non-sync (bit 16) must be
    skipped; the second (sync) sample is the one extracted."""
    _px, stream = _stream(seed=6)
    wrapped = bytearray(m.mp4_wrap_h264(stream, 20, 12, fragmented=True))
    # rebuild the moof with TWO samples: a junk non-sync one first
    units = list(m.mp4_boxes(bytes(wrapped)))
    moof_s, moof_e = next((s, e) for t, s, e in units if t == b"moof")
    mdat_s, mdat_e = next((s, e) for t, s, e in units if t == b"mdat")
    sample = bytes(wrapped[mdat_s:mdat_e])
    junk = b"\x00\x00\x00\x02\xff\xff"  # one bogus length-prefixed NAL
    head = bytes(wrapped[: moof_s - 8])
    mfhd = m._box(b"mfhd", struct.pack(">II", 0, 1))
    tfhd = m._box(b"tfhd", struct.pack(">II", 0x20000, 1))
    trun = m._box(b"trun", struct.pack(
        ">IIi", 0x601, 2, 0)          # data-offset + sizes + flags
        + struct.pack(">II", len(junk), 0x10000)   # junk: non-sync
        + struct.pack(">II", len(sample), 0))      # real: sync
    moof = bytearray(m._box(b"moof", mfhd + m._box(b"traf", tfhd + trun)))
    idx = bytes(moof).find(b"trun") + 4 + 8
    struct.pack_into(">i", moof, idx, len(moof) + 8)
    out = head + bytes(moof) + m._box(b"mdat", junk + sample)
    assert m.mp4_extract_h264(out) == stream


def test_fmp4_trun_without_data_offset_raises():
    _px, stream = _stream()
    wrapped = bytearray(m.mp4_wrap_h264(stream, 20, 12, fragmented=True))
    idx = bytes(wrapped).find(b"trun") + 4
    flags = struct.unpack_from(">I", wrapped, idx)[0]
    struct.pack_into(">I", wrapped, idx, flags & ~0x1)
    with pytest.raises(NotImplementedError, match="data_offset"):
        m.mp4_extract_h264(bytes(wrapped))


def test_no_avc_track_raises():
    ftyp = m._box(b"ftyp", b"isom" + struct.pack(">I", 512))
    moov = m._box(b"moov", m._box(b"trak", m._box(b"mdia", b"")))
    with pytest.raises(ValueError, match="no AVC video track"):
        m.mp4_extract_h264(ftyp + moov)


def test_payload_format_and_real_features_dispatch():
    _px, stream = _stream(seed=9)
    wrapped = m.mp4_wrap_h264(stream, 20, 12)
    assert mm.payload_format(wrapped) == "mp4"
    assert mm.payload_format(stream) == "h264"
    f_mp4 = mm._real_features(wrapped, 6)
    f_annexb = mm._real_features(stream, 6)
    assert f_mp4[:2] == [20.0, 12.0]
    assert f_mp4[2:] == f_annexb[2:]  # same decoded pixels


def test_extract_frames_real_decodes_mp4_first_frame(spark):
    _px, stream = _stream(seed=11)
    wrapped = m.mp4_wrap_h264(stream, 20, 12)
    df = spark.createDataFrame(
        [(0, "video", bytearray(wrapped), "{}")], mm.MEDIA_SCHEMA
    )
    rows = mm.extract_frames(df, decoder="real").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.frame_idx) == (20, 12, 0)
    assert bytes(r.frame_bmp)[:2] == b"BM"
