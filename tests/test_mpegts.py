"""MPEG-TS demux (operators/mpegts.py): wrap->extract byte identity
for H.264 + AAC elementary streams, end-to-end decode through the
codec layers, PSI CRC validation, multi-PES reassembly, adaptation
fields, and the named scope errors."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import aac
from data_migration_etl_scripts_spark.operators import h264
from data_migration_etl_scripts_spark.operators import mpegts as ts


def _video():
    px = [[((x * 7 + y * 3) % 256, (x + y * 5) % 256, (x * y) % 256)
           for x in range(32)] for y in range(16)]
    return h264.encode_ipcm(px)


def test_wrap_extract_identity_video_audio():
    v = _video()
    a = aac.aac_encode_silence(frames=3, rate_idx=8)
    seg = ts.ts_wrap(h264=v, aac=a)
    assert len(seg) % 188 == 0
    out = ts.ts_demux(seg)
    assert out["h264"] == v and out["aac"] == a
    # single-track wraps too
    assert ts.ts_extract_h264(ts.ts_wrap(h264=v)) == v
    assert ts.ts_extract_aac(ts.ts_wrap(aac=a)) == a


def test_ts_end_to_end_decode():
    """HLS-shaped segment -> demux -> both codec layers decode."""
    v = _video()
    a = aac.aac_encode_silence(frames=2, rate_idx=7, channels=2)
    seg = ts.ts_wrap(h264=v, aac=a)
    w, hgt, rows = h264.decode_iframe(ts.ts_extract_h264(seg))
    assert (w, hgt) == (32, 16)
    rate, nch, chans = aac.aac_decode(ts.ts_extract_aac(seg))
    assert (rate, nch) == (22050, 2)


def test_multi_pes_reassembly():
    """Several PES packets on one PID concatenate in stream order
    (the wrap side emits one PES per call; build two segments' worth
    of packets by concatenating wraps sans the second PSI pair)."""
    a1 = aac.aac_encode_silence(frames=1, rate_idx=8)
    a2 = aac.aac_encode_silence(frames=2, rate_idx=8)
    seg1 = ts.ts_wrap(aac=a1)
    seg2 = ts.ts_wrap(aac=a2)
    # strip seg2's PAT+PMT packets (first two)
    joined = seg1 + seg2[2 * 188:]
    assert ts.ts_extract_aac(joined) == a1 + a2


def test_psi_crc_validated():
    seg = bytearray(ts.ts_wrap(aac=aac.aac_encode_silence(frames=1)))
    # corrupt one PAT byte (program number low byte, offset: packet 0,
    # 4 hdr + 1 pointer + 8 section header + 1)
    seg[4 + 1 + 8 + 1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ts.ts_demux(bytes(seg))


def test_errors():
    with pytest.raises(ValueError, match="0x47"):
        ts.ts_demux(b"\x00" * 188)
    with pytest.raises(ValueError, match="no AVC"):
        ts.ts_extract_h264(ts.ts_wrap(aac=aac.aac_encode_silence(1)))
    with pytest.raises(ValueError, match="nothing to wrap"):
        ts.ts_wrap()
    # scrambled packets raise namefully
    seg = bytearray(ts.ts_wrap(aac=aac.aac_encode_silence(1)))
    seg[2 * 188 + 3] |= 0xC0
    with pytest.raises(NotImplementedError, match="scrambled"):
        ts.ts_demux(bytes(seg))


def test_truncated_tail_tolerated():
    a1 = aac.aac_encode_silence(frames=1, rate_idx=8)
    seg = ts.ts_wrap(aac=a1)
    # crawled segments often cut mid-packet: drop 50 trailing bytes
    # (a full trailing packet must still be parseable)
    out = ts.ts_demux(seg + seg[:138])
    assert out["aac"].startswith(a1)


def test_multimodal_dispatch_mpegts():
    """payload_format labels TS; the feature kernel takes the video
    surface of an A/V segment and the audio surface of an audio-only
    segment; extract_frames and audio_decode_rate both route TS."""
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    v = _video()
    a = aac.aac_encode_silence(frames=2, rate_idx=8)
    seg = ts.ts_wrap(h264=v, aac=a)
    assert mm.payload_format(seg) == "mpegts"
    feats = mm._real_features(seg, 6)
    assert feats[:2] == [32.0, 16.0]  # video surface: first I frame

    audio_seg = ts.ts_wrap(aac=a)
    feats = mm._real_features(audio_seg, 6)
    assert feats[0] == pytest.approx(2048 / 16000)  # audio surface
    rate, mono = mm.audio_decode_rate(audio_seg)
    assert rate == 16000 and all(x == 0.0 for x in mono)


def test_wrap_extract_property():
    """Property: ANY payload sizes (incl. exact multiples of the
    184-byte packet body and one-off boundaries) round-trip through
    wrap -> extract byte-exactly."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def run(data):
        rnd = data.draw(st.randoms(use_true_random=False))
        size = data.draw(st.sampled_from(
            [1, 50, 183, 184, 185, 368, 367, 369, 1000, 2000]))
        # PES-shaped-agnostic: arbitrary ES bytes ride the container
        es = bytes(rnd.randrange(256) for _ in range(size))
        seg = ts.ts_wrap(h264=es)
        assert len(seg) % 188 == 0
        assert ts.ts_extract_h264(seg) == es

    run()


def test_audio_pes_bounded_length():
    """13818-1 permits PES_packet_length = 0 (unbounded) only for
    video ES: audio ES > 64 KiB is split into multiple BOUNDED PES
    packets (round-10 ADVICE fix), and reassembly stays byte-exact."""
    aac_big = bytes(range(256)) * 600            # 150 KiB "audio" ES
    tsb = ts.ts_wrap(aac=aac_big)
    assert ts.ts_demux(tsb)["aac"] == aac_big
    # every audio PES in the mux is bounded (non-zero length field)
    seen = 0
    for pid, pusi, payload in ts._packets(tsb):
        if pid == 0x0101 and pusi:
            assert payload[:3] == b"\x00\x00\x01"
            ln = (payload[4] << 8) | payload[5]
            assert 0 < ln <= 0xFFFF
            seen += 1
    assert seen == 3                             # ceil(150 KiB / 65532)
    # video keeps the unbounded form for long ES
    h264_big = b"\x00\x00\x01\x65" + bytes(70000)
    ts_v = ts.ts_wrap(h264=h264_big)
    assert ts.ts_demux(ts_v)["h264"] == h264_big
    for pid, pusi, payload in ts._packets(ts_v):
        if pid == 0x0100 and pusi:
            assert (payload[4] << 8) | payload[5] == 0
