"""FLAC codec (operators/flac.py): bit-exact lossless round trips
across every subframe type (CONSTANT / VERBATIM / FIXED 0-4 / LPC),
every stereo decorrelation mode, Rice partitions + escape partitions,
wasted bits, 8/16/24-bit depths, frame-syntax goldens, CRC-8/CRC-16/
MD5 corruption detection, and the multimodal audio_decode dispatch +
Spark kernel wiring.

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows). FLAC is the one mainstream codec with no tabulated spec data,
so unlike the MPEG filterbank there is no conformance seam here: the
whole format is EXACT."""

from __future__ import annotations

import math
import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators import flac as fl
from data_migration_etl_scripts_spark.operators import multimodal as mm

RATE = 32000


def _itone(freq: float, n: int, amp: float = 0.5, bits: int = 16) -> list[int]:
    full = (1 << (bits - 1)) - 1
    return [int(amp * full * math.sin(2 * math.pi * freq * t / RATE))
            for t in range(n)]


def _roundtrip(channels, **kw):
    b = fl.flac_encode(channels, **kw)
    rate, nch, bps, got = fl.flac_decode(b)
    assert got == channels
    return b, rate, nch, bps


# ------------------------------------------------------- round trips


def test_mono_fixed_roundtrip_and_compression():
    sig = _itone(440.0, 6000)
    b, rate, nch, bps = _roundtrip([sig], rate=RATE, block_size=1024)
    assert (rate, nch, bps) == (RATE, 1, 16)
    # fixed predictors on a smooth sine must beat raw PCM comfortably
    assert len(b) < 2 * len(sig) / 2


def test_constant_subframe():
    b, *_ = _roundtrip([[-123] * 2000], rate=8000)
    assert len(b) < 100  # one CONSTANT subframe per frame


def test_verbatim_forced_and_auto_noise():
    rng = random.Random(11)
    noise = [rng.randint(-32768, 32767) for _ in range(700)]
    _roundtrip([noise], block_size=256, force_verbatim=True)
    _roundtrip([noise], block_size=256)


def test_lpc_roundtrip_every_order():
    sig = [int(8000 * math.sin(2 * math.pi * 300 * t / RATE)
               + 3000 * math.sin(2 * math.pi * 950 * t / RATE))
           for t in range(2048)]
    for order in (1, 2, 4, 8, 16, 32):
        _roundtrip([sig], force_lpc=order, block_size=1024)


def test_lpc_beats_raw_on_tonal_signal():
    sig = _itone(440.0, 4096, amp=0.7)
    b, *_ = _roundtrip([sig], force_lpc=4, block_size=2048)
    assert len(b) < 2 * len(sig)


def test_stereo_all_modes():
    rng = random.Random(3)
    left = _itone(440.0, 3000, amp=0.6)
    right = [v - rng.randint(-40, 40) for v in left]
    for mode in ("independent", "left_side", "right_side", "mid_side",
                 "auto"):
        _, rate, nch, _ = _roundtrip([left, right], stereo_mode=mode,
                                     block_size=1000)
        assert nch == 2


def test_mid_side_negative_odd_samples():
    # mid/side reconstruction uses the side LSB trick — exercise odd
    # sums and negatives explicitly
    left = [-5, 7, -32768, 32767, 1, 0]
    right = [2, -7, 32767, -32768, 0, 1]
    _roundtrip([left, right], stereo_mode="mid_side", block_size=6)


def test_bit_depths_8_24():
    for bits in (8, 24):
        sig = _itone(500.0, 2000, bits=bits)
        _, _, _, bps = _roundtrip([sig], bps=bits)
        assert bps == bits


def test_rice_partitions_and_wasted_bits():
    sig = [min(1 << 22, max(-(1 << 22), v << 3))
           for v in _itone(440.0, 4096)]
    b, *_ = _roundtrip([sig], bps=24, partition_order=3,
                       wasted_hint=True, block_size=2048)
    # wasted-bits detection must actually shrink the stream vs not
    b2 = fl.flac_encode([sig], bps=24, partition_order=3, block_size=2048)
    assert len(b) < len(b2)


def test_escape_partition_raw_residuals():
    # high-entropy residuals make the 5+raw form cheaper than rice in
    # at least some partitions; round trip must hold either way
    rng = random.Random(9)
    sig = [rng.randint(-(1 << 14), 1 << 14) for _ in range(1024)]
    _roundtrip([sig], partition_order=2, block_size=512)


def test_multichannel_more_than_stereo():
    chans = [_itone(200.0 * (i + 1), 800, amp=0.2) for i in range(4)]
    _, _, nch, _ = _roundtrip(chans, block_size=256)
    assert nch == 4


def test_last_frame_shorter_than_block():
    sig = _itone(440.0, 1100)  # 1024 + 76
    _roundtrip([sig], block_size=1024)


def test_odd_sample_rate_uses_explicit_field():
    _, rate, _, _ = _roundtrip([_itone(440.0, 500)], rate=12345)
    assert rate == 12345


# ----------------------------------------------------- frame syntax


def test_stream_layout_golden():
    sig = _itone(440.0, 192)
    b = fl.flac_encode([sig], rate=44100, block_size=192)
    assert b[:4] == b"fLaC"
    assert b[4] == 0x80  # last-metadata flag + STREAMINFO type 0
    assert int.from_bytes(b[5:8], "big") == 34
    minbs, maxbs = struct.unpack(">HH", b[8:12])
    assert (minbs, maxbs) == (192, 192)
    si = int.from_bytes(b[18:26], "big")
    assert (si >> 44) & 0xFFFFF == 44100
    assert ((si >> 41) & 0x7) + 1 == 1
    assert ((si >> 36) & 0x1F) + 1 == 16
    assert si & 0xFFFFFFFFF == 192
    frame = b[4 + 4 + 34:]
    # 14-bit sync 0b11111111111110 then reserved=0, fixed blocking
    assert frame[0] == 0xFF and frame[1] & 0xFC == 0xF8
    # blocksize 192 has dedicated code 0001; rate 44100 code 1001
    assert frame[2] == 0x19
    # frame header CRC-8 self-consistent
    # (header = sync..coded number; blocksize/rate fully in codes)
    hdr_len = 4 + 1  # 4 fixed bytes + 1-byte coded frame number 0
    assert fl.crc8(frame[:hdr_len]) == frame[hdr_len]


def test_utf8_coded_number_boundaries():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              (1 << 36) - 1):
        enc = fl._utf8_coded(v)
        r = fl._BitReader(enc)
        assert fl._read_utf8_coded(r) == v
    with pytest.raises(ValueError):
        fl._utf8_coded(1 << 36)


def test_many_frames_coded_numbers():
    # >128 frames pushes the frame number into multi-byte coding
    sig = _itone(100.0, 200 * 130)
    _roundtrip([sig], block_size=200)


# ------------------------------------------------ corruption handling


def test_crc16_detects_payload_corruption():
    b = bytearray(fl.flac_encode([_itone(440.0, 1000)]))
    b[-10] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16|MD5|truncated|sync"):
        fl.flac_decode(bytes(b))


def test_crc8_detects_header_corruption():
    b = bytearray(fl.flac_encode([_itone(440.0, 1000)], rate=RATE))
    # flip the sample-rate code inside the first frame header
    off = 4 + 4 + 34 + 2
    b[off] ^= 0x01
    with pytest.raises(ValueError):
        fl.flac_decode(bytes(b))


def test_md5_detects_wrong_streaminfo():
    b = bytearray(fl.flac_encode([_itone(440.0, 1000)]))
    b[4 + 4 + 18] ^= 0xFF  # corrupt the stored MD5
    with pytest.raises(ValueError, match="MD5"):
        fl.flac_decode(bytes(b))
    fl.flac_decode(bytes(b), verify_md5=False)  # opt-out still decodes


def test_truncated_stream_raises():
    b = fl.flac_encode([_itone(440.0, 1000)])
    with pytest.raises(ValueError):
        fl.flac_decode(b[: len(b) // 2])


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        fl.flac_decode(b"fLaK" + b"\x00" * 40)


def test_out_of_range_sample_rejected_on_encode():
    with pytest.raises(ValueError, match="range"):
        fl.flac_encode([[40000]], bps=16)


# ------------------------------------------- multimodal integration


def test_audio_decode_dispatch_flac():
    sig = _itone(440.0, 3200, amp=0.6)
    b = fl.flac_encode([sig], rate=RATE, block_size=1024)
    dur_ms, mono = mm.audio_decode(bytes(b))
    assert dur_ms == 100
    assert len(mono) == 3200
    rms = math.sqrt(sum(x * x for x in mono) / len(mono))
    assert abs(rms - 0.6 / math.sqrt(2)) < 0.01
    # lossless: decoded floats match the integer source exactly
    assert all(abs(m - s / 32768.0) < 1e-12 for m, s in zip(mono, sig))


def test_audio_decode_dispatch_flac_stereo_downmix():
    left = _itone(440.0, 3200, amp=0.6)
    right = [0] * 3200
    b = fl.flac_encode([left, right], rate=RATE, stereo_mode="left_side")
    _, mono = mm.audio_decode(bytes(b))
    assert all(abs(m - l / 2 / 32768.0) < 1e-12
               for m, l in zip(mono, left))


def test_real_features_flac_fixture_rows():
    rows = {mid: (mtype, bytes(c))
            for mid, mtype, c, _ in mm.synthetic_real_media_rows(
                24, include_mpeg=True)}
    assert rows[31][0] == "audio" and rows[31][1][:4] == b"fLaC"
    assert rows[32][0] == "audio" and rows[32][1][:4] == b"fLaC"
    f31 = mm._real_features(rows[31][1], 6)
    assert f31[0] == 0.1 and f31[1] == 3200.0
    assert abs(f31[2] - 0.6 / math.sqrt(2)) < 0.01
    f32 = mm._real_features(rows[32][1], 6)
    assert f32[0] == 0.1
    # stereo downmix (0.6*sin440 + 0.3*sin880)/2: component amps 0.3
    # and 0.15, RMS = sqrt(0.3^2/2 + 0.15^2/2)
    want = math.sqrt((0.3 ** 2 + 0.15 ** 2) / 2)
    assert abs(f32[2] - want) < 0.02
