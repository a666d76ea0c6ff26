"""MPEG-1 audio Layer I/II codec (operators/mpeg_audio.py): ISO
requantization grids, filterbank NPR round trip (the SNR pins the
module docstring cites), mono + stereo encode/decode round trips,
frame-syntax goldens, truncation/corruption handling, and the
multimodal audio_decode dispatch + Spark kernel wiring.

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows)."""

from __future__ import annotations

import math
import random

import pytest

from data_migration_etl_scripts_spark.operators import mpeg_audio as ma
from data_migration_etl_scripts_spark.operators import multimodal as mm

RATE = 32000
D = ma.PQMF_DELAY


def _snr_db(ref: list[float], got: list[float]) -> float:
    num = sum(x * x for x in ref)
    den = sum((x - y) ** 2 for x, y in zip(ref, got))
    return 10 * math.log10(num / den)


def _sine(freq: float, n: int, amp: float = 0.5) -> list[float]:
    return [amp * math.sin(2 * math.pi * freq * t / RATE) for t in range(n)]


# ------------------------------------------------- requantization grid


def test_grouped_requantize_iso_grid():
    # ISO 11172-3: s''' = code/2^(nb-1) - 1, s'' = C*(s''' + D).
    # 5-level class decodes to exactly -0.8,-0.4,0,+0.4,+0.8 —
    # NOT the uniform 2*code/(nlevels-1)-1 grid (which put codes 3-4
    # at 1.6/2.4, beyond full scale).
    got5 = [round(ma._requantize(c, 5), 10) for c in range(5)]
    assert got5 == [-0.8, -0.4, 0.0, 0.4, 0.8]
    got9 = [ma._requantize(c, 9) for c in range(9)]
    assert got9[4] == 0.0
    assert all(abs(v) < 1.0 for v in got9)  # inside full scale
    step = 16.0 / 72.0
    for k, v in enumerate(got9):
        assert abs(v - (k - 4) * step) < 1e-12
    got3 = [ma._requantize(c, 3) for c in range(3)]
    assert got3[1] == 0.0 and abs(got3[0] + got3[2]) < 1e-12


@pytest.mark.parametrize("nlevels", sorted(ma.QUANT_CLASSES))
def test_quantize_is_requantize_inverse(nlevels):
    for code in range(0, nlevels, max(1, nlevels // 17)):
        v = ma._requantize(code, nlevels)
        assert ma._quantize(v, nlevels) == code
    # midtread: zero quantizes to the code that decodes to zero
    zero_code = ma._quantize(0.0, nlevels)
    assert abs(ma._requantize(zero_code, nlevels)) < 1.0 / nlevels


def test_requantize_symmetric_and_monotonic():
    for nlevels in (3, 5, 7, 9, 15, 63, 255):
        vals = [ma._requantize(c, nlevels) for c in range(nlevels)]
        assert vals == sorted(vals)
        # symmetric about 0 (midtread)
        assert abs(vals[0] + vals[-1]) < 1e-9


# ---------------------------------------------------- filterbank (NPR)


def test_filterbank_roundtrip_snr_noise():
    rng = random.Random(7)
    sig = [rng.uniform(-0.5, 0.5) for _ in range(1152 * 3)]
    dec = ma.pqmf_synthesize(ma.pqmf_analyze(sig))
    n = len(sig)
    assert _snr_db(sig[: n - D], dec[D:n]) >= 58.0  # measured ~64 dB


def test_filterbank_roundtrip_snr_sine():
    sig = _sine(440.0, 1152 * 3, amp=0.7)
    dec = ma.pqmf_synthesize(ma.pqmf_analyze(sig))
    n = len(sig)
    assert _snr_db(sig[: n - D], dec[D:n]) >= 52.0  # measured ~59 dB


# ------------------------------------------------ encode/decode mono


def test_layer2_mono_roundtrip_snr():
    sig = [
        0.5 * math.sin(2 * math.pi * 440 * t / RATE)
        + 0.2 * math.sin(2 * math.pi * 3000 * t / RATE)
        for t in range(1152 * 4)
    ]
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert (rate, nch) == (RATE, 1)
    n = len(sig)
    assert len(chans[0]) == n
    assert _snr_db(sig[: n - D], chans[0][D:]) >= 50.0  # measured ~56 dB


def test_layer1_mono_roundtrip_snr():
    sig = _sine(440.0, 384 * 8)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=1, bits=10)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert (rate, nch) == (RATE, 1)
    n = len(chans[0])
    assert _snr_db(sig[: n - D], chans[0][D:n]) >= 50.0  # measured ~56 dB


def test_layer2_grouped_classes_roundtrip():
    # bits=2 selects the 3-level grouped class in every subband: the
    # 5/7/10-bit triple-packed code path runs end to end
    sig = _sine(440.0, 1152 * 2, amp=0.6)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=2)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    n = len(sig)
    # 3 levels is brutally coarse; demand signal survival, not fidelity
    assert _snr_db(sig[: n - D], chans[0][D:]) >= 8.0
    # and determinism
    assert ma.mpeg_audio_decode(blob)[2] == chans


def test_decode_deterministic():
    sig = _sine(880.0, 1152 * 2)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=8)
    assert ma.mpeg_audio_decode(blob) == ma.mpeg_audio_decode(blob)


# ---------------------------------------------------- stereo (mode 00)


def test_layer2_stereo_independent_channels():
    n = 1152 * 3
    left = _sine(440.0, n)
    right = _sine(1000.0, n, amp=0.4)
    blob = ma.mpeg_audio_encode(left, rate=RATE, layer=2, bits=8, right=right)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert (rate, nch) == (RATE, 2)
    assert _snr_db(left[: n - D], chans[0][D:]) >= 44.0   # measured ~48 dB
    assert _snr_db(right[: n - D], chans[1][D:]) >= 44.0
    # the channels must NOT have leaked into each other: decoding L
    # against the R reference (and vice versa) is anti-correlated noise
    assert _snr_db(left[: n - D], chans[1][D:]) < 6.0


def test_layer1_stereo_roundtrip():
    n = 384 * 6
    left = _sine(440.0, n)
    right = _sine(2000.0, n, amp=0.3)
    blob = ma.mpeg_audio_encode(left, rate=RATE, layer=1, bits=6, right=right)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert (rate, nch) == (RATE, 2)
    m = len(chans[0])
    assert _snr_db(left[: m - D], chans[0][D:m]) >= 25.0  # 6-bit stereo L1
    assert _snr_db(right[: m - D], chans[1][D:m]) >= 25.0


def test_stereo_length_mismatch_rejected():
    with pytest.raises(ValueError, match="same length"):
        ma.mpeg_audio_encode([0.0] * 1152, right=[0.0] * 576)


# ------------------------------------------------------- frame syntax


def test_frame_header_fields_roundtrip():
    sig = _sine(440.0, 1152 * 3)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=8)
    hdr = ma._parse_header(blob, 0)
    assert hdr["layer"] == 2
    assert hdr["rate"] == RATE
    assert hdr["nch"] == 1
    assert hdr["bitrate"] in {b * 1000 for b in ma.BITRATES_L2 if b}
    # sync walk: frames tile the stream exactly
    pos, frames = 0, 0
    while pos < len(blob):
        h = ma._parse_header(blob, pos)
        pos += h["frame_len"]
        frames += 1
    assert pos == len(blob) and frames == 3


def test_layer1_frame_length_formula():
    sig = _sine(440.0, 384 * 2)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=1, bits=8)
    hdr = ma._parse_header(blob, 0)
    assert hdr["layer"] == 1
    assert hdr["frame_len"] % 4 == 0  # Layer I frames are slot-4 sized
    assert hdr["frame_len"] == (12 * hdr["bitrate"] // RATE + hdr["pad"]) * 4


def test_truncated_tail_frame_dropped():
    sig = _sine(440.0, 1152 * 3)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=8)
    hdr = ma._parse_header(blob, 0)
    cut = blob[: 2 * hdr["frame_len"] + 10]  # 2 whole frames + a stub
    rate, nch, chans = ma.mpeg_audio_decode(cut)
    assert len(chans[0]) == 2 * 1152


def test_decode_errors():
    with pytest.raises(ValueError, match="sync"):
        ma.mpeg_audio_decode(b"\x00\x01\x02\x03" * 10)
    with pytest.raises(ValueError, match="no complete"):
        ma.mpeg_audio_decode(b"\xff\xfd\x48\x00")  # header only, no body
    # Layer III (layer code 01) now DELEGATES to mpeg_layer3 (r7);
    # an all-zero body is a valid silent frame once it is long enough
    with pytest.raises(ValueError, match="no complete Layer III"):
        ma.mpeg_audio_decode(bytes((0xFF, 0xFB, 0x92, 0x00)) + bytes(100))
    # MPEG-2 escape: version bits 10
    with pytest.raises(NotImplementedError, match="MPEG-2"):
        ma.mpeg_audio_decode(bytes((0xFF, 0xF5, 0x48, 0x00)) + bytes(400))
    # free-format bitrate index 0
    with pytest.raises(NotImplementedError, match="free-format"):
        ma.mpeg_audio_decode(bytes((0xFF, 0xFD, 0x08, 0x00)) + bytes(400))


# ----------------------------------------- intensity (joint) stereo


def test_layer2_intensity_stereo_roundtrip():
    """Mode 01: below the bound channels are independent; above it one
    set of codes carries the joint signal and per-channel scalefactors
    carry each channel's envelope. L and R share a waveform at 2:1
    intensity — the intended use case — so both reconstruct well."""
    n = 1152 * 3
    shape = [
        0.3 * math.sin(2 * math.pi * 440 * t / RATE)
        + 0.25 * math.sin(2 * math.pi * 5000 * t / RATE)
        for t in range(n)
    ]
    left = shape
    right = [0.5 * v for v in shape]
    blob = ma.mpeg_audio_encode(
        left, rate=RATE, layer=2, bits=8, right=right, joint_bound=4
    )
    hdr = ma._parse_header(blob, 0)
    assert hdr["mode"] == 0b01 and hdr["bound"] == 4 and hdr["nch"] == 2
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert nch == 2
    # intensity reconstruction error is floored by the scalefactor
    # grid (2^(1/3) steps ~ up to 12% envelope error), not the bits:
    # measured ~18 dB for a perfectly-correlated 2:1 pair
    assert _snr_db(left[: n - D], chans[0][D:]) >= 15.0
    assert _snr_db(right[: n - D], chans[1][D:]) >= 15.0
    # intensity is smaller than independent stereo at the same bits
    indep = ma.mpeg_audio_encode(left, rate=RATE, layer=2, bits=8, right=right)
    assert len(blob) <= len(indep)


def test_layer1_intensity_stereo_roundtrip():
    n = 384 * 6
    shape = [0.4 * math.sin(2 * math.pi * 880 * t / RATE) for t in range(n)]
    left, right = shape, [0.6 * v for v in shape]
    blob = ma.mpeg_audio_encode(
        left, rate=RATE, layer=1, bits=8, right=right, joint_bound=8
    )
    hdr = ma._parse_header(blob, 0)
    assert hdr["mode"] == 0b01 and hdr["bound"] == 8
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    m = len(chans[0])
    assert _snr_db(left[: m - D], chans[0][D:m]) >= 15.0
    assert _snr_db(right[: m - D], chans[1][D:m]) >= 15.0


def test_intensity_stereo_preserves_channel_envelope():
    """The per-channel scalefactors must carry the 2:1 intensity ratio
    through the joint region (decoded RMS ratio ~0.5, not ~1)."""
    n = 1152 * 2
    shape = [0.5 * math.sin(2 * math.pi * 6000 * t / RATE) for t in range(n)]
    blob = ma.mpeg_audio_encode(
        shape, rate=RATE, layer=2, bits=8,
        right=[0.5 * v for v in shape], joint_bound=4,
    )
    _, _, chans = ma.mpeg_audio_decode(blob)
    rms = [math.sqrt(sum(x * x for x in ch[D:]) / (n - D)) for ch in chans]
    assert 0.3 < rms[1] / rms[0] < 0.7


def test_joint_bound_validation():
    sig = _sine(440.0, 1152)
    with pytest.raises(ValueError, match="right channel"):
        ma.mpeg_audio_encode(sig, joint_bound=4)
    with pytest.raises(ValueError, match="4, 8, 12 or 16"):
        ma.mpeg_audio_encode(sig, right=list(sig), joint_bound=5)


# ------------------------------------- multimodal wiring (audio_decode)


def test_audio_decode_dispatches_mpeg():
    sig = _sine(440.0, 1152 * 3, amp=0.6)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    dur_ms, mono = mm.audio_decode(blob)
    # PQMF delay is trimmed: sample 0 aligns with encoder sample 0
    assert len(mono) == 1152 * 3 - D
    assert dur_ms == int(len(mono) * 1000 / RATE)
    assert _snr_db(sig[: len(mono)], mono) >= 50.0


def test_audio_decode_still_handles_wav():
    samples = _sine(440.0, 800)
    dur_ms, mono = mm.audio_decode(mm.wav_encode(samples))
    assert len(mono) == 800


def test_audio_decode_rejects_unknown_container():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.audio_decode(b"QQXX" + bytes(64))
    # Ogg is recognized since r9: a malformed page raises from the
    # container layer, not the generic plug point
    with pytest.raises(ValueError):
        mm.audio_decode(b"OggS" + bytes(64))


def test_audio_features_real_kernel_mp2(spark):
    sig = _sine(440.0, 1152 * 2, amp=0.6)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    media = spark.createDataFrame(
        [(100, "audio", bytearray(blob), "{}")], mm.MEDIA_SCHEMA
    )
    out = mm.audio_features(media, n_mfcc=4, decoder="real").collect()
    assert len(out) == 1
    row = out[0]
    n = 1152 * 2 - D
    assert row.duration_ms == int(n * 1000 / RATE)
    assert len(row.mfcc) == 4
    # constant-frequency sine: every band carries the same RMS energy
    assert max(row.mfcc) - min(row.mfcc) < 0.05
    assert all(0.2 < v < 0.6 for v in row.mfcc)  # sine RMS ~0.42


def test_extract_features_real_kernel_mp2(spark):
    sig = _sine(440.0, 1152 * 2, amp=0.6)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    wavblob = mm.wav_encode(_sine(440.0, 800))
    media = spark.createDataFrame(
        [(0, "audio", bytearray(blob), "{}"), (1, "audio", bytearray(wavblob), "{}")],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in
           mm.extract_features(media, dim=5, decoder="real").collect()}
    mp2 = out[0]
    n = 1152 * 2 - D
    assert abs(mp2.feature[0] - (int(n * 1000 / RATE) / 1000.0)) < 2e-3
    assert mp2.feature[1] == float(n)
    assert mp2.feature[2] > 0.3  # real RMS energy, not hash noise
    assert out[1].feature[1] == 800.0  # WAV path unchanged


# --------------------------------------------- scfsi scalefactor reuse


def test_layer2_scfsi_sharing_emitted_and_decodes():
    """A constant-envelope sine has equal scalefactors across the three
    blocks of every coded subband: the encoder must emit scfsi=2 (one
    scalefactor field) and the decoder's sharing paths must reproduce
    the same samples the scfsi=0 coding would."""
    sig = _sine(440.0, 1152 * 2)
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    # frame 2 (frame 1's first block carries the filterbank warm-up
    # ramp): 4-byte header, then the allocation region (sum of nbal
    # bits over the 30 subbands), then scfsi of subband 0
    frame_len = ma._parse_header(blob, 0)["frame_len"]
    r = ma._BitReader(blob, frame_len + 4)
    alloc0 = [r.read(ma._nbal(ma.ALLOC_TABLE_A[sb])) for sb in range(ma.SBLIMIT_II)]
    assert alloc0[0]  # the carrier subband is coded
    scfsi0 = r.read(2)
    assert scfsi0 == 2  # constant envelope: one scalefactor for all 3 blocks
    # and the full round trip still clears the mono SNR bar
    n = 1152 * 2
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert _snr_db(sig[: n - D], chans[0][D:]) >= 50.0


def test_layer2_scfsi_mixed_patterns_roundtrip():
    """An amplitude-ramped signal makes per-block scalefactors differ,
    mixing scfsi patterns 0/1/3 — decode must still track the envelope."""
    n = 1152 * 2
    sig = [
        (0.1 + 0.8 * t / n) * math.sin(2 * math.pi * 440 * t / RATE)
        for t in range(n)
    ]
    blob = ma.mpeg_audio_encode(sig, rate=RATE, layer=2, bits=10)
    rate, nch, chans = ma.mpeg_audio_decode(blob)
    assert _snr_db(sig[: n - D], chans[0][D:]) >= 40.0
