"""IMA ADPCM codec: nibble-arithmetic goldens, mono/stereo round-trip
SNR pins, fact-chunk length truncation, block independence, and the
wav_decode/audio-surface integration."""

from __future__ import annotations

import math
import struct

import pytest

from data_migration_etl_scripts_spark.operators import adpcm as ad
from data_migration_etl_scripts_spark.operators import multimodal as mm


def _tone(freq, n, amp=0.6, rate=8000):
    return [int(amp * 32767 * math.sin(2 * math.pi * freq * t / rate))
            for t in range(n)]


def _snr(orig, rec):
    n = min(len(orig), len(rec))
    sig = sum(o * o for o in orig[:n])
    err = sum((o - r) * (o - r) for o, r in zip(orig[:n], rec[:n]))
    return 10 * math.log10(sig / max(err, 1e-12))


def test_nibble_arithmetic_goldens():
    # from the IMA reference algorithm, step[0]=7: magnitudes via shifts
    assert ad.decode_nibble(0, 0, 0) == (0, 0)       # diff = 7>>3 = 0
    assert ad.decode_nibble(7, 0, 0) == (11, 8)      # 0+1+3+7, idx +8
    assert ad.decode_nibble(15, 0, 0) == (-11, 8)    # sign bit
    assert ad.decode_nibble(4, 0, 88) == (32767, 88)  # clamp at full scale
    assert ad.decode_nibble(12, 0, 88) == (-32768, 88)
    # index clamps at both ends
    assert ad.decode_nibble(0, 100, 0)[1] == 0
    assert ad.decode_nibble(7, 0, 87)[1] == 88


def test_encoder_is_decoder_inverse_state():
    pred, idx = 0, 0
    for s in [100, -200, 3000, 32767, -32768, 15, 0]:
        nb, pred2, idx2 = ad.encode_sample(s, pred, idx)
        assert (pred2, idx2) == ad.decode_nibble(nb, pred, idx)
        pred, idx = pred2, idx2


def test_mono_roundtrip_snr():
    tone = _tone(440, 4000)
    b = ad.adpcm_wav_encode([tone], rate=8000)
    rate, nch, mono = ad.adpcm_wav_decode(b)
    assert (rate, nch) == (8000, 1)
    assert len(mono) == 4000  # fact chunk pins the true length
    assert _snr([t / 32768.0 for t in tone], mono) > 22.0
    # 4:1 compression (4-bit codes + block headers)
    assert len(b) < 2 * len(tone) * 0.3


def test_stereo_roundtrip_snr():
    l, r = _tone(440, 4000), _tone(880, 4000, amp=0.4)
    b = ad.adpcm_wav_encode([l, r], rate=8000)
    rate, nch, mono = ad.adpcm_wav_decode(b)
    assert (rate, nch) == (8000, 2)
    mix = [(a + bb) / 2 / 32768.0 for a, bb in zip(l, r)]
    assert _snr(mix, mono) > 20.0


def test_short_final_block_exact_length():
    tone = _tone(300, 777)
    b = ad.adpcm_wav_encode([tone], rate=8000)
    assert len(ad.adpcm_wav_decode(b)[2]) == 777


def test_blocks_decode_independently():
    """Each block header restarts (predictor, index): decoding only the
    second block must equal the tail of the full decode."""
    tone = _tone(250, 2048)
    b = ad.adpcm_wav_encode([tone], rate=8000, samples_per_block=513)
    rate, nch, full = ad.adpcm_wav_decode(b)
    # carve out block 2 by rebuilding a 1-block file
    fmt_pos = b.find(b"fmt ")
    block_align = struct.unpack_from("<H", b, fmt_pos + 8 + 12)[0]
    data_pos = b.find(b"data") + 8
    blk2 = b[data_pos + block_align : data_pos + 2 * block_align]
    rebuilt = (
        b[: data_pos - 8 - 12]  # header + fmt (drop fact)
        + b"data" + struct.pack("<I", len(blk2)) + blk2
    )
    # patch RIFF size
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    _, _, second = ad.adpcm_wav_decode(rebuilt)
    assert second == full[513 : 513 + len(second)]


def test_wav_decode_routes_format_17():
    tone = _tone(500, 1600)
    b = ad.adpcm_wav_encode([tone], rate=8000)
    dur_ms, mono = mm.wav_decode(b)
    assert dur_ms == 200
    assert _snr([t / 32768.0 for t in tone], mono) > 22.0


def test_audio_features_on_adpcm():
    tone = _tone(440, 800)
    f = mm._real_features(ad.adpcm_wav_encode([tone], rate=8000), 6)
    assert f[0] == pytest.approx(0.1, abs=0.01)  # 100 ms
    assert 0.1 <= f[2] <= 0.9  # real sine RMS, not a hash fake


def test_not_adpcm_raises():
    with pytest.raises(ValueError):
        ad.adpcm_wav_decode(b"RIFF\x00\x00\x00\x00XXXX")
    pcm = mm.wav_encode([0.0] * 100)
    with pytest.raises(ValueError, match="fmt tag 1"):
        ad.adpcm_wav_decode(pcm)


def test_g711_expansion_goldens():
    # formula-derived extremes of the G.711 expansions
    assert ad.mulaw_decode_sample(0x80) == 32124   # max positive
    assert ad.mulaw_decode_sample(0x00) == -32124  # max negative
    assert ad.mulaw_decode_sample(0xFF) == 0       # quietest positive
    assert ad.alaw_decode_sample(0xD5) == 8   # XOR -> 0x80: sign SET = +
    assert ad.alaw_decode_sample(0x55) == -8  # XOR -> 0x00: sign clear = -
    # A-law full scale (XOR -> 0xFF)
    assert ad.alaw_decode_sample(0xAA) == 32256


def test_g711_roundtrip_snr_and_dispatch():
    tone = _tone(440, 1600)
    for law in ("mulaw", "alaw"):
        b = ad.g711_wav_encode(tone, rate=8000, law=law)
        rate, nch, mono = ad.g711_wav_decode(b)
        assert (rate, nch, len(mono)) == (8000, 1, 1600)
        assert _snr([t / 32768.0 for t in tone], mono) > 30.0
        dur_ms, mono2 = mm.wav_decode(b)
        assert dur_ms == 200 and mono2 == mono


def test_g711_features_real():
    tone = _tone(300, 800)
    f = mm._real_features(ad.g711_wav_encode(tone, rate=8000), 6)
    assert f[0] == pytest.approx(0.1, abs=0.01)
    assert 0.1 <= f[2] <= 0.9


def test_riff_decoy_fmt_in_list_chunk():
    # A LIST/INFO chunk BEFORE the real fmt chunk whose payload
    # contains the bytes "fmt " followed by tag 0x11: a byte-scan
    # (b.find) would read the decoy tag and misroute this plain PCM
    # file to the ADPCM decoder, which raises. The RIFF chunk walk
    # must skip chunk payloads.
    tone = _tone(440, 800)
    pcm = mm.wav_encode([t / 32768.0 for t in tone], rate=8000)
    decoy = b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 0x11) + b"\x00" * 14
    payload = b"INFO" + decoy
    lst = b"LIST" + struct.pack("<I", len(payload)) + payload
    b = pcm[:12] + lst + pcm[12:]
    b = b"RIFF" + struct.pack("<I", len(b) - 8) + b[8:]
    assert mm._riff_fmt_tag(b) == (1, 8000)
    dur_ms, mono = mm.wav_decode(b)
    assert dur_ms == 100 and len(mono) == 800
    rate, mono2 = mm.audio_decode_rate(b)
    assert rate == 8000 and mono2 == mono
