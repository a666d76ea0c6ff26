"""Audio sample-rate conversion (operators/resample.py): length
formula, identity, amplitude preservation through up/down/rational
rate changes, anti-aliasing, exact constant passthrough, round-trip
SNR, and the Spark audio_resample kernel over real fixture payloads
(WAV + MPEG + FLAC through one dispatch).

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows) — the normalization step between decode and featurization in
an ASR training pipeline."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators.resample import resample


def _sine(freq, n, rate, amp=0.5):
    return amp * np.sin(2 * math.pi * freq * np.arange(n) / rate)


def _goertzel_amp(x, freq, rate):
    n = len(x)
    c = np.exp(-2j * math.pi * freq * np.arange(n) / rate)
    return 2 * abs((x * c).sum()) / n


def test_identity_same_rate():
    x = _sine(440, 1000, 16000)
    y = resample(x, 16000, 16000)
    assert np.array_equal(y, x)


@pytest.mark.parametrize(
    "src,dst", [(32000, 16000), (8000, 16000), (44100, 16000),
                (48000, 16000), (16000, 22050)]
)
def test_output_length_formula(src, dst):
    n = 12345
    y = resample(np.zeros(n), src, dst)
    g = math.gcd(src, dst)
    assert len(y) == (n * (dst // g) + src // g - 1) // (src // g)


@pytest.mark.parametrize(
    "src,dst,freq", [(32000, 16000, 440), (8000, 16000, 440),
                     (44100, 16000, 1000), (16000, 48000, 2500)]
)
def test_tone_amplitude_preserved(src, dst, freq):
    x = _sine(freq, src, src)  # 1 second
    y = resample(x, src, dst)
    amp = _goertzel_amp(y[400:-400], freq, dst)
    assert abs(amp - 0.5) < 0.005


def test_antialiasing_kills_out_of_band_tone():
    # 14 kHz is above the 8 kHz Nyquist of the target rate: it must
    # be attenuated, not folded to 2 kHz
    x = _sine(14000, 32000, 32000)
    y = resample(x, 32000, 16000)
    out_rms = math.sqrt(float((y[400:-400] ** 2).mean()))
    in_rms = math.sqrt(float((x ** 2).mean()))
    assert out_rms / in_rms < 0.01
    assert _goertzel_amp(y[400:-400], 2000, 16000) < 0.005


def test_constant_passes_exactly():
    y = resample(np.full(5000, 0.37), 48000, 16000)
    assert float(np.abs(y[50:-50] - 0.37).max()) == 0.0


def test_round_trip_snr():
    rate = 32000
    t = np.arange(rate)
    x = sum(0.2 * np.sin(2 * math.pi * f * t / rate)
            for f in (300, 1200, 3000))
    back = resample(resample(x, rate, 48000), 48000, rate)
    m = min(len(back), len(x))
    err = back[100:m - 100] - x[100:m - 100]
    snr = 10 * math.log10(float((x[100:m - 100] ** 2).sum())
                          / float((err ** 2).sum()))
    assert snr > 80


def test_bad_rates_raise():
    with pytest.raises(ValueError, match="positive"):
        resample([0.0] * 10, 0, 16000)


def test_spark_audio_resample_kernel(spark):
    from data_migration_etl_scripts_spark.operators.resample import (
        audio_resample,
    )

    media = mm.synthetic_real_media(spark, n=8, include_mpeg=True).where(
        "media_type = 'audio'"
    )
    rows = {r.media_id: r for r in audio_resample(media, 16000).collect()}
    fixture = {mid: bytes(c)
               for mid, t, c, _ in mm.synthetic_real_media_rows(
                   8, include_mpeg=True) if t == "audio"}
    assert set(rows) == set(fixture)
    for mid, r in rows.items():
        rate, mono = mm.audio_decode_rate(fixture[mid])
        assert r.src_rate == rate and r.dst_rate == 16000
        g = math.gcd(rate, 16000)
        assert r.n_out == (len(mono) * (16000 // g)
                           + rate // g - 1) // (rate // g)
        got = np.array(struct.unpack(f"<{r.n_out}f", bytes(r.pcm_bin)))
        want = resample(mono, rate, 16000).astype(np.float32)
        assert np.array_equal(got, want.astype(np.float64)) or np.allclose(
            got, want, atol=1e-7
        )
