"""Log-mel spectrograms: FFT correctness vs a naive DFT, mel-scale
filterbank properties, tone localization, and the Spark kernel over
WAV and MPEG payloads."""

from __future__ import annotations

import cmath
import math
import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators import melspec as ms
from data_migration_etl_scripts_spark.operators import multimodal as mm


def _naive_dft(x):
    n = len(x)
    return [
        sum(x[t] * cmath.exp(-2j * math.pi * k * t / n) for t in range(n))
        for k in range(n)
    ]


def test_fft_matches_naive_dft():
    rng = random.Random(3)
    x = [complex(rng.uniform(-1, 1), 0) for _ in range(64)]
    got = ms._fft(list(x))
    want = _naive_dft(x)
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-9


def test_fft_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        ms._fft([0j] * 48)


def test_fft_parseval():
    rng = random.Random(9)
    x = [complex(rng.uniform(-1, 1), 0) for _ in range(256)]
    X = ms._fft(list(x))
    t_energy = sum(abs(v) ** 2 for v in x)
    f_energy = sum(abs(v) ** 2 for v in X) / len(x)
    assert abs(t_energy - f_energy) < 1e-9 * t_energy + 1e-12


def test_mel_filterbank_shape_and_coverage():
    bank = ms.mel_filterbank(40, 512, 16000)
    assert len(bank) == 40 and all(len(r) == 257 for r in bank)
    # every filter has mass, peaks at 1.0-ish, and centers ascend
    centers = []
    for row in bank:
        assert max(row) > 0
        centers.append(max(range(257), key=lambda i: row[i]))
    assert centers == sorted(centers)
    # mid-band bins are covered by at least one filter
    covered = [any(row[i] > 0 for row in bank) for i in range(257)]
    assert sum(covered) > 200


def test_tone_lands_in_expected_mel_bin():
    rate, n_fft, n_mels = 16000, 512, 40
    for freq in (300.0, 1000.0, 3000.0, 6000.0):
        sig = [0.8 * math.sin(2 * math.pi * freq * t / rate)
               for t in range(rate // 4)]
        mel = ms.log_mel_spectrogram(sig, rate, n_fft=n_fft, n_mels=n_mels)
        assert len(mel) > 10
        # average over frames, find the hottest mel bin
        avg = [sum(f[m] for f in mel) / len(mel) for m in range(n_mels)]
        hot = max(range(n_mels), key=lambda m: avg[m])
        # expected bin: the filter whose center is nearest the tone
        mlo, mhi = ms._hz_to_mel(0.0), ms._hz_to_mel(rate / 2)
        want = min(
            range(n_mels),
            key=lambda m: abs(
                ms._mel_to_hz(mlo + (mhi - mlo) * (m + 1) / (n_mels + 1)) - freq
            ),
        )
        assert abs(hot - want) <= 1


def test_short_input_yields_no_frames():
    assert ms.log_mel_spectrogram([0.0] * 100, 16000, n_fft=512) == []


def test_frame_count_formula():
    sig = [0.0] * 2000
    mel = ms.log_mel_spectrogram(sig, 8000, n_fft=512, hop=160)
    assert len(mel) == (2000 - 512) // 160 + 1


def test_spark_kernel_wav_and_mp2(spark):
    from data_migration_etl_scripts_spark.operators import mpeg_audio as ma

    rate = 32000
    sig = [0.6 * math.sin(2 * math.pi * 440 * t / rate) for t in range(1152 * 3)]
    wav = mm.wav_encode(sig, rate=rate)
    mp2 = ma.mpeg_audio_encode(sig, rate=rate, layer=2, bits=10)
    media = spark.createDataFrame(
        [(0, "audio", bytearray(wav), "{}"), (1, "audio", bytearray(mp2), "{}")],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in
           ms.audio_mel_spectrogram(media, n_fft=512, hop=160, n_mels=24).collect()}
    for mid, row in out.items():
        assert row.rate == rate
        assert row.n_mels == 24
        assert len(row.mel_bin) == row.n_frames * 24 * 4  # float32 rows
    # same tone through both containers: hottest mel bin agrees
    def hottest(row):
        vals = struct.unpack(f"<{row.n_frames * 24}f", bytes(row.mel_bin))
        frames = [vals[i * 24:(i + 1) * 24] for i in range(row.n_frames)]
        avg = [sum(f[m] for f in frames) / len(frames) for m in range(24)]
        return max(range(24), key=lambda m: avg[m])

    assert hottest(out[0]) == hottest(out[1])


def test_audio_decode_rate_exposes_true_rate():
    sig = [0.1] * 800
    rate, mono = mm.audio_decode_rate(mm.wav_encode(sig, rate=44100))
    assert rate == 44100 and len(mono) == 800


def test_mfcc_dct_is_orthonormal_and_compacts_energy():
    rng = random.Random(4)
    frames = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(5)]
    full = ms.mfcc_from_mel(frames, n_mfcc=16)  # complete DCT
    # orthonormal: energy preserved frame-by-frame (Parseval for DCT-II)
    for f, c in zip(frames, full):
        assert abs(sum(v * v for v in f) - sum(v * v for v in c)) < 1e-9
    # a smooth (constant) frame compacts into coefficient 0
    smooth = ms.mfcc_from_mel([[2.5] * 16], n_mfcc=16)[0]
    assert abs(smooth[0] - 2.5 * 4.0) < 1e-9  # sqrt(16) * mean
    assert max(abs(v) for v in smooth[1:]) < 1e-9


def test_delta_features_regression_formula():
    from data_migration_etl_scripts_spark.operators.melspec import delta_features

    # linear ramp: delta of c_t = t is exactly 1.0 in the interior
    frames = [[float(t)] for t in range(10)]
    d = delta_features(frames, width=2)
    assert all(abs(row[0] - 1.0) < 1e-12 for row in d[2:8])
    # edges replicate (mode='nearest'): first frame sees (c1-c0) + 2*(c2-c0) over 10
    assert abs(d[0][0] - (1 * 1 + 2 * 2) / 10.0) < 1e-12
    # constant signal: zero velocity everywhere
    assert all(r == [0.0] for r in delta_features([[7.0]] * 5, width=2))
    # delta of delta of a quadratic is constant in the interior
    quad = [[float(t * t)] for t in range(12)]
    dd = delta_features(delta_features(quad), width=2)
    assert abs(dd[4][0] - dd[6][0]) < 1e-9


def test_mfcc_stack_kernel_shapes(spark):
    from data_migration_etl_scripts_spark.operators import melspec as msp
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    media = mm.synthetic_real_media(spark, n=4).where("media_type = 'audio'")
    rows = msp.audio_mfcc_stack(media, n_fft=256, hop=160, n_mels=16,
                                n_mfcc=8).collect()
    assert rows and all(r["n_dims"] == 24 for r in rows)
    for r in rows:
        assert len(r["mfcc_bin"]) == r["n_frames"] * 24 * 4
