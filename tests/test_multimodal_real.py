"""Real-decode multimodal kernels: stdlib BMP/WAV codecs round-trip
through the Arrow-batched mapInPandas plumbing (decoder="real")."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm


def test_bmp_roundtrip_pure():
    px = [[(x * 10, y * 10, (x + y)) for x in range(5)] for y in range(3)]
    w, h, back = mm.bmp_decode(mm.bmp_encode(px))
    assert (w, h) == (5, 3)
    assert back == px


def test_wav_roundtrip_pure():
    samples = [math.sin(2 * math.pi * 440 * t / 8000) for t in range(2000)]  # 250ms
    dur_ms, mono = mm.wav_decode(mm.wav_encode(samples))
    assert dur_ms == 250
    assert len(mono) == 2000
    assert abs(mono[500] - samples[500]) < 1e-3


def test_extract_features_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=8)
    out = {r.media_id: r for r in mm.extract_features(media, dim=6, decoder="real").collect()}
    assert len(out) == 8
    img = out[0]
    assert img.feature[0] == 8.0 and img.feature[1] == 8.0  # width, height lead
    aud = out[1]
    assert abs(aud.feature[0] - 0.1) < 1e-6   # 100 ms duration
    assert aud.feature[1] == 800.0            # sample count
    assert aud.feature[2] > 0.5               # sine RMS ~ 0.707


def test_resize_images_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=2).where("media_type = 'image'")
    out = mm.resize_images(media, width=4, height=2, decoder="real").collect()
    assert len(out) == 1
    w, h, rows = mm.bmp_decode(bytes(out[0].content))
    assert (w, h) == (4, 2)
    assert len(rows) == 2 and len(rows[0]) == 4


def test_audio_features_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=4).where("media_type = 'audio'")
    out = {r.media_id: r for r in mm.audio_features(media, n_mfcc=4, decoder="real").collect()}
    assert set(out) == {1, 3}
    assert out[1].duration_ms == 100
    assert len(out[1].mfcc) == 4
    # constant-frequency sine: every band carries the same RMS energy
    assert max(out[1].mfcc) - min(out[1].mfcc) < 0.05


def test_real_kernel_raises_on_compressed(spark):
    fake = mm.synthetic_media(spark, n=3)  # md5 noise: not BMP/WAV magic
    with pytest.raises(Exception, match="PIL|ffmpeg|NotImplemented"):
        mm.extract_features(fake, dim=4, decoder="real").collect()
