"""Audio perceptual fingerprint (operators/audiohash.py): gain and
container invariance, source-rate normalization, lossy-codec
robustness, unrelated-clip separation, determinism, and the Spark
audio_afp kernel + banded pair search over the known-structure
fixture.

Reference parity note: the reference ETL repo has no media handling;
this is the LLM-data-pipeline addendum surface (SURVEY.md multimodal
rows) — per-modality dedup: text minhash, embedding cosine, image
dHash, audio spectral fingerprint."""

from __future__ import annotations

import itertools
import math

from data_migration_etl_scripts_spark.operators import audiohash as afx
from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators.flac import flac_encode


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _chord(rate, n, f1=500.0, f2=1200.0):
    return [
        (0.4 * math.sin(2 * math.pi * f1 * t / rate)
         + 0.2 * math.sin(2 * math.pi * f2 * t / rate))
        * (0.6 + 0.4 * math.sin(2 * math.pi * 3.0 * t / rate))
        + 0.04 * math.sin(
            2 * math.pi * (300.0 + 5700.0 * t / (2.0 * n)) * t / rate)
        for t in range(n)
    ]


def test_gain_invariance_exact():
    x = _chord(16000, 5760)
    h = afx.afp_bits(x, 16000)
    assert afx.afp_bits([v * 0.5 for v in x], 16000) == h
    assert afx.afp_bits([v * 0.031 for v in x], 16000) == h


def test_container_invariance_wav_flac():
    x = _chord(16000, 5760)
    ints = [max(-32768, min(32767, int(s * 32767))) for s in x]
    wav = mm.wav_encode(x, rate=16000)
    flc = flac_encode([ints], rate=16000)
    hw = afx.afp_bits(*reversed(mm.audio_decode_rate(wav)))
    hf = afx.afp_bits(*reversed(mm.audio_decode_rate(bytes(flc))))
    assert hw == hf


def test_rate_invariance_small_hamming():
    h16 = afx.afp_bits(_chord(16000, 5760), 16000)
    h32 = afx.afp_bits(_chord(32000, 11520), 32000)
    h44 = afx.afp_bits(_chord(44100, 15876), 44100)
    assert _ham(h16, h32) <= 4
    assert _ham(h16, h44) <= 4


def test_distinct_content_far_apart():
    a = afx.afp_bits(_chord(16000, 5760, 500, 1200), 16000)
    b = afx.afp_bits(_chord(16000, 5760, 2200, 4200), 16000)
    assert _ham(a, b) >= 12


def test_determinism():
    x = _chord(16000, 5760)
    assert afx.afp_bits(x, 16000) == afx.afp_bits(list(x), 16000)


def test_short_clip_pads():
    h = afx.afp_bits(_chord(16000, 300), 16000)
    assert isinstance(h, int) and 0 <= h < 1 << 64


def test_fixture_structure():
    hashes = {}
    for mid, mtype, content, _m in afx.synthetic_audiohash_media_rows(4):
        assert mtype == "audio"
        rate, mono = mm.audio_decode_rate(bytes(content))
        hashes[mid] = afx.afp_bits(mono, rate)
    for k in range(4):
        b = 10 * k
        assert _ham(hashes[b], hashes[b + 1]) == 0  # FLAC lossless
        assert _ham(hashes[b], hashes[b + 2]) == 0  # half-gain float WAV
        assert _ham(hashes[b], hashes[b + 3]) <= 6  # MPEG-1 L2 re-encode
        assert _ham(hashes[b], hashes[b + 4]) <= 6  # 32 kHz rendering
        assert _ham(hashes[b], hashes[b + 5]) >= 10  # unrelated chirp
    # no two different base groups come close
    for a, b in itertools.combinations(sorted(hashes), 2):
        if a // 10 != b // 10:
            assert _ham(hashes[a], hashes[b]) > 6, (a, b)


def test_spark_audio_afp_and_pairs(spark):
    from data_migration_etl_scripts_spark.operators import imagehash as ihx

    media = spark.createDataFrame(
        afx.synthetic_audiohash_media_rows(2), mm.MEDIA_SCHEMA
    )
    hashes = afx.audio_afp(media)
    got = {r.media_id: r.afp for r in hashes.collect()}
    want = {}
    for mid, _t, content, _m in afx.synthetic_audiohash_media_rows(2):
        rate, mono = mm.audio_decode_rate(bytes(content))
        bits = afx.afp_bits(mono, rate)
        want[mid] = bits - (1 << 64) if bits >= 1 << 63 else bits
    assert got == want
    pairs = ihx.dhash_neardup_pairs(
        hashes, hash_col="afp", max_hamming=6, n_bands=8
    ).collect()
    assert all(r.id_a // 10 == r.id_b // 10 for r in pairs)
    pair_set = {(r.id_a, r.id_b) for r in pairs}
    for k in range(2):
        assert (10 * k, 10 * k + 1) in pair_set
        assert (10 * k, 10 * k + 2) in pair_set
