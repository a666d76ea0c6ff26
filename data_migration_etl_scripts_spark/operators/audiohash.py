"""Perceptual audio fingerprinting + near-duplicate pairs — audio
dedup for training corpora (the speech/music analog of the image
dHash stage in `operators/imagehash.py`), completing the per-modality
dedup family: text minhash, embedding cosine, image dHash, audio
spectral fingerprint.

Fingerprint (Haitsma-Kalker-style band-energy gradients, downsampled
to one 64-bit clip hash): decode -> resample to 16 kHz
(`operators/resample.py`, so the hash is INVARIANT to the source
sample rate) -> Hann/rfft power spectrogram -> 9 geometrically spaced
bands over 300-6000 Hz -> box-mean into 8 time cells -> bit(t, b) =
log E(t, b) > log E(t, b+1). Log-domain band GRADIENTS make the hash
exactly invariant to amplitude scaling (a gain shifts every log
energy by the same constant) and to lossless container choice (WAV
vs FLAC decode to identical floats); lossy MPEG re-encode and rate
conversion land within a few bits.

Scale split (the engine's dedup discipline, same as imagehash):
- the HASH is the only Python stage (decode + fingerprint, Arrow-
  batched mapInPandas, one clip in memory at a time);
- the PAIR SEARCH reuses `imagehash.dhash_neardup_pairs` verbatim —
  it is generic over any (id, 64-bit hash) relation: band equi-join
  (pigeonhole-exact recall for hamming < n_bands) + codegen popcount.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

AFP_RATE = 16000
AFP_NFFT = 512
AFP_HOP = 256
AFP_BANDS = 9  # 9 band energies -> 8 gradient bits per time cell
AFP_TIME_CELLS = 8
AFP_FMIN = 300.0
AFP_FMAX = 6000.0


def afp_bits(mono, rate: int) -> int:
    """Mono samples at any rate -> 64-bit spectral fingerprint.
    Deterministic, amplitude-scale invariant, source-rate normalized
    (internal resample to 16 kHz)."""
    from data_migration_etl_scripts_spark.operators.resample import resample

    y = resample(np.asarray(mono, dtype=np.float64), rate, AFP_RATE)
    if len(y) < AFP_NFFT:
        y = np.concatenate([y, np.zeros(AFP_NFFT - len(y))])
    n_frames = 1 + (len(y) - AFP_NFFT) // AFP_HOP
    window = np.hanning(AFP_NFFT)
    # geometric band edges over [FMIN, FMAX] -> rfft bin ranges
    edges = AFP_FMIN * (AFP_FMAX / AFP_FMIN) ** (
        np.arange(AFP_BANDS + 1) / AFP_BANDS
    )
    bins = np.clip(
        np.round(edges * AFP_NFFT / AFP_RATE).astype(int), 1, AFP_NFFT // 2
    )
    band_energy = np.zeros((n_frames, AFP_BANDS))
    for f in range(n_frames):
        seg = y[f * AFP_HOP:f * AFP_HOP + AFP_NFFT] * window
        power = np.abs(np.fft.rfft(seg)) ** 2
        for b in range(AFP_BANDS):
            lo, hi = bins[b], max(bins[b] + 1, bins[b + 1])
            band_energy[f, b] = power[lo:hi].sum()
    # box-mean frames into the fixed time grid (clip-length adaptive)
    grid = np.zeros((AFP_TIME_CELLS, AFP_BANDS))
    for t in range(AFP_TIME_CELLS):
        f0 = t * n_frames // AFP_TIME_CELLS
        f1 = max(f0 + 1, (t + 1) * n_frames // AFP_TIME_CELLS)
        grid[t] = band_energy[f0:f1].mean(axis=0)
    # relative epsilon: scales with the signal, so log DIFFERENCES are
    # exactly gain-invariant
    eps = max(float(grid.max()), 1e-300) * 1e-12
    lg = np.log(grid + eps)
    bits = 0
    for t in range(AFP_TIME_CELLS):
        for b in range(AFP_BANDS - 1):
            bits = (bits << 1) | (1 if lg[t, b] > lg[t, b + 1] else 0)
    return bits


AFP_SCHEMA = "media_id long, afp long"


def audio_afp(df: DataFrame) -> DataFrame:
    """binary audio column -> (media_id, afp): the only Python stage
    of the audio-dedup pipeline (decode via the WAV/FLAC/MPEG dispatch
    in `multimodal.audio_decode_rate`). The 64-bit fingerprint is
    stored as a signed long (bit patterns intact), ready for
    `imagehash.dhash_neardup_pairs(hashes, hash_col="afp")`."""
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "afp": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                rate, mono = audio_decode_rate(bytes(content))
                bits = afp_bits(mono, rate)
                if bits >= 1 << 63:  # two's-complement into LongType
                    bits -= 1 << 64
                out["media_id"].append(mid)
                out["afp"].append(bits)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(kernel, schema=AFP_SCHEMA)


_FIXTURE_MEMO: dict[int, list[tuple]] = {}


def synthetic_audiohash_media_rows(n_base: int = 4) -> list[tuple]:
    """Deterministic audio table with KNOWN near-dup structure (pure
    Python — shared by the board query and the selfcheck oracle): for
    each base clip k (a distinct two-tone chord with AM envelope),
    id 10k = 16 kHz int16 WAV, 10k+1 = the SAME samples as FLAC
    (lossless: hamming 0), 10k+2 = the same clip at HALF amplitude as
    an IEEE-float WAV (exact scaling: hamming 0 by log-gradient
    invariance), 10k+3 = the same clip re-encoded as MPEG-1 Layer II
    (lossy: small hamming), 10k+4 = the same content rendered at
    32 kHz (rate-invariance: small hamming), and one unrelated
    noise-chord clip at 10k+5."""
    import math

    memo = _FIXTURE_MEMO.get(n_base)
    if memo is not None:  # deterministic rows; MP2 encode is the cost
        return memo

    from data_migration_etl_scripts_spark.operators.flac import flac_encode
    from data_migration_etl_scripts_spark.operators.mpeg_audio import (
        mpeg_audio_encode,
    )
    from data_migration_etl_scripts_spark.operators.multimodal import wav_encode

    def chord(rate: int, k: int, n: int) -> list[float]:
        # component frequencies sit mid-band (not on the geometric
        # band edges), so codec band-edge attenuation can't flip
        # gradient bits; a -28 dB slow chirp (300->6000 Hz across the
        # clip) gives EVERY band real energy — like real audio, and
        # unlike a bare two-tone whose empty-band gradients would be
        # quantization-noise coin flips
        f1, f2 = 450.0 + 180.0 * k, 1000.0 + 260.0 * k
        out = []
        for t in range(n):
            v = (0.45 * math.sin(2 * math.pi * f1 * t / rate)
                 + 0.25 * math.sin(2 * math.pi * f2 * t / rate)) \
                * (0.6 + 0.4 * math.sin(2 * math.pi * 3.0 * t / rate))
            ph = 2 * math.pi * (300.0 + 5700.0 * t / (2.0 * n)) * t / rate
            out.append(v + 0.04 * math.sin(ph))
        return out

    def float_wav(samples: list[float], rate: int) -> bytes:
        import struct as _s

        fmt = _s.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
        data = b"".join(_s.pack("<f", s) for s in samples)
        body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
                + b"data" + _s.pack("<I", len(data)) + data)
        return b"RIFF" + _s.pack("<I", len(body)) + body

    rows = []
    for k in range(n_base):
        # 360 ms everywhere (11520 = 10 MPEG Layer-II frames at 32 kHz)
        # so every variant's adaptive time grid covers the same content
        base16 = chord(16000, k, 5760)
        ints16 = [max(-32768, min(32767, int(s * 32767))) for s in base16]
        floats16 = [v / 32768.0 for v in ints16]
        rows.append((10 * k, "audio",
                     bytearray(wav_encode(base16, rate=16000)), "{}"))
        rows.append((10 * k + 1, "audio",
                     bytearray(flac_encode([ints16], rate=16000)), "{}"))
        rows.append((10 * k + 2, "audio",
                     bytearray(float_wav([v / 2.0 for v in floats16], 16000)),
                     "{}"))
        base32 = chord(32000, k, 11520)
        rows.append((10 * k + 3, "audio",
                     bytearray(mpeg_audio_encode(base32, layer=2, bits=10)),
                     "{}"))
        rows.append((10 * k + 4, "audio",
                     bytearray(wav_encode(base32, rate=32000)), "{}"))
        # unrelated clip: linear chirp in a per-base NON-overlapping
        # frequency range (500-1500, 1800-2800, ... Hz)
        f0, f1 = 500.0 + 1300.0 * k, 1500.0 + 1300.0 * k
        noise = [
            0.5 * math.sin(2 * math.pi
                           * (f0 + (f1 - f0) * t / (2 * 5760)) * t / 16000.0)
            for t in range(5760)
        ]
        rows.append((10 * k + 5, "audio",
                     bytearray(wav_encode(noise, rate=16000)), "{}"))
    _FIXTURE_MEMO[n_base] = rows
    return rows
