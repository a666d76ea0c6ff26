"""Log-mel spectrograms, pure stdlib — the standard acoustic feature
of ASR/audio training pipelines (Whisper-class models consume exactly
this shape), completing the audio half of the multimodal addendum:
``audio_decode`` (WAV/MPEG) -> frames -> FFT -> mel energies -> log.

Everything here is FORMULA-derived (no data tables, so no Annex-B-
style seams): the Hann window, the radix-2 iterative FFT, and the
HTK mel scale mel(f) = 2595 * log10(1 + f / 700) with triangular
filters placed at equal mel intervals.

Spark surface: :func:`audio_mel_spectrogram` runs the kernel inside
Arrow-batched ``mapInPandas`` (same contract as the other media
kernels — one batch of decoded audio in memory per task) and ships
the spectrogram as an mmap-able float32-LE binary column, the same
training-ready handoff as ``bpe.encode_token_ids``'s ``ids_bin``.
"""

from __future__ import annotations

import cmath
import math
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _fft(x: list[complex]) -> list[complex]:
    """Iterative radix-2 Cooley-Tukey FFT (len(x) must be a power of
    two). Pure stdlib; O(n log n)."""
    n = len(x)
    if n & (n - 1):
        raise ValueError("FFT length must be a power of two")
    # bit-reversal permutation
    out = list(x)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            out[i], out[j] = out[j], out[i]
    length = 2
    while length <= n:
        ang = -2.0 * math.pi / length
        wl = cmath.exp(1j * ang)
        for i in range(0, n, length):
            w = 1.0 + 0.0j
            half = length >> 1
            for k in range(i, i + half):
                u = out[k]
                v = out[k + half] * w
                out[k] = u + v
                out[k + half] = u - v
                w *= wl
        length <<= 1
    return out


def hann_window(n: int) -> list[float]:
    """Periodic Hann window (the STFT convention)."""
    return [0.5 - 0.5 * math.cos(2.0 * math.pi * i / n) for i in range(n)]


def _hz_to_mel(f: float) -> float:
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_to_hz(m: float) -> float:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0,
    fmax: float | None = None,
) -> list[list[float]]:
    """Triangular mel filters over the rfft bins: ``n_mels`` rows of
    ``n_fft // 2 + 1`` weights. Filter centers sit at equal mel
    intervals between fmin and fmax (Nyquist by default) — the
    classic HTK construction, entirely formulaic."""
    if fmax is None:
        fmax = rate / 2.0
    n_bins = n_fft // 2 + 1
    mlo, mhi = _hz_to_mel(fmin), _hz_to_mel(fmax)
    centers_hz = [
        _mel_to_hz(mlo + (mhi - mlo) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    bin_hz = [i * rate / n_fft for i in range(n_bins)]
    bank = []
    for m in range(1, n_mels + 1):
        lo, c, hi = centers_hz[m - 1], centers_hz[m], centers_hz[m + 1]
        row = []
        for f in bin_hz:
            if lo < f <= c:
                row.append((f - lo) / (c - lo))
            elif c < f < hi:
                row.append((hi - f) / (hi - c))
            else:
                row.append(0.0)
        bank.append(row)
    return bank


def log_mel_spectrogram(
    samples: list[float],
    rate: int,
    n_fft: int = 512,
    hop: int = 160,
    n_mels: int = 40,
    fmin: float = 0.0,
    fmax: float | None = None,
    eps: float = 1e-10,
) -> list[list[float]]:
    """Mono samples -> frames x n_mels natural-log mel energies.
    Frames are windowed (periodic Hann), zero-padded tails dropped
    (only full frames emitted), power spectrum from the radix-2 FFT's
    first ``n_fft//2 + 1`` bins."""
    if len(samples) < n_fft:
        return []
    win = hann_window(n_fft)
    bank = mel_filterbank(n_mels, n_fft, rate, fmin, fmax)
    n_bins = n_fft // 2 + 1
    frames = []
    for start in range(0, len(samples) - n_fft + 1, hop):
        seg = [samples[start + i] * win[i] for i in range(n_fft)]
        spec = _fft([complex(v, 0.0) for v in seg])
        power = [abs(spec[i]) ** 2 for i in range(n_bins)]
        frames.append([
            math.log(max(eps, sum(w * p for w, p in zip(row, power))))
            for row in bank
        ])
    return frames


MEL_SCHEMA = (
    "media_id long, rate int, n_frames int, n_mels int, mel_bin binary"
)


def audio_mel_spectrogram(
    df: DataFrame,
    n_fft: int = 512,
    hop: int = 160,
    n_mels: int = 40,
) -> DataFrame:
    """binary audio (WAV or MPEG-1 Layer I/II, via ``audio_decode``)
    -> (media_id, rate, n_frames, n_mels, mel_bin) where ``mel_bin``
    is the frames x n_mels log-mel matrix as row-major float32-LE —
    mmap-able by a dataloader without any decode step, the audio
    analog of the tokenizer's ``ids_bin``.

    Scale: Arrow-batched mapInPandas; one batch of decoded audio per
    task (keep arrow.maxRecordsPerBatch small for long clips, and
    repartition by size upstream — the same straggler advice as every
    media kernel)."""
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "rate": [], "n_frames": [],
                   "n_mels": [], "mel_bin": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                b = bytes(content)
                rate, mono = audio_decode_rate(b)
                mel = log_mel_spectrogram(
                    mono, rate, n_fft=n_fft, hop=hop, n_mels=n_mels
                )
                blob = b"".join(
                    struct.pack(f"<{n_mels}f", *row) for row in mel
                )
                out["media_id"].append(mid)
                out["rate"].append(rate)
                out["n_frames"].append(len(mel))
                out["n_mels"].append(n_mels)
                out["mel_bin"].append(blob)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(kernel, schema=MEL_SCHEMA)


def mfcc_from_mel(mel_frames: list[list[float]], n_mfcc: int = 13) -> list[list[float]]:
    """Classic MFCCs: orthonormal DCT-II over each log-mel frame,
    keeping the first ``n_mfcc`` coefficients. Pure formula (the DCT
    basis is cosines), the historical compact form of the mel feature."""
    if not mel_frames:
        return []
    n = len(mel_frames[0])
    basis = [
        [
            math.cos(math.pi * k * (2 * i + 1) / (2 * n))
            * (math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n))
            for i in range(n)
        ]
        for k in range(n_mfcc)
    ]
    return [
        [sum(b * v for b, v in zip(row_k, frame)) for row_k in basis]
        for frame in mel_frames
    ]


def delta_features(
    frames: list[list[float]], width: int = 2
) -> list[list[float]]:
    """Regression-formula deltas (HTK/librosa convention): for frame t,
    d_t = sum_{n=1..N} n * (c_{t+n} - c_{t-n}) / (2 * sum n^2), with
    edge frames replicated (librosa mode='nearest'). Applied once for
    deltas, twice for delta-deltas — the velocity/acceleration half of
    the classic 39-dim MFCC stack."""
    if not frames:
        return []
    t_max = len(frames) - 1
    denom = 2.0 * sum(n * n for n in range(1, width + 1))
    out = []
    for t in range(len(frames)):
        row = []
        for d in range(len(frames[0])):
            acc = 0.0
            for n in range(1, width + 1):
                hi = frames[min(t + n, t_max)][d]
                lo = frames[max(t - n, 0)][d]
                acc += n * (hi - lo)
            row.append(acc / denom)
        out.append(row)
    return out


MFCC_STACK_SCHEMA = (
    "media_id long, rate int, n_frames int, n_dims int, mfcc_bin binary"
)


def audio_mfcc_stack(
    df: DataFrame,
    n_fft: int = 256,
    hop: int = 160,
    n_mels: int = 16,
    n_mfcc: int = 8,
    width: int = 2,
) -> DataFrame:
    """The full classic acoustic front end: log-mel -> MFCC -> delta ->
    delta-delta, concatenated per frame (3 * n_mfcc dims) and shipped
    as row-major float32-LE — decode + FFT + DCT + regression deltas
    all inside ONE Arrow-batched mapInPandas pass (same scale shape as
    the mel kernel: per-clip work, zero Exchanges)."""
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
    )

    n_dims = 3 * n_mfcc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "rate": [], "n_frames": [],
                   "n_dims": [], "mfcc_bin": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                rate, mono = audio_decode_rate(bytes(content))
                mel = log_mel_spectrogram(
                    mono, rate, n_fft=n_fft, hop=hop, n_mels=n_mels
                )
                mfcc = mfcc_from_mel(mel, n_mfcc=n_mfcc)
                d1 = delta_features(mfcc, width)
                d2 = delta_features(d1, width)
                blob = b"".join(
                    struct.pack(f"<{n_dims}f", *(c + v + a))
                    for c, v, a in zip(mfcc, d1, d2)
                )
                out["media_id"].append(mid)
                out["rate"].append(rate)
                out["n_frames"].append(len(mfcc))
                out["n_dims"].append(n_dims)
                out["mfcc_bin"].append(blob)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=MFCC_STACK_SCHEMA
    )
