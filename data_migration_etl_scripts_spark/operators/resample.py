"""Audio sample-rate conversion — the normalization step every ASR/
speech training pipeline runs before featurization (mixed-provenance
corpora arrive at 8/22.05/44.1/48 kHz; models consume one rate,
usually 16 kHz). Completes the audio chain: ``audio_decode`` (WAV/
FLAC/MPEG) -> :func:`resample` -> `operators/melspec.py` features.

Everything is FORMULA-derived (no data tables, so no Annex-B-style
seams): a polyphase windowed-sinc interpolator — for output sample j
at input-clock position t = j*M/L (L/M the reduced rational rate
ratio), y[j] = sum_k x[floor(t)+k] * h(k - frac(t)) with
h(u) = cutoff * sinc(cutoff*u) * kaiser(u/H; beta), the Kaiser window
computed from the I0 Bessel power series. Taps are L phase rows
precomputed once per (L, M) and normalized to unit DC gain per phase,
so a constant signal resamples to itself exactly and tone amplitudes
survive within the window's ripple. Cutoff sits at 0.945 of the
narrower Nyquist — downsampling is anti-aliased by construction.

Spark surface: :func:`audio_resample` decodes, resamples, and ships
mono float32-LE PCM inside Arrow-batched ``mapInPandas`` (same
contract as the other media kernels). numpy does the inner
gather-multiply-sum — the kernel is vectorized per clip, not
per-sample Python.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _i0(x: np.ndarray) -> np.ndarray:
    """Modified Bessel I0 via its power series sum((x/2)^2k / k!^2),
    vectorized — converges in well under 64 terms for the window-
    argument range used here (|x| <= beta ~ 10)."""
    hx2 = np.square(np.asarray(x, dtype=np.float64) / 2.0)
    acc = np.ones_like(hx2)
    term = np.ones_like(hx2)
    for k in range(1, 64):
        term = term * hx2 / (k * k)
        acc += term
        if term.max() < 1e-16 * acc.min():
            break
    return acc


def _phase_taps(L: int, M: int, half_taps: int, beta: float) -> np.ndarray:
    """(L, 2*half_taps) tap matrix; row p holds h(k - p/L) for
    k in [-half_taps+1, half_taps], normalized to unit row sum."""
    cutoff = 0.945 * min(1.0, L / M)
    ks = np.arange(-half_taps + 1, half_taps + 1, dtype=np.float64)
    u = ks[None, :] - (np.arange(L, dtype=np.float64) / L)[:, None]
    arg = u / half_taps
    win = np.where(
        np.abs(arg) <= 1.0,
        _i0(beta * np.sqrt(np.clip(1.0 - arg * arg, 0.0, None)))
        / _i0(np.float64(beta)),
        0.0,
    )
    taps = cutoff * np.sinc(cutoff * u) * win
    return taps / taps.sum(axis=1, keepdims=True)


_TAPS_CACHE: dict[tuple[int, int, int, float], np.ndarray] = {}


def resample(
    mono: list[float] | np.ndarray,
    src_rate: int,
    dst_rate: int,
    half_taps: int = 16,
    beta: float = 8.6,
) -> np.ndarray:
    """Mono samples at src_rate -> float64 array at dst_rate with
    n_out = ceil(n_in * dst/src) samples (exact integer formula
    ceil(n*L/M) on the reduced ratio). Identity when rates match."""
    x = np.asarray(mono, dtype=np.float64)
    if src_rate == dst_rate:
        return x.copy()
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("rates must be positive")
    g = math.gcd(src_rate, dst_rate)
    L, M = dst_rate // g, src_rate // g
    key = (L, M, half_taps, beta)
    taps = _TAPS_CACHE.get(key)
    if taps is None:
        taps = _phase_taps(L, M, half_taps, beta)
        if len(_TAPS_CACHE) > 64:
            _TAPS_CACHE.clear()
        _TAPS_CACHE[key] = taps
    n_in = len(x)
    n_out = (n_in * L + M - 1) // M
    j = np.arange(n_out, dtype=np.int64)
    tM = j * M
    ni = tM // L  # floor(j*M/L)
    phase = (tM - ni * L).astype(np.int64)  # j*M mod L
    H = half_taps
    xpad = np.concatenate([np.zeros(H - 1), x, np.zeros(H + 1)])
    # window for output j starts at input index ni - H + 1 -> padded ni
    idx = ni[:, None] + np.arange(2 * H)[None, :]
    return (xpad[idx] * taps[phase]).sum(axis=1)


def audio_resample(
    df: DataFrame,
    target_rate: int = 16000,
    decoder: str = "real",
) -> DataFrame:
    """binary audio (WAV/FLAC/MPEG-1, via ``audio_decode_rate``) ->
    (media_id, src_rate, dst_rate, n_in, n_out, pcm_bin) with
    ``pcm_bin`` the resampled mono clip as float32-LE — the
    train-ready handoff consumed by a dataloader or a downstream
    featurizer at one uniform rate.

    Scale: Arrow-batched mapInPandas; numpy-vectorized per clip; the
    (L, M) tap table is built once per executor and cached. Same
    straggler advice as every media kernel: repartition by size
    upstream for long clips."""
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "src_rate": [], "dst_rate": [],
                   "n_in": [], "n_out": [], "pcm_bin": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                rate, mono = audio_decode_rate(bytes(content))
                y = resample(mono, rate, target_rate)
                out["media_id"].append(mid)
                out["src_rate"].append(rate)
                out["dst_rate"].append(target_rate)
                out["n_in"].append(len(mono))
                out["n_out"].append(len(y))
                out["pcm_bin"].append(
                    struct.pack(f"<{len(y)}f", *y.astype(np.float32))
                )
            yield pd.DataFrame(out)

    schema = ("media_id long, src_rate int, dst_rate int, n_in int, "
              "n_out int, pcm_bin binary")
    return df.select("media_id", "content").mapInPandas(kernel, schema=schema)
