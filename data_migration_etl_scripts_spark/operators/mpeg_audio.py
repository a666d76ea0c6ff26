"""MPEG-1 Audio Layer I/II codec, pure stdlib — the audio analog of
the baseline JPEG codec (`operators/jpeg.py`), filling the
`multimodal.py` compressed-audio plug-point for the two subband
layers. Layer III (MP3) decodes through `operators/mpeg_layer3.py`
(r7: side info, bit reservoir, scalefactors, requantization, MS
stereo, alias reduction, IMDCT — the Annex-B Huffman big-values
codebooks remain that module's documented data seam).

Reference parity note: the reference ETL repo has no media handling at
all; this exists for the LLM-data-pipeline addendum (decode / feature
extraction over binary audio columns at corpus scale).

What is EXACT here (ISO/IEC 11172-3 frame syntax, from public spec
knowledge):
  - header fields, sync walk, padding, frame sizing
    (LayerI: 4*(12*bitrate/rate + pad); LayerII: 144*bitrate/rate + pad)
  - Layer I: 4-bit allocation per subband/channel, 6-bit scalefactors,
    12 samples/subband, nb = alloc+1 bits, MSB-inverted offset code
  - Layer II: allocation-table driven nbal per subband, scfsi (2 bits)
    with 1/2/3 scalefactors per 36-sample block, 12 granules x 3
    samples, GROUPED codes for 3/5/9-level classes (one 5/7/10-bit
    code = c0 + L*c1 + L^2*c2)
  - requantization s'' = C*(s' + D) with the per-class (C, D) grid and
    scalefactor table sf[i] = 2 * 2^(-i/3)
  - stereo: independently coded channels (mode 00), and INTENSITY
    (joint) stereo (mode 01, r6): above the mode_extension bound one
    set of sample codes serves both channels, scaled by per-channel
    scalefactors

What is STRUCTURAL-but-not-bit-conformant (documented, by design):
  - the 512-tap polyphase prototype window. The ISO Annex-B C/D
    tables are numeric data with no closed form; reproducing 512
    tabulated constants from memory is exactly the kind of silent
    wrongness this repo refuses. Instead the filterbank is the
    textbook NPR cosine-modulated bank (Vaidyanathan pseudo-QMF:
    modulation about the prototype center with +/-(-1)^k*pi/4
    phases — the same band structure the ISO matrixing produces once
    its Annex-B window's built-in sign pattern is folded in) around a
    numerically designed Kaiser-windowed-sinc prototype optimized for
    composite-response flatness; measured round-trip SNR ~64 dB on
    broadband noise, >= 55 dB on in-band sines (pinned in
    tests/test_mpeg_audio.py). Our encoder and
    decoder share the bank, so engine-written frames round-trip;
    decoding a FOREIGN encoder's frames yields audio through a
    slightly different synthesis window (same subband layout, no
    resync loss) — drop the Annex-B table + ISO matrixing into
    ``PROTOTYPE``/``_ANA``/``_SYN`` for bit-level conformance.

The Layer II allocation table below is the B.2a SHAPE (sblimit 30;
nbal 4/3/2 by subband region; 15-step low bands). Tables B.2b/c/d
(other rate/bitrate operating points) select identically through
``_ALLOC_TABLE`` and are a data-only extension.
"""

from __future__ import annotations

import math

# ------------------------------------------------------------- tables

SAMPLE_RATES = {0: 44100, 1: 48000, 2: 32000}
BITRATES_L1 = [None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
BITRATES_L2 = [None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
BITRATES_L3 = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]

#: scalefactor index -> multiplier (ISO table: sf[0] = 2.0, step 2^(-1/3))
SCALEFACTORS = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]

#: Layer II quantization classes: nlevels -> (C, D, bits, grouped)
#: C = 2^ceil(log2(nlevels+1)) / nlevels, D = 2^(1 - (bits-ish)) per the
#: spec's class grid; grouped classes pack 3 samples into one code.
QUANT_CLASSES = {
    3: (4.0 / 3.0, 0.5, 5, True),
    5: (8.0 / 5.0, 0.5, 7, True),
    7: (8.0 / 7.0, 0.25, 3, False),
    9: (16.0 / 9.0, 0.5, 10, True),
    15: (16.0 / 15.0, 0.125, 4, False),
    31: (32.0 / 31.0, 0.0625, 5, False),
    63: (64.0 / 63.0, 0.03125, 6, False),
    127: (128.0 / 127.0, 0.015625, 7, False),
    255: (256.0 / 255.0, 0.0078125, 8, False),
    511: (512.0 / 511.0, 0.00390625, 9, False),
    1023: (1024.0 / 1023.0, 0.001953125, 10, False),
    2047: (2048.0 / 2047.0, 0.0009765625, 11, False),
    4095: (4096.0 / 4095.0, 0.00048828125, 12, False),
    8191: (8192.0 / 8191.0, 0.000244140625, 13, False),
    16383: (16384.0 / 16383.0, 0.0001220703125, 14, False),
    32767: (32768.0 / 32767.0, 0.00006103515625, 15, False),
    65535: (65536.0 / 65535.0, 0.000030517578125, 16, False),
}

#: Layer II allocation table (B.2a shape): per subband, the list of
#: selectable nlevels (index 0 = not allocated); nbal = bits needed to
#: index the list. sblimit = len(table).
_STEPS_LO = [0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535]
_STEPS_MID = [0, 3, 5, 7, 9, 15, 31, 65535]
_STEPS_HI = [0, 3, 5, 65535]
ALLOC_TABLE_A = [_STEPS_LO] * 11 + [_STEPS_MID] * 12 + [_STEPS_HI] * 7  # sblimit 30
SBLIMIT_II = len(ALLOC_TABLE_A)


def _nbal(steps: list[int]) -> int:
    return max(1, (len(steps) - 1).bit_length())


# --------------------------------------------------- prototype window

def _i0(x: float) -> float:
    """Modified Bessel I0 via its power series (converges fast for the
    beta range used here)."""
    s, t, k = 1.0, 1.0, 1
    while True:
        t *= (x / (2.0 * k)) ** 2
        s += t
        if t < 1e-12 * s:
            return s
        k += 1


def _kaiser_sinc(cutoff: float, taps: int = 512, beta: float = 9.0) -> list[float]:
    """numpy-vectorized (r8): this runs inside the golden-section
    search at MODULE IMPORT, in the driver and in every Python worker
    — the pure-Python loop cost 2.2 s per process, which dominated the
    multimodal decode walls."""
    import numpy as np

    m = (taps - 1) / 2.0
    t = np.arange(taps) - m
    # np.sinc(x) = sin(pi x)/(pi x) handles t == 0 exactly
    ideal = (cutoff / math.pi) * np.sinc(cutoff * t / math.pi)
    w = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - (t / m) ** 2))) / np.i0(beta)
    return (ideal * w).tolist()


def _design_prototype(taps: int = 512, beta: float = 9.0) -> list[float]:
    """Near-perfect-reconstruction prototype for the 32-band
    cosine-modulated bank: Kaiser-windowed sinc whose cutoff is
    golden-section-searched to MINIMIZE the classic NPR flatness
    objective max|T(w) - 1| over the transition band, where
    T(w) = (|H(w)|^2 + |H(pi/32 - w)|^2) / |H(0)|^2 is the composite
    (distortion) response of a band and its adjacent image (Lin &
    Vaidyanathan one-parameter pseudo-QMF design). At beta=9 the
    optimum lands at cutoff ~1.13*pi/64 with flatness ~1.2e-3 and
    stopband < -95 dB; measured round-trip SNR ~64 dB on broadband
    noise, >= 55 dB on in-band sines (pinned in
    tests/test_mpeg_audio.py). Swap in the ISO Annex-B table here for
    bit-conformance with foreign encoders."""

    import numpy as np

    n_idx = np.arange(taps)

    def flatness(cutoff: float, npts: int = 17) -> float:
        h = np.asarray(_kaiser_sinc(cutoff, taps, beta))
        ws = (math.pi / 32.0) * np.arange(npts) / (npts - 1)
        grid = np.concatenate(([0.0], ws, math.pi / 32.0 - ws))
        mags = np.abs(np.exp(-1j * np.outer(grid, n_idx)) @ h) ** 2
        g0 = mags[0]
        comp = (mags[1: npts + 1] + mags[npts + 1:]) / g0
        return float(np.max(np.abs(comp - 1.0)))

    lo, hi = math.pi / 128.0, math.pi / 32.0
    for _ in range(50):
        m1 = lo + (hi - lo) * 0.382
        m2 = lo + (hi - lo) * 0.618
        if flatness(m1) < flatness(m2):
            hi = m2
        else:
            lo = m1
    return _kaiser_sinc((lo + hi) / 2.0, taps, beta)


PROTOTYPE = _design_prototype()

#: filterbank delay in samples (analysis + synthesis cascade): N - M
PQMF_DELAY = 512 - 32

# textbook NPR pseudo-QMF modulation (Vaidyanathan): phases
# +/-(-1)^k*pi/4 about the prototype CENTER (255.5). Equivalent band
# structure to the ISO matrixing — the ISO +/-16 offsets fold the same
# phases into its Annex-B window's sign pattern. Synthesis carries the
# 1/M interpolation gain so the cascade is unit-gain.
_CENTER = (512 - 1) / 2.0
_ANA = [
    [
        2.0 * PROTOTYPE[n]
        * math.cos((2 * k + 1) * (math.pi / 64.0) * (n - _CENTER) + (-1) ** k * math.pi / 4.0)
        for n in range(512)
    ]
    for k in range(32)
]
_SYN = [
    [
        # 2 (modulation) * 32 (interpolation gain of the 1-in-32
        # upsampled synthesis convolution) -> unit cascade gain,
        # measured flat to <0.01 dB across the band in the tests
        64.0 * PROTOTYPE[n]
        * math.cos((2 * k + 1) * (math.pi / 64.0) * (n - _CENTER) - (-1) ** k * math.pi / 4.0)
        for n in range(512)
    ]
    for k in range(32)
]


def pqmf_analyze(samples: list[float]) -> list[list[float]]:
    """Mono samples -> list of granules, each 32 subband samples
    (critically decimated: one granule per 32 input samples). Input is
    zero-padded at the head (the filter history). numpy-vectorized
    (r7): one (n_granules, 512) strided window matrix against the
    analysis bank — float64 math identical to the scalar form."""
    import numpy as np

    n = len(samples) // 32
    if n == 0:
        return []
    x = np.concatenate([np.zeros(511), np.asarray(samples, dtype=np.float64)])
    ana = np.asarray(_ANA, dtype=np.float64)  # (32, 512)
    # window m = x[end-512 : end] reversed, end = 511 + (m+1)*32
    idx = (511 + (np.arange(n)[:, None] + 1) * 32 - 1) - np.arange(512)[None, :]
    wins = x[idx]  # (n, 512), newest-first
    return (wins @ ana.T).tolist()


def pqmf_synthesize(granules: list[list[float]]) -> list[float]:
    """Inverse of :func:`pqmf_analyze` (overall delay ``PQMF_DELAY``
    samples, unit gain). numpy-vectorized (r7): the 16-granule history
    convolution becomes one tensordot per granule against the
    (16, 32, 32) synthesis tensor S[r, k, j] = _SYN[k][32r + j]."""
    import numpy as np

    if not granules:
        return []
    syn = np.asarray(_SYN, dtype=np.float64)  # (32, 512)
    s3 = syn.reshape(32, 16, 32).transpose(1, 0, 2)  # (r, k, j)
    hist = np.zeros((16, 32))  # hist[r] = granule r ago
    out = np.empty(32 * len(granules))
    for m, g in enumerate(granules):
        hist[1:] = hist[:-1]
        hist[0] = g
        out[m * 32: (m + 1) * 32] = np.einsum("rk,rkj->j", hist, s3)
    return out.tolist()


# ------------------------------------------------------------ bit I/O

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v


# ------------------------------------------------- quantize / requant

def _quantize(v: float, nlevels: int) -> int:
    """[-1, 1) sample -> MSB-inverted offset code in [0, nlevels-1],
    the exact inverse of :func:`_requantize` (midtread, symmetric)."""
    c, d, _, _ = QUANT_CLASSES[nlevels]
    sp = v / c - d  # target s' in [-1, 1)
    nb = nlevels.bit_length()  # code bit width: 2 for 3, 3 for 5/7, 4 for 9/15 ...
    code = round((sp + 1.0) * (1 << (nb - 1)))
    return max(0, min(nlevels - 1, code))


def _requantize(code: int, nlevels: int) -> float:
    """ISO 11172-3 s'' = C * (s''' + D) with s''' = code / 2^(nb-1) - 1,
    nb = the class code width (the MSB-inverted offset fraction) — one
    formula for ALL classes, grouped (3/5/9) and ungrouped alike.
    Spot values: 5-level codes decode to -0.8,-0.4,0,+0.4,+0.8 and
    9-level to k*16/72 for k in -4..4 (symmetric, within full scale)."""
    c, d, _, _ = QUANT_CLASSES[nlevels]
    nb = nlevels.bit_length()
    sp = code / float(1 << (nb - 1)) - 1.0
    return c * (sp + d)


def _pick_scalefactor(peak: float) -> int:
    """Smallest scalefactor (largest index -> smallest value) that
    still covers |sample| <= peak, i.e. the ISO 'next table entry
    above the block maximum'."""
    for i in range(len(SCALEFACTORS) - 1, -1, -1):
        if SCALEFACTORS[i] >= peak + 1e-12:
            return i
    return 0


# ------------------------------------------------------------ headers

def _frame_header(
    layer: int, bitrate_idx: int, rate_idx: int, pad: int, mode: int,
    mode_ext: int = 0, version: int = 0b11,
) -> bytes:
    b0 = 0xFF
    b1 = (0xE0 | (version << 3)
          | ({1: 0b11, 2: 0b10, 3: 0b01}[layer] << 1) | 1)  # no CRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes((b0, b1, b2, b3))


def _parse_header(data: bytes, pos: int) -> dict:
    if pos + 4 > len(data):
        raise ValueError("truncated MPEG audio header")
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"bad sync at byte {pos}")
    version = (b1 >> 3) & 0b11
    layer_code = (b1 >> 1) & 0b11
    if version == 0b01:
        raise ValueError("reserved MPEG version code")
    if layer_code == 0b00:
        raise ValueError("reserved layer code")
    layer = {0b11: 1, 0b10: 2, 0b01: 3}[layer_code]
    if version != 0b11 and layer != 3:
        raise NotImplementedError(
            "MPEG-2/2.5 Layers I/II — Layer III LSF only"
        )
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0b11
    if bitrate_idx in (0, 15) or rate_idx == 3:
        raise NotImplementedError("free-format/reserved bitrate or reserved rate")
    mode = (b3 >> 6) & 0b11
    mode_ext = (b3 >> 4) & 0b11
    pad = (b2 >> 1) & 1
    if version != 0b11:
        # MPEG-2 (10) / MPEG-2.5 (00) Layer III: rates halve/quarter
        # by formula; the LSF bitrate row + SFB grids are the
        # mpeg_layer3.load_lsf_tables seam
        from data_migration_etl_scripts_spark.operators import mpeg_layer3

        if not mpeg_layer3.LSF["bitrates"]:
            mpeg_layer3._try_env_lsf_tables()
        if not mpeg_layer3.LSF["bitrates"]:
            raise NotImplementedError(
                "MPEG-2/2.5 Layer III needs the LSF tables — "
                "mpeg_layer3.load_lsf_tables(path) or "
                "$SPARK_GRAFT_LSF_TABLES injects them"
            )
        rate = SAMPLE_RATES[rate_idx] // (2 if version == 0b10 else 4)
        bitrate = mpeg_layer3.LSF["bitrates"][bitrate_idx] * 1000
        # 576 samples per LSF Layer III frame -> 72 * bitrate / rate
        frame_len = 72 * bitrate // rate + pad
        return {
            "version": version,
            "layer": layer, "bitrate": bitrate, "rate": rate, "pad": pad,
            "mode": mode, "mode_ext": mode_ext,
            "nch": 1 if mode == 0b11 else 2, "frame_len": frame_len,
            "bound": 4 * (mode_ext + 1) if mode == 0b01 else 32,
            "crc": (b1 & 1) == 0,
        }
    bitrate = (BITRATES_L1, BITRATES_L2, BITRATES_L3)[layer - 1][bitrate_idx] * 1000
    rate = SAMPLE_RATES[rate_idx]
    if layer == 1:
        frame_len = (12 * bitrate // rate + pad) * 4
    else:  # Layers II and III share the 144*bitrate/rate sizing
        frame_len = 144 * bitrate // rate + pad
    return {
        "version": version,
        "layer": layer, "bitrate": bitrate, "rate": rate, "pad": pad,
        "mode": mode, "mode_ext": mode_ext,
        "nch": 1 if mode == 0b11 else 2, "frame_len": frame_len,
        # intensity-stereo bound: below it channels code independently,
        # from it on one set of sample codes serves both channels
        # (scaled by each channel's own scalefactors). Independent
        # stereo/dual/mono = no joint region.
        "bound": 4 * (mode_ext + 1) if mode == 0b01 else 32,
        "crc": (b1 & 1) == 0,
    }


# ------------------------------------------------------------- decode

def mpeg_audio_decode(data: bytes) -> tuple[int, int, list[list[float]]]:
    """MPEG-1 Layer I/II/III bytes -> (sample_rate, n_channels,
    per-channel float sample lists). Walks every frame; a truncated
    final frame is dropped (streaming-tail tolerance, like the JPEG
    fill-byte rule). Layer III streams (bit reservoir, IMDCT path)
    delegate to `operators/mpeg_layer3.py`. Raises on bad sync /
    MPEG-2."""
    if len(data) >= 4 and _parse_header(data, 0)["layer"] == 3:
        from data_migration_etl_scripts_spark.operators.mpeg_layer3 import (
            layer3_decode,
        )

        return layer3_decode(data)
    pos, rate, nch = 0, None, None
    subband_stream: list[list[list[float]]] = []  # per channel: granules
    while pos + 4 <= len(data):
        hdr = _parse_header(data, pos)
        if pos + hdr["frame_len"] > len(data):
            break  # truncated tail frame
        if rate is None:
            rate, nch = hdr["rate"], hdr["nch"]
            subband_stream = [[] for _ in range(nch)]
        elif hdr["rate"] != rate or hdr["nch"] != nch:
            raise ValueError("mid-stream rate/mode change")
        if hdr["layer"] == 3:
            raise ValueError("mid-stream layer change")
        body = _BitReader(data, pos + 4 + (2 if hdr["crc"] else 0))
        if hdr["layer"] == 1:
            _decode_layer1_frame(body, nch, subband_stream, hdr["bound"])
        else:
            _decode_layer2_frame(body, nch, subband_stream, hdr["bound"])
        pos += hdr["frame_len"]
    if rate is None:
        raise ValueError("no complete MPEG audio frame found")
    channels = [pqmf_synthesize(g) for g in subband_stream]
    return rate, nch, channels


def _decode_layer1_frame(
    r: _BitReader, nch: int, out: list[list[list[float]]], bound: int = 32
) -> None:
    # ISO field order: subband-major, channel-minor for alloc + scf.
    # Intensity (joint) stereo: from `bound` on, ONE allocation and ONE
    # set of sample codes serve both channels, each scaled by its own
    # transmitted scalefactor (mono streams: bound is irrelevant).
    bound = min(bound, 32) if nch == 2 else 32
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = r.read(4)
        else:
            a = r.read(4)
            for ch in range(nch):
                alloc[ch][sb] = a
    for ch in range(nch):
        if any(a == 15 for a in alloc[ch]):
            raise ValueError("forbidden Layer I allocation 15")
    scf = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                scf[ch][sb] = r.read(6)
    grans = [[[0.0] * 32 for _ in range(12)] for _ in range(nch)]
    for s in range(12):
        for sb in range(32):
            a = alloc[0][sb] if sb >= bound else None
            if sb >= bound:
                if a:
                    nb = a + 1
                    sp = _requantize(r.read(nb), (1 << nb) - 1)
                    for ch in range(nch):
                        grans[ch][s][sb] = sp * SCALEFACTORS[scf[ch][sb]]
                continue
            for ch in range(nch):
                a = alloc[ch][sb]
                if a:
                    nb = a + 1
                    code = r.read(nb)
                    grans[ch][s][sb] = (
                        _requantize(code, (1 << nb) - 1) * SCALEFACTORS[scf[ch][sb]]
                    )
    for ch in range(nch):
        out[ch].extend(grans[ch])


def _decode_layer2_frame(
    r: _BitReader, nch: int, out: list[list[list[float]]], bound: int = 32
) -> None:
    table = ALLOC_TABLE_A
    # ISO field order: subband-major, channel-minor throughout.
    # Intensity (joint) stereo: from `bound` on, ONE allocation and ONE
    # set of (possibly grouped) sample codes serve both channels, each
    # scaled by its own transmitted scalefactors.
    bound = min(bound, SBLIMIT_II) if nch == 2 else SBLIMIT_II
    alloc = [[0] * SBLIMIT_II for _ in range(nch)]
    for sb in range(SBLIMIT_II):
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = r.read(_nbal(table[sb]))
        else:
            a = r.read(_nbal(table[sb]))
            for ch in range(nch):
                alloc[ch][sb] = a
    scfsi = [[0] * SBLIMIT_II for _ in range(nch)]
    for sb in range(SBLIMIT_II):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = r.read(2)
    scf = [[(0, 0, 0)] * SBLIMIT_II for _ in range(nch)]
    for sb in range(SBLIMIT_II):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            if si == 0:
                a, b, c = r.read(6), r.read(6), r.read(6)
            elif si == 1:
                a = r.read(6); c = r.read(6); b = a
            elif si == 2:
                a = r.read(6); b = c = a
            else:
                a = r.read(6); c = r.read(6); b = c
            scf[ch][sb] = (a, b, c)
    grans = [[[0.0] * 32 for _ in range(36)] for _ in range(nch)]

    def read_triple(sb: int, nlevels: int, bits: int, grouped: bool):
        if grouped:
            code = r.read(bits)
            return (
                code % nlevels,
                (code // nlevels) % nlevels,
                (code // (nlevels * nlevels)) % nlevels,
            )
        return (r.read(bits), r.read(bits), r.read(bits))

    for g in range(12):  # granule = 3 consecutive samples per subband
        for sb in range(SBLIMIT_II):
            if sb >= bound:
                idx = alloc[0][sb]
                if not idx:
                    continue
                nlevels = table[sb][idx]
                c_, d_, bits, grouped = QUANT_CLASSES[nlevels]
                triple = read_triple(sb, nlevels, bits, grouped)
                sps = [_requantize(t, nlevels) for t in triple]
                for ch in range(nch):
                    sf = SCALEFACTORS[scf[ch][sb][g // 4]]
                    for t in range(3):
                        grans[ch][3 * g + t][sb] = sps[t] * sf
                continue
            for ch in range(nch):
                idx = alloc[ch][sb]
                if not idx:
                    continue
                nlevels = table[sb][idx]
                c_, d_, bits, grouped = QUANT_CLASSES[nlevels]
                triple = read_triple(sb, nlevels, bits, grouped)
                sf = SCALEFACTORS[scf[ch][sb][g // 4]]
                for t in range(3):
                    grans[ch][3 * g + t][sb] = _requantize(triple[t], nlevels) * sf
    for ch in range(nch):
        out[ch].extend(grans[ch])


# ------------------------------------------------------------- encode

def _pick_frame(layer: int, rate: int, needed_bytes: int) -> tuple[int, int]:
    """Smallest standard bitrate index whose unpadded frame holds
    ``needed_bytes`` -> (bitrate_idx, frame_len)."""
    rate_idx = {v: k for k, v in SAMPLE_RATES.items()}[rate]
    rates = BITRATES_L1 if layer == 1 else BITRATES_L2
    for i in range(1, 15):
        br = rates[i] * 1000
        fl = (12 * br // rate) * 4 if layer == 1 else 144 * br // rate
        if fl >= needed_bytes:
            return i, fl
    raise ValueError(
        f"frame payload {needed_bytes}B exceeds the highest Layer {layer} bitrate"
    )


def mpeg_audio_encode(
    samples: list[float],
    rate: int = 32000,
    layer: int = 2,
    bits: int = 8,
    sblimit: int | None = None,
    right: list[float] | None = None,
    joint_bound: int | None = None,
) -> bytes:
    """Mono [-1, 1] samples -> MPEG-1 Layer I/II bytes (fixture
    encoder, like ``jpeg_encode``): PQMF analysis, per-block
    scalefactors, uniform allocation of ``bits``-ish resolution across
    the coded subbands, scfsi=0 (all three scalefactors sent). Input
    is trimmed to whole frames (384 / 1152 samples).

    Pass ``right`` for two-channel STEREO (mode 0b00): the channels
    are coded independently per the ISO stereo mode — each gets its
    own allocation/scalefactors, samples interleaved per-subband in
    channel order. Add ``joint_bound`` (4/8/12/16) for INTENSITY
    (joint) stereo (mode 0b01): subbands from the bound up transmit
    ONE set of sample codes (the L/R mean, normalized to its own
    scalefactor) plus per-channel scalefactors that carry each
    channel's envelope — the standard high-band intensity trade."""
    if rate not in SAMPLE_RATES.values():
        raise ValueError(f"rate must be one of {sorted(SAMPLE_RATES.values())}")
    if right is not None and len(right) != len(samples):
        raise ValueError("stereo channels must be the same length")
    if joint_bound is not None:
        if right is None:
            raise ValueError("joint_bound requires a right channel")
        if joint_bound not in (4, 8, 12, 16):
            raise ValueError("joint_bound must be 4, 8, 12 or 16")
    frame_granules = 12 if layer == 1 else 36
    frame_samples = 32 * frame_granules
    nframes = len(samples) // frame_samples
    if nframes == 0:
        raise ValueError(f"need at least {frame_samples} samples")
    chans = [samples] if right is None else [samples, right]
    if right is None:
        mode, mode_ext, bound = 0b11, 0, 32
    elif joint_bound is None:
        mode, mode_ext, bound = 0b00, 0, 32
    else:
        mode, mode_ext, bound = 0b01, joint_bound // 4 - 1, joint_bound
    granules = [pqmf_analyze(ch[: nframes * frame_samples]) for ch in chans]
    frames = bytearray()
    for f in range(nframes):
        grs = [g[f * frame_granules : (f + 1) * frame_granules] for g in granules]
        if layer == 1:
            frames += _encode_layer1_frame(grs, rate, bits, mode, mode_ext, bound)
        else:
            frames += _encode_layer2_frame(
                grs, rate, bits, sblimit or SBLIMIT_II, mode, mode_ext, bound
            )
    return bytes(frames)


_SILENCE = 1e-6  # subbands quieter than this get allocation 0


def _joint_scf(peak_ch: float, peak_joint: float, scf_joint: int) -> int:
    """Per-channel scalefactor for an intensity subband: the decoder
    reconstructs ch = requant(code) * scf_ch with requant(code) ~
    joint / scf_joint_value, so scf_ch must carry the channel's
    envelope relative to the joint signal."""
    if peak_joint <= _SILENCE:
        return len(SCALEFACTORS) - 1
    return _pick_scalefactor(
        SCALEFACTORS[scf_joint] * peak_ch / peak_joint
    )


def _encode_layer1_frame(
    grs: list[list[list[float]]], rate: int, bits: int, mode: int,
    mode_ext: int = 0, bound: int = 32,
) -> bytes:
    nch = len(grs)
    if nch == 1:
        bound = 32
    w = _BitWriter()
    peaks = [
        [max(abs(g[sb]) for g in gr) for sb in range(32)] for gr in grs
    ]
    joint = [
        [sum(gr[s][sb] for gr in grs) / nch for sb in range(32)]
        for s in range(len(grs[0]))
    ]
    jpeaks = [max(abs(joint[s][sb]) for s in range(12)) for sb in range(32)]
    # real encoders allocate by psychoacoustics; the fixture encoder
    # allocates `bits` to every audible subband and 0 to silence
    alloc = [
        [bits - 1 if peaks[ch][sb] > _SILENCE else 0 for sb in range(32)]
        for ch in range(nch)
    ]
    for sb in range(bound, 32):  # joint region: one shared allocation
        a = bits - 1 if max(peaks[ch][sb] for ch in range(nch)) > _SILENCE else 0
        for ch in range(nch):
            alloc[ch][sb] = a
    nlevels = (1 << bits) - 1
    jscf = [_pick_scalefactor(jpeaks[sb]) for sb in range(32)]
    scf = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            if sb >= bound:
                scf[ch][sb] = _joint_scf(peaks[ch][sb], jpeaks[sb], jscf[sb])
            else:
                scf[ch][sb] = _pick_scalefactor(peaks[ch][sb])
    # ISO field order: subband-major, channel-minor (mirrors the decoder)
    for sb in range(32):
        if sb >= bound:
            w.write(alloc[0][sb], 4)
        else:
            for ch in range(nch):
                w.write(alloc[ch][sb], 4)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                w.write(scf[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            if sb >= bound:
                if alloc[0][sb]:
                    v = joint[s][sb] / SCALEFACTORS[jscf[sb]]
                    w.write(_quantize(v, nlevels), bits)
                continue
            for ch in range(nch):
                if alloc[ch][sb]:
                    v = grs[ch][s][sb] / SCALEFACTORS[scf[ch][sb]]
                    w.write(_quantize(v, nlevels), bits)
    w.pad_to_byte()
    body = bytes(w.buf)
    idx, frame_len = _pick_frame(1, rate, len(body) + 4)
    rate_idx = {v: k for k, v in SAMPLE_RATES.items()}[rate]
    return _frame_header(1, idx, rate_idx, 0, mode, mode_ext) + body + bytes(
        frame_len - 4 - len(body)
    )


def _encode_layer2_frame(
    grs: list[list[list[float]]], rate: int, bits: int, sblimit: int, mode: int,
    mode_ext: int = 0, bound: int = 32,
) -> bytes:
    nch = len(grs)
    if nch == 1:
        bound = SBLIMIT_II
    bound = min(bound, sblimit)
    table = ALLOC_TABLE_A
    # per subband: the table entry closest to 2^bits - 1 levels
    # (same allocation for both channels — fixture simplicity)
    want = (1 << bits) - 1
    alloc_idx, nlevels = [], []
    for sb in range(sblimit):
        steps = table[sb]
        best = min(range(1, len(steps)), key=lambda i: abs(steps[i] - want))
        alloc_idx.append(best)
        nlevels.append(steps[best])
    joint = [
        [sum(gr[g][sb] for gr in grs) / nch for sb in range(32)]
        for g in range(len(grs[0]))
    ]
    w = _BitWriter()
    # ISO field order: subband-major, channel-minor (mirrors the decoder)
    for sb in range(SBLIMIT_II):
        if sb >= bound:
            w.write(alloc_idx[sb] if sb < sblimit else 0, _nbal(table[sb]))
        else:
            for ch in range(nch):
                w.write(alloc_idx[sb] if sb < sblimit else 0, _nbal(table[sb]))
    scf = [[None] * sblimit for _ in range(nch)]
    jscf = [[0, 0, 0] for _ in range(sblimit)]
    for sb in range(sblimit):
        jpeaks = [
            max(abs(joint[g][sb]) for g in range(12 * blk, 12 * blk + 12))
            for blk in range(3)
        ]
        jscf[sb] = [_pick_scalefactor(p) for p in jpeaks]
        for ch in range(nch):
            per_block = []
            for blk in range(3):
                peak = max(
                    abs(grs[ch][g][sb]) for g in range(12 * blk, 12 * blk + 12)
                )
                if sb >= bound:
                    per_block.append(
                        _joint_scf(peak, jpeaks[blk], jscf[sb][blk])
                    )
                else:
                    per_block.append(_pick_scalefactor(peak))
            scf[ch][sb] = per_block

    def _scfsi(pb: list[int]) -> int:
        # ISO scalefactor sharing: equal neighbors transmit once —
        # 2 = all three equal (1 field), 1 = first two equal (2),
        # 3 = last two equal (2), 0 = all distinct (3). Values are
        # preserved exactly, so decode output is identical to scfsi=0
        # coding — only the frame shrinks.
        a, b, c = pb
        if a == b == c:
            return 2
        if a == b:
            return 1
        if b == c:
            return 3
        return 0

    for sb in range(sblimit):
        for ch in range(nch):
            w.write(_scfsi(scf[ch][sb]), 2)
    for sb in range(sblimit):
        for ch in range(nch):
            a, b, c = scf[ch][sb]
            si = _scfsi(scf[ch][sb])
            if si == 0:
                w.write(a, 6); w.write(b, 6); w.write(c, 6)
            elif si == 2:
                w.write(a, 6)
            else:  # 1 or 3: (first, last) — decoder rebuilds the middle
                w.write(a, 6); w.write(c, 6)
    for g in range(12):
        for sb in range(sblimit):
            L = nlevels[sb]
            c_, d_, nbits, grouped = QUANT_CLASSES[L]
            if sb >= bound:
                sf = SCALEFACTORS[jscf[sb][g // 4]]
                codes = [
                    _quantize(joint[3 * g + t][sb] / sf, L) for t in range(3)
                ]
                if grouped:
                    w.write(codes[0] + L * codes[1] + L * L * codes[2], nbits)
                else:
                    for c in codes:
                        w.write(c, nbits)
                continue
            for ch in range(nch):
                sf = SCALEFACTORS[scf[ch][sb][g // 4]]
                codes = [
                    _quantize(grs[ch][3 * g + t][sb] / sf, L) for t in range(3)
                ]
                if grouped:
                    w.write(codes[0] + L * codes[1] + L * L * codes[2], nbits)
                else:
                    for c in codes:
                        w.write(c, nbits)
    w.pad_to_byte()
    body = bytes(w.buf)
    idx, frame_len = _pick_frame(2, rate, len(body) + 4)
    rate_idx = {v: k for k, v in SAMPLE_RATES.items()}[rate]
    return _frame_header(2, idx, rate_idx, 0, mode, mode_ext) + body + bytes(
        frame_len - 4 - len(body)
    )
