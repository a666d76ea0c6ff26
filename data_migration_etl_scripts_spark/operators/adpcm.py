"""IMA/DVI ADPCM codec (WAV format tag 0x11) — pure stdlib.

The most common compressed-WAV variant in crawl corpora (4 bits per
sample, 4:1 vs 16-bit PCM). Decoder handles mono and stereo block
layouts (per-channel 4-byte block headers, stereo nibbles interleaved
in 4-byte channel groups), any BlockAlign, and the final short block.
Encoder writes spec block layout so every decode path round-trips.

The quantizer is the IMA reference algorithm: 89-entry step table,
3-bit magnitude + sign nibbles, index adaptation [-1,-1,-1,-1,2,4,6,8].
Lossy by design — tests pin reconstruction SNR (> 25 dB on tones)
rather than bit equality, plus exact decode of hand-built nibble
streams for the arithmetic itself.

Engine integration: `multimodal.wav_decode` routes format-17 RIFF
files here (stdlib ``wave`` rejects them), so ADPCM WAVs flow through
audio features, resampling, spectral fingerprints, and mel/MFCC
unchanged. Same embarrassingly-parallel per-row kernel shape as the
other codecs — nothing crosses rows, so 100 TB of clips scan flat.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(v: int) -> int:
    return 0 if v < 0 else (88 if v > 88 else v)


def decode_nibble(n: int, pred: int, index: int) -> tuple[int, int]:
    """One 4-bit code -> (new predictor, new step index). The IMA
    reference reconstruction: diff = (step * magnitude) / 4 + step / 8
    computed with shifts, sign in bit 3."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        diff = -diff
    return _clamp16(pred + diff), _clamp_idx(index + INDEX_TABLE[n & 7])


def encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One 16-bit sample -> (nibble, new predictor, new index); the
    encoder runs the decoder's reconstruction so state never drifts."""
    step = STEP_TABLE[index]
    diff = sample - pred
    n = 0
    if diff < 0:
        n = 8
        diff = -diff
    if diff >= step:
        n |= 4
        diff -= step
    if diff >= step >> 1:
        n |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        n |= 1
    new_pred, new_index = decode_nibble(n, pred, index)
    return n, new_pred, new_index


def _decode_block(
    block: bytes, nch: int
) -> list[list[int]]:
    """One ADPCM block -> per-channel int16 sample lists."""
    chans: list[list[int]] = []
    preds: list[int] = []
    idxs: list[int] = []
    for c in range(nch):
        pred = struct.unpack_from("<h", block, c * 4)[0]
        idx = block[c * 4 + 2]
        preds.append(pred)
        idxs.append(_clamp_idx(idx))
        chans.append([pred])  # header predictor IS sample 0
    data = block[4 * nch:]
    if nch == 1:
        pred, idx = preds[0], idxs[0]
        for byte in data:
            for nib in (byte & 0xF, byte >> 4):
                pred, idx = decode_nibble(nib, pred, idx)
                chans[0].append(pred)
        return chans
    # stereo: alternating 4-byte groups per channel (8 samples each)
    pos = 0
    while pos + 4 * nch <= len(data):
        for c in range(nch):
            group = data[pos + 4 * c : pos + 4 * c + 4]
            pred, idx = preds[c], idxs[c]
            for byte in group:
                for nib in (byte & 0xF, byte >> 4):
                    pred, idx = decode_nibble(nib, pred, idx)
                    chans[c].append(pred)
            preds[c], idxs[c] = pred, idx
        pos += 4 * nch
    return chans


def adpcm_wav_decode(b: bytes) -> tuple[int, int, list[float]]:
    """IMA-ADPCM WAV bytes -> (rate, nch, mono samples in [-1, 1]).
    Raises ValueError if not RIFF/WAVE format 0x11."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact = int.from_bytes(body[:4], "little")
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    code, nch, rate, _br, block_align = struct.unpack_from("<HHIIH", fmt)
    if code != 0x11:
        raise ValueError(f"not IMA ADPCM (fmt tag {code})")
    mono: list[float] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4 * nch:
            break
        chans = _decode_block(block, nch)
        n = min(len(c) for c in chans)
        for i in range(n):
            mono.append(sum(ch[i] for ch in chans) / (nch * 32768.0))
    if fact is not None:
        mono = mono[:fact]  # true length: compressed WAVs carry a fact chunk
    return rate, nch, mono


def adpcm_wav_encode(
    channels: list[list[int]], rate: int = 8000, samples_per_block: int = 505
) -> bytes:
    """Per-channel int16 samples -> IMA-ADPCM WAV bytes. Spec block
    layout: sample 0 rides the block header verbatim; each block
    restarts from the running codec state (standard encoder
    behavior, so blocks decode independently)."""
    nch = len(channels)
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    n = min(len(c) for c in channels)
    # (samples_per_block - 1) nibbles per channel; stereo groups need
    # multiples of 8 samples per group
    spb = samples_per_block
    if (spb - 1) % 8 and nch == 2:
        spb = 1 + 8 * ((spb - 1) // 8)
    block_align = 4 * nch + ((spb - 1) * nch + 1) // 2
    preds = [0] * nch
    idxs = [0] * nch
    blocks = bytearray()
    pos = 0
    while pos < n:
        take = min(spb, n - pos)
        for c in range(nch):
            preds[c] = _clamp16(channels[c][pos])
            blocks += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(nch)]
        for c in range(nch):
            pred, idx = preds[c], idxs[c]
            for i in range(pos + 1, pos + take):
                nb, pred, idx = encode_sample(
                    _clamp16(channels[c][i]), pred, idx
                )
                nibs[c].append(nb)
            # pad the block's nibble budget with repeats of silence
            while len(nibs[c]) < spb - 1:
                nb, pred, idx = encode_sample(pred, pred, idx)
                nibs[c].append(nb)
            preds[c], idxs[c] = pred, idx
        if nch == 1:
            seq = nibs[0]
            for i in range(0, len(seq), 2):
                lo = seq[i]
                hi = seq[i + 1] if i + 1 < len(seq) else 0
                blocks.append(lo | (hi << 4))
        else:
            for g in range(0, spb - 1, 8):
                for c in range(nch):
                    seq = nibs[c][g : g + 8]
                    for i in range(0, 8, 2):
                        blocks.append(seq[i] | (seq[i + 1] << 4))
        pos += take
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, nch, rate,
        rate * block_align // spb,  # nominal byte rate
        block_align, 4, 2, spb,     # bits/sample 4, cbSize 2, samples/block
    )
    out = bytearray()
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, n)  # true per-channel length
    out += b"data" + struct.pack("<I", len(blocks)) + blocks
    return b"RIFF" + struct.pack("<I", len(out)) + bytes(out)


# ------------------------------------------- G.711 companding (r6)
#
# WAV format tags 6 (A-law) and 7 (mu-law): 8-bit companded telephony
# audio, decoded by the ITU-T G.711 expansion formulas. Formula-derived
# (sign | exponent | mantissa fields), no tables to transcribe.


def mulaw_decode_sample(b: int) -> int:
    """One mu-law byte -> linear int16 (G.711: bias 0x84, 3-bit
    exponent, 4-bit mantissa, bitwise-inverted on the wire)."""
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return -mag if sign else mag


def alaw_decode_sample(b: int) -> int:
    """One A-law byte -> linear int16 (G.711: even bits inverted on
    the wire, 12-bit magnitude, exponent 0 is linear; the A-law sign
    bit SET means POSITIVE — opposite of mu-law's post-complement
    convention)."""
    b ^= 0x55
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    if exp == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (exp - 1)
    return mag if sign else -mag


def g711_wav_decode(b: bytes) -> tuple[int, int, list[float]]:
    """G.711 WAV bytes (fmt tag 6 or 7) -> (rate, nch, mono [-1, 1])."""
    import struct as _s

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    code, nch, rate = _s.unpack_from("<HHI", fmt)
    if code not in (6, 7):
        raise ValueError(f"not G.711 (fmt tag {code})")
    dec = alaw_decode_sample if code == 6 else mulaw_decode_sample
    lut = [dec(i) / 32768.0 for i in range(256)]
    vals = [lut[x] for x in data]
    mono = [sum(vals[i:i + nch]) / nch for i in range(0, len(vals) - nch + 1, nch)]
    return rate, nch, mono


def g711_wav_encode(
    samples: list[int], rate: int = 8000, law: str = "mulaw"
) -> bytes:
    """int16 mono samples -> G.711 WAV (search-based compander: each
    sample maps to the code whose expansion is nearest — exact inverse
    of the decode LUT, so round-trips are optimal-quantizer)."""
    import struct as _s

    dec = alaw_decode_sample if law == "alaw" else mulaw_decode_sample
    code_id = 6 if law == "alaw" else 7
    lut = sorted((dec(c), c) for c in range(256))
    import bisect

    keys = [v for v, _ in lut]

    def nearest(s: int) -> int:
        i = bisect.bisect_left(keys, s)
        best = min(
            (abs(keys[j] - s), lut[j][1])
            for j in (max(0, i - 1), min(i, 255))
        )
        return best[1]

    payload = bytes(nearest(max(-32768, min(32767, s))) for s in samples)
    fmt = _s.pack("<HHIIHH", code_id, 1, rate, rate, 1, 8)
    out = bytearray(b"WAVE")
    out += b"fmt " + _s.pack("<I", len(fmt)) + fmt
    out += b"fact" + _s.pack("<II", 4, len(samples))
    out += b"data" + _s.pack("<I", len(payload)) + payload
    return b"RIFF" + _s.pack("<I", len(out)) + bytes(out)
