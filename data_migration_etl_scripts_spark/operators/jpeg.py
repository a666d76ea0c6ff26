"""Pure-stdlib baseline JPEG (SOF0) codec.

Closes the last stdlib-feasible plug point in the multimodal column
kernels (reference parity target: opaque binary media columns,
``/root/reference``'s pipelines never decode media at all — this is
part of the LLM-data addendum). Same pattern as the shipped
PNG/GIF/BMP/WAV codecs in ``multimodal.py``: decode runs inside
Arrow-batched ``mapInPandas`` kernels, one image in memory at a time.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr,
any sampling factors (4:4:4, 4:2:2, 4:2:0 — chroma upsampled by pixel
replication), restart markers, byte stuffing. Progressive (SOF2),
arithmetic coding, and 12-bit stay NotImplementedError.

Encoder: minimal but standards-valid — Annex-K quantization tables
(quality-scaled, libjpeg formula) and fixed Huffman tables written
into DQT/DHT, 4:4:4 or 4:2:0. It exists so tests can round-trip
(decode(encode(img)) ~ img within DCT loss); the decoder reads tables
from the stream, so it decodes foreign baseline JPEGs too.
"""

from __future__ import annotations

import math
import struct

#: zigzag position -> row-major index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K base quantization tables (row-major)
_Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: standard Huffman table specs: (bits[1..16], values). The decoder
#: never uses these (it parses DHT from the stream); the encoder
#: writes them, so encode/decode agree by construction.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: separable (I)DCT basis: _CT[v][x] = 0.5 * C(v) * cos((2x+1) v pi / 16)
_CT = [
    [
        0.5 * (1 / math.sqrt(2) if v == 0 else 1.0)
        * math.cos((2 * x + 1) * v * math.pi / 16)
        for x in range(8)
    ]
    for v in range(8)
]


def _idct2(block: list[float]) -> list[float]:
    """8x8 inverse DCT (row-major in, row-major out)."""
    g = [0.0] * 64
    for u in range(8):
        base = u * 8
        row = block[base : base + 8]
        for x in range(8):
            g[base + x] = sum(row[v] * _CT[v][x] for v in range(8))
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            out[y * 8 + x] = sum(g[u * 8 + x] * _CT[u][y] for u in range(8))
    return out


def _fdct2(block: list[float]) -> list[float]:
    """8x8 forward DCT (row-major in, row-major out)."""
    g = [0.0] * 64
    for v in range(8):
        for x in range(8):
            g[v * 8 + x] = sum(
                block[y * 8 + x] * _CT[v][y] for y in range(8)
            )
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            out[v * 8 + u] = sum(g[v * 8 + x] * _CT[u][x] for x in range(8))
    return out


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * scale + 50) // 100)) for q in base]


class _BitReader:
    """Entropy-coded-segment bit reader: 0xFF00 unstuffing, restart
    markers surfaced via ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("JPEG bit stream ran into a restart marker")
            else:
                # entropy data exhausted (EOI or next segment): pad with
                # 1-bits, the standard's fill convention
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, reset bit state."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and (
            d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7)
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical Huffman."""
    if len(bits) != 16 or sum(bits) > len(values):
        raise ValueError("truncated JPEG Huffman table")
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_decode(b: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Baseline JPEG bytes -> (width, height, top-down (r, g, b) rows)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan_pos = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos + 2 < len(b) and b[pos + 1] == 0xFF:
            pos += 1  # legal 0xFF fill bytes before a marker
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    tab = [
                        struct.unpack_from(">H", seg, i + 2 * j)[0]
                        for j in range(64)
                    ]
                    i += 128
                else:
                    tab = list(seg[i : i + 64])
                    i += 64
                if len(tab) != 64:
                    raise ValueError("truncated JPEG quantization table")
                qt[tid] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (baseline)
            prec, height, width, n_comp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            if n_comp not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) baseline streams would
                # otherwise silently decode comps[0:3] as YCbCr and
                # produce garbage pixels — keep the documented seam.
                raise NotImplementedError(
                    f"{n_comp}-component JPEG (CMYK/YCCK) needs PIL — only "
                    "grayscale and 3-component YCbCr decode here"
                )
            comps = []
            for c in range(n_comp):
                cid, hv, qid = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "q": qid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended JPEG needs PIL — only baseline SOF0/1 "
                "decodes here"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tids = struct.unpack_from(">BB", seg, 1 + 2 * c)
                sel[cid] = (tids >> 4, tids & 15)
            for comp in comps:
                comp["dc"], comp["ac"] = sel[comp["id"]]
            scan_pos = pos
            break
    if scan_pos is None or not comps:
        raise ValueError("JPEG has no scan data")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["w"] = mcux * c["h"] * 8
        c["rows"] = mcuy * c["v"] * 8
        c["plane"] = bytearray(c["w"] * c["rows"])
        c["pred"] = 0

    r = _BitReader(b, scan_pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                quant = qt[c["q"]]
                dc_tab = huff[(0, c["dc"])]
                ac_tab = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = [0.0] * 64
                        t = _huff_decode(r, dc_tab)
                        diff = _extend(r.read(t), t) if t else 0
                        c["pred"] += diff
                        coeff[0] = c["pred"] * quant[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tab)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coeff[ZIGZAG[k]] = (
                                _extend(r.read(size), size) * quant[k]
                            )
                            k += 1
                        px = _idct2(coeff)
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane, pw = c["plane"], c["w"]
                        for y in range(8):
                            base = (oy + y) * pw + ox
                            for x in range(8):
                                v = int(px[y * 8 + x] + 128.5)
                                plane[base + x] = 0 if v < 0 else (
                                    255 if v > 255 else v
                                )

    rows: list[list[tuple[int, int, int]]] = []
    if len(comps) == 1:
        c = comps[0]
        for y in range(height):
            base = y * c["w"]
            rows.append(
                [(c["plane"][base + x],) * 3 for x in range(width)]
            )
        return width, height, rows
    cy, cb, cr = comps[0], comps[1], comps[2]
    for y in range(height):
        row = []
        # Y gets the same sampling-factor scaling as chroma: a legal
        # stream may have comps[0].v < vmax (subsampled luma)
        yb = (y * cy["v"] // vmax) * cy["w"]
        bb = (y * cb["v"] // vmax) * cb["w"]
        rb = (y * cr["v"] // vmax) * cr["w"]
        for x in range(width):
            Y = cy["plane"][yb + x * cy["h"] // hmax]
            Cb = cb["plane"][bb + x * cb["h"] // hmax] - 128
            Cr = cr["plane"][rb + x * cr["h"] // hmax] - 128
            rr = int(Y + 1.402 * Cr + 0.5)
            gg = int(Y - 0.344136 * Cb - 0.714136 * Cr + 0.5)
            bl = int(Y + 1.772 * Cb + 0.5)
            row.append(
                (
                    0 if rr < 0 else 255 if rr > 255 else rr,
                    0 if gg < 0 else 255 if gg > 255 else gg,
                    0 if bl < 0 else 255 if bl > 255 else bl,
                )
            )
        rows.append(row)
    return width, height, rows


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            byte = (self.acc >> self.nacc) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)  # 1-fill


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length), canonical Huffman."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    w: _BitWriter, block: list[float], quant: list[int],
    dc_tab: dict, ac_tab: dict, pred: int,
) -> int:
    f = _fdct2(block)
    zz = [
        int(round(f[ZIGZAG[k]] / quant[k])) for k in range(64)
    ]
    diff = zz[0] - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            w.put(code, ln)  # ZRL
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]
        w.put(code, ln)  # EOB
    return zz[0]


def _component_blocks(plane: list[list[float]], bx: int, by: int) -> list[float]:
    h = len(plane)
    wdt = len(plane[0])
    out = []
    for y in range(8):
        yy = min(by * 8 + y, h - 1)
        for x in range(8):
            out.append(plane[yy][min(bx * 8 + x, wdt - 1)] - 128.0)
    return out


def jpeg_encode(
    rows: list[list[tuple[int, int, int]]],
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Top-down (r, g, b) rows -> baseline JPEG bytes (4:4:4 or 4:2:0;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    height = len(rows)
    width = len(rows[0])
    # DQT payloads and _encode_block index by ZIGZAG POSITION, so
    # reorder the scaled row-major base tables into zigzag order
    qlum = [x for x in _scaled_quant(_Q_LUM, quality)]
    qchr = [x for x in _scaled_quant(_Q_CHR, quality)]
    qlum = [qlum[ZIGZAG[k]] for k in range(64)]
    qchr = [qchr[ZIGZAG[k]] for k in range(64)]
    # color convert to full-res planes
    yp = [[0.0] * width for _ in range(height)]
    cbp = [[0.0] * width for _ in range(height)]
    crp = [[0.0] * width for _ in range(height)]
    for y, row in enumerate(rows):
        for x, (r, g, b) in enumerate(row):
            yp[y][x] = 0.299 * r + 0.587 * g + 0.114 * b
            cbp[y][x] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            crp[y][x] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsampling == "420":
        h1 = v1 = 2
        cw, ch = (width + 1) // 2, (height + 1) // 2
        cb2 = [[0.0] * cw for _ in range(ch)]
        cr2 = [[0.0] * cw for _ in range(ch)]
        for y in range(ch):
            for x in range(cw):
                pts = [
                    (min(2 * y + dy, height - 1), min(2 * x + dx, width - 1))
                    for dy in (0, 1) for dx in (0, 1)
                ]
                cb2[y][x] = sum(cbp[a][b_] for a, b_ in pts) / 4
                cr2[y][x] = sum(crp[a][b_] for a, b_ in pts) / 4
        cbp, crp = cb2, cr2
    else:
        h1 = v1 = 1

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    zz_lum = bytes(qlum[k] for k in range(64))
    zz_chr = bytes(qchr[k] for k in range(64))
    segment(0xDB, b"\x00" + zz_lum)
    segment(0xDB, b"\x01" + zz_chr)
    segment(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + struct.pack(">BBB", 1, (h1 << 4) | v1, 0)
        + struct.pack(">BBB", 2, 0x11, 1)
        + struct.pack(">BBB", 3, 0x11, 1),
    )
    for cls, tid, (bits, values) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR),
    ):
        segment(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
        )
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    segment(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")

    dc_l = _build_encode_table(*_DC_LUM)
    ac_l = _build_encode_table(*_AC_LUM)
    dc_c = _build_encode_table(*_DC_CHR)
    ac_c = _build_encode_table(*_AC_CHR)
    w = _BitWriter()
    mcux = (width + 8 * h1 - 1) // (8 * h1)
    mcuy = (height + 8 * v1 - 1) // (8 * v1)
    py = pcb = pcr = 0
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.flush()
                out.extend(w.out)
                w = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                py = pcb = pcr = 0
            n_mcu += 1
            for by in range(v1):
                for bx in range(h1):
                    py = _encode_block(
                        w,
                        _component_blocks(yp, mx * h1 + bx, my * v1 + by),
                        qlum, dc_l, ac_l, py,
                    )
            pcb = _encode_block(
                w, _component_blocks(cbp, mx, my), qchr, dc_c, ac_c, pcb
            )
            pcr = _encode_block(
                w, _component_blocks(crp, mx, my), qchr, dc_c, ac_c, pcr
            )
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
