"""CCITT Group 4 (ITU-T T.6, 2-D MMR) + Group 3 (T.4) bilevel codecs
— the TIFF Compression=4/3/2 codings every scanned-document corpus
hits.

r9 adds Group 3 (TIFF Compression 3): EOL-framed rows (eleven 0s + 1,
fill-bit tolerant, optional byte alignment per T4Options bit 2),
pure 1-D MH rows, and the 2-D option (T4Options bit 0: a mode bit
after each EOL; 2-D rows reuse the same T.6 coding loop against the
previous row). G3 always needs the injected T.4 codebooks — the
first row of a page is 1-D by construction.

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (decode of scanned-
document TIFFs at corpus scale, `operators/tiff.py` dispatches here).

What is STRUCTURAL here (public T.6 coding structure):
  - the 2-D mode coding loop: changing elements a0/a1/a2 on the
    coding line, b1/b2 on the reference line (first row references an
    imaginary all-white line), pass / horizontal / vertical(+-3)
    modes, row-by-row with no EOL codes (G4), optional EOFB ignored
  - the 9 mode codewords (V0 '1', VR1 '011', VL1 '010', H '001',
    P '0001', VR2 '000011', VL2 '000010', VR3 '0000011',
    VL3 '0000010') — the tiny structural alphabet of T.4 2-D/T.6,
    kept as engine data like the scalefactor grids in mpeg_layer3.py
  - MSB-first bit order (TIFF FillOrder 1), rows byte-UNaligned
    within a strip (G4 packs rows back to back)

What is a DATA SEAM (the repo's Annex-B policy: large tabulated spec
constants are never reproduced from memory):
  - the T.4 modified-Huffman run-length codebooks used by HORIZONTAL
    mode (terminating codes 0-63 + makeup codes 64..2560, per color —
    ~200 tabulated entries). ``T4_WHITE`` / ``T4_BLACK`` ship empty;
    ``load_t4_tables(path_or_dict)`` injects them from a validated
    JSON file and ``$SPARK_GRAFT_T4_TABLES`` auto-loads on the first
    decode that needs one — the same loader pattern as the MP3
    Huffman seam (mpeg_layer3.load_huffman_tables).

Consequence of the seam: VERTICAL and PASS modes decode and encode
with zero injected data, but any image whose first row is non-blank
(or whose runs move more than +-3 per row) REQUIRES horizontal mode,
so real scanned pages need the injected tables. The synthetic-table
tests prove the full H-mode machinery (makeup+terminating composition
both colors); a gated test exercises real user-provided tables.

Engine encode/decode are exact inverses on their whole domain (any
bilevel image, given tables for the H-modes it needs); a
vertical/pass-only subset (blank first row, +-3 drift) round-trips
with the seam EMPTY, which is what the always-on tests pin.
"""

from __future__ import annotations

__all__ = [
    "g4_encode", "g4_decode", "g4_decode_packed",
    "g3_encode", "g3_decode", "g3_decode_packed",
    "mh_encode", "mh_decode", "mh_decode_packed", "load_t4_tables",
]

#: T.6 / T.4-2D mode codewords (bit-length, value), MSB-first.
_MODES = {
    "V0": (1, 0b1),
    "VR1": (3, 0b011),
    "VL1": (3, 0b010),
    "H": (3, 0b001),
    "P": (4, 0b0001),
    "VR2": (6, 0b000011),
    "VL2": (6, 0b000010),
    "VR3": (7, 0b0000011),
    "VL3": (7, 0b0000010),
}
_V_BY_DELTA = {0: "V0", 1: "VR1", -1: "VL1", 2: "VR2", -2: "VL2",
               3: "VR3", -3: "VL3"}

#: T.4 modified-Huffman run-length codebooks: run -> (bit-length,
#: code). Terminating runs 0..63 plus makeup runs (multiples of 64).
#: Annex-B DATA SEAM — empty until load_t4_tables() injects them.
T4_WHITE: dict[int, tuple[int, int]] = {}
T4_BLACK: dict[int, tuple[int, int]] = {}

#: inverted decode dicts (length, code) -> run, rebuilt by
#: load_t4_tables — cached once so decode is O(1) per symbol rather
#: than re-inverting the codebook per run (real scanned pages decode
#: millions of runs)
_T4_WHITE_DEC: dict[tuple[int, int], int] = {}
_T4_BLACK_DEC: dict[tuple[int, int], int] = {}

#: inverted mode lookup (length, code) -> mode name, built once
_MODES_DEC = {v: k for k, v in _MODES.items()}

_TABLES_ENV = "SPARK_GRAFT_T4_TABLES"
_env_load_done = False


def _check_prefix_free(codes: list[tuple[int, int]]) -> None:
    by_len: dict[int, set[int]] = {}
    for hlen, code in codes:
        by_len.setdefault(hlen, set()).add(code)
    for hlen, code in codes:
        for l2, cs in by_len.items():
            if l2 < hlen and (code >> (hlen - l2)) in cs:
                raise ValueError(
                    f"T.4 codebook not prefix-free: ({hlen}, {code:#b})"
                )


def load_t4_tables(source) -> int:
    """Inject the T.4 run-length codebooks (Annex-B seam) from a dict
    or a JSON file shaped::

        {"white": [[run, hlen, code], ...],
         "black": [[run, hlen, code], ...]}

    with terminating runs 0-63 and makeup runs as multiples of 64.
    Validates widths and prefix-freeness per color; returns the number
    of entries loaded. ``$SPARK_GRAFT_T4_TABLES=/path/tables.json`` is
    the no-code-change route: the decoder auto-loads it on the first
    horizontal-mode code it meets."""
    import json

    if isinstance(source, (str, bytes)):
        with open(source) as fh:
            source = json.load(fh)
    n = 0
    for key, table in (("white", T4_WHITE), ("black", T4_BLACK)):
        entries = source.get(key) or []
        book: dict[int, tuple[int, int]] = {}
        for run, hlen, code in entries:
            if not (0 <= run <= 63 or (run % 64 == 0 and run <= 2560)):
                raise ValueError(f"{key}: bad run length {run}")
            if not (1 <= hlen <= 14 and 0 <= code < (1 << hlen)):
                raise ValueError(f"{key}: bad code ({hlen}, {code})")
            book[run] = (hlen, code)
        if book:
            _check_prefix_free(list(book.values()))
            table.clear()
            table.update(book)
            dec = _T4_BLACK_DEC if key == "black" else _T4_WHITE_DEC
            dec.clear()
            dec.update({v: k for k, v in book.items()})
            n += len(book)
    return n


def _try_env_tables() -> bool:
    global _env_load_done
    if _env_load_done:
        return False
    import os

    path = os.environ.get(_TABLES_ENV)
    if not (path and os.path.exists(path)):
        # do NOT latch: an env var set after a first failed decode in
        # a long-lived process must still take effect
        return False
    load_t4_tables(path)
    _env_load_done = True
    return True


# ------------------------------------------------------------ bit io

class _W:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, hlen: int) -> None:
        self.acc = (self.acc << hlen) | code
        self.n += hlen
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.buf)


class _R:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read1(self) -> int:
        if self.pos >= 8 * len(self.data):
            raise ValueError("G4 stream exhausted mid-row")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b


# ----------------------------------------------------------- helpers

def _transitions(row: list[int]) -> list[int]:
    """Positions where the color changes, starting from white."""
    out = []
    prev = 0
    for x, v in enumerate(row):
        if v != prev:
            out.append(x)
            prev = v
    return out


def _b1_b2(ref: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """b1: first reference changing element > a0 with the opposite
    color of a0's run (an even-index transition when coding white,
    odd when coding black); b2: the next one after b1."""
    import bisect

    i = bisect.bisect_right(ref, a0)
    if i % 2 != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def _mh_tables_for(color: int) -> dict[int, tuple[int, int]]:
    table = T4_BLACK if color else T4_WHITE
    if not table:
        _try_env_tables()
        table = T4_BLACK if color else T4_WHITE
    if not table:
        raise NotImplementedError(
            "horizontal mode needs the T.4 run-length codebooks — "
            "Annex-B data; load_t4_tables(path) or $SPARK_GRAFT_T4_TABLES "
            "injects them (module docstring seam note)"
        )
    return table


# ------------------------------------------------------------ encode

def _emit_run(w: _W, run: int, color: int) -> None:
    table = _mh_tables_for(color)
    while run >= 64:
        makeups = [r for r in table if r >= 64 and r <= run]
        if not makeups:
            raise ValueError(f"no makeup code covers run {run}")
        m = max(makeups)
        hlen, code = table[m]
        w.write(code, hlen)
        run -= m
    if run not in table:
        raise ValueError(f"terminating code for run {run} missing")
    hlen, code = table[run]
    w.write(code, hlen)


def _encode_row_2d(w: _W, cur: list[int], ref: list[int],
                   width: int) -> None:
    """One 2-D (T.4/T.6) coded row: cur/ref are transition lists."""
    import bisect

    a0, color = -1, 0
    while True:
        b1, b2 = _b1_b2(ref, a0, color, width)
        i = bisect.bisect_right(cur, a0)
        if i % 2 != color:
            i += 1
        a1 = cur[i] if i < len(cur) else width
        if b2 < a1:
            hlen, code = _MODES["P"]
            w.write(code, hlen)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            hlen, code = _MODES[_V_BY_DELTA[a1 - b1]]
            w.write(code, hlen)
            a0 = a1
            color ^= 1
        else:
            a2 = cur[i + 1] if i + 1 < len(cur) else width
            hlen, code = _MODES["H"]
            w.write(code, hlen)
            start = max(a0, 0)
            _emit_run(w, a1 - start, color)
            _emit_run(w, a2 - a1, color ^ 1)
            a0 = a2
        if a0 >= width:
            break


def g4_encode(rows: list[list[int]], width: int | None = None) -> bytes:
    """Bilevel rows (0 = white, 1 = black) -> T.6 bytes (no EOFB;
    TIFF strips carry row counts externally). Uses vertical/pass modes
    wherever T.6 allows; horizontal mode requires the injected T.4
    tables and raises the seam error without them."""
    if not rows:
        return b""
    width = width if width is not None else len(rows[0])
    w = _W()
    ref: list[int] = []  # imaginary all-white reference line
    for row in rows:
        cur = _transitions(row)
        _encode_row_2d(w, cur, ref, width)
        ref = cur
    return w.done()


# ------------------------------------------------------------ decode

def _read_mode(r: _R) -> str:
    """Walk the structural mode tree bit by bit."""
    code, hlen = 0, 0
    while hlen < 8:
        code = (code << 1) | r.read1()
        hlen += 1
        hit = _MODES_DEC.get((hlen, code))
        if hit is not None:
            return hit
    raise ValueError("corrupt G4 stream: no mode code within 8 bits")


def _mh_decode_table_for(color: int) -> dict[tuple[int, int], int]:
    table = _mh_tables_for(color)  # raises the seam error when empty
    dec = _T4_BLACK_DEC if color else _T4_WHITE_DEC
    if len(dec) != len(table):  # direct-mutation skew (tests) — rebuild
        dec.clear()
        dec.update({v: k for k, v in table.items()})
    return dec


def _read_run(r: _R, color: int) -> int:
    decode = _mh_decode_table_for(color)
    total = 0
    while True:
        code, hlen = 0, 0
        while hlen < 14:
            code = (code << 1) | r.read1()
            hlen += 1
            run = decode.get((hlen, code))
            if run is not None:
                break
        else:
            raise ValueError("corrupt G4 stream: no T.4 code within 14 bits")
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _decode_row_2d(r: _R, ref: list[int], width: int) -> list[int]:
    """Decode one 2-D coded row against the reference transitions."""
    row = [0] * width
    a0, color = -1, 0
    while True:
        b1, b2 = _b1_b2(ref, a0, color, width)
        mode = _read_mode(r)
        start = max(a0, 0)
        if mode == "P":
            for x in range(start, min(b2, width)):
                row[x] = color
            a0 = b2
        elif mode == "H":
            r1 = _read_run(r, color)
            r2 = _read_run(r, color ^ 1)
            a1 = start + r1
            a2 = a1 + r2
            for x in range(start, min(a1, width)):
                row[x] = color
            for x in range(a1, min(a2, width)):
                row[x] = color ^ 1
            a0 = a2
        else:  # vertical family
            d = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                 "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + d
            for x in range(start, min(a1, width)):
                row[x] = color
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    return row


def g4_decode(data: bytes, width: int, height: int) -> list[list[int]]:
    """T.6 bytes -> bilevel rows (0 = white, 1 = black)."""
    r = _R(data)
    out: list[list[int]] = []
    ref: list[int] = []
    for _y in range(height):
        row = _decode_row_2d(r, ref, width)
        out.append(row)
        ref = _transitions(row)
    return out


# --------------------------------------------------- G3 (T.4, r9)

def _write_eol(w: _W, align: bool, extra: int = 0) -> None:
    """EOL = eleven 0s + 1; ``align=True`` (T4Options fill bits) pads
    with extra 0s so the EOL (+ the 2-D mode bit when ``extra=1``)
    ends on a byte boundary."""
    if align:
        pos = 8 * len(w.buf) + w.n
        pad = (-(pos + 12 + extra)) % 8
        if pad:
            w.write(0, pad)
    w.write(1, 12)


def _read_eol(r: _R) -> None:
    """Consume fill zeros + one EOL (>= 11 zeros then a 1)."""
    zeros = 0
    while True:
        b = r.read1()
        if b:
            if zeros < 11:
                raise ValueError(
                    f"G3: expected EOL, got a 1 after {zeros} zeros"
                )
            return
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError("G3: runaway fill before EOL")


def g3_encode(rows: list[list[int]], width: int | None = None,
              two_d: bool = False, fill: bool = False) -> bytes:
    """TIFF Compression 3 (CCITT T.4 / Group 3): every row is
    preceded by an EOL; ``two_d=True`` (T4Options bit 0) adds the
    1-D/2-D mode bit after each EOL and codes rows after the first
    2-D against the previous row; ``fill=True`` (T4Options bit 2)
    byte-aligns each EOL. 1-D rows are T.4 MH runs, so the injected
    codebooks are required (G3 has no table-free subset — the first
    row is always 1-D)."""
    if not rows:
        return b""
    width = width if width is not None else len(rows[0])
    w = _W()
    ref: list[int] = []
    for y, row in enumerate(rows):
        _write_eol(w, fill, extra=1 if two_d else 0)
        cur = _transitions(row)
        if two_d:
            one_d = y == 0
            w.write(1 if one_d else 0, 1)
        else:
            one_d = True
        if one_d:
            x, color = 0, 0
            while x < width:
                run = 0
                while x + run < width and row[x + run] == color:
                    run += 1
                _emit_run(w, run, color)
                x += run
                color ^= 1
        else:
            _encode_row_2d(w, cur, ref, width)
        ref = cur
    return w.done()


def g3_decode(data: bytes, width: int, height: int,
              two_d: bool = False) -> list[list[int]]:
    """TIFF Compression 3 bytes -> bilevel rows (EOL-framed 1-D MH,
    or mixed 1-D/2-D when T4Options bit 0 is set)."""
    r = _R(data)
    out: list[list[int]] = []
    ref: list[int] = []
    for _y in range(height):
        _read_eol(r)
        one_d = True
        if two_d:
            one_d = bool(r.read1())
        if one_d:
            row = [0] * width
            x, color = 0, 0
            while x < width:
                run = _read_run(r, color)
                for i in range(x, min(x + run, width)):
                    row[i] = color
                x += run
                color ^= 1
        else:
            row = _decode_row_2d(r, ref, width)
        out.append(row)
        ref = _transitions(row)
    return out


def g3_decode_packed(data: bytes, width: int, height: int,
                     two_d: bool = False) -> bytes:
    rows = g3_decode(data, width, height, two_d=two_d)
    row_bytes = (width + 7) // 8
    out = bytearray(row_bytes * height)
    for y, row in enumerate(rows):
        base = y * row_bytes
        for x, v in enumerate(row):
            if v:
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)


def mh_encode(rows: list[list[int]], width: int | None = None) -> bytes:
    """TIFF Compression 2 (CCITT 1-D modified-Huffman RLE): each row
    is alternating white/black run lengths from the T.4 codebooks
    (starting white; a leading black pixel codes a zero-length white
    run), and every row starts on a byte boundary per the TIFF spec.
    Needs the injected T.4 tables for EVERY row — this coding has no
    table-free subset."""
    if not rows:
        return b""
    width = width if width is not None else len(rows[0])
    out = bytearray()
    for row in rows:
        w = _W()
        x, color = 0, 0
        while x < width:
            run = 0
            while x + run < width and row[x + run] == color:
                run += 1
            _emit_run(w, run, color)
            x += run
            color ^= 1
        out += w.done()
    return bytes(out)


def mh_decode(data: bytes, width: int, height: int) -> list[list[int]]:
    """TIFF Compression 2 bytes -> bilevel rows."""
    out: list[list[int]] = []
    r = _R(data)
    for _y in range(height):
        r.pos = (r.pos + 7) & ~7  # rows are byte-aligned
        row = [0] * width
        x, color = 0, 0
        while x < width:
            run = _read_run(r, color)
            for i in range(x, min(x + run, width)):
                row[i] = color
            x += run
            color ^= 1
        out.append(row)
    return out


def mh_decode_packed(data: bytes, width: int, height: int) -> bytes:
    rows = mh_decode(data, width, height)
    row_bytes = (width + 7) // 8
    out = bytearray(row_bytes * height)
    for y, row in enumerate(rows):
        base = y * row_bytes
        for x, v in enumerate(row):
            if v:
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)


def g4_decode_packed(data: bytes, width: int, height: int) -> bytes:
    """T.6 bytes -> MSB-first packed bilevel rows, one byte-aligned
    row per scanline (the TIFF strip layout; 1 = black, matching
    PhotometricInterpretation 0 / WhiteIsZero)."""
    rows = g4_decode(data, width, height)
    row_bytes = (width + 7) // 8
    out = bytearray(row_bytes * height)
    for y, row in enumerate(rows):
        base = y * row_bytes
        for x, v in enumerate(row):
            if v:
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)
