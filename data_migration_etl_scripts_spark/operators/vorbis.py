"""Vorbis I audio decode (the Xiph Vorbis I specification, public) —
header-triad and FULL setup parsing plus the silence operating point,
feeding from the r9 Ogg layer (operators/ogg.py packets).

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (.ogg audio in crawls
is Vorbis far more often than FLAC).

Build-vs-seam status — an r9-plan CORRECTION: the round-9 verdict
assumed Vorbis needed a codebook seam like MP3/AAC. It does not:
Vorbis carries ALL codebooks, floor configurations, residue
configurations, mappings and modes IN THE STREAM (the setup header),
so the entire configuration layer here is formula-level parsing of
stream data — codeword lengths -> canonical Huffman assignment per
the spec's incremental algorithm, 32-bit packed floats, lookup-1
integer roots, floor1/residue/mapping/mode syntax — with nothing
recalled from tables. The ONE tabulated spec constant is the
floor1 inverse-dB amplitude table (256 floats, spec section 10.1,
no published closed form), which only nonzero floor curves consult:
it is the declared seam (``load_vorbis_tables`` /
``$SPARK_GRAFT_VORBIS_TABLES``, key ``"floor1_inverse_db"``).

What DECODES end to end (r10): the FULL synthesis pipeline —
floor1 curve decode (neighbor prediction + amplitude fold) and
integer line rendering through the seam dB table, residue types
0/1/2 with partition classwords and VQ value vectors, inverse
square-polar channel coupling (reverse step order), the IMDCT (the
same TDAC cosine kernel as the in-house AAC filterbank), Vorbis
windowing incl. block-switch slope narrowing, and absolute-position
overlap-add with first-packet priming and Ogg final-granule
truncation. Engine operating points: :func:`vorbis_encode_silence`
(all-floors-silent: exact zero PCM, ZERO tables either side — the
I_PCM / AAC-silence discipline) and :func:`vorbis_encode_quantized`
(flat floors + pseudorandom integer residues through real stream
codebooks, mono/stereo, optionally with coupling + residue type 2 —
the encoder replays the synthesis with an INDEPENDENT equal-size lap
implementation, so decode must match float-exactly). Floor type 0
(legacy LSP, r11) decodes too: bark-map bins, the parity-split p/q
cosine products and the amplitude-normalized exponential are all
pure formulas, so floor0 streams — unlike floor1 — need NO seam
table at all (``vorbis_encode_quantized(floor0=True)`` is a fully
table-free operating point).
"""

from __future__ import annotations

import json
import math
import os

__all__ = ["vorbis_decode", "vorbis_decode_packets",
           "vorbis_encode_silence", "vorbis_encode_quantized",
           "parse_vorbis_headers", "load_vorbis_tables", "VORBIS"]

_TABLES_ENV = "SPARK_GRAFT_VORBIS_TABLES"
_env_load_done = False

#: seam storage: "floor1_inverse_db" = 256 floats (spec 10.1)
VORBIS: dict[str, object] = {"floor1_inverse_db": None}


def load_vorbis_tables(source) -> int:
    """Inject the floor1 inverse-dB table (dict/JSON/path with key
    ``"floor1_inverse_db"``: 256 floats)."""
    if isinstance(source, (str, bytes)):
        s = source.decode() if isinstance(source, bytes) else source
        if "{" not in s:
            with open(s, "rb") as f:
                source = json.load(f)
        else:
            source = json.loads(s)
    if not isinstance(source, dict):
        raise ValueError("Vorbis table source must be a dict/JSON")
    loaded = 0
    t = source.get("floor1_inverse_db")
    if t is not None:
        if len(t) != 256:
            raise ValueError("floor1_inverse_db must be 256 values")
        vals = [float(v) for v in t]
        if any(v < 0.0 or v > 1.0 for v in vals):
            raise ValueError("floor1_inverse_db values must be in "
                             "[0, 1]")
        VORBIS["floor1_inverse_db"] = vals
        loaded += 1
    return loaded


def _try_env_tables() -> bool:
    global _env_load_done
    if _env_load_done:
        return False
    _env_load_done = True
    src = os.environ.get(_TABLES_ENV)
    if not src:
        return False
    try:
        load_vorbis_tables(src)
        return True
    except (OSError, ValueError, json.JSONDecodeError):
        return False


# --------------------------------------------------- LSB-first bits
#
# Vorbis packs bits least-significant-first within bytes — the
# opposite convention from every other codec in this package.


class _RL:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= 8 * len(self.d):
                raise ValueError("Vorbis packet exhausted")
            bit = (self.d[self.pos >> 3] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def f32(self) -> float:
        """Vorbis 32-bit packed float: 21-bit mantissa, 10-bit biased
        exponent, sign."""
        x = self.u(32)
        mant = x & 0x1FFFFF
        if x & 0x80000000:
            mant = -mant
        exp = (x >> 21) & 0x3FF
        return float(mant) * (2.0 ** (exp - 788))


class _WL:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, v: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def tobytes(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc])
        return out


def _ilog(x: int) -> int:
    """Spec ilog: position of the highest set bit (ilog(0) = 0)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def _lookup1_values(entries: int, dims: int) -> int:
    """Greatest integer v with v**dims <= entries (spec integer
    root)."""
    v = int(round(entries ** (1.0 / dims)))
    while (v + 1) ** dims <= entries:
        v += 1
    while v ** dims > entries:
        v -= 1
    return v


# ----------------------------------------------------------- setup


def _assign_codewords(lengths: list[int]) -> dict:
    """Canonical Vorbis codeword assignment (spec 3.2.1): each used
    entry, in order, takes the numerically lowest available codeword
    of its length (MSB-first). Modeled directly as the spec's binary
    tree: a free-node set per depth; placing a codeword of length L
    claims the lowest free node extendable to depth L, freeing each
    passed sibling. Returns {(length, code): entry}; raises on over-
    and (single-entry aside) underspecified books."""
    entries = [(i, ln) for i, ln in enumerate(lengths) if ln > 0]
    if not entries:
        return {}
    if len(entries) == 1:
        i, ln = entries[0]
        return {(ln, 0): i}
    book: dict = {}
    free: dict[int, list[int]] = {0: [0]}
    for i, ln in entries:
        best = None
        for depth in range(ln, -1, -1):
            if free.get(depth):
                cand = min(free[depth])
                val = cand << (ln - depth)
                if best is None or val < best[0]:
                    best = (val, depth, cand)
        if best is None:
            raise ValueError("overspecified Vorbis codebook")
        _val, depth, cand = best
        free[depth].remove(cand)
        code = cand
        for d in range(depth + 1, ln + 1):
            code <<= 1
            free.setdefault(d, []).append(code | 1)
        book[(ln, code)] = i
    if any(free.get(d) for d in free):
        raise ValueError("underspecified Vorbis codebook")
    return book


def _parse_codebook(r: _RL) -> dict:
    if r.u(24) != 0x564342:
        raise ValueError("Vorbis codebook sync lost")
    dims = r.u(16)
    entries = r.u(24)
    ordered = r.u(1)
    lengths = []
    if not ordered:
        sparse = r.u(1)
        for _ in range(entries):
            if sparse:
                lengths.append(r.u(5) + 1 if r.u(1) else 0)
            else:
                lengths.append(r.u(5) + 1)
    else:
        cur_len = r.u(5) + 1
        n = 0
        while n < entries:
            num = r.u(_ilog(entries - n))
            lengths.extend([cur_len] * num)
            n += num
            cur_len += 1
        if n != entries:
            raise ValueError("ordered codebook length overrun")
    book = {"dims": dims, "entries": entries, "lengths": lengths,
            "codewords": _assign_codewords(lengths)}
    lookup = r.u(4)
    book["lookup"] = lookup
    if lookup in (1, 2):
        book["min"] = r.f32()
        book["delta"] = r.f32()
        vbits = r.u(4) + 1
        book["seq_p"] = r.u(1)
        count = (_lookup1_values(entries, dims) if lookup == 1
                 else entries * dims)
        book["mults"] = [r.u(vbits) for _ in range(count)]
    elif lookup != 0:
        raise ValueError(f"Vorbis lookup type {lookup} reserved")
    return book


def _parse_floor(r: _RL, n_books: int, books: list) -> dict:
    ftype = r.u(16)
    if ftype == 0:
        # legacy LSP floor (r11; spec 6.2): the curve is synthesized
        # from line-spectral-pair coefficients read in VQ context
        order = r.u(8)
        rate = r.u(16)
        bark_map_size = r.u(16)
        amplitude_bits = r.u(6)
        amplitude_offset = r.u(8)
        num_books = r.u(4) + 1
        blist = [r.u(8) for _ in range(num_books)]
        if order == 0 or rate == 0 or bark_map_size == 0:
            raise ValueError("floor0 order/rate/bark_map_size must "
                             "be nonzero")
        for b in blist:
            if b >= n_books:
                raise ValueError("floor0 book out of range")
            if books[b]["lookup"] == 0:
                raise ValueError("floor0 book lacks a value mapping")
        return {"type": 0, "order": order, "rate": rate,
                "bark_map_size": bark_map_size,
                "amplitude_bits": amplitude_bits,
                "amplitude_offset": amplitude_offset,
                "books": blist, "_maps": {}}
    if ftype != 1:
        raise ValueError(f"Vorbis floor type {ftype} reserved")
    partitions = r.u(5)
    class_list = [r.u(4) for _ in range(partitions)]
    n_classes = max(class_list) + 1 if class_list else 0
    classes = []
    for _ in range(n_classes):
        dim = r.u(3) + 1
        sub = r.u(2)
        master = r.u(8) if sub else None
        if master is not None and master >= n_books:
            raise ValueError("floor1 masterbook out of range")
        books = []
        for _ in range(1 << sub):
            b = r.u(8) - 1
            if b >= n_books:
                raise ValueError("floor1 subclass book out of range")
            books.append(b)     # -1 = unused
        classes.append({"dim": dim, "sub": sub, "master": master,
                        "books": books})
    multiplier = r.u(2) + 1
    rangebits = r.u(4)
    xs = [0, 1 << rangebits]
    for cls in class_list:
        for _ in range(classes[cls]["dim"]):
            xs.append(r.u(rangebits))
    return {"type": 1, "partitions": partitions,
            "class_list": class_list, "classes": classes,
            "multiplier": multiplier, "rangebits": rangebits,
            "xs": xs}


def _parse_residue(r: _RL, n_books: int, books: list) -> dict:
    rtype = r.u(16)
    if rtype > 2:
        raise ValueError(f"Vorbis residue type {rtype} reserved")
    begin = r.u(24)
    end = r.u(24)
    psize = r.u(24) + 1
    classifications = r.u(6) + 1
    classbook = r.u(8)
    if classbook >= n_books:
        raise ValueError("residue classbook out of range")
    cascades = []
    for _ in range(classifications):
        low = r.u(3)
        high = r.u(5) if r.u(1) else 0
        cascades.append(low | (high << 3))
    rbooks = []
    for cas in cascades:
        row = []
        for bit in range(8):
            if cas & (1 << bit):
                b = r.u(8)
                if b >= n_books or books[b]["lookup"] == 0:
                    raise ValueError(
                        "residue VQ book missing a value mapping")
                row.append(b)
            else:
                row.append(None)
        rbooks.append(row)
    return {"type": rtype, "begin": begin, "end": end,
            "psize": psize, "classifications": classifications,
            "classbook": classbook, "cascades": cascades,
            "books": rbooks}


def _parse_mapping(r: _RL, channels: int, n_floors: int,
                   n_residues: int) -> dict:
    mtype = r.u(16)
    if mtype != 0:
        raise ValueError(f"Vorbis mapping type {mtype} reserved")
    submaps = r.u(4) + 1 if r.u(1) else 1
    couplings = []
    if r.u(1):
        steps = r.u(8) + 1
        bits = _ilog(channels - 1)
        for _ in range(steps):
            m = r.u(bits)
            a = r.u(bits)
            if m == a or m >= channels or a >= channels:
                raise ValueError("invalid Vorbis coupling pair")
            couplings.append((m, a))
    if r.u(2):
        raise ValueError("mapping reserved bits set")
    mux = ([r.u(4) for _ in range(channels)] if submaps > 1
           else [0] * channels)
    if any(m >= submaps for m in mux):
        raise ValueError("mapping mux out of range")
    cfg = []
    for _ in range(submaps):
        r.u(8)   # unused time configuration
        fl = r.u(8)
        res = r.u(8)
        if fl >= n_floors or res >= n_residues:
            raise ValueError("mapping floor/residue out of range")
        cfg.append((fl, res))
    return {"submaps": submaps, "couplings": couplings, "mux": mux,
            "cfg": cfg}


def parse_vorbis_headers(packets: list[bytes]) -> dict:
    """The three Vorbis header packets -> a full stream config dict:
    identification fields plus parsed codebooks, floors, residues,
    mappings and modes (everything the audio-packet walk needs)."""
    if len(packets) < 3:
        raise ValueError("Vorbis needs 3 header packets")
    ident, comment, setup = packets[0], packets[1], packets[2]
    if ident[:7] != b"\x01vorbis":
        raise ValueError("not a Vorbis identification packet")
    r = _RL(ident[7:])
    if r.u(32) != 0:
        raise ValueError("Vorbis version must be 0")
    channels = r.u(8)
    rate = r.u(32)
    r.u(32)
    r.u(32)
    r.u(32)     # bitrate max/nominal/min
    bs0 = 1 << r.u(4)
    bs1 = 1 << r.u(4)
    if not (64 <= bs0 <= bs1 <= 8192):
        raise ValueError("Vorbis blocksizes out of range")
    if not r.u(1):
        raise ValueError("identification framing bit clear")
    if channels == 0 or rate == 0:
        raise ValueError("Vorbis channels/rate must be nonzero")

    if comment[:7] != b"\x03vorbis":
        raise ValueError("not a Vorbis comment packet")

    if setup[:7] != b"\x05vorbis":
        raise ValueError("not a Vorbis setup packet")
    r = _RL(setup[7:])
    books = [_parse_codebook(r) for _ in range(r.u(8) + 1)]
    for _ in range(r.u(6) + 1):     # time domain transforms
        if r.u(16) != 0:
            raise ValueError("Vorbis time type must be 0")
    floors = [_parse_floor(r, len(books), books)
              for _ in range(r.u(6) + 1)]
    residues = [_parse_residue(r, len(books), books)
                for _ in range(r.u(6) + 1)]
    mappings = [_parse_mapping(r, channels, len(floors),
                               len(residues))
                for _ in range(r.u(6) + 1)]
    modes = []
    for _ in range(r.u(6) + 1):
        blockflag = r.u(1)
        if r.u(16) != 0 or r.u(16) != 0:
            raise ValueError("Vorbis mode window/transform reserved")
        mapping = r.u(8)
        if mapping >= len(mappings):
            raise ValueError("mode mapping out of range")
        modes.append({"blockflag": blockflag, "mapping": mapping})
    if not r.u(1):
        raise ValueError("setup framing bit clear")
    return {"channels": channels, "rate": rate, "bs0": bs0,
            "bs1": bs1, "books": books, "floors": floors,
            "residues": residues, "mappings": mappings,
            "modes": modes}


# ----------------------------------------------------------- decode


def vorbis_decode_packets(packets: list[bytes],
                          final_granule: int | None = None):
    """Header + audio packets -> (rate, channels, [channel PCM
    lists]): the FULL synthesis pipeline (r10 second block) — floor1
    curve decode + render (seam dB table), residue types 0/1/2,
    inverse square-polar coupling in reverse step order, IMDCT,
    Vorbis windowing with block-switch slopes, and absolute-position
    overlap-add with the first-packet priming / final-granule
    truncation rules. All-silent frames never consult the seam, so
    the silence operating point stays table-free."""
    import numpy as np

    cfg = parse_vorbis_headers(packets)
    channels = cfg["channels"]
    modes = cfg["modes"]
    mode_bits = _ilog(len(modes) - 1)
    acc = [np.zeros(0) for _ in range(channels)]
    outs: list[list[float]] = [[] for _ in range(channels)]
    # absolute left edge of the current frame; based at bs1/4 because
    # a long block after a short one extends BACKWARD past the
    # short block's left edge (its zero-windowed lead-in) — the dip
    # is bounded by bs1/4
    pos = cfg["bs1"] // 4
    emit_from = None    # first not-yet-final absolute sample
    prev_n = None
    for pkt in packets[3:]:
        if not pkt:
            continue
        r = _RL(pkt)
        if r.u(1):
            raise ValueError("non-audio packet in the audio stream")
        mode = modes[r.u(mode_bits)] if mode_bits else modes[0]
        n = cfg["bs1"] if mode["blockflag"] else cfg["bs0"]
        n2 = n // 2
        if mode["blockflag"]:
            wprev = cfg["bs1"] if r.u(1) else cfg["bs0"]
            wnext = cfg["bs1"] if r.u(1) else cfg["bs0"]
        else:
            wprev = wnext = n
        mapping = cfg["mappings"][mode["mapping"]]
        floors_dec = []
        for ch in range(channels):
            floor = cfg["floors"][
                mapping["cfg"][mapping["mux"][ch]][0]]
            floors_dec.append(_floor_read(r, floor, cfg["books"]))
        # nonzero-vector propagation across coupling pairs
        audible = [d is not None for d in floors_dec]
        for m_ch, a_ch in mapping["couplings"]:
            if audible[m_ch] or audible[a_ch]:
                audible[m_ch] = audible[a_ch] = True
        residue = [None] * channels
        for sm in range(mapping["submaps"]):
            bundle = [ch for ch in range(channels)
                      if mapping["mux"][ch] == sm]
            res = cfg["residues"][mapping["cfg"][sm][1]]
            dnd = [not audible[ch] for ch in bundle]
            vecs = _residue_decode(r, res, cfg["books"], dnd, n2)
            for ch, v in zip(bundle, vecs):
                residue[ch] = v
        # inverse coupling, reverse step order (spec 4.3.5)
        for m_ch, a_ch in reversed(mapping["couplings"]):
            m_v, a_v = residue[m_ch], residue[a_ch]
            for i in range(n2):
                m = m_v[i]
                a = a_v[i]
                if m > 0:
                    if a > 0:
                        m_v[i], a_v[i] = m, m - a
                    else:
                        m_v[i], a_v[i] = m + a, m
                else:
                    if a > 0:
                        m_v[i], a_v[i] = m, m + a
                    else:
                        m_v[i], a_v[i] = m - a, m
        win = np.asarray(_frame_window(n, wprev, wnext))
        mat = _imdct_mat(n)
        if prev_n is not None:
            # slope-center alignment: the previous frame's right
            # slope center (3*prev_n/4) meets this frame's left slope
            # center (n/4) — equal sizes reduce to the familiar n/2
            # hop; centers still advance by prev_n/4 + n/4
            pos += 3 * prev_n // 4 - n // 4
        for ch in range(channels):
            if floors_dec[ch] is None:
                frame = np.zeros(n)
            else:
                floor = cfg["floors"][
                    mapping["cfg"][mapping["mux"][ch]][0]]
                curve = _floor_curve(floor, floors_dec[ch], n2)
                spec = np.asarray(curve) * np.asarray(residue[ch])
                frame = (mat @ spec) * win
            if acc[ch].shape[0] < pos + n:
                acc[ch] = np.concatenate(
                    [acc[ch], np.zeros(pos + n - acc[ch].shape[0])])
            acc[ch][pos: pos + n] += frame
        center = pos + n2
        if emit_from is None:
            emit_from = center     # first packet primes
        else:
            for ch in range(channels):
                outs[ch].extend(acc[ch][emit_from: center].tolist())
            emit_from = center
        prev_n = n
    total = len(outs[0]) if outs else 0
    if final_granule is not None and 0 <= final_granule < total:
        outs = [o[:final_granule] for o in outs]
    return cfg["rate"], channels, outs


def vorbis_decode(ogg_bytes: bytes):
    """Ogg-Vorbis file -> (rate, channels, [channel PCM lists]) for
    the FIRST Vorbis logical stream."""
    from data_migration_etl_scripts_spark.operators.ogg import (
        ogg_packets,
        ogg_pages,
    )

    streams = ogg_packets(ogg_bytes)
    for serial, pkts in streams.items():
        if pkts and pkts[0][:7] == b"\x01vorbis":
            granule = None
            for _h, g, s, _q, _segs in ogg_pages(ogg_bytes):
                if s == serial and g >= 0:
                    granule = g
            return vorbis_decode_packets(pkts, granule)
    raise ValueError("no Vorbis stream in the Ogg file")


# ----------------------------------------------------------- encode


def _silence_setup() -> bytes:
    """A minimal fully-VALID setup header: one 2-entry scalar
    codebook, a floor1 with one partition, a residue whose single
    class carries no VQ books, one mapping, one short-block mode."""
    w = _WL()
    w.u(1 - 1, 8)           # codebook count - 1
    w.u(0x564342, 24)
    w.u(1, 16)              # dims
    w.u(2, 24)              # entries
    w.u(0, 1)               # not ordered
    w.u(0, 1)               # not sparse
    w.u(0, 5)               # length 1 (coded - 1)
    w.u(0, 5)
    w.u(0, 4)               # lookup 0
    w.u(0, 6)               # time count - 1
    w.u(0, 16)              # time type 0
    w.u(0, 6)               # floor count - 1
    w.u(1, 16)              # floor type 1
    w.u(1, 5)               # partitions
    w.u(0, 4)               # class 0
    w.u(0, 3)               # class dim - 1 -> 1
    w.u(0, 2)               # subclasses 0
    w.u(0 + 1, 8)           # the single subclass book: book 0
    w.u(0, 2)               # multiplier - 1
    w.u(6, 4)               # rangebits
    w.u(32, 6)              # one X value (dim 1) — 6 bits? rangebits
    # NOTE: X values use `rangebits` bits each
    w2 = w                  # continue on the same writer
    w2.u(0, 6)              # residue count - 1
    w2.u(0, 16)             # residue type 0
    w2.u(0, 24)             # begin
    w2.u(0, 24)             # end
    w2.u(0, 24)             # partition size - 1
    w2.u(0, 6)              # classifications - 1
    w2.u(0, 8)              # classbook 0
    w2.u(0, 3)              # cascade low bits 0
    w2.u(0, 1)              # no high bits
    w2.u(0, 6)              # mapping count - 1
    w2.u(0, 16)             # mapping type 0
    w2.u(0, 1)              # no submaps flag
    w2.u(0, 1)              # no coupling
    w2.u(0, 2)              # reserved
    w2.u(0, 8)              # time cfg (unused)
    w2.u(0, 8)              # floor 0
    w2.u(0, 8)              # residue 0
    w2.u(0, 6)              # mode count - 1
    w2.u(0, 1)              # blockflag 0 (short)
    w2.u(0, 16)             # windowtype
    w2.u(0, 16)             # transformtype
    w2.u(0, 8)              # mapping 0
    w2.u(1, 1)              # framing
    return b"\x05vorbis" + w2.tobytes()


def vorbis_encode_silence(frames: int = 4, rate: int = 8000,
                          channels: int = 1,
                          blockexp: int = 8) -> bytes:
    """Engine silence encoder: a VALID Ogg-Vorbis stream of
    ``frames`` short-block audio packets whose floors are all zero —
    the table-free operating point that pins the page/packet layer,
    the full header-triad parse (codebook/floor/residue/mapping/mode)
    and the lapping sample accounting end to end. Returns Ogg
    bytes."""
    from data_migration_etl_scripts_spark.operators.ogg import _page

    if not 6 <= blockexp <= 13:
        raise ValueError("blockexp must be in [6, 13]")
    n = 1 << blockexp
    w = _WL()
    w.u(0, 32)              # version
    w.u(channels, 8)
    w.u(rate, 32)
    w.u(0, 32)
    w.u(0, 32)
    w.u(0, 32)
    w.u(blockexp, 4)
    w.u(blockexp, 4)
    w.u(1, 1)               # framing
    ident = b"\x01vorbis" + w.tobytes()
    comment = (b"\x03vorbis"
               + (11).to_bytes(4, "little") + b"spark-graft"
               + (0).to_bytes(4, "little") + b"\x01")
    setup = _silence_setup()

    audio = []
    total = 0
    prev = None
    for _ in range(frames):
        aw = _WL()
        aw.u(0, 1)          # audio packet
        # zero mode bits (one mode); floor nonzero = 0 per channel
        for _ in range(channels):
            aw.u(0, 1)
        audio.append(aw.tobytes())
        if prev is not None:
            total += prev // 4 + n // 4
        prev = n

    serial = 0x7B15
    out = bytearray()
    out += _page(0x02, 0, serial, 0, [ident],
                 [255] * (len(ident) // 255) + [len(ident) % 255])

    def lace(p):
        return [255] * (len(p) // 255) + [len(p) % 255]

    # comment + setup share page 1 (the common layout)
    out += _page(0, 0, serial, 1, [comment, setup],
                 lace(comment) + lace(setup))
    granule = 0
    prev = None
    for i, pkt in enumerate(audio):
        nblk = n
        if prev is not None:
            granule += prev // 4 + nblk // 4
        prev = nblk
        htype = 0x04 if i == len(audio) - 1 else 0
        out += _page(htype, granule, serial, 2 + i, [pkt], lace(pkt))
    return bytes(out)


# -------------------------------------------------------- synthesis
#
# Full audio synthesis (r10, second block): scalar Huffman reads, VQ
# value vectors, floor1 curve decode + the integer line renderer,
# residue types 0/1/2, inverse square-polar coupling, and the IMDCT +
# Vorbis-window lapping pipeline. The IMDCT cosine kernel is the same
# TDAC family as the in-house AAC filterbank: Vorbis's
# cos(pi/(2n)(2j+1+n/2)(2k+1)) equals cos(2pi/n (j+.5+n/4)(k+.5)).
# The ONE tabulated constant consulted here is the floor1 inverse-dB
# amplitude table (seam; module docstring).


def seam_available() -> bool:
    """True when the floor1 inverse-dB table is loaded (or loads from
    the env seam) — gates the quantized fixture row in
    operators/multimodal.py (workers re-import this module)."""
    if VORBIS["floor1_inverse_db"] is None:
        _try_env_tables()
    return VORBIS["floor1_inverse_db"] is not None


def _need_db() -> list:
    t = VORBIS["floor1_inverse_db"]
    if t is None and _try_env_tables():
        t = VORBIS["floor1_inverse_db"]
    if t is None:
        raise NotImplementedError(
            "floor1 inverse-dB amplitude table (Vorbis I spec 10.1, "
            "256 floats, no published closed form) is tabulated "
            "data — load_vorbis_tables({'floor1_inverse_db': ...}) "
            "or $SPARK_GRAFT_VORBIS_TABLES injects it"
        )
    return t


def _huff_read(r: _RL, book: dict) -> int:
    """Scalar codeword read: Vorbis codewords descend the canonical
    tree MSB-first, one stream bit per level."""
    code = 0
    ln = 0
    words = book["codewords"]
    while ln < 33:
        code = (code << 1) | r.u(1)
        ln += 1
        hit = words.get((ln, code))
        if hit is not None:
            return hit
    raise ValueError("Vorbis codeword longer than 32 bits")


def _vq_values(book: dict, entry: int) -> list[float]:
    """Lookup-type value vector for an entry (spec 3.3)."""
    dims = book["dims"]
    mults = book["mults"]
    mn, delta = book["min"], book["delta"]
    out = []
    if book["lookup"] == 1:
        v = _lookup1_values(book["entries"], dims)
        last = 0.0
        div = 1
        for _ in range(dims):
            off = (entry // div) % v
            val = mults[off] * delta + mn + last
            out.append(val)
            if book["seq_p"]:
                last = val
            div *= v
    else:
        last = 0.0
        for i in range(dims):
            val = mults[entry * dims + i] * delta + mn + last
            out.append(val)
            if book["seq_p"]:
                last = val
    return out


# ------------------------------------------------------------ floor1

_FLOOR1_RANGE = {1: 256, 2: 128, 3: 86, 4: 64}


def _render_point(x0, y0, x1, y1, x) -> int:
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0, y0, x1, y1, out, n, mult, table) -> None:
    """Integer Bresenham line render (spec 9.2.7) writing amplitude
    values table[y * mult] into out[x0..min(x1, n)-1]."""
    dy = y1 - y0
    adx = x1 - x0
    base = abs(dy) // adx
    if dy < 0:
        base = -base
    sy = base - 1 if dy < 0 else base + 1
    ady = abs(dy) - abs(base) * adx
    x, y, err = x0, y0, 0
    if x0 < n:
        out[x0] = table[min(255, y0 * mult)]
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = table[min(255, y * mult)]


def _floor1_read(r: _RL, floor: dict, books: list):
    """floor1 packet data -> final Y values + step2 flags (spec
    7.2.3/7.2.4 amplitude merge), or None when the nonzero flag is
    clear (silent channel)."""
    if not r.u(1):
        return None
    rng = _FLOOR1_RANGE[floor["multiplier"]]
    ybits = _ilog(rng - 1)
    xs = floor["xs"]
    ys = [r.u(ybits), r.u(ybits)]
    for cls in floor["class_list"]:
        c = floor["classes"][cls]
        sub = c["sub"]
        cbits = sub
        csub = (1 << sub) - 1
        cval = 0
        if sub:
            cval = _huff_read(r, books[c["master"]])
        for _ in range(c["dim"]):
            book = c["books"][cval & csub]
            cval >>= cbits
            ys.append(_huff_read(r, books[book]) if book >= 0 else 0)
    # amplitude merge: values after the first two are folded
    # residuals against the neighbor-line prediction
    npts = len(xs)
    final = [0] * npts
    flags = [False] * npts
    final[0], final[1] = ys[0], ys[1]
    flags[0] = flags[1] = True
    for j in range(2, npts):
        # low/high neighbors: nearest X below/above among PRIOR points
        lo = 0
        hi = 1
        for k in range(j):
            if xs[lo] < xs[k] < xs[j]:
                lo = k
            if xs[j] < xs[k] < xs[hi] or (xs[hi] < xs[j]
                                          and xs[k] > xs[j]):
                hi = k
        pred = _render_point(xs[lo], final[lo], xs[hi], final[hi],
                             xs[j])
        val = ys[j]
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if val:
            flags[lo] = flags[hi] = flags[j] = True
            if val >= room:
                final[j] = (val - lowroom + pred
                            if highroom > lowroom
                            else pred - (val - highroom) - 1)
            else:
                final[j] = (pred - ((val + 1) >> 1) if val & 1
                            else pred + (val >> 1))
            final[j] = max(0, min(rng - 1, final[j]))
        else:
            final[j] = pred
    return final, flags


def _floor1_curve(floor: dict, decoded, n2: int) -> list[float]:
    """Rendered floor curve over n2 spectral bins (seam table)."""
    table = _need_db()
    final, flags = decoded
    xs = floor["xs"]
    mult = floor["multiplier"]
    pts = sorted((x, final[i]) for i, x in enumerate(xs) if flags[i])
    out = [0.0] * n2
    hx = 0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x1 <= x0:
            continue
        _render_line(x0, y0, x1, y1, out, n2, mult, table)
        hx = x1
    if hx < n2:
        lvl = table[min(255, pts[-1][1] * mult)]
        for x in range(max(hx, 0), n2):
            out[x] = lvl
    return out


# ------------------------------------------------------------ floor0


def _bark(x: float) -> float:
    """The Bark-scale map of spec 6.2.3 (pure formula)."""
    return (13.1 * math.atan(0.00074 * x)
            + 2.24 * math.atan(1.85e-8 * x * x)
            + 1e-4 * x)


def _floor0_map(floor: dict, n2: int) -> list[int]:
    """Linear-bin -> bark-bin map, cached per blocksize on the floor
    config (lazy — no import/parse tax)."""
    mp = floor["_maps"].get(n2)
    if mp is None:
        bms = floor["bark_map_size"]
        c = bms / _bark(0.5 * floor["rate"])
        mp = [min(bms - 1,
                  int(_bark(0.5 * floor["rate"] * i / n2) * c))
              for i in range(n2)]
        floor["_maps"][n2] = mp
    return mp


def _floor0_read(r: _RL, floor: dict, books: list):
    """floor0 packet data (spec 6.2.2): amplitude (zero = channel
    unused), book number over ilog(num_books) bits — the spec's
    quirky no-minus-one width, which is what makes an out-of-range
    number representable and 'undecodable' — then LSP coefficient
    vectors in VQ context with the running 'last' offset."""
    amplitude = r.u(floor["amplitude_bits"])
    if not amplitude:
        return None
    bn = r.u(_ilog(len(floor["books"])))
    if bn >= len(floor["books"]):
        raise ValueError("floor0 book number out of range — "
                         "undecodable packet")
    book = books[floor["books"][bn]]
    coeffs: list[float] = []
    last = 0.0
    while len(coeffs) < floor["order"]:
        entry = _huff_read(r, book)
        coeffs.extend(v + last for v in _vq_values(book, entry))
        last = coeffs[-1]
    return (amplitude, coeffs[: floor["order"]])


def _floor0_curve(floor: dict, decoded, n2: int) -> list[float]:
    """LSP curve synthesis (spec 6.2.3): per bark bin, the p/q
    products over the even/odd cosine-domain coefficients (parity
    split by the filter order), then the amplitude-normalized
    exponential. Consecutive bins sharing a bark index share the
    computation. Fully formula-level — floor0, unlike floor1, needs
    NO seam table."""
    amplitude, coeffs = decoded
    order = floor["order"]
    mp = _floor0_map(floor, n2)
    cosc = [math.cos(c) for c in coeffs]
    amax = float((1 << floor["amplitude_bits"]) - 1)
    off = float(floor["amplitude_offset"])
    out = [0.0] * n2
    i = 0
    while i < n2:
        m = mp[i]
        cw = math.cos(math.pi * m / floor["bark_map_size"])
        if order % 2:
            p = 1.0 - cw * cw
            for j in range((order - 1) // 2):
                p *= 4.0 * (cosc[2 * j + 1] - cw) ** 2
            q = 0.25
            for j in range((order + 1) // 2):
                q *= 4.0 * (cosc[2 * j] - cw) ** 2
        else:
            p = (1.0 - cw) / 2.0
            q = (1.0 + cw) / 2.0
            for j in range(order // 2):
                p *= 4.0 * (cosc[2 * j + 1] - cw) ** 2
                q *= 4.0 * (cosc[2 * j] - cw) ** 2
        # exponent capped where a C float implementation saturates to
        # inf — Python's math.exp raises instead of overflowing
        lin = math.exp(min(709.0,
                           0.11512925
                           * (amplitude * off
                              / (amax * math.sqrt(p + q)) - off)))
        while i < n2 and mp[i] == m:
            out[i] = lin
            i += 1
    return out


def _floor_read(r: _RL, floor: dict, books: list):
    if floor["type"] == 0:
        return _floor0_read(r, floor, books)
    return _floor1_read(r, floor, books)


def _floor_curve(floor: dict, decoded, n2: int) -> list[float]:
    if floor["type"] == 0:
        return _floor0_curve(floor, decoded, n2)
    return _floor1_curve(floor, decoded, n2)


# ----------------------------------------------------------- residue


def _residue_decode(r: _RL, res: dict, books: list, dnd: list[bool],
                    n2: int) -> list[list[float]]:
    """Residue decode (spec 8.6.2) for a channel bundle. ``dnd`` =
    do-not-decode flags. Types 0/1 decode per channel; type 2
    interleaves the bundle into one vector, decoded iff ANY channel
    is audible, then deinterleaved."""
    ch = len(dnd)
    rtype = res["type"]
    if rtype == 2:
        vecs = [[0.0] * n2 for _ in range(ch)]
        if all(dnd):
            return vecs
        big = _residue_core(r, res, books, [False], n2 * ch)[0]
        for i in range(n2 * ch):
            vecs[i % ch][i // ch] = big[i]
        return vecs
    return _residue_core(r, res, books, dnd, n2)


def _residue_core(r: _RL, res: dict, books: list, dnd: list[bool],
                  size: int) -> list[list[float]]:
    ch = len(dnd)
    vecs = [[0.0] * size for _ in range(ch)]
    begin = min(res["begin"], size)
    end = min(res["end"], size)
    if end <= begin:
        return vecs
    psize = res["psize"]
    n_parts = (end - begin) // psize
    classbook = books[res["classbook"]]
    cdims = classbook["dims"]
    classes = [[0] * (n_parts + cdims) for _ in range(ch)]
    for pass_n in range(8):
        pc = 0
        while pc < n_parts:
            if pass_n == 0:
                for j in range(ch):
                    if dnd[j]:
                        continue
                    temp = _huff_read(r, classbook)
                    for i in range(cdims - 1, -1, -1):
                        classes[j][pc + i] = (
                            temp % res["classifications"])
                        temp //= res["classifications"]
            for _i in range(cdims):
                if pc >= n_parts:
                    break
                for j in range(ch):
                    if dnd[j]:
                        continue
                    vq = res["books"][classes[j][pc]][pass_n]
                    if vq is None:
                        continue
                    book = books[vq]
                    dims = book["dims"]
                    off = begin + pc * psize
                    v = vecs[j]
                    if res["type"] == 0:
                        step = psize // dims
                        for k in range(step):
                            vals = _vq_values(
                                book, _huff_read(r, book))
                            for d in range(dims):
                                v[off + k + d * step] += vals[d]
                    else:        # types 1 and 2 share the core
                        k = 0
                        while k < psize:
                            vals = _vq_values(
                                book, _huff_read(r, book))
                            for d in range(dims):
                                v[off + k] += vals[d]
                                k += 1
                pc += 1
    return vecs


# --------------------------------------------------- filterbank/lap


_IMDCT_CACHE: dict[int, object] = {}


def _imdct_mat(n: int):
    """n//2 spectral -> n time IMDCT matrix (Vorbis 4.3.6 kernel)."""
    import math

    import numpy as np

    m = _IMDCT_CACHE.get(n)
    if m is None:
        j = np.arange(n).reshape(-1, 1)
        k = np.arange(n // 2).reshape(1, -1)
        m = np.cos(math.pi / (2 * n) * (2 * j + 1 + n // 2)
                   * (2 * k + 1))
        _IMDCT_CACHE[n] = m
    return m


def _vorbis_window(n: int) -> list[float]:
    """The full-n Vorbis window: sin(pi/2 * sin^2(pi (i+.5)/n))."""
    import math

    key = -n
    w = _IMDCT_CACHE.get(key)
    if w is None:
        w = [math.sin(0.5 * math.pi
                      * math.sin(math.pi * (i + 0.5) / n) ** 2)
             for i in range(n)]
        _IMDCT_CACHE[key] = w
    return w


def _frame_window(n: int, prev_n: int, next_n: int) -> list[float]:
    """Window for one block with possibly narrower lap slopes (block
    switching, spec 4.3.1): the left slope spans prev_n/2 samples
    centered at n/4, the right slope next_n/2 centered at 3n/4; flat
    1.0 between, 0.0 outside the slopes."""
    if prev_n == n and next_n == n:
        return _vorbis_window(n)
    wl = _vorbis_window(prev_n)
    wr = _vorbis_window(next_n)
    out = [0.0] * n
    ls = n // 4 - prev_n // 4
    for i in range(prev_n // 2):
        out[ls + i] = wl[i]
    for i in range(ls + prev_n // 2, n // 2 + n // 4 - next_n // 4):
        out[i] = 1.0
    rs = n // 2 + n // 4 - next_n // 4
    for i in range(next_n // 2):
        out[rs + i] = wr[next_n // 2 + i]
    return out


# ------------------------------------------------ quantized encoder


def _w_codeword(w: _WL, book_cw: dict, entry: int) -> None:
    """Write a codeword MSB-first (the read order of _huff_read)."""
    for (ln, code), e in book_cw.items():
        if e == entry:
            for i in range(ln - 1, -1, -1):
                w.u((code >> i) & 1, 1)
            return
    raise ValueError(f"entry {entry} has no codeword")


def _f32_pack(v: float) -> int:
    """Inverse of _RL.f32 for the integer-valued floats the engine
    setup uses (|v| < 2^21, exponent 788)."""
    m = int(abs(v))
    return (0x80000000 if v < 0 else 0) | (788 << 21) | m


def _quantized_setup(coupled: bool, channels: int,
                     floor0: bool = False) -> bytes:
    """Setup with real content books: [0] = 2-entry classbook,
    [1] = 64-entry uniform-length scalar/VQ book (lookup 2, dims 1,
    values -32..31) shared by the floor and the residue; residue
    type 1 (or 2 when ``coupled``), one coupling step when asked.
    With ``floor0`` the floor is a TYPE 0 (LSP) config: order 4,
    bark_map_size 64, 6 amplitude bits, offset 10, coefficients
    through book 1."""
    w = _WL()
    w.u(2 - 1, 8)           # two codebooks
    # book 0: classbook
    w.u(0x564342, 24)
    w.u(1, 16)
    w.u(2, 24)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 5)
    w.u(0, 5)
    w.u(0, 4)
    # book 1: 64 entries, uniform length 6, lookup 2 dims 1
    w.u(0x564342, 24)
    w.u(1, 16)
    w.u(64, 24)
    w.u(0, 1)               # not ordered
    w.u(0, 1)               # not sparse
    for _ in range(64):
        w.u(5, 5)           # length 6 (coded - 1)
    w.u(2, 4)               # lookup type 2
    w.u(_f32_pack(-32.0), 32)   # min
    w.u(_f32_pack(1.0), 32)     # delta
    w.u(5, 4)               # value_bits 6 (coded - 1)
    w.u(0, 1)               # seq_p
    for i in range(64):
        w.u(i, 6)           # multiplicands 0..63
    w.u(0, 6)               # time count - 1
    w.u(0, 16)
    w.u(0, 6)               # floor count - 1
    if floor0:
        w.u(0, 16)          # floor type 0 (LSP)
        w.u(4, 8)           # order 4
        w.u(8000, 16)       # floor rate
        w.u(64, 16)         # bark_map_size
        w.u(6, 6)           # amplitude_bits
        w.u(10, 8)          # amplitude_offset
        w.u(0, 4)           # num_books - 1
        w.u(1, 8)           # coefficient book: book 1
    else:
        w.u(1, 16)          # floor type 1
        w.u(1, 5)           # partitions
        w.u(0, 4)           # class 0
        w.u(0, 3)           # class dim 1
        w.u(0, 2)           # subclasses 0
        w.u(1 + 1, 8)       # subclass book: book 1
        w.u(0, 2)           # multiplier 1
        w.u(6, 4)           # rangebits
        w.u(32, 6)          # the one extra X point
    w.u(0, 6)               # residue count - 1
    w.u(2 if coupled else 1, 16)    # residue type
    w.u(0, 24)              # begin
    w.u(4096, 24)           # end (clamped by the decoder to size)
    w.u(32 - 1, 24)         # partition size 32
    w.u(2 - 1, 6)           # 2 classifications
    w.u(0, 8)               # classbook 0
    for _ in range(2):      # both classes: pass-0 bit -> book 1
        w.u(1, 3)
        w.u(0, 1)
    w.u(1, 8)
    w.u(1, 8)
    w.u(0, 6)               # mapping count - 1
    w.u(0, 16)              # mapping type
    w.u(0, 1)               # one submap
    if coupled:
        w.u(1, 1)           # coupling present
        w.u(0, 8)           # one step
        bits = _ilog(channels - 1)
        w.u(0, bits)        # magnitude ch 0
        w.u(1, bits)        # angle ch 1
    else:
        w.u(0, 1)
    w.u(0, 2)               # reserved
    w.u(0, 8)               # time cfg
    w.u(0, 8)               # floor 0
    w.u(0, 8)               # residue 0
    w.u(0, 6)               # mode count - 1
    w.u(0, 1)               # short blocks only
    w.u(0, 16)
    w.u(0, 16)
    w.u(0, 8)
    w.u(1, 1)               # framing
    return b"\x05vorbis" + w.tobytes()


def vorbis_encode_quantized(frames: int = 4, rate: int = 8000,
                            channels: int = 1, blockexp: int = 8,
                            floor_y: int = 160, seed: int = 7,
                            coupled: bool = False,
                            floor0: bool = False):
    """Engine QUANTIZED operating point -> (ogg bytes, [expected PCM
    per channel]): flat floor1 curves at amplitude index ``floor_y``
    and deterministic pseudorandom integer residues in [-32, 31]
    coded through REAL stream codebooks (residue type 1; with
    ``coupled`` True and 2 channels: one square-polar coupling step +
    residue type 2 over the interleaved bundle). The expected PCM is
    computed by an INDEPENDENT equal-blocksize lap implementation
    (prev-half + current-half), so ``vorbis_decode`` of the returned
    bytes must match it float-exactly — pinning floor render,
    residue/classword order, VQ values, (de)coupling, IMDCT and
    window against each other. Requires the floor1 inverse-dB seam
    (any valid injected table; both sides use the same one).

    With ``floor0`` (r11) the stream carries a TYPE 0 (LSP) floor:
    per channel an amplitude, a book number and LSP coefficient
    vectors with the running 'last' offset (deterministic prefix
    sums over the PRNG deltas), and the expected PCM multiplies the
    residues by the :func:`_floor0_curve` synthesis — floor0 needs
    NO seam table, so this operating point is fully table-free."""
    import numpy as np

    from data_migration_etl_scripts_spark.operators.ogg import _page

    if coupled and channels != 2:
        raise ValueError("coupled needs exactly 2 channels")
    if not 6 <= blockexp <= 13:
        raise ValueError("blockexp must be in [6, 13]")
    table = None if floor0 else _need_db()
    n = 1 << blockexp
    n2 = n // 2
    w = _WL()
    w.u(0, 32)
    w.u(channels, 8)
    w.u(rate, 32)
    w.u(0, 32)
    w.u(0, 32)
    w.u(0, 32)
    w.u(blockexp, 4)
    w.u(blockexp, 4)
    w.u(1, 1)
    ident = b"\x01vorbis" + w.tobytes()
    comment = (b"\x03vorbis"
               + (11).to_bytes(4, "little") + b"spark-graft"
               + (0).to_bytes(4, "little") + b"\x01")
    setup = _quantized_setup(coupled, channels, floor0)
    cfg = parse_vorbis_headers([ident, comment, setup])
    book1 = cfg["books"][1]
    cw_class = cfg["books"][0]["codewords"]
    cw_val = book1["codewords"]

    state = seed & 0x7FFFFFFF

    def rnd():
        nonlocal state
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        return (state >> 16) % 64 - 32

    win = np.asarray(_vorbis_window(n))
    mat = _imdct_mat(n)
    psize = 32
    n_parts = n2 // psize
    if floor0:
        # deterministic, WELL-CONDITIONED LSP coefficients: the even-
        # and odd-indexed cosine roots are kept apart (coeffs 2, 5,
        # 11, 14 -> cos spread over [-0.45, 0.3]), so p + q never
        # collapses and the curve stays within a couple of orders of
        # magnitude of unity; the curve replays the decoder's
        # synthesis
        f0 = cfg["floors"][0]
        f0_amp = 10
        base = [2, 3, 6, 3]
        f0_deltas = [[base[i % 4] + (ci if i == 0 else 0)
                      for i in range(f0["order"])]
                     for ci in range(channels)]
        curves = []
        for ch in range(channels):
            coeffs, acc = [], 0.0
            for d in f0_deltas[ch]:
                acc += float(d)
                coeffs.append(acc)
            curves.append(np.asarray(_floor0_curve(
                f0, (f0_amp, coeffs), n2)))
    else:
        amp = table[min(255, floor_y)]

    audio = []
    frames_pcm = []     # per frame: [channel time arrays]
    for _f in range(frames):
        aw = _WL()
        aw.u(0, 1)              # audio packet
        if floor0:
            for ch in range(channels):
                aw.u(f0_amp, 6)     # amplitude (nonzero)
                aw.u(0, 1)          # book number: ilog(1) = 1 bit
                for d in f0_deltas[ch]:
                    _w_codeword(aw, cw_val, d + 32)
        else:
            # floors: nonzero, flat at floor_y
            for _ch in range(channels):
                aw.u(1, 1)
                aw.u(floor_y, 8)    # y0 (range 256 -> 8 bits)
                aw.u(floor_y, 8)    # y1
                _w_codeword(aw, cw_val, 0)  # third point: 0 (flat)
        res_ints = [[rnd() for _ in range(n2)]
                    for _ch in range(channels)]
        if coupled:
            # encoder works in the COUPLED domain: res_ints are the
            # transmitted magnitude/angle vectors; expected spectra
            # apply the decoder's inverse mapping
            big = [0] * (2 * n2)
            for i in range(n2):
                big[2 * i] = res_ints[0][i]
                big[2 * i + 1] = res_ints[1][i]
            for pc in range(len(big) // psize):
                _w_codeword(aw, cw_class, 0)
                for k in range(psize):
                    _w_codeword(aw, cw_val,
                                big[pc * psize + k] + 32)
            dec = [[0.0] * n2 for _ in range(2)]
            for i in range(n2):
                m, a = float(res_ints[0][i]), float(res_ints[1][i])
                if m > 0:
                    dec[0][i], dec[1][i] = ((m, m - a) if a > 0
                                            else (m + a, m))
                else:
                    dec[0][i], dec[1][i] = ((m, m + a) if a > 0
                                            else (m - a, m))
            spectra = dec
        else:
            for pc in range(n_parts):
                for ch in range(channels):
                    _w_codeword(aw, cw_class, 0)
                for ch in range(channels):
                    for k in range(psize):
                        _w_codeword(aw, cw_val,
                                    res_ints[ch][pc * psize + k] + 32)
            spectra = [[float(v) for v in row] for row in res_ints]
        audio.append(aw.tobytes())
        if floor0:
            frames_pcm.append([
                (mat @ (np.asarray(sp) * curves[ci])) * win
                for ci, sp in enumerate(spectra)])
        else:
            frames_pcm.append([
                (mat @ (np.asarray(sp) * amp)) * win
                for sp in spectra])

    # independent equal-size lap: emit prev[n2:] + cur[:n2] per join
    expected = [[] for _ in range(channels)]
    for f in range(1, frames):
        for ch in range(channels):
            seg = (frames_pcm[f - 1][ch][n2:]
                   + frames_pcm[f][ch][:n2])
            expected[ch].extend(float(v) for v in seg)

    serial = 0x7B16
    out = bytearray()

    def lace(p):
        return [255] * (len(p) // 255) + [len(p) % 255]

    out += _page(0x02, 0, serial, 0, [ident], lace(ident))
    out += _page(0, 0, serial, 1, [comment, setup],
                 lace(comment) + lace(setup))
    granule = 0
    for i, pkt in enumerate(audio):
        if i:
            granule += n2
        htype = 0x04 if i == len(audio) - 1 else 0
        out += _page(htype, granule, serial, 2 + i, [pkt], lace(pkt))
    return bytes(out), expected
