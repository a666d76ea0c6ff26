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

What DECODES end to end today (r10): the silence operating point —
streams whose floor1 nonzero flag is clear in every channel of every
audio packet decode to exact zero PCM with the spec's block/lapping
sample accounting (short/long windows, the (prev/4 + cur/4) return
rule, first-packet priming, Ogg granule truncation). The engine
encoder :func:`vorbis_encode_silence` emits a fully VALID stream —
real identification/comment/setup headers with a parseable codebook,
floor1, residue and mapping — so encode -> decode round-trips pin
the whole container + header + packet walk with the seam EMPTY
(the I_PCM / AAC-silence discipline). Nonzero floor curves (actual
audio synthesis: floor curve rendering, residue vector decode, MDCT)
raise namefully at the documented plug point until a later round
builds the synthesis path on the in-house filterbank.
"""

from __future__ import annotations

import json
import os

__all__ = ["vorbis_decode", "vorbis_decode_packets",
           "vorbis_encode_silence", "parse_vorbis_headers",
           "load_vorbis_tables", "VORBIS"]

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


def _parse_floor(r: _RL, n_books: int) -> dict:
    ftype = r.u(16)
    if ftype == 0:
        raise NotImplementedError(
            "Vorbis floor type 0 (LSP) — floor1 streams decode; the "
            "legacy LSP floor stays a documented plug point"
        )
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
    floors = [_parse_floor(r, len(books))
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
    lists]). Implements the full packet walk and the spec's lapping
    sample accounting; ONLY all-floors-silent frames synthesize
    (exact zeros) — a nonzero floor reaches the documented synthesis
    plug point and raises namefully."""
    cfg = parse_vorbis_headers(packets)
    channels = cfg["channels"]
    modes = cfg["modes"]
    mode_bits = _ilog(len(modes) - 1)
    total = 0
    prev_block = None
    for pkt in packets[3:]:
        if not pkt:
            continue
        r = _RL(pkt)
        if r.u(1):
            raise ValueError("non-audio packet in the audio stream")
        mode = modes[r.u(mode_bits)] if mode_bits else modes[0]
        n = cfg["bs1"] if mode["blockflag"] else cfg["bs0"]
        if mode["blockflag"]:
            r.u(1)
            r.u(1)   # prev/next window shape flags
        mapping = cfg["mappings"][mode["mapping"]]
        for ch in range(channels):
            floor = cfg["floors"][
                mapping["cfg"][mapping["mux"][ch]][0]]
            nonzero = r.u(1)
            if nonzero:
                if VORBIS["floor1_inverse_db"] is None:
                    _try_env_tables()
                raise NotImplementedError(
                    "Vorbis floor/residue synthesis (nonzero floor "
                    "curves) — the silence operating point decodes; "
                    "full synthesis is the documented next increment "
                    f"(floor1 {floor['partitions']} partitions "
                    "parsed, spectral path pending)"
                )
        # all channels silent: residue decode reads nothing (every
        # channel is do-not-decode), the frame is exact zeros
        if prev_block is not None:
            total += prev_block // 4 + n // 4
        prev_block = n
    if final_granule is not None and 0 <= final_granule < total:
        total = final_granule
    return cfg["rate"], channels, [[0.0] * total
                                   for _ in range(channels)]


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
