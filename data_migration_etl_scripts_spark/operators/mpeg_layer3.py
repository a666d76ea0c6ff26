"""MPEG-1 Audio Layer III (MP3) — structural decode + engine encoder,
pure stdlib, closing most of the Layer III plug-point left by
`operators/mpeg_audio.py` (which handles Layers I/II).

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (decode / feature
extraction over binary audio columns at corpus scale).

What is EXACT here (ISO/IEC 11172-3 Layer III syntax, from public
spec knowledge, all formula-derived or structurally checkable):
  - frame walk: header, 144*bitrate/rate + pad sizing, side info
    layout (17/32 bytes: main_data_begin 9, private bits, scfsi 4/ch,
    59 bits per granule*channel), and the BIT RESERVOIR
    (main_data_begin byte back-pointer into prior frames' main data)
  - scalefactor read: scalefac_compress -> (slen1, slen2) pairs,
    scfsi reuse groups (0-5, 6-10, 11-15, 16-20) for granule 2,
    long / short / mixed layouts
  - requantization: x = sign(ix)*|ix|^(4/3)
      * 2^((global_gain - 210 - 8*subblock_gain[w]) / 4)
      * 2^(-(1 + scalefac_scale)/2 * (scalefac + preflag*pretab))
  - MS stereo: l = (m + s)/sqrt(2), r = (m - s)/sqrt(2)
  - alias reduction: 8 Givens butterflies per long-subband boundary,
    cs = 1/sqrt(1 + ci^2), ca = ci*cs (rotation, inverse = transpose)
  - IMDCT: 18-point (36 out) with the four sine window types
    (normal/start/short/stop), 3x12 short-window overlay at offsets
    6/12/18, 18-sample overlap-add, frequency inversion of odd
    time samples in odd subbands
  - synthesis: the shared pseudo-QMF bank from `mpeg_audio.py`
  - count1 "table B" (count1table_select=1): CLOSED FORM per the spec
    text — every quadruple (v,w,x,y) codes in exactly 4 bits as the
    one's complement of its value bits, signs trailing each nonzero

What is a documented DATA SEAM (the repo's Annex-B policy: large
tabulated spec constants are not reproduced from memory — see the
prototype-window note in mpeg_audio.py):
  - the 32 big_values Huffman codebooks and count1 table A
    (ISO 11172-3 Annex B Table B.7). `HUFF_TABLES` ships table 0
    (the spec-structural "no bits read, region decodes to zeros"
    table). r8: `load_huffman_tables(path_or_dict)` injects the rest
    from a JSON file (validated, prefix-free-checked), and the
    decoder auto-loads `$SPARK_GRAFT_MP3_TABLES` on the first miss —
    a user with the spec data decodes arbitrary foreign MP3s with an
    env var, no source edit. Until then a foreign frame that selects
    table >= 1 raises NotImplementedError naming the table and the
    loader.
  - scalefactor-band boundaries and pretab (Annex B Table B.8 /
    the preemphasis table). The grids below follow the published
    values to the author's best knowledge and are engine data: the
    engine encoder and decoder share them, so engine round-trips are
    exact by construction regardless; only FOREIGN-stream band
    scaling depends on their conformance — verify against the spec
    text before relying on that.
  - intensity stereo with SHORT blocks raises (the per-window is_pos
    layout is untestable here without a foreign fixture); long-block
    intensity (r7) decodes via ratio = tan(is_pos*pi/12) over the
    right channel's zero region, MS below it when both bits are set,
    and round-trips against the engine encoder's intensity mode.
  - MPEG-2/2.5 LSF Layer III (r9): the STRUCTURE is implemented end
    to end — header rates by formula (half/quarter), 72*bitrate/rate
    frame sizing, 1-granule 9/17-byte side info with 8-bit
    main_data_begin and 9-bit scalefac_compress, the 4-partition
    scalefactor read, and an engine LSF encoder mode
    (``layer3_encode(lsf=True)``) whose round trip pins all of it
    with SYNTHETIC grids. The tabulated 13818-3 data (bitrate row,
    SFB grids, nr_sfb partition counts) is the ``load_lsf_tables`` /
    ``$SPARK_GRAFT_LSF_TABLES`` seam; LSF intensity stereo raises
    (different is_pos coding).

The ENGINE ENCODER (`layer3_encode`) emits conformant-syntax streams
at the table-0 + count1-B operating point: long blocks, big_values=0,
all spectral data as {0, +/-1} quadruples with per-scalefactor-band
gains — a coarse but honest codec (sign + band envelope) whose every
bit the decoder exercises: side info, scalefactors, reservoir
(main_data_begin > 0 arises naturally once blob sizes trail frame
areas), count1 Huffman, requantization, alias butterflies, IMDCT,
PQMF. Codec delay: 576 samples (one granule, MDCT overlap) +
``PQMF_DELAY``.
"""

from __future__ import annotations

import math

from data_migration_etl_scripts_spark.operators.mpeg_audio import (
    BITRATES_L3,
    PQMF_DELAY,
    SAMPLE_RATES,
    _BitReader,
    _BitWriter,
    _frame_header,
    pqmf_analyze,
    pqmf_synthesize,
)

__all__ = [
    "layer3_decode", "layer3_encode", "load_huffman_tables",
    "load_lsf_tables", "PQMF_DELAY",
]

#: scalefac_compress -> (slen1, slen2): bit widths for the low/high
#: scalefactor groups (ISO 11172-3 2.4.2.7 — a 16-entry pairing, kept
#: as data; both halves are <= 4 bits so the table is self-checking
#: against part2 length accounting in the tests).
SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

#: preemphasis table: extra scalefactor added per long sfb when
#: preflag is set (Annex-B data; engine encoder never sets preflag).
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

#: scalefactor-band boundaries in spectral lines (22 long bands /
#: 13 short bands per window) — Annex-B Table B.8 data, see the
#: module docstring's seam note.
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

#: alias-reduction source coefficients ci (8 values, ISO 2.4.3.4.10.1);
#: cs/ca derive by formula and form a Givens rotation (cs^2+ca^2 == 1),
#: so the encoder-side inverse is the exact transpose.
_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
_CS = [1.0 / math.sqrt(1.0 + c * c) for c in _CI]
_CA = [c / math.sqrt(1.0 + c * c) for c in _CI]

#: big_values Huffman codebooks: table index -> (linbits,
#: {(length, code): (x, y)}). Table 0 is the spec-structural empty
#: table (no bits read; the region decodes to zeros). Tables 1-31 and
#: count1 table A are the Annex-B Table B.7 DATA SEAM — plug them in
#: here and `_read_big_values` handles them (ESC-15 + linbits + sign
#: bits included).
HUFF_TABLES: dict[int, tuple[int, dict[tuple[int, int], tuple[int, int]]]] = {
    0: (0, {}),
}
#: count1 table A codebook: {(length, code): (v, w, x, y)} — same seam.
COUNT1_TABLE_A: dict[tuple[int, int], tuple[int, int, int, int]] = {}

#: env var naming a JSON file of Annex-B tables, auto-loaded on the
#: first decode that needs a missing table (see load_huffman_tables)
_TABLES_ENV = "SPARK_GRAFT_MP3_TABLES"
_env_load_done = False

#: MPEG-2/2.5 LSF Layer III seam (r9): the lower-sampling-frequency
#: bitrate row, SFB grids (inserted into SFB_LONG/SFB_SHORT under
#: their own rates — the keyspaces don't collide), and the 4-partition
#: scalefactor-band count table nr_sfb[kind][row] (kind long/short/
#: mixed, row = the scalefac_compress range class). All tabulated spec
#: data (13818-3 Annex B) — ``load_lsf_tables`` injects them;
#: ``$SPARK_GRAFT_LSF_TABLES`` auto-loads. The slen partitioning
#: FORMULA from the 9-bit scalefac_compress lives in ``_lsf_slens``
#: (engine data to the author's best knowledge — conformance caveat;
#: the engine LSF encoder shares it, so engine round trips are exact
#: by construction).
LSF: dict = {"bitrates": [], "nr_sfb": {}}
_LSF_TABLES_ENV = "SPARK_GRAFT_LSF_TABLES"
_lsf_env_load_done = False


def load_lsf_tables(source) -> int:
    """Inject the MPEG-2/2.5 LSF Layer III tables from a dict or JSON
    file shaped::

        {"bitrates": [14 kbps values for indices 1..14],
         "sfb_long":  {"22050": [23 edges 0..576], ...},
         "sfb_short": {"22050": [14 edges 0..192], ...},
         "nr_sfb": {"long"|"short"|"mixed": [[4 counts] x 3 rows]}}

    Grids register under their integer rates in SFB_LONG/SFB_SHORT
    (8000-24000 — disjoint from the MPEG-1 rates). Returns the number
    of table groups loaded."""
    import json

    if isinstance(source, (str, bytes)):
        with open(source) as fh:
            source = json.load(fh)
    n = 0
    br = source.get("bitrates")
    if br:
        if len(br) != 14 or any(not isinstance(v, int) or v <= 0
                                for v in br):
            raise ValueError("LSF bitrates: need 14 positive kbps values")
        LSF["bitrates"] = [None] + list(br) + [None]
        n += 1
    for key, full, n_edges in (("sfb_long", 576, 23),
                               ("sfb_short", 192, 14)):
        for rate_s, edges in (source.get(key) or {}).items():
            rate = int(rate_s)
            if rate not in (8000, 11025, 12000, 16000, 22050, 24000):
                raise ValueError(f"{key}: {rate} is not an LSF rate")
            if (len(edges) != n_edges or edges[0] != 0
                    or edges[-1] != full
                    or any(b <= a for a, b in zip(edges, edges[1:]))):
                raise ValueError(
                    f"{key}[{rate}]: need {n_edges} strictly increasing "
                    f"edges from 0 to {full}"
                )
            (SFB_LONG if key == "sfb_long" else SFB_SHORT)[rate] = list(edges)
            n += 1
    for kind, rows in (source.get("nr_sfb") or {}).items():
        if kind not in ("long", "short", "mixed"):
            raise ValueError(f"nr_sfb kind {kind!r} unknown")
        if len(rows) != 3 or any(
            len(rw) != 4 or any(not isinstance(v, int) or v < 0 for v in rw)
            for rw in rows
        ):
            raise ValueError(f"nr_sfb[{kind}]: need 3 rows of 4 counts")
        LSF["nr_sfb"][kind] = [list(rw) for rw in rows]
        n += 1
    return n


def _try_env_lsf_tables() -> bool:
    global _lsf_env_load_done
    if _lsf_env_load_done:
        return False
    import os

    path = os.environ.get(_LSF_TABLES_ENV)
    if not (path and os.path.exists(path)):
        return False
    load_lsf_tables(path)
    _lsf_env_load_done = True
    return True


def _lsf_slens(sfc: int) -> tuple[list[int], int, int]:
    """9-bit LSF scalefac_compress -> (slen[4], nr_sfb row, preflag).
    Formula-level partitioning (non-intensity channels); constants are
    engine data to the author's best knowledge — see the LSF seam
    note. Intensity-coded channels use a different partitioning and
    are out of scope (the decoder raises before getting here)."""
    if sfc < 400:
        return ([(sfc >> 4) // 5, (sfc >> 4) % 5,
                 (sfc >> 2) & 3, sfc & 3], 0, 0)
    if sfc < 500:
        s = sfc - 400
        return ([(s >> 2) // 5, (s >> 2) % 5, s & 3, 0], 1, 0)
    s = sfc - 500
    return ([s // 3, s % 3, 0, 0], 2, 1)


def _lsf_nr_sfb(kind: str, row: int) -> list[int]:
    rows = LSF["nr_sfb"].get(kind)
    if rows is None:
        _try_env_lsf_tables()
        rows = LSF["nr_sfb"].get(kind)
    if rows is None:
        raise NotImplementedError(
            f"LSF nr_sfb[{kind}] is tabulated spec data — "
            "load_lsf_tables(path) or $SPARK_GRAFT_LSF_TABLES injects it"
        )
    return rows[row]


def _check_prefix_free(codes: dict) -> None:
    by_len: dict[int, set[int]] = {}
    for (hlen, code) in codes:
        by_len.setdefault(hlen, set()).add(code)
    for (hlen, code) in codes:
        for l2, cs in by_len.items():
            if l2 < hlen and (code >> (hlen - l2)) in cs:
                raise ValueError(
                    f"codebook not prefix-free: ({hlen}, {code:#b}) is "
                    f"shadowed by a {l2}-bit code"
                )


def load_huffman_tables(source) -> int:
    """Inject ISO 11172-3 Annex-B Table B.7 data (the big_values
    codebooks and count1 table A) WITHOUT source edits — the loader
    half of the repo's Annex-B policy: the spec tables stay out of the
    repo, a user who has the spec data drops them in from a file.

    ``source`` is a dict or a path to a JSON file shaped:

        {"tables": {"<idx>": {"linbits": N,
                              "codes": [[hlen, code, x, y], ...]},
                    ...},
         "count1a": [[hlen, code, v, w, x, y], ...]}

    Validates widths (hlen 1-24, code < 2**hlen, values 0-15) and
    prefix-freeness per codebook; merges into ``HUFF_TABLES`` /
    ``COUNT1_TABLE_A`` and returns the number of big_values tables
    loaded. Setting ``$SPARK_GRAFT_MP3_TABLES=/path/tables.json`` is
    equivalent: the decoder auto-loads it on the first frame that
    needs a missing table, so arbitrary foreign (LAME/FFmpeg) MP3s
    decode end-to-end with no code change."""
    import json

    if isinstance(source, (str, bytes)):
        with open(source) as fh:
            source = json.load(fh)
    n = 0
    for idx_s, spec in (source.get("tables") or {}).items():
        idx = int(idx_s)
        if not 1 <= idx <= 31:
            raise ValueError(f"big_values table index {idx} out of range")
        linbits = int(spec.get("linbits", 0))
        book: dict[tuple[int, int], tuple[int, int]] = {}
        for hlen, code, x, y in spec["codes"]:
            if not (1 <= hlen <= 24 and 0 <= code < (1 << hlen)
                    and 0 <= x <= 15 and 0 <= y <= 15):
                raise ValueError(
                    f"table {idx}: bad entry ({hlen}, {code}, {x}, {y})"
                )
            book[(hlen, code)] = (x, y)
        _check_prefix_free(book)
        HUFF_TABLES[idx] = (linbits, book)
        n += 1
    if source.get("count1a"):
        book_a: dict[tuple[int, int], tuple[int, int, int, int]] = {}
        for hlen, code, v, w, x, y in source["count1a"]:
            if not (1 <= hlen <= 24 and 0 <= code < (1 << hlen)
                    and all(t in (0, 1) for t in (v, w, x, y))):
                raise ValueError(f"count1a: bad entry ({hlen}, {code})")
            book_a[(hlen, code)] = (v, w, x, y)
        _check_prefix_free(book_a)
        COUNT1_TABLE_A.clear()
        COUNT1_TABLE_A.update(book_a)
    return n


def _try_env_tables() -> bool:
    """Auto-load from $SPARK_GRAFT_MP3_TABLES; latches only after a
    successful load so an env var set later in a long-lived process
    still takes effect."""
    global _env_load_done
    if _env_load_done:
        return False
    import os

    path = os.environ.get(_TABLES_ENV)
    if not (path and os.path.exists(path)):
        return False
    load_huffman_tables(path)
    _env_load_done = True
    return True

_MAX_RESERVOIR = 255  # encoder cap on main_data_begin (field max 511)


# --------------------------------------------------------- side info

def _parse_side_info(r: _BitReader, nch: int) -> dict:
    si: dict = {"main_data_begin": r.read(9)}
    r.read(5 if nch == 1 else 3)  # private_bits
    si["scfsi"] = [[r.read(1) for _ in range(4)] for _ in range(nch)]
    grs = []
    for _g in range(2):
        chs = []
        for _ch in range(nch):
            gi: dict = {
                "part2_3_length": r.read(12),
                "big_values": r.read(9),
                "global_gain": r.read(8),
                "scalefac_compress": r.read(4),
                "window_switching": r.read(1),
            }
            if gi["window_switching"]:
                gi["block_type"] = r.read(2)
                gi["mixed_block"] = r.read(1)
                gi["table_select"] = [r.read(5), r.read(5)]
                gi["subblock_gain"] = [r.read(3) for _ in range(3)]
                if gi["block_type"] == 0:
                    raise ValueError("window_switching with block_type 0")
            else:
                gi["block_type"] = 0
                gi["mixed_block"] = 0
                gi["table_select"] = [r.read(5) for _ in range(3)]
                gi["region0_count"] = r.read(4)
                gi["region1_count"] = r.read(3)
                gi["subblock_gain"] = [0, 0, 0]
            gi["preflag"] = r.read(1)
            gi["scalefac_scale"] = r.read(1)
            gi["count1table_select"] = r.read(1)
            chs.append(gi)
        grs.append(chs)
    si["granules"] = grs
    return si


def _side_info_len(nch: int, version: int = 0b11) -> int:
    if version == 0b11:
        return 17 if nch == 1 else 32
    return 9 if nch == 1 else 17


def _parse_side_info_lsf(r: _BitReader, nch: int) -> dict:
    """MPEG-2/2.5 Layer III side info: ONE granule, 8-bit
    main_data_begin, 1/2 private bits, no scfsi, 9-bit
    scalefac_compress, no preflag bit (derived from the sfc range)."""
    si: dict = {"main_data_begin": r.read(8)}
    r.read(1 if nch == 1 else 2)  # private_bits
    si["scfsi"] = [[0, 0, 0, 0] for _ in range(nch)]
    chs = []
    for _ch in range(nch):
        gi: dict = {
            "part2_3_length": r.read(12),
            "big_values": r.read(9),
            "global_gain": r.read(8),
            "scalefac_compress": r.read(9),
            "window_switching": r.read(1),
        }
        if gi["window_switching"]:
            gi["block_type"] = r.read(2)
            gi["mixed_block"] = r.read(1)
            gi["table_select"] = [r.read(5), r.read(5)]
            gi["subblock_gain"] = [r.read(3) for _ in range(3)]
            if gi["block_type"] == 0:
                raise ValueError("window_switching with block_type 0")
        else:
            gi["block_type"] = 0
            gi["mixed_block"] = 0
            gi["table_select"] = [r.read(5) for _ in range(3)]
            gi["region0_count"] = r.read(4)
            gi["region1_count"] = r.read(3)
            gi["subblock_gain"] = [0, 0, 0]
        _slens, _row, preflag = _lsf_slens(gi["scalefac_compress"])
        gi["preflag"] = preflag
        gi["scalefac_scale"] = r.read(1)
        gi["count1table_select"] = r.read(1)
        chs.append(gi)
    si["granules"] = [chs]
    return si


def _read_scalefactors_lsf(r: _BitReader, gi: dict) -> dict:
    """LSF part2: 4 partitions of nr_sfb[row] scalefactors at slen[p]
    bits each, filled band-major (and window-minor for short
    blocks)."""
    slens, row, _pre = _lsf_slens(gi["scalefac_compress"])
    short = gi["block_type"] == 2
    mixed = short and gi["mixed_block"]
    kind = "mixed" if mixed else ("short" if short else "long")
    nr = _lsf_nr_sfb(kind, row)
    vals: list[int] = []
    for p in range(4):
        for _ in range(nr[p]):
            vals.append(r.read(slens[p]) if slens[p] else 0)
    out: dict = {}
    if short and not mixed:
        out["s"] = [[0, 0, 0] for _ in range(12)]
        for k, v in enumerate(vals):
            sfb, w = k // 3, k % 3
            if sfb < 12:
                out["s"][sfb][w] = v
        out["l"] = [0] * 21
    elif mixed:
        # first partition covers the long bands, the rest short bands
        # from sfb 3 (window-minor)
        nlong = nr[0]
        out["l"] = [0] * 21
        for k in range(min(nlong, 21)):
            out["l"][k] = vals[k] if k < len(vals) else 0
        out["s"] = [[0, 0, 0] for _ in range(12)]
        for k, v in enumerate(vals[nlong:]):
            sfb, w = 3 + k // 3, k % 3
            if sfb < 12:
                out["s"][sfb][w] = v
    else:
        out["l"] = ([v for v in vals] + [0] * 21)[:21]
    return out


# ------------------------------------------------------ scalefactors

def _read_scalefactors(
    r: _BitReader, gi: dict, scfsi: list[int], gr: int, prev: dict | None
) -> dict:
    """part2: returns {"l": [21 ints]} and/or {"s": [[3] x 12 sfbs]}.
    scfsi reuse (granule 2, long blocks only) copies the group from
    granule 1 and reads no bits for it."""
    slen1, slen2 = SLEN[gi["scalefac_compress"]]
    short = gi["block_type"] == 2
    mixed = short and gi["mixed_block"]
    out: dict = {}
    if short and not mixed:
        out["s"] = [
            [r.read(slen1 if sfb < 6 else slen2) for _w in range(3)]
            for sfb in range(12)
        ]
        out["l"] = [0] * 21
    elif mixed:
        out["l"] = [r.read(slen1) for _ in range(8)] + [0] * 13
        out["s"] = [[0, 0, 0] for _ in range(3)] + [
            [r.read(slen1 if sfb < 6 else slen2) for _w in range(3)]
            for sfb in range(3, 12)
        ]
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
        sf = [0] * 21
        for gidx, (lo, hi, slen) in enumerate(groups):
            if gr == 1 and scfsi[gidx] and prev is not None:
                sf[lo:hi] = prev["l"][lo:hi]
            else:
                for sfb in range(lo, hi):
                    sf[sfb] = r.read(slen)
        out["l"] = sf
    return out


# ----------------------------------------------------------- huffman

def _decode_prefix(r: _BitReader, book: dict, end_bit: int):
    code, length = 0, 0
    while length < 24:
        if r.bitpos >= end_bit:
            return None
        code = (code << 1) | r.read(1)
        length += 1
        hit = book.get((length, code))
        if hit is not None:
            return hit
    raise ValueError("Huffman walk exceeded 24 bits — corrupt stream")


def _read_spectrum(
    r: _BitReader, gi: dict, end_bit: int, rate: int
) -> list[int]:
    """big_values pairs + count1 quads -> 576 signed ints."""
    ix = [0] * 576
    long_b = SFB_LONG[rate]
    if gi["window_switching"]:
        # short non-mixed: fixed 36 (= 3 * short-sfb[3]); start/stop/mixed:
        # implied region0_count = 7 -> boundary long_b[8], which is also 36
        # at every MPEG-1 rate (dist10/pdmp3 convention).
        r1 = 36 if gi["block_type"] == 2 and not gi["mixed_block"] else long_b[8]
        r2 = 576
    else:
        r1 = long_b[min(gi["region0_count"] + 1, 22)]
        r2 = long_b[min(gi["region0_count"] + 1 + gi["region1_count"] + 1, 22)]
    nbig = min(gi["big_values"] * 2, 576)
    i = 0
    while i < nbig:
        region = 0 if i < r1 else (1 if i < r2 else 2)
        tsel = gi["table_select"][region]
        if tsel not in HUFF_TABLES and _try_env_tables():
            pass  # env-provided Annex-B tables just loaded; recheck
        if tsel not in HUFF_TABLES:
            raise NotImplementedError(
                f"big_values Huffman table {tsel} is Annex-B data — "
                "load_huffman_tables(path) or $SPARK_GRAFT_MP3_TABLES "
                "injects it (see module docstring seam note)"
            )
        linbits, book = HUFF_TABLES[tsel]
        if not book:  # table 0: zero region, no bits read
            i += 2
            continue
        hit = _decode_prefix(r, book, end_bit)
        if hit is None:
            return ix
        x, y = hit
        for j, v in enumerate((x, y)):
            if v == 15 and linbits:
                v += r.read(linbits)
            if v:
                if r.read(1):
                    v = -v
            if i + j < 576:
                ix[i + j] = v
        i += 2
    # count1 region: quads until part2_3 bits or 576 lines exhausted
    while r.bitpos < end_bit and i + 4 <= 576:
        mark = r.bitpos
        if gi["count1table_select"]:
            quad = (~r.read(4)) & 0xF
            vals = [(quad >> 3) & 1, (quad >> 2) & 1, (quad >> 1) & 1, quad & 1]
        else:
            if not COUNT1_TABLE_A:
                _try_env_tables()
            if not COUNT1_TABLE_A:
                raise NotImplementedError(
                    "count1 table A is Annex-B data — "
                    "load_huffman_tables(path) or $SPARK_GRAFT_MP3_TABLES "
                    "injects it"
                )
            hit = _decode_prefix(r, COUNT1_TABLE_A, end_bit)
            if hit is None:
                break
            vals = list(hit)
        for j in range(4):
            if vals[j]:
                if r.bitpos >= end_bit:
                    # partial quad past the boundary: discard it
                    for k in range(j):
                        ix[i + k] = 0
                    r.bitpos = mark
                    return ix
                if r.read(1):
                    vals[j] = -vals[j]
            ix[i + j] = vals[j]
        if r.bitpos > end_bit:  # quad overran: discard
            for k in range(4):
                ix[i + k] = 0
            r.bitpos = mark
            break
        i += 4
    return ix


# ------------------------------------------------------ requantize &c

def _requantize(
    ix: list[int], gi: dict, scf: dict, rate: int
) -> list[float]:
    out = [0.0] * 576
    g = gi["global_gain"] - 210
    sstep = 0.5 * (1 + gi["scalefac_scale"])
    short = gi["block_type"] == 2
    mixed = short and gi["mixed_block"]
    long_b, short_b = SFB_LONG[rate], SFB_SHORT[rate]
    long_end = 36 if mixed else (0 if short else 576)
    # long part
    sfb = 0
    for i in range(long_end if short else 576):
        while sfb < 21 and i >= long_b[sfb + 1]:
            sfb += 1
        v = ix[i]
        if not v:
            continue
        sc = scf["l"][sfb] + gi["preflag"] * PRETAB[sfb] if sfb < 21 else 0
        out[i] = (
            math.copysign(abs(v) ** (4.0 / 3.0), v)
            * 2.0 ** (0.25 * g - sstep * sc)
        )
    if not short:
        return out
    # short part: spectral order is sfb-major, window-minor. 13 bands
    # per window; the last (like long sfb 21) carries no scalefactor.
    start_sfb = 3 if mixed else 0
    pos = long_end
    for sfb in range(start_sfb, 13):
        width = short_b[sfb + 1] - short_b[sfb]
        for w in range(3):
            gw = g - 8 * gi["subblock_gain"][w]
            sc = scf["s"][sfb][w] if sfb < 12 else 0
            for _k in range(width):
                if pos >= 576:
                    break
                v = ix[pos]
                if v:
                    out[pos] = (
                        math.copysign(abs(v) ** (4.0 / 3.0), v)
                        * 2.0 ** (0.25 * gw - sstep * sc)
                    )
                pos += 1
    return out


def _reorder_short(xr: list[float], gi: dict, rate: int) -> list[float]:
    """Map short-block spectral order (sfb, window, line) onto the
    IMDCT layout (subband*18 + window*6 + line%6)."""
    if gi["block_type"] != 2:
        return xr
    short_b = SFB_SHORT[rate]
    mixed = bool(gi["mixed_block"])
    out = list(xr[:36]) + [0.0] * 540 if mixed else [0.0] * 576
    pos = 36 if mixed else 0
    for sfb in range(3 if mixed else 0, 13):
        width = short_b[sfb + 1] - short_b[sfb]
        for w in range(3):
            for k in range(width):
                f = short_b[sfb] + k  # freq index within window w
                dst = (f // 6) * 18 + w * 6 + (f % 6)
                if dst >= 576 or pos >= 576:
                    break
                out[dst] = xr[pos]
                pos += 1
    return out


def _alias_reduce(x: list[float], gi: dict, inverse: bool = False) -> list[float]:
    """8 Givens butterflies per long-subband boundary (decoder
    direction); ``inverse=True`` is the exact transpose used by the
    encoder. Short non-mixed blocks: none; mixed: boundary 1 only."""
    if gi["block_type"] == 2 and not gi["mixed_block"]:
        return x
    nb = 2 if (gi["block_type"] == 2 and gi["mixed_block"]) else 32
    y = list(x)
    for b in range(1, nb):
        for i in range(8):
            u, d = y[18 * b - 1 - i], y[18 * b + i]
            if inverse:
                y[18 * b - 1 - i] = u * _CS[i] + d * _CA[i]
                y[18 * b + i] = d * _CS[i] - u * _CA[i]
            else:
                y[18 * b - 1 - i] = u * _CS[i] - d * _CA[i]
                y[18 * b + i] = d * _CS[i] + u * _CA[i]
    return y


# --------------------------------------------------------------- imdct

def _win(block_type: int) -> list[float]:
    if block_type == 0:
        return [math.sin(math.pi / 36 * (n + 0.5)) for n in range(36)]
    if block_type == 1:  # start
        return (
            [math.sin(math.pi / 36 * (n + 0.5)) for n in range(18)]
            + [1.0] * 6
            + [math.sin(math.pi / 12 * (n - 18 + 0.5)) for n in range(24, 30)]
            + [0.0] * 6
        )
    if block_type == 3:  # stop
        return (
            [0.0] * 6
            + [math.sin(math.pi / 12 * (n - 6 + 0.5)) for n in range(6, 12)]
            + [1.0] * 6
            + [math.sin(math.pi / 36 * (n + 0.5)) for n in range(18, 36)]
        )
    raise ValueError("short windows go through _imdct_short")


_WIN_SHORT = [math.sin(math.pi / 12 * (n + 0.5)) for n in range(12)]


def _imdct_matrices():
    """Precomputed numpy transform matrices (r7 vectorization — the
    same cos/window float64 values the scalar loops used):
    imdct[bt] (36, 18) windowed long IMDCT; short (12, 6) windowed
    12-point IMDCT; fwd (18, 36) forward MDCT with the 4/36 scale."""
    import numpy as np

    global _MATS
    if _MATS is None:
        cos_l = np.cos(
            np.pi / 72
            * (2 * np.arange(36)[:, None] + 1 + 18)
            * (2 * np.arange(18)[None, :] + 1)
        )
        imdct = {
            bt: np.asarray(_win(bt), dtype=np.float64)[:, None] * cos_l
            for bt in (0, 1, 3)
        }
        cos_s = np.cos(
            np.pi / 24
            * (2 * np.arange(12)[:, None] + 1 + 6)
            * (2 * np.arange(6)[None, :] + 1)
        )
        short = np.asarray(_WIN_SHORT, dtype=np.float64)[:, None] * cos_s
        fwd = (4.0 / 36.0) * (
            np.asarray(_win(0), dtype=np.float64)[None, :] * cos_l.T
        )
        _MATS = (imdct, short, fwd)
    return _MATS


_MATS = None


def _imdct_long(X: list[float], block_type: int) -> list[float]:
    import numpy as np

    imdct, _short, _fwd = _imdct_matrices()
    return (imdct[block_type] @ np.asarray(X, dtype=np.float64)).tolist()


def _imdct_short(X: list[float]) -> list[float]:
    """Three 12-point IMDCTs overlaid at offsets 6/12/18 in the
    36-sample slot; X is subband-local (window*6 + line)."""
    import numpy as np

    _imdct, short, _fwd = _imdct_matrices()
    xs = np.asarray(X, dtype=np.float64).reshape(3, 6)
    out = np.zeros(36)
    for w in range(3):
        out[6 + 6 * w: 18 + 6 * w] += short @ xs[w]
    return out.tolist()


def _mdct_long(x36: list[float]) -> list[float]:
    """Forward of :func:`_imdct_long` for block_type 0 (engine encoder):
    scale 4/36 makes IMDCT + windowed overlap-add the exact inverse
    (TDAC identity pinned in tests)."""
    import numpy as np

    _imdct, _short, fwd = _imdct_matrices()
    return (fwd @ np.asarray(x36, dtype=np.float64)).tolist()


# --------------------------------------------------------------- decode

def layer3_decode(data: bytes) -> tuple[int, int, list[list[float]]]:
    """MPEG-1 Layer III bytes -> (rate, nch, per-channel floats).
    Walks frames, maintains the bit reservoir, and synthesizes through
    the shared pseudo-QMF bank. Frames whose main_data_begin points
    before the available reservoir (stream cut-in) are skipped, the
    standard streaming behavior."""
    from data_migration_etl_scripts_spark.operators.mpeg_audio import _parse_header

    pos, rate, nch, mode_ext = 0, None, None, 0
    version = 0b11
    pool = bytearray()
    pending: list[tuple[int, dict]] = []  # (pool_start_byte, side_info)
    while pos + 4 <= len(data):
        hdr = _parse_header(data, pos)
        if hdr["layer"] != 3:
            raise ValueError("mid-stream layer change")
        if pos + hdr["frame_len"] > len(data):
            break
        if rate is None:
            rate, nch, version = hdr["rate"], hdr["nch"], hdr["version"]
        elif hdr["rate"] != rate or hdr["nch"] != nch:
            raise ValueError("mid-stream rate/mode change")
        mode_ext = hdr["mode_ext"] if hdr["mode"] == 0b01 else 0
        if version != 0b11 and mode_ext & 0b01:
            raise NotImplementedError(
                "LSF intensity stereo (different is_pos coding)"
            )
        body = pos + 4 + (2 if hdr["crc"] else 0)
        if version == 0b11:
            si = _parse_side_info(_BitReader(data, body), nch)
        else:
            si = _parse_side_info_lsf(_BitReader(data, body), nch)
        start = len(pool) - si["main_data_begin"]
        main = data[body + _side_info_len(nch, version): pos + hdr["frame_len"]]
        pool.extend(main)
        if start >= 0:
            pending.append((start, si))
        pos += hdr["frame_len"]
    if rate is None:
        raise ValueError("no complete Layer III frame found")

    subband_stream: list[list[list[float]]] = [[] for _ in range(nch)]
    overlap = [[[0.0] * 18 for _ in range(32)] for _ in range(nch)]
    for start, si in pending:
        r = _BitReader(bytes(pool), start)
        # scfsi reuse is per CHANNEL within a frame: granule 2 copies the
        # flagged groups from the SAME channel's granule-1 scalefactors.
        gr0_scfs: list[dict | None] = [None] * nch
        for gr in range(len(si["granules"])):
            xs = []
            ixs, scfs = [], []
            for ch in range(nch):
                gi = si["granules"][gr][ch]
                p23_end = r.bitpos + gi["part2_3_length"]
                if version == 0b11:
                    scf = _read_scalefactors(
                        r, gi, si["scfsi"][ch], gr, gr0_scfs[ch]
                    )
                else:
                    scf = _read_scalefactors_lsf(r, gi)
                if gr == 0:
                    gr0_scfs[ch] = scf
                ix = _read_spectrum(r, gi, p23_end, rate)
                r.bitpos = p23_end  # skip stuffing up to the boundary
                ixs.append(ix)
                scfs.append(scf)
                xs.append(_requantize(ix, gi, scf, rate))
            izone = 576  # first intensity line (MS applies below it)
            if nch == 2 and mode_ext & 0b01:  # intensity stereo (r7)
                if any(si["granules"][gr][c]["block_type"] == 2
                       for c in range(2)):
                    raise NotImplementedError(
                        "intensity stereo with short blocks"
                    )
                zero_bound = 0
                for i in range(575, -1, -1):
                    if ixs[1][i]:
                        zero_bound = i + 1
                        break
                long_b = SFB_LONG[rate]
                izone = None
                for sfb in range(21):
                    if long_b[sfb] < zero_bound:
                        continue  # right still carries real data here
                    if izone is None:
                        izone = long_b[sfb]
                    is_pos = scfs[1]["l"][sfb]
                    if is_pos == 7:
                        continue  # intensity off for this band
                    if is_pos == 6:
                        rl, rr = 1.0, 0.0
                    else:
                        t_ = math.tan(is_pos * math.pi / 12.0)
                        rl, rr = t_ / (1.0 + t_), 1.0 / (1.0 + t_)
                    for i in range(long_b[sfb], long_b[sfb + 1]):
                        x = xs[0][i]
                        xs[0][i] = x * rl
                        xs[1][i] = x * rr
                if izone is None:
                    izone = 576
            if nch == 2 and mode_ext & 0b10:  # MS stereo (below izone)
                inv = 1.0 / math.sqrt(2.0)
                for i in range(izone):
                    m, s = xs[0][i], xs[1][i]
                    xs[0][i], xs[1][i] = (m + s) * inv, (m - s) * inv
            for ch in range(nch):
                gi = si["granules"][gr][ch]
                xr = _reorder_short(xs[ch], gi, rate)
                xr = _alias_reduce(xr, gi)
                grans = [[0.0] * 32 for _ in range(18)]
                for sb in range(32):
                    X = xr[sb * 18: sb * 18 + 18]
                    mixed_long = gi["mixed_block"] and sb < 2
                    if gi["block_type"] == 2 and not mixed_long:
                        y = _imdct_short(X)
                    else:
                        bt = 0 if (gi["block_type"] == 2 and mixed_long) else gi["block_type"]
                        y = _imdct_long(X, bt)
                    ov = overlap[ch][sb]
                    for t in range(18):
                        v = y[t] + ov[t]
                        if sb & 1 and t & 1:  # frequency inversion
                            v = -v
                        grans[t][sb] = v
                    overlap[ch][sb] = y[18:]
                subband_stream[ch].extend(grans)
    channels = [pqmf_synthesize(g) for g in subband_stream]
    return rate, nch, channels


# --------------------------------------------------------------- encode

def _quantize_granule(
    lines: list[float], rate: int, caps: list[int] | None = None
) -> tuple[list[int], int, list[int]]:
    """{0,+/-1} sign + per-band envelope quantization at the table-0 /
    count1-B operating point: global_gain fits the loudest band,
    per-sfb scalefactors (scalefac_scale=0 -> 3 dB steps) attenuate
    the rest. Returns (ix, global_gain, scalefacs[21])."""
    long_b = SFB_LONG[rate]
    caps = caps if caps is not None else [15] * 11 + [7] * 10
    amax = [0.0] * 22
    for sfb in range(22):
        for i in range(long_b[sfb], long_b[sfb + 1]):
            amax[sfb] = max(amax[sfb], abs(lines[i]))
    peak = max(amax)
    if peak <= 0.0:
        return [0] * 576, 210, [0] * 21
    gg = max(0, min(255, round(210 + 4 * math.log2(peak))))
    g = 2.0 ** (0.25 * (gg - 210))
    scf = [0] * 21
    ix = [0] * 576
    for sfb in range(22):
        if amax[sfb] <= 0.0:
            if sfb < 21:
                scf[sfb] = caps[sfb]
            continue
        if sfb < 21:
            scf[sfb] = max(0, min(caps[sfb],
                                  round(-2 * math.log2(amax[sfb] / g))))
            v = g * 2.0 ** (-0.5 * scf[sfb])
        else:
            v = g
        for i in range(long_b[sfb], long_b[sfb + 1]):
            if abs(lines[i]) >= 0.5 * v:
                ix[i] = 1 if lines[i] > 0 else -1
    return ix, gg, scf


def _pack_granule(w: _BitWriter, ix: list[int], gg: int, scf: list[int]) -> dict:
    """part2 (scalefactors, scalefac_compress=15: slen 4/3) + count1
    quads, appended to ``w`` at BIT level (granules abut bit-exactly —
    the decoder locates granule 2 at granule 1's start +
    part2_3_length, so no per-granule byte alignment is allowed).
    Returns the granule's side info fields."""
    start = w.n + 8 * len(w.buf)
    for sfb in range(11):
        w.write(scf[sfb], 4)
    for sfb in range(11, 21):
        w.write(scf[sfb], 3)
    last = 0
    for i, v in enumerate(ix):
        if v:
            last = i + 1
    nquads = (last + 3) // 4
    for q in range(nquads):
        vals = ix[4 * q: 4 * q + 4]
        quad = 0
        for v in vals:
            quad = (quad << 1) | (1 if v else 0)
        w.write((~quad) & 0xF, 4)
        for v in vals:
            if v:
                w.write(1 if v < 0 else 0, 1)
    nbits = (w.n + 8 * len(w.buf)) - start
    gi = {
        "part2_3_length": nbits,
        "big_values": 0,
        "global_gain": gg,
        "scalefac_compress": 15,
        "table_select": [0, 0, 0],
        "region0_count": 0,
        "region1_count": 0,
        "preflag": 0,
        "scalefac_scale": 0,
        "count1table_select": 1,
    }
    return gi


def _pack_granule_lsf(
    w: _BitWriter, ix: list[int], gg: int, scf: list[int],
    nr: list[int], slens: list[int], sfc: int,
) -> dict:
    """LSF part2 (4 partitions of nr[p] scalefactors at slens[p] bits)
    + count1 quads — same bit-abutting contract as _pack_granule."""
    start = w.n + 8 * len(w.buf)
    band = 0
    for p in range(4):
        for _ in range(nr[p]):
            v = scf[band] if band < 21 else 0
            if slens[p]:
                w.write(v, slens[p])
            band += 1
    last = 0
    for i, v in enumerate(ix):
        if v:
            last = i + 1
    for q in range((last + 3) // 4):
        vals = ix[4 * q: 4 * q + 4]
        quad = 0
        for v in vals:
            quad = (quad << 1) | (1 if v else 0)
        w.write((~quad) & 0xF, 4)
        for v in vals:
            if v:
                w.write(1 if v < 0 else 0, 1)
    nbits = (w.n + 8 * len(w.buf)) - start
    return {
        "part2_3_length": nbits,
        "big_values": 0,
        "global_gain": gg,
        "scalefac_compress": sfc,
        "table_select": [0, 0, 0],
        "region0_count": 0,
        "region1_count": 0,
        "preflag": 0,
        "scalefac_scale": 0,
        "count1table_select": 1,
    }


def _write_side_info_lsf(
    w: _BitWriter, begin: int, nch: int, gis: list[dict]
) -> None:
    w.write(begin, 8)
    w.write(0, 1 if nch == 1 else 2)
    for ch in range(nch):
        gi = gis[ch]
        w.write(gi["part2_3_length"], 12)
        w.write(gi["big_values"], 9)
        w.write(gi["global_gain"], 8)
        w.write(gi["scalefac_compress"], 9)
        w.write(0, 1)  # window_switching: long blocks only
        for t in gi["table_select"]:
            w.write(t, 5)
        w.write(gi["region0_count"], 4)
        w.write(gi["region1_count"], 3)
        w.write(gi["scalefac_scale"], 1)
        w.write(gi["count1table_select"], 1)


def _write_side_info(
    w: _BitWriter, begin: int, nch: int, gis: list[list[dict]],
    scfsi: list[list[int]] | None = None,
) -> None:
    """``scfsi`` is 4 group bits per channel (None -> all fresh; the
    engine encoder always transmits full scalefactors)."""
    w.write(begin, 9)
    w.write(0, 5 if nch == 1 else 3)
    for ch in range(nch):
        for bit in (scfsi[ch] if scfsi is not None else (0, 0, 0, 0)):
            w.write(bit, 1)
    for gr in range(2):
        for ch in range(nch):
            gi = gis[gr][ch]
            w.write(gi["part2_3_length"], 12)
            w.write(gi["big_values"], 9)
            w.write(gi["global_gain"], 8)
            w.write(gi["scalefac_compress"], 4)
            w.write(0, 1)  # window_switching: long blocks only
            for t in gi["table_select"]:
                w.write(t, 5)
            w.write(gi["region0_count"], 4)
            w.write(gi["region1_count"], 3)
            w.write(gi["preflag"], 1)
            w.write(gi["scalefac_scale"], 1)
            w.write(gi["count1table_select"], 1)


def layer3_encode(
    samples: list[float],
    rate: int = 44100,
    right: list[float] | None = None,
    ms: bool = True,
    intensity: bool = False,
    bitrate_idx: int | None = None,
    lsf: bool = False,
) -> bytes:
    """Mono (or stereo) [-1, 1] samples -> MPEG-1 Layer III bytes at
    the engine operating point (module docstring). ``right`` enables
    two-channel coding; ``ms=True`` codes mid/side (joint stereo,
    mode_ext=2) — exact by linearity of the filterbank. The bit
    reservoir engages automatically whenever a frame's blob undershoots
    its main-data area (main_data_begin > 0 on the following frames),
    capped at ``_MAX_RESERVOIR`` via stuffing bytes.

    ``intensity=True`` (r7, requires ``right``): ALL-bands intensity
    stereo (mode_ext bit 0) — the left channel carries the quantized
    L+R spectrum, the right channel's scalefactor slots carry the
    per-band pan position is_pos = round(atan2(|L|, |R|) * 12/pi)
    (7 = band off), and the decoder splits by tan(is_pos*pi/12).
    Lossy by design: per-band panning, exact only when the true L/R
    ratio sits on one of the 7 angles. Lines above the last
    scalefactor band (no is_pos slot) stay on the left channel."""
    if lsf:
        if rate not in (8000, 11025, 12000, 16000, 22050, 24000):
            raise ValueError("lsf=True needs an MPEG-2/2.5 rate")
        if intensity:
            raise ValueError("LSF intensity stereo is out of scope")
        if rate not in SFB_LONG:
            _try_env_lsf_tables()
        if rate not in SFB_LONG or not LSF["bitrates"]:
            raise NotImplementedError(
                f"LSF SFB grid / bitrates for {rate} Hz — "
                "load_lsf_tables(path) or $SPARK_GRAFT_LSF_TABLES "
                "injects them"
            )
    elif rate not in SAMPLE_RATES.values():
        raise ValueError(f"rate must be one of {sorted(SAMPLE_RATES.values())}")
    if right is not None and len(right) != len(samples):
        raise ValueError("stereo channels must be the same length")
    nch = 1 if right is None else 2
    frame_samples = 576 if lsf else 1152
    nfr = len(samples) // frame_samples
    if nfr == 0:
        raise ValueError(
            f"need at least {frame_samples} samples (one frame)"
        )
    if intensity and right is None:
        raise ValueError("intensity=True needs a right channel")
    if nch == 2 and intensity:
        chans = [list(samples), list(right)]
        mode, mode_ext = 0b01, 0b01
    elif nch == 2 and ms:
        inv = 1.0 / math.sqrt(2.0)
        chans = [
            [(a + b) * inv for a, b in zip(samples, right)],
            [(a - b) * inv for a, b in zip(samples, right)],
        ]
        mode, mode_ext = 0b01, 0b10
    elif nch == 2:
        chans = [list(samples), list(right)]
        mode, mode_ext = 0b00, 0
    else:
        chans = [list(samples)]
        mode, mode_ext = 0b11, 0

    # analysis: PQMF -> per-subband MDCT (granule pairs, 50% overlap)
    ngran = nfr * (1 if lsf else 2)
    per_ch_granules = []
    for ch in range(nch):
        sub = pqmf_analyze(chans[ch][: nfr * frame_samples])
        hist = [[0.0] * 18 for _ in range(32)]
        gr_lines = []
        for g in range(ngran):
            block = sub[g * 18: (g + 1) * 18]  # 18 x 32
            lines = [0.0] * 576
            for sb in range(32):
                cur = [block[t][sb] for t in range(18)]
                if sb & 1:  # mirror the decoder's frequency inversion
                    cur = [(-v if t & 1 else v) for t, v in enumerate(cur)]
                X = _mdct_long(hist[sb] + cur)
                lines[sb * 18: sb * 18 + 18] = X
                hist[sb] = cur
            gi_stub = {"block_type": 0, "mixed_block": 0}
            lines = _alias_reduce(lines, gi_stub, inverse=True)
            gr_lines.append(lines)
        per_ch_granules.append(gr_lines)

    # quantize + pack each frame's blob
    blobs: list[bytes] = []
    frame_gis: list[list[list[dict]]] = []
    if lsf:
        # one granule per frame; scalefac_compress 399 -> slens
        # (4,4,3,3) over the injected nr_sfb partitions
        lsf_sfc = 399
        slens, row, _pre = _lsf_slens(lsf_sfc)
        nr = _lsf_nr_sfb("long", row)
        caps = [0] * 21
        band = 0
        for p in range(4):
            for _ in range(nr[p]):
                if band < 21:
                    caps[band] = (1 << slens[p]) - 1
                band += 1
        for f in range(nfr):
            w = _BitWriter()
            gis_f: list[dict] = []
            for ch in range(nch):
                ixg, gg, scf = _quantize_granule(
                    per_ch_granules[ch][f], rate, caps=caps
                )
                gis_f.append(_pack_granule_lsf(
                    w, ixg, gg, scf, nr, slens, lsf_sfc
                ))
            w.pad_to_byte()
            blobs.append(bytes(w.buf))
            frame_gis.append([gis_f])
    for f in range(0 if lsf else nfr):
        w = _BitWriter()
        gis = [[], []]
        for gr in range(2):
            if intensity:
                gl = per_ch_granules[0][f * 2 + gr]
                grr = per_ch_granules[1][f * 2 + gr]
                summed = [a + b for a, b in zip(gl, grr)]
                ixg, gg, scf = _quantize_granule(summed, rate)
                gis[gr].append(_pack_granule(w, ixg, gg, scf))
                # right channel: zero spectrum, scalefactors = is_pos
                long_b = SFB_LONG[rate]
                is_pos = []
                for sfb in range(21):
                    al = sum(abs(v) for v in gl[long_b[sfb]:long_b[sfb + 1]])
                    ar = sum(abs(v) for v in grr[long_b[sfb]:long_b[sfb + 1]])
                    if al == 0.0 and ar == 0.0:
                        is_pos.append(7)  # intensity off: empty band
                    else:
                        is_pos.append(
                            max(0, min(6, round(
                                math.atan2(al, ar) * 12.0 / math.pi
                            )))
                        )
                gis[gr].append(
                    _pack_granule(w, [0] * 576, 210, is_pos)
                )
                continue
            for ch in range(nch):
                ixg, gg, scf = _quantize_granule(
                    per_ch_granules[ch][f * 2 + gr], rate
                )
                gis[gr].append(_pack_granule(w, ixg, gg, scf))
        w.pad_to_byte()  # frame blobs are byte-aligned in the pool
        blobs.append(bytes(w.buf))
        frame_gis.append(gis)

    # frame sizing: smallest uniform bitrate whose area holds every blob
    version = 0b11
    if lsf:
        version = 0b10 if rate >= 16000 else 0b00
        base_rate = rate * (2 if version == 0b10 else 4)
        rate_idx = {v: k for k, v in SAMPLE_RATES.items()}[base_rate]
        br_row = LSF["bitrates"]
        per_frame = 72
    else:
        rate_idx = {v: k for k, v in SAMPLE_RATES.items()}[rate]
        br_row = BITRATES_L3
        per_frame = 144
    si_len = _side_info_len(nch, version)
    need = max(len(b) for b in blobs) + 4 + si_len
    bidx = bitrate_idx
    if bidx is None:
        for i in range(1, 15):
            if per_frame * br_row[i] * 1000 // rate >= need:
                bidx = i
                break
        if bidx is None:
            raise ValueError("granule blob exceeds the highest Layer III bitrate")
    frame_len = per_frame * br_row[bidx] * 1000 // rate
    area = frame_len - 4 - si_len
    if area < max(len(b) for b in blobs):
        raise ValueError("explicit bitrate_idx too small for the blobs")

    # reservoir packing: blobs stream into consecutive main-data areas;
    # begin_i = accumulated surplus, stuffing caps it at _MAX_RESERVOIR
    pool = bytearray()
    begins: list[int] = []
    for f in range(nfr):
        surplus = f * area - len(pool)
        if surplus > _MAX_RESERVOIR:
            pool.extend(b"\x00" * (surplus - _MAX_RESERVOIR))
            surplus = _MAX_RESERVOIR
        begins.append(surplus)
        pool.extend(blobs[f])
    pool.extend(b"\x00" * (nfr * area - len(pool)))  # final-frame pad

    out = bytearray()
    for f in range(nfr):
        out.extend(_frame_header(3, bidx, rate_idx, 0, mode, mode_ext,
                                 version=version))
        w = _BitWriter()
        if lsf:
            _write_side_info_lsf(w, begins[f], nch, frame_gis[f][0])
        else:
            _write_side_info(w, begins[f], nch, frame_gis[f])
        w.pad_to_byte()
        assert len(w.buf) == si_len
        out.extend(w.buf)
        out.extend(pool[f * area: (f + 1) * area])
    return bytes(out)
