"""CCITT G4 / T.6 codec (operators/ccitt.py): structural hand-checked
bitstreams, vertical/pass round-trips with the T.4 seam EMPTY,
horizontal-mode machinery through synthetic injected tables, the
Annex-B loader (validation, env autoload), TIFF Compression=4
integration, and a gated real-tables test."""

from __future__ import annotations

import json
import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators import ccitt as cc
from data_migration_etl_scripts_spark.operators import tiff as tf


def _clear_tables():
    cc.T4_WHITE.clear()
    cc.T4_BLACK.clear()


@pytest.fixture(autouse=True)
def _isolated_tables():
    _clear_tables()
    yield
    _clear_tables()


#: synthetic fixed-length MH codebooks (prefix-free by construction):
#: white 8-bit codes (terminating t -> t, makeup 64k -> 64+k),
#: black 9-bit codes (same values) — spec data stays out of the repo,
#: the MECHANISM (makeup+terminating composition, per-color tables,
#: H-mode run pairs) is fully exercised.
def _synthetic_tables():
    white = [[t, 8, t] for t in range(64)]
    white += [[64 * k, 8, 64 + k] for k in range(1, 41)]
    black = [[t, 9, t] for t in range(64)]
    black += [[64 * k, 9, 64 + k] for k in range(1, 41)]
    return {"white": white, "black": black}


# ------------------------------------------------------- structural

def test_blank_rows_are_single_v0_bits():
    """All-white rows over an all-white reference code as one V0 ('1')
    per row — hand-checkable from the public mode alphabet."""
    rows = [[0] * 16 for _ in range(8)]
    b = cc.g4_encode(rows)
    # 8 rows x 1 bit = 8 bits -> one 0xFF byte
    assert b == b"\xff"
    assert cc.g4_decode(b, 16, 8) == rows


def test_run_first_appearance_requires_hmode_tables():
    """Creating a run where the reference line has none is exactly
    horizontal mode — without the Annex-B tables the encoder raises
    the named seam error (a blank image is the ONLY image that never
    needs H, which is why the seam matters for real pages)."""
    rows = [[0] * 40, [0] * 10 + [1] * 8 + [0] * 22]
    with pytest.raises(NotImplementedError, match="load_t4_tables"):
        cc.g4_encode(rows)


def test_vertical_modes_dominate_after_first_appearance():
    """Once a run exists on the reference line, drifting edges (<=3
    px/row) code as pure vertical modes: measurable as ~2 code bits
    per steady row (V per edge), far below H-mode's table codes."""
    cc.load_t4_tables(_synthetic_tables())
    lo, w = 10, 40
    deltas = [0, 1, 3, -2, -3, 2, 0, -1, 3, -3, 1, 2, -2, 0]
    rows = [[0] * w]
    for d in deltas:
        lo += d
        row = [0] * w
        for x in range(lo, lo + 8):
            row[x] = 1
        rows.append(row)
    b = cc.g4_encode(rows, w)
    assert cc.g4_decode(b, w, len(rows)) == rows
    # budget: row0 V0 (1) + appearance row H (3 + 8 + 9 code bits)
    # + V0 terminator (up to ~7 more) + 14 drift rows x (two V codes
    # <= 7 bits each + V0 terminator 1) <= ~240 bits total
    assert len(b) * 8 <= 260


def test_hmode_roundtrip_synthetic_tables():
    """Full-machinery round-trip: random-ish bilevel images (new runs
    appear, vanish, drift, merge) with synthetic injected T.4 tables."""
    cc.load_t4_tables(_synthetic_tables())
    import random

    rnd = random.Random(8)
    for trial in range(6):
        w = rnd.choice([17, 33, 64, 100])
        h = rnd.randrange(3, 14)
        rows = [[1 if rnd.random() < 0.35 else 0 for _ in range(w)]
                for _ in range(h)]
        b = cc.g4_encode(rows, w)
        assert cc.g4_decode(b, w, h) == rows, trial


def test_hmode_long_runs_use_makeup_codes():
    cc.load_t4_tables(_synthetic_tables())
    w = 700  # forces makeup (>= 64) + terminating composition
    rows = [[0] * w, [0] * 200 + [1] * 450 + [0] * 50]
    b = cc.g4_encode(rows, w)
    assert cc.g4_decode(b, w, 2) == rows


def test_loader_validates():
    with pytest.raises(ValueError, match="bad run length"):
        cc.load_t4_tables({"white": [[65, 4, 0]]})
    with pytest.raises(ValueError, match="bad code"):
        cc.load_t4_tables({"white": [[0, 4, 16]]})
    with pytest.raises(ValueError, match="prefix-free"):
        cc.load_t4_tables({"white": [[0, 1, 0], [1, 2, 0]]})
    assert not cc.T4_WHITE


def test_env_autoload_on_first_hmode(tmp_path, monkeypatch):
    p = tmp_path / "t4.json"
    p.write_text(json.dumps(_synthetic_tables()))
    monkeypatch.setenv(cc._TABLES_ENV, str(p))
    monkeypatch.setattr(cc, "_env_load_done", False)
    rows = [[0] * 20, [0] * 5 + [1] * 6 + [0] * 9]
    b = cc.g4_encode(rows, 20)  # H-mode needed: triggers env load
    assert cc.T4_WHITE and cc.T4_BLACK
    assert cc.g4_decode(b, 20, 2) == rows


def test_missing_tables_raise_namefully():
    # (a 4-wide image would legally code via VL3 against the imaginary
    # b1=width — the run must sit >3 px from the row end to force H)
    with pytest.raises(NotImplementedError, match="SPARK_GRAFT_T4_TABLES"):
        cc.g4_encode([[0] * 5 + [1] * 3 + [0] * 12], 20)


def test_g4_and_mh_roundtrip_property():
    """Property (hypothesis): ANY bilevel image round-trips through
    both codings with the synthetic tables — arbitrary dims, densities
    from blank to solid, row-correlated and independent noise."""
    from hypothesis import given, settings, strategies as st

    cc.load_t4_tables(_synthetic_tables())

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        rnd = data.draw(st.randoms(use_true_random=False))
        w = data.draw(st.integers(1, 90))
        hgt = data.draw(st.integers(1, 12))
        p = data.draw(st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]))
        correlated = data.draw(st.booleans())
        rows = []
        prev = [0] * w
        for _ in range(hgt):
            if correlated and rows:
                row = list(prev)
                for _ in range(rnd.randrange(3)):
                    row[rnd.randrange(w)] ^= 1
            else:
                row = [1 if rnd.random() < p else 0 for _ in range(w)]
            rows.append(row)
            prev = row
        assert cc.g4_decode(cc.g4_encode(rows, w), w, hgt) == rows
        assert cc.mh_decode(cc.mh_encode(rows, w), w, hgt) == rows

    run()


# ----------------------------------------------- MH 1-D (Compression 2)

def test_mh_roundtrip_synthetic_tables():
    cc.load_t4_tables(_synthetic_tables())
    import random

    rnd = random.Random(9)
    for w in (8, 21, 64, 130):
        rows = [[1 if rnd.random() < 0.45 else 0 for _ in range(w)]
                for _ in range(7)]
        b = cc.mh_encode(rows, w)
        assert cc.mh_decode(b, w, 7) == rows, w


def test_mh_rows_are_byte_aligned():
    cc.load_t4_tables(_synthetic_tables())
    # width 8 all-white: one run of 8 -> one 8-bit synthetic code per
    # row, so 3 rows = exactly 3 bytes; alignment is observable
    rows = [[0] * 8] * 3
    b = cc.mh_encode(rows, 8)
    assert len(b) == 3
    assert cc.mh_decode(b, 8, 3) == rows


def test_mh_needs_tables_for_every_row():
    with pytest.raises(NotImplementedError, match="load_t4_tables"):
        cc.mh_encode([[0] * 8], 8)


# --------------------------------------------------- TIFF integration

def _g4_tiff(rows, width, height, rows_per_strip=None, photo=0, comp=4):
    """Hand-assemble a Compression=4 (or 2) bilevel TIFF (strips)."""
    rps = rows_per_strip or height
    enc = cc.g4_encode if comp == 4 else cc.mh_encode
    strips = []
    for y0 in range(0, height, rps):
        strips.append(enc(rows[y0: y0 + rps], width))
    entries = [
        (256, 3, [width]), (257, 3, [height]), (258, 3, [1]),
        (259, 3, [comp]), (262, 3, [photo]), (277, 3, [1]),
        (278, 3, [rps]),
    ]
    # IFD with marker offsets for strip data
    e = "<"
    n = len(entries) + 2  # + offsets + counts
    ifd_size = 2 + 12 * n + 4
    data_start = 8 + ifd_size
    off_vals, cnt_vals = [], []
    pos = data_start + 8 * len(strips)  # room for offset/count arrays
    blobs_off = pos
    for s in strips:
        off_vals.append(pos)
        cnt_vals.append(len(s))
        pos += len(s)
    entries = entries + [(273, 4, off_vals), (279, 4, cnt_vals)]
    fixed, extra = [], bytearray()
    for tag, typ, vals in sorted(entries):
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ]
        if sz * len(vals) <= 4:
            vb = struct.pack(e + f"{len(vals)}{fmt}", *vals).ljust(4, b"\x00")
        else:
            vb = struct.pack(e + "I", data_start + len(extra))
            extra += struct.pack(e + f"{len(vals)}{fmt}", *vals)
        fixed.append(struct.pack(e + "HHI", tag, typ, len(vals)) + vb)
    assert len(extra) <= 8 * len(strips)
    extra = extra.ljust(blobs_off - data_start, b"\x00")
    out = bytearray(b"II*\x00") + struct.pack(e + "I", 8)
    out += struct.pack(e + "H", n)
    for f in fixed:
        out += f
    out += struct.pack(e + "I", 0)
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def test_tiff_g4_strip_decode():
    cc.load_t4_tables(_synthetic_tables())
    import random

    rnd = random.Random(4)
    w, h = 37, 11
    rows = [[1 if rnd.random() < 0.4 else 0 for _ in range(w)]
            for _ in range(h)]
    for rps in (None, 4):
        b = _g4_tiff(rows, w, h, rows_per_strip=rps)
        gw, gh, px = tf.tiff_decode(b)
        assert (gw, gh) == (w, h)
        # photometric 0 (WhiteIsZero): bit 1 = black = (0,0,0)
        want = [[(0, 0, 0) if v else (255, 255, 255) for v in row]
                for row in rows]
        assert px == want, rps


def test_tiff_mh_strip_decode():
    cc.load_t4_tables(_synthetic_tables())
    import random

    rnd = random.Random(6)
    w, h = 29, 9
    rows = [[1 if rnd.random() < 0.5 else 0 for _ in range(w)]
            for _ in range(h)]
    b = _g4_tiff(rows, w, h, rows_per_strip=4, comp=2)
    gw, gh, px = tf.tiff_decode(b)
    assert (gw, gh) == (w, h)
    want = [[(0, 0, 0) if v else (255, 255, 255) for v in row]
            for row in rows]
    assert px == want


def test_tiff_g4_requires_bilevel():
    b = bytearray(_g4_tiff([[0] * 8] * 2, 8, 2))
    # patch BitsPerSample (258) to 8
    n = struct.unpack_from("<H", b, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", b, base)[0] == 258:
            struct.pack_into("<H", b, base + 8, 8)
    with pytest.raises(ValueError, match="bilevel"):
        tf.tiff_decode(bytes(b))


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_T4_TABLES_REAL"),
    reason="real ITU-T T.4 table data not provided "
           "(set SPARK_GRAFT_T4_TABLES_REAL=/path/tables.json)",
)
def test_real_t4_tables_roundtrip():
    import os
    import random

    cc.load_t4_tables(os.environ["SPARK_GRAFT_T4_TABLES_REAL"])
    rnd = random.Random(1)
    w, h = 128, 16
    rows = [[1 if rnd.random() < 0.3 else 0 for _ in range(w)]
            for _ in range(h)]
    b = cc.g4_encode(rows, w)
    assert cc.g4_decode(b, w, h) == rows


# --------------------------------------------- G3 / Compression 3 (r9)

def test_g3_1d_roundtrip_property():
    """EOL-framed 1-D MH rows: any bilevel image round-trips (needs
    the injected T.4 codebooks — G3 has no table-free subset)."""
    cc.load_t4_tables(_synthetic_tables())
    rnd = random.Random(11)
    for _ in range(25):
        w = rnd.randrange(1, 80)
        h = rnd.randrange(1, 16)
        rows = [[rnd.randrange(2) for _ in range(w)] for _ in range(h)]
        b = cc.g3_encode(rows, w)
        assert cc.g3_decode(b, w, h) == rows


def test_g3_2d_and_fill_roundtrip_property():
    """T4Options bit 0 (2-D rows after the first) and bit 2 (EOLs
    byte-aligned by fill bits), all combinations."""
    cc.load_t4_tables(_synthetic_tables())
    rnd = random.Random(12)
    for _ in range(15):
        w = rnd.randrange(2, 60)
        h = rnd.randrange(2, 12)
        rows = [[rnd.randrange(2) for _ in range(w)] for _ in range(h)]
        for two_d in (False, True):
            for fill in (False, True):
                b = cc.g3_encode(rows, w, two_d=two_d, fill=fill)
                assert cc.g3_decode(b, w, h, two_d=two_d) == rows, (
                    two_d, fill)


def test_g3_fill_bits_byte_align_eols():
    cc.load_t4_tables(_synthetic_tables())
    rows = [[1, 0, 1, 0, 1], [0, 1, 0, 1, 0]]
    b = cc.g3_encode(rows, 5, fill=True)
    # with fill, the first EOL is padded to 16 bits: 0x00 0x01
    assert b[:2] == b"\x00\x01"


def test_g3_bad_eol_raises():
    cc.load_t4_tables(_synthetic_tables())
    with pytest.raises(ValueError, match="EOL"):
        cc.g3_decode(b"\xff\xff", 8, 1)


def test_g3_needs_tables():
    with pytest.raises(NotImplementedError, match="load_t4_tables"):
        cc.g3_encode([[1, 0, 1]], 3)


def test_tiff_g3_strip_decode():
    """Compression=3 TIFF through tiff_decode, 1-D and 2-D options
    (tag 292), multiple strips."""
    cc.load_t4_tables(_synthetic_tables())
    rnd = random.Random(13)
    w, h = 23, 9
    rows = [[rnd.randrange(2) for _ in range(w)] for _ in range(h)]
    for t4opts in (0, 1):
        strips = []
        rps = 4
        for y0 in range(0, h, rps):
            strips.append(cc.g3_encode(rows[y0: y0 + rps], w,
                                       two_d=bool(t4opts & 1)))
        b = _g4_tiff_raw(strips, w, h, rps, comp=3, t4_options=t4opts)
        gw, gh, px = tf.tiff_decode(b)
        assert (gw, gh) == (w, h)
        for y in range(h):
            for x in range(w):
                want = (0, 0, 0) if rows[y][x] else (255, 255, 255)
                assert px[y][x] == want, (t4opts, x, y)


def _g4_tiff_raw(strips, width, height, rps, comp, t4_options=None):
    """Like _g4_tiff but over pre-encoded strips (+ optional tag 292)."""
    entries = [
        (256, 3, [width]), (257, 3, [height]), (258, 3, [1]),
        (259, 3, [comp]), (262, 3, [0]), (277, 3, [1]),
        (278, 3, [rps]),
    ]
    if t4_options is not None:
        entries.append((292, 4, [t4_options]))
    e = "<"
    n = len(entries) + 2
    ifd_size = 2 + 12 * n + 4
    data_start = 8 + ifd_size
    off_vals, cnt_vals = [], []
    pos = data_start + 8 * len(strips)
    blobs_off = pos
    for s in strips:
        off_vals.append(pos)
        cnt_vals.append(len(s))
        pos += len(s)
    entries = entries + [(273, 4, off_vals), (279, 4, cnt_vals)]
    fixed, extra = [], bytearray()
    for tag, typ, vals in sorted(entries):
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ]
        if sz * len(vals) <= 4:
            vb = struct.pack(e + f"{len(vals)}{fmt}", *vals).ljust(4, b"\x00")
        else:
            vb = struct.pack(e + "I", data_start + len(extra))
            extra += struct.pack(e + f"{len(vals)}{fmt}", *vals)
        fixed.append(struct.pack(e + "HHI", tag, typ, len(vals)) + vb)
    assert len(extra) <= 8 * len(strips)
    extra = extra.ljust(blobs_off - data_start, b"\x00")
    out = bytearray(b"II*\x00") + struct.pack(e + "I", 8)
    out += struct.pack(e + "H", n)
    for f in fixed:
        out += f
    out += struct.pack(e + "I", 0)
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def test_tiff_g3_uncompressed_mode_raises():
    cc.load_t4_tables(_synthetic_tables())
    b = _g4_tiff_raw([b"\x00\x01"], 8, 1, 1, comp=3, t4_options=2)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        tf.tiff_decode(b)
