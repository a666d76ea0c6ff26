"""TIFF 6.0 codec: round-trip matrix (byte orders x compressions x
strip layouts x predictor x gray/RGB), decode-only paths via
hand-built IFDs (bilevel, WhiteIsZero, palette, extra samples),
LZW early-change conformance, corrupt/unsupported handling, and
image-surface integration (dispatch + dHash container invariance)."""

from __future__ import annotations

import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators import tiff as tf


def _px(w=37, h=23, seed=0):
    rnd = random.Random(seed)
    return [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
         for _ in range(w)]
        for _ in range(h)
    ]


def _smooth(w=37, h=23):
    return [[((x * 3 + y) % 256, (x + y * 5) % 256, (x * y) % 256)
             for x in range(w)] for y in range(h)]


def test_roundtrip_full_matrix():
    imgs = [_px(), _smooth()]
    for comp in ("none", "packbits", "lzw"):
        for rps in (None, 5):
            for pred in (False, True):
                for be in (False, True):
                    for img in imgs:
                        b = tf.tiff_encode(
                            img, compression=comp, rows_per_strip=rps,
                            predictor=pred, big_endian=be,
                        )
                        w, h, out = tf.tiff_decode(b)
                        assert (w, h) == (37, 23)
                        assert out == img, (comp, rps, pred, be)


def test_gray_roundtrip_and_strip_tail():
    # 23 rows with rows_per_strip 4 -> last strip is 3 rows (partial)
    g = [[(v % 256,) * 3 for v in range(37)] for _ in range(23)]
    for comp in ("none", "packbits", "lzw"):
        b = tf.tiff_encode(g, compression=comp, gray=True, rows_per_strip=4)
        assert tf.tiff_decode(b)[2] == g


def test_lzw_early_change_boundary():
    """Random bytes force width bumps at 9->10->11->12 and a table-full
    Clear reset; any early-change off-by-one corrupts from byte ~254."""
    rnd = random.Random(1)
    data = bytes(rnd.randrange(256) for _ in range(50000))
    assert tf.lzw_decode(tf.lzw_encode(data), len(data)) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' drives the code-not-yet-in-table branch immediately
    data = b"a" * 64 + b"ab" * 32 + b"a" * 64
    assert tf.lzw_decode(tf.lzw_encode(data), len(data)) == data


def test_packbits_spec_example():
    # the TIFF 6.0 spec's worked example
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                 0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    expect = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                   + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)
    assert tf.packbits_decode(enc, len(expect)) == expect
    # and our encoder's output decodes back
    assert tf.packbits_decode(tf.packbits_encode(expect), len(expect)) == expect


def _ifd(entries, data_blobs, big_endian=False):
    """Hand-assemble a single-IFD TIFF. entries: (tag, typ, values);
    data_blobs appended after the IFD, referenced by marker offsets."""
    e = ">" if big_endian else "<"
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    ifd_size = 2 + 12 * len(entries) + 4
    extra = bytearray()
    fixed = []
    for tag, typ, vals in sorted(entries):
        cnt = len(vals)
        if sizes[typ] * cnt <= 4:
            vb = struct.pack(e + f"{cnt}{fmts[typ]}", *vals).ljust(4, b"\x00")
        else:
            vb = struct.pack(e + "I", 8 + ifd_size + len(extra))
            extra += struct.pack(e + f"{cnt}{fmts[typ]}", *vals)
        fixed.append(struct.pack(e + "HHI", tag, typ, cnt) + vb)
    out = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(e + "I", 8)
    out += struct.pack(e + "H", len(entries))
    for f in fixed:
        out += f
    out += struct.pack(e + "I", 0)
    out += extra
    for blob in data_blobs:
        out += blob
    return bytes(out)


def test_bilevel_whiteiszero_decodes():
    # 10x3 1-bit image, photometric 0 (WhiteIsZero): bit 1 -> black
    rows_bits = [0b1010101010, 0b1111100000, 0b0000011111]
    raw = bytearray()
    for r in rows_bits:
        raw += bytes([(r >> 2) & 0xFF, (r & 0x3) << 6])
    # strip data goes right after the IFD; compute its offset:
    # header 8 + (2 + 7*12 + 4) = 98
    b = _ifd(
        [(256, 3, [10]), (257, 3, [3]), (258, 3, [1]), (259, 3, [1]),
         (262, 3, [0]), (273, 4, [98]), (279, 4, [len(raw)])],
        [bytes(raw)],
    )
    w, h, px = tf.tiff_decode(b)
    assert (w, h) == (10, 3)
    assert px[0][0] == (0, 0, 0)       # bit 1, WhiteIsZero -> black
    assert px[0][1] == (255, 255, 255)
    assert px[1][:5] == [(0, 0, 0)] * 5
    assert px[2][:5] == [(255, 255, 255)] * 5


def test_gray_whiteiszero_inverts():
    g = [[(10, 10, 10), (250, 250, 250)]]
    b = tf.tiff_encode(g, gray=True)
    # flip photometric 1 -> 0 in place: find tag 262 entry
    b = bytearray(b)
    n = struct.unpack_from("<H", b, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", b, base)[0] == 262:
            struct.pack_into("<H", b, base + 8, 0)
    w, h, px = tf.tiff_decode(bytes(b))
    assert px[0][0] == (245, 245, 245) and px[0][1] == (5, 5, 5)


def test_palette_colormap():
    # 4x2 palette image, 256-entry ColorMap with 16-bit channels
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    cmap = [0] * 768
    for i, (r, g, bl) in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]):
        cmap[i] = r << 8
        cmap[256 + i] = g << 8
        cmap[512 + i] = bl << 8
    # offset: 8 + (2 + 8*12 + 4) = 110, colormap goes out-of-line first
    # -> easier: let _ifd place colormap in extra; strip offset =
    # 8 + ifd + len(cmap bytes)
    ifd_size = 2 + 8 * 12 + 4
    strip_off = 8 + ifd_size + 768 * 2
    b = _ifd(
        [(256, 3, [4]), (257, 3, [2]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [3]), (273, 4, [strip_off]), (279, 4, [8]),
         (320, 3, cmap)],
        [idx],
    )
    w, h, px = tf.tiff_decode(b)
    assert px[0] == [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    assert px[1] == [(17, 34, 51), (0, 0, 255), (0, 255, 0), (255, 0, 0)]


def test_rgb_with_extra_alpha_sample():
    # spp=4 chunky RGBA: alpha ignored
    raw = bytes([10, 20, 30, 255, 40, 50, 60, 128])
    ifd_size = 2 + 8 * 12 + 4
    # BitsPerSample (4 SHORTs) is the only out-of-line value: 8 bytes
    b = _ifd(
        [(256, 3, [2]), (257, 3, [1]), (258, 3, [8, 8, 8, 8]),
         (259, 3, [1]), (262, 3, [2]), (273, 4, [8 + ifd_size + 8]),
         (277, 3, [4]), (279, 4, [8])],
        [raw],
    )
    assert tf.tiff_decode(b)[2] == [[(10, 20, 30), (40, 50, 60)]]


def test_unsupported_paths_raise_with_tag_names():
    px = _smooth(8, 8)
    good = tf.tiff_encode(px)
    with pytest.raises(ValueError):
        tf.tiff_decode(b"XX" + good[2:])
    # unsupported compression id: patch tag 259 to 6 (old-style JPEG)
    b = bytearray(good)
    n = struct.unpack_from("<H", b, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", b, base)[0] == 259:
            struct.pack_into("<H", b, base + 8, 6)
    with pytest.raises(NotImplementedError, match="Compression 6"):
        tf.tiff_decode(bytes(b))
    # tiled layout with incomplete tile tags (r7: tiled DECODES now; a
    # 322 without 323/324 is malformed, not a seam)
    with pytest.raises(ValueError, match="tags 323/324"):
        tf.tiff_decode(_ifd(
            [(256, 3, [4]), (257, 3, [4]), (322, 3, [16]),
             (273, 4, [0]), (279, 4, [0])], [b""]))
    # r8 (ADVICE): TileByteCounts (325) absent must be the same named
    # ValueError, not a bare KeyError
    with pytest.raises(ValueError, match="tags 323/324/325"):
        tf.tiff_decode(_ifd(
            [(256, 3, [16]), (257, 3, [16]), (322, 3, [16]),
             (323, 3, [16]), (324, 4, [0]),
             (273, 4, [0]), (279, 4, [0])], [b""]))


def test_image_decode_dispatches_tiff():
    px = _px(16, 12, seed=3)
    for be in (False, True):
        w, h, out = mm.image_decode(
            tf.tiff_encode(px, compression="lzw", big_endian=be)
        )
        assert (w, h, out) == (16, 12, px)


def test_dhash_container_invariant_includes_tiff():
    from data_migration_etl_scripts_spark.operators import imagehash as ih

    px = _smooth(24, 16)
    h_bmp = ih.dhash_bits(mm.image_decode(mm.bmp_encode(px))[2])
    h_tif = ih.dhash_bits(mm.image_decode(tf.tiff_encode(px, compression="packbits"))[2])
    assert h_bmp == h_tif


def test_deflate_compression_roundtrip():
    px = _px(21, 13, seed=9)
    for rps in (None, 4):
        for pred in (False, True):
            b = tf.tiff_encode(px, compression="deflate",
                               rows_per_strip=rps, predictor=pred)
            assert tf.tiff_decode(b)[2] == px
    # a smooth image actually compresses under zlib
    sm = _smooth(32, 32)
    assert len(tf.tiff_encode(sm, compression="deflate")) < len(tf.tiff_encode(sm))


def test_tiled_roundtrip_all_compressions():
    # 40x35 RGB with 16x16 tiles: 3x3 tile grid, right/bottom padding
    px = [[((x * 7 + y) % 256, (x + y * 5) % 256, (x * y) % 256)
           for x in range(40)] for y in range(35)]
    for comp in ("none", "packbits", "lzw", "deflate"):
        b = tf.tiff_encode(px, compression=comp, tiles=(16, 16))
        w, h, rows = tf.tiff_decode(b)
        assert (w, h) == (40, 35)
        assert rows == px, comp


def test_tiled_with_predictor_and_gray_big_endian():
    px = [[((x * 3 + y * 11) % 256,) * 3 for x in range(20)]
          for y in range(18)]
    b = tf.tiff_encode(px, compression="lzw", predictor=True,
                       gray=True, big_endian=True, tiles=(16, 16))
    w, h, rows = tf.tiff_decode(b)
    assert (w, h) == (20, 18) and rows == px


def test_tiled_exact_multiple_no_padding():
    px = [[((x + y) % 256, x % 256, y % 256) for x in range(32)]
          for y in range(16)]
    b = tf.tiff_encode(px, compression="deflate", tiles=(16, 16))
    assert tf.tiff_decode(b)[2] == px


def test_tile_dims_must_be_multiple_of_16():
    px = [[(0, 0, 0)] * 8 for _ in range(8)]
    with pytest.raises(ValueError, match="multiples of 16"):
        tf.tiff_encode(px, tiles=(8, 8))


def test_16bit_gray_both_endians():
    # 4x2 16-bit gray: v16 = v8*257 decodes to v8 (high byte kept)
    vals8 = [[10, 40, 90, 200], [255, 0, 128, 17]]
    for be in (False, True):
        e = ">" if be else "<"
        raw = b"".join(
            struct.pack(e + "H", v * 257) for row in vals8 for v in row
        )
        # header 8 + IFD (2 + 7*12 + 4) = 98
        b = _ifd(
            [(256, 3, [4]), (257, 3, [2]), (258, 3, [16]), (259, 3, [1]),
             (262, 3, [1]), (273, 4, [98]), (279, 4, [len(raw)])],
            [raw], big_endian=be,
        )
        w, h, px = tf.tiff_decode(b)
        assert (w, h) == (4, 2)
        assert px == [[(v, v, v) for v in row] for row in vals8], be


def test_16bit_rgb_with_predictor():
    # 3x2 16-bit RGB, predictor 2: differencing on 16-bit samples
    pix = [[(1000, 2000, 3000), (1100, 2050, 2900), (65535, 0, 257)],
           [(257, 514, 771), (300, 514, 900), (0, 65535, 400)]]
    rows = []
    for row in pix:
        samp = [c for p in row for c in p]
        diff = list(samp)
        for i in range(len(samp) - 1, 2, -1):
            diff[i] = (diff[i] - diff[i - 3]) & 0xFFFF
        rows.append(struct.pack("<9H", *diff))
    raw = b"".join(rows)
    # header 8 + IFD (2 + 9*12 + 4) = 122; BITS count 3 -> extra block
    # BEFORE data: offsets shift by 6
    b = _ifd(
        [(256, 3, [3]), (257, 3, [2]), (258, 3, [16, 16, 16]),
         (259, 3, [1]), (262, 3, [2]), (273, 4, [122 + 6]),
         (277, 3, [3]), (279, 4, [len(raw)]), (317, 3, [2])],
        [raw],
    )
    w, h, px = tf.tiff_decode(b)
    assert (w, h) == (3, 2)
    want = [[tuple(c >> 8 for c in p) for p in row] for row in pix]
    assert px == want


def test_planar_config_2_rgb():
    # 4x3 RGB stored as 3 separate planes, one strip per plane
    pix = [[(x * 20, 255 - x * 30, (x * x) % 256) for x in range(4)]
           for _ in range(3)]
    planes = []
    for c in range(3):
        planes.append(bytes(row[x][c] for row in pix for x in range(4)))
    # header 8 + IFD (2 + 9*12 + 4) = 122; extra block = BITS (3
    # SHORTs, 6 B) + offsets (3 LONGs) + counts (3 LONGs) = 30 B
    base = 122 + 30
    offs = [base, base + 12, base + 24]
    b = _ifd(
        [(256, 3, [4]), (257, 3, [3]), (258, 3, [8, 8, 8]), (259, 3, [1]),
         (262, 3, [2]), (273, 4, offs), (277, 3, [3]),
         (279, 4, [12, 12, 12]), (284, 3, [2])],
        planes,
    )
    w, h, px = tf.tiff_decode(b)
    assert (w, h) == (4, 3)
    assert px == pix


def test_planar_config_2_with_predictor_lag1():
    # predictor in planar mode differences within the plane (lag 1)
    pix = [[(10, 100, 200), (13, 90, 210), (20, 95, 190)]]
    planes = []
    for c in range(3):
        vals = [p[c] for p in pix[0]]
        diff = [vals[0]] + [(vals[i] - vals[i - 1]) & 0xFF
                            for i in range(1, 3)]
        planes.append(bytes(diff))
    # IFD (2 + 10*12 + 4) = 126; extra = BITS 6 + offsets 12 + counts 12
    base = 8 + 126 + 30
    offs = [base, base + 3, base + 6]
    b = _ifd(
        [(256, 3, [3]), (257, 3, [1]), (258, 3, [8, 8, 8]), (259, 3, [1]),
         (262, 3, [2]), (273, 4, offs), (277, 3, [3]),
         (279, 4, [3, 3, 3]), (284, 3, [2]), (317, 3, [2])],
        planes,
    )
    assert tf.tiff_decode(b)[2] == pix


def test_tiled_planar2_raises():
    with pytest.raises(NotImplementedError, match="tiled .*Planar"):
        tf.tiff_decode(_ifd(
            [(256, 3, [16]), (257, 3, [16]), (258, 3, [8]), (284, 3, [2]),
             (322, 3, [16]), (323, 3, [16]), (324, 4, [0]),
             (325, 4, [0])], [b""]))


def test_tiled_roundtrip_property():
    """Property (hypothesis): any dims x any tile grid x any codec x
    predictor/gray round-trips exactly — edge-padding and the blit
    arithmetic hold off the hand-picked sizes."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 50), h=st.integers(1, 40),
        tw=st.sampled_from([16, 32]), th=st.sampled_from([16, 32]),
        comp=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
        pred=st.booleans(), gray=st.booleans(), be=st.booleans(),
        seed=st.integers(0, 10**6),
    )
    def run(w, h, tw, th, comp, pred, gray, be, seed):
        rnd = random.Random(seed)
        px = [[(rnd.randrange(256),) * 3 if gray else
               (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
               for _ in range(w)] for _ in range(h)]
        b = tf.tiff_encode(px, compression=comp, predictor=pred,
                           gray=gray, big_endian=be, tiles=(tw, th))
        got_w, got_h, rows = tf.tiff_decode(b)
        assert (got_w, got_h) == (w, h)
        assert rows == px

    run()


# --------------------------------------------- JPEG-in-TIFF, comp 7 (r9)

def _grad_px(w, h):
    return [[((x * 11 + y * 3) % 256, (x + y * 2) % 256, (x * 5 + y) % 256)
             for x in range(w)] for y in range(h)]


def test_jpeg_in_tiff_strips_equal_composed_jpeg():
    """Compression-7 strips decode EXACTLY like each strip run through
    the engine JPEG codec standalone (same codec both ways — the
    self-check that needs no tolerance despite JPEG loss)."""
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_decode, jpeg_encode,
    )

    px = _grad_px(32, 24)
    b = tf.tiff_encode(px, compression="jpeg", rows_per_strip=8,
                       quality=92)
    w, h, got = tf.tiff_decode(b)
    assert (w, h) == (32, 24)
    want = []
    for y0 in range(0, 24, 8):
        _w, _h, rows = jpeg_decode(
            jpeg_encode([r[:] for r in px[y0: y0 + 8]], quality=92))
        want.extend(rows)
    assert got == want


def test_jpeg_in_tiff_tiled_roundtrip_tolerance():
    px = _grad_px(32, 24)
    b = tf.tiff_encode(px, compression="jpeg", tiles=(16, 16), quality=92)
    w, h, got = tf.tiff_decode(b)
    assert (w, h) == (32, 24)
    err = max(abs(got[y][x][c] - px[y][x][c])
              for y in range(24) for x in range(32) for c in range(3))
    assert err <= 40  # plain JPEG loss, no structural error


def test_jpeg_in_tiff_shared_jpegtables():
    """Tag 347: DQT/DHT live in a shared JPEGTables stream, strips
    carry only SOF/SOS — the scanned-document layout. Split an engine
    strip into (tables, image) and verify the decode equals the
    unsplit one."""
    import struct as _st

    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode,
    )

    px = _grad_px(32, 16)
    full = jpeg_encode(px, quality=90)
    # walk markers; extract DQT (DB) + DHT (C4) into the tables stream
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(full):
        assert full[pos] == 0xFF
        marker = full[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:  # SOS: rest of stream is entropy data
            image += full[pos:]
            break
        (seglen,) = _st.unpack_from(">H", full, pos + 2)
        seg = full[pos: pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else image).extend(seg)
        pos += 2 + seglen
    tables += b"\xff\xd9"
    # hand-build the TIFF: one strip = the stripped image stream
    b = bytearray(tf.tiff_encode(px, compression="jpeg", quality=90))
    # simpler than patching: build via the public writer, then decode
    # the hand-split layout through a minimal IFD
    strips = [bytes(image)]
    entries = [
        (256, 3, [32]), (257, 3, [16]), (258, 3, [8, 8, 8]),
        (259, 3, [7]), (262, 3, [6]), (277, 3, [3]), (278, 3, [16]),
        (347, 7, list(tables)),
    ]
    e = "<"
    n = len(entries) + 2
    ifd_size = 2 + 12 * n + 4
    data_start = 8 + ifd_size
    off_vals, cnt_vals = [], []
    extra = bytearray()
    fixed = []
    # lay out out-of-line values first (entries sorted by tag)
    pos0 = data_start
    blobs: list[bytes] = []
    entries_all = entries + [(273, 4, None), (279, 4, None)]
    # compute extra sizes: bits(3H=6>4), tables(len>4)
    layout = {}
    for tag, typ, vals in sorted(entries):
        sz = {3: 2, 4: 4, 7: 1}[typ] * len(vals)
        if sz > 4:
            layout[tag] = pos0
            pos0 += sz
    strip_off = pos0
    for tag, typ, vals in sorted(entries + [
        (273, 4, [0]), (279, 4, [len(strips[0])]),
    ]):
        if tag == 273:
            vals = [strip_off]
        fmt = {3: "H", 4: "I", 7: "B"}[typ]
        sz = {3: 2, 4: 4, 7: 1}[typ]
        if sz * len(vals) <= 4:
            vb = _st.pack(e + f"{len(vals)}{fmt}", *vals).ljust(4, b"\x00")
        else:
            vb = _st.pack(e + "I", layout[tag])
        fixed.append(_st.pack(e + "HHI", tag, typ, len(vals)) + vb)
    out = bytearray(b"II*\x00") + _st.pack(e + "I", 8)
    out += _st.pack(e + "H", n)
    for f in fixed:
        out += f
    out += _st.pack(e + "I", 0)
    for tag, typ, vals in sorted(entries):
        sz = {3: 2, 4: 4, 7: 1}[typ] * len(vals)
        if sz > 4:
            fmt = {3: "H", 4: "I", 7: "B"}[typ]
            out += _st.pack(e + f"{len(vals)}{fmt}", *vals)
    out += strips[0]
    w1, h1, split_rows = tf.tiff_decode(bytes(out))
    w2, h2, whole_rows = tf.tiff_decode(bytes(b))
    assert (w1, h1) == (w2, h2) == (32, 16)
    assert split_rows == whole_rows


def test_jpeg_in_tiff_rejects_gray_and_predictor():
    px = _grad_px(16, 16)
    with pytest.raises(ValueError, match="JPEG-in-TIFF"):
        tf.tiff_encode(px, compression="jpeg", gray=True)
    with pytest.raises(ValueError, match="JPEG-in-TIFF"):
        tf.tiff_encode(px, compression="jpeg", predictor=True)


def test_old_style_jpeg_raises():
    px = _grad_px(16, 16)
    b = bytearray(tf.tiff_encode(px, compression="jpeg"))
    idx = bytes(b).find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", b, idx + 8, 6)  # Compression 6 (old-style)
    with pytest.raises(NotImplementedError, match="Compression 6"):
        tf.tiff_decode(bytes(b))
