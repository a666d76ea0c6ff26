"""Baseline TIFF 6.0 codec — pure stdlib, spec-derived.

Decoder covers the baseline-TIFF matrix a web/scan corpus actually
contains: both byte orders (II little-endian / MM big-endian), striped
images (any RowsPerStrip), Compression 1 (none), 32773 (PackBits), 8 (Adobe
Deflate/zlib) and 5 (LZW, with the spec's early-change code widths),
Predictor 2
(horizontal differencing), and PhotometricInterpretation 0/1
(bilevel+gray, including WhiteIsZero inversion), 2 (RGB, with an
extra-samples-tolerant chunky layout) and 3 (palette via ColorMap's
16-bit channels). Multi-IFD files decode their first image, matching
mainstream viewer behavior.

Encoder writes single-IFD TIFF (either byte order, gray or RGB, any
RowsPerStrip, compression none/PackBits/LZW/Deflate, optional
predictor 2, and r7: the TILED layout via ``tiles=(tw, th)``) —
enough to round-trip every decoder path and to cross-check against
foreign fixtures byte-structurally.

Engine integration: `multimodal.image_decode` dispatches on the
II*/MM* magic, so TIFF bytes flow through every existing image
surface (features, resize, dHash near-dup pairs) unchanged.

Reference parity: the reference ETL (data-migration-etl-scripts) has no media
path at all — this extends the multimodal addendum, same per-row
kernel shape as operators/jpeg.py (mapInPandas streams Arrow batches;
each file decodes independently, embarrassingly parallel at 100 TB).

r7 additions: tiled TIFF (tags 322-325: tiles left-to-right then
top-to-bottom, edge tiles padded to full size, predictor per tile
row, same codec set as strips); 16-bit samples (both byte orders,
per-SAMPLE predictor differencing, high byte kept for the 8-bit RGB
surface); PlanarConfiguration 2 (plane-major strips, lag-1 predictor
within a plane, interleaved to chunky before assembly).

CCITT G4 (Compression 4, r8): decodes via `operators/ccitt.py` — the
2-D mode machinery is structural; horizontal mode's T.4 run-length
codebooks are an injectable Annex-B seam (`ccitt.load_t4_tables` /
`$SPARK_GRAFT_T4_TABLES`), so vertical/pass-mode imagery decodes
out of the box and real scanned pages decode once the user injects
the spec tables.

r9 additions: CCITT G3 (Compression 3, tag 292 T4Options: 1-D rows,
the 2-D option, fill bits) via `operators/ccitt.py`; new-style
JPEG-in-TIFF (Compression 7) both ways — strips/tiles decode through
`operators/jpeg.py` with the shared JPEGTables (tag 347) stream
prepended, PhotometricInterpretation 6 handled by the JPEG codec's
own YCbCr stage, and `tiff_encode(compression="jpeg")` writes it.

What is NOT here (documented seams, same policy as jpeg.py/webp.py):
old-style JPEG-in-TIFF (Compression 6, deprecated by TTN2),
tiled+planar-2 combination, and >16-bit samples. Each raises
NotImplementedError naming the tag value.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# tag constants (TIFF 6.0 §8)

_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_T4OPTIONS = 292
_T_JPEGTABLES = 347
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(b: bytes, off: int, e: str) -> dict[int, list[int]]:
    """Parse one IFD into {tag: [values...]} (BYTE/SHORT/LONG only —
    the tags baseline decode needs are all integral)."""
    (n,) = struct.unpack_from(e + "H", b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, base)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", b, base + 8)
        if typ == 3:
            tags[tag] = list(struct.unpack_from(e + f"{cnt}H", b, voff))
        elif typ == 4:
            tags[tag] = list(struct.unpack_from(e + f"{cnt}I", b, voff))
        elif typ in (1, 7):   # BYTE / UNDEFINED (e.g. JPEGTables)
            tags[tag] = list(b[voff : voff + cnt])
        # other types (RATIONAL, ASCII...) are metadata — skipped
    return tags


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i = j + 1
            continue
        # literal stretch until a 3-byte run starts (2-byte runs are
        # cheaper folded into the literal)
        j = i
        while (
            j + 1 < n
            and j - i < 127
            and not (
                j + 2 < n and data[j + 1] == data[j + 2] == data[j]
            )
        ):
            j += 1
        out += bytes([j - i]) + data[i : j + 1]
        i = j + 1
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, codes start
# at 9 bits, Clear=256, EOI=257, EARLY CHANGE (width bumps at 2^w - 1).


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expected])
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # EARLY CHANGE: the decoder's table lags the encoder's by one
        # entry, so it must bump at 2^w - 2 (one before the classic
        # 2^w - 1) to read the next code at the width the encoder
        # wrote it — the TIFF-spec quirk that breaks GIF-style LZW.
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((256, width))  # leading Clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # encoder mirrors the decoder's early change
        if next_code >= (1 << width) - 1:
            if width < 12:
                width += 1
            else:  # table full: emit Clear, reset
                out_bits.append((256, width))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))  # EOI
    # pack MSB-first
    buf = 0
    nbits = 0
    out = bytearray()
    for code, cw in out_bits:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def tiff_decode(b: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """TIFF bytes -> (width, height, rows of (r, g, b)). First IFD."""
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order/magic header")
    (ifd_off,) = struct.unpack_from(e + "I", b, 4)
    t = _read_ifd(b, ifd_off, e)
    width = t[_T_WIDTH][0]
    height = t[_T_HEIGHT][0]
    comp = t.get(_T_COMPRESSION, [1])[0]
    photo = t.get(_T_PHOTOMETRIC, [1])[0]
    bits = t.get(_T_BITS, [1])
    spp = t.get(_T_SPP, [len(bits)])[0]
    planar = t.get(_T_PLANAR, [1])[0]
    predictor = t.get(_T_PREDICTOR, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"PlanarConfiguration {planar}")
    if any(x not in (1, 8, 16) for x in bits[:spp]) or len(set(bits[:spp])) > 1:
        raise NotImplementedError(
            f"BitsPerSample {bits} — uniform 1-, 8- or 16-bit only"
        )
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32773):
        raise NotImplementedError(
            f"Compression {comp} — none (1), CCITT MH (2), CCITT G3 (3), "
            "CCITT G4 (4), LZW (5), JPEG (7), Deflate (8), "
            "PackBits (32773) only"
        )
    if comp == 7:
        if bits[0] != 8:
            raise NotImplementedError("JPEG-in-TIFF is 8-bit only")
        if photo == 6:
            # new-style JPEG strips decode straight to RGB (the JPEG
            # codec owns the YCbCr stage); downstream treats them as 2
            photo = 2
    if comp in (2, 3, 4) and (bits[0] != 1 or spp != 1):
        raise ValueError("CCITT codings (Compression 2/3/4) require bilevel data")
    t4_options = t.get(_T_T4OPTIONS, [0])[0]
    if comp == 3 and t4_options & 0x2:
        raise NotImplementedError("G3 uncompressed mode (T4Options bit 1)")

    bilevel = bits[0] == 1 and spp == 1
    if bits[0] == 1 and (spp != 1 or planar == 2):
        raise NotImplementedError("bilevel data must be chunky single-sample")
    bpp = 2 if bits[0] == 16 else 1  # bytes per sample (r7: 16-bit)
    row_bytes = (width + 7) // 8 if bilevel else width * spp * bpp

    jpeg_tables = bytes(t.get(_T_JPEGTABLES, []))

    def decompress(chunk: bytes, expected: int, pix_w: int | None = None) -> bytes:
        if comp == 1:
            return chunk[:expected]
        if comp == 7:  # new-style JPEG-in-TIFF (r9)
            from data_migration_etl_scripts_spark.operators.jpeg import (
                jpeg_decode,
            )

            stream = bytes(chunk)
            if len(jpeg_tables) > 4 and stream[:2] == b"\xff\xd8":
                # JPEGTables = SOI + DQT/DHT + EOI; prepend its tables
                # to the strip stream (drop the tables EOI + strip SOI)
                stream = jpeg_tables[:-2] + stream[2:]
            jw, jh, jrows = jpeg_decode(stream)
            w_px = pix_w if pix_w is not None else width
            if jw != w_px:
                raise ValueError(
                    f"JPEG strip width {jw} != segment width {w_px}"
                )
            pad = bytes(max(0, spp - 3))
            out = bytearray()
            for row in jrows:
                if spp == 1:
                    out += bytes(px_[0] for px_ in row)
                else:
                    out += b"".join(bytes(px_[:spp]) + pad for px_ in row)
            return bytes(out[:expected])
        if comp in (2, 3, 4):  # CCITT MH 1-D / G3 (r9) / G4 2-D (r8)
            from data_migration_etl_scripts_spark.operators.ccitt import (
                g3_decode_packed,
                g4_decode_packed,
                mh_decode_packed,
            )

            w_px = pix_w if pix_w is not None else width
            n_rows = expected // ((w_px + 7) // 8)
            if comp == 3:
                return g3_decode_packed(
                    chunk, w_px, n_rows, two_d=bool(t4_options & 0x1)
                )
            dec = g4_decode_packed if comp == 4 else mh_decode_packed
            return dec(chunk, w_px, n_rows)
        if comp == 32773:
            return packbits_decode(chunk, expected)
        if comp == 8:  # Adobe deflate: zlib stream per strip/tile
            import zlib

            return zlib.decompress(bytes(chunk))[:expected]
        return lzw_decode(chunk, expected)

    def undo_predictor(data: bytes, n_rows: int, stride: int, nchan: int) -> bytes:
        """Horizontal differencing is per SAMPLE (16-bit units when
        bpp == 2), channel-interleave-aware: lag = nchan samples."""
        if predictor != 2:
            return data
        if bilevel:
            raise NotImplementedError("Predictor 2 on bilevel data")
        if bpp == 1:
            out = bytearray(data)
            for r in range(n_rows):
                base = r * stride
                for i in range(nchan, stride):
                    out[base + i] = (out[base + i] + out[base + i - nchan]) & 0xFF
            return bytes(out)
        n_samp = stride // 2
        out = bytearray(len(data))
        for r in range(n_rows):
            base = r * stride
            vals = list(struct.unpack_from(e + f"{n_samp}H", data, base))
            for i in range(nchan, n_samp):
                vals[i] = (vals[i] + vals[i - nchan]) & 0xFFFF
            struct.pack_into(e + f"{n_samp}H", out, base, *vals)
        return bytes(out)

    if _T_TILE_WIDTH in t:
        # tiled layout (tags 322-325): tw x th blocks, left-to-right
        # then top-to-bottom, edge tiles PADDED to full tile size;
        # compression and predictor apply per tile (predictor rows are
        # tile-width). Spec requires tile dims to be multiples of 16,
        # which keeps bilevel blits byte-aligned.
        if planar == 2:
            raise NotImplementedError("tiled + PlanarConfiguration 2")
        if (_T_TILE_LENGTH not in t or _T_TILE_OFFSETS not in t
                or _T_TILE_COUNTS not in t):
            raise ValueError(
                "tiled TIFF missing TileLength/TileOffsets/TileByteCounts "
                "(tags 323/324/325)"
            )
        tw = t[_T_TILE_WIDTH][0]
        th = t[_T_TILE_LENGTH][0]
        if tw % 16 or th % 16:
            raise ValueError(f"tile dims {tw}x{th} must be multiples of 16")
        offsets = t[_T_TILE_OFFSETS]
        counts = t[_T_TILE_COUNTS]
        across = (width + tw - 1) // tw
        tile_row_bytes = (tw + 7) // 8 if bilevel else tw * spp * bpp
        raw = bytearray(row_bytes * height)
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            data = undo_predictor(
                decompress(b[off: off + cnt], tile_row_bytes * th, tw),
                th, tile_row_bytes, spp,
            )
            x0 = (idx % across) * tw
            y0 = (idx // across) * th
            xb = x0 // 8 if bilevel else x0 * spp * bpp
            copy = min(tile_row_bytes, row_bytes - xb)
            for r in range(min(th, height - y0)):
                dst = (y0 + r) * row_bytes + xb
                raw[dst: dst + copy] = data[
                    r * tile_row_bytes: r * tile_row_bytes + copy
                ]
        raw = bytes(raw)
    elif planar == 2:
        # separate planes (r7): each sample's strips stored
        # consecutively, plane-major; predictor lag is 1 within a
        # plane. Decode per plane, then interleave to the chunky
        # layout the assembly below expects.
        rows_per_strip = t.get(_T_ROWS_PER_STRIP, [height])[0] or height
        offsets = t[_T_STRIP_OFFSETS]
        counts = t[_T_STRIP_COUNTS]
        per_plane = len(offsets) // spp
        plane_row = width * bpp
        planes = []
        for c in range(spp):
            praw = bytearray()
            row0 = 0
            for off, cnt in zip(
                offsets[c * per_plane: (c + 1) * per_plane],
                counts[c * per_plane: (c + 1) * per_plane],
            ):
                n_rows = min(rows_per_strip, height - row0)
                praw += undo_predictor(
                    decompress(b[off: off + cnt], plane_row * n_rows),
                    n_rows, plane_row, 1,
                )
                row0 += n_rows
            planes.append(praw)
        raw = bytearray(row_bytes * height)
        for y in range(height):
            for x in range(width):
                for c in range(spp):
                    src = y * plane_row + x * bpp
                    dst = y * row_bytes + (x * spp + c) * bpp
                    raw[dst: dst + bpp] = planes[c][src: src + bpp]
        raw = bytes(raw)
    else:
        rows_per_strip = t.get(_T_ROWS_PER_STRIP, [height])[0] or height
        offsets = t[_T_STRIP_OFFSETS]
        counts = t.get(
            _T_STRIP_COUNTS, [len(b) - offsets[0]] if len(offsets) == 1 else None
        )
        if counts is None:
            raise ValueError("multi-strip TIFF without StripByteCounts")
        raw = bytearray()
        row0 = 0
        for off, cnt in zip(offsets, counts):
            n_rows = min(rows_per_strip, height - row0)
            raw += undo_predictor(
                decompress(b[off: off + cnt], row_bytes * n_rows),
                n_rows, row_bytes, spp,
            )
            row0 += n_rows

    if bpp == 2:
        # 16-bit -> 8-bit for the RGB surface: keep the high byte
        # (file byte order decides which half that is)
        raw = raw[0::2] if e == ">" else raw[1::2]
        row_bytes //= 2

    rows: list[list[tuple[int, int, int]]] = []
    if bilevel:
        for y in range(height):
            base = y * row_bytes
            row = []
            for x in range(width):
                bit = (raw[base + (x >> 3)] >> (7 - (x & 7))) & 1
                v = 255 * bit
                if photo == 0:  # WhiteIsZero
                    v = 255 - v
                row.append((v, v, v))
            rows.append(row)
        return width, height, rows
    if photo in (0, 1) and spp == 1:  # 8-bit gray
        for y in range(height):
            base = y * width
            row = []
            for x in range(width):
                v = raw[base + x]
                if photo == 0:
                    v = 255 - v
                row.append((v, v, v))
            rows.append(row)
        return width, height, rows
    if photo == 3 and spp == 1:  # palette: ColorMap is 3*2^bits SHORTs
        cmap = t[_T_COLORMAP]
        n = len(cmap) // 3
        for y in range(height):
            base = y * width
            row = []
            for x in range(width):
                i = raw[base + x]
                row.append(
                    (cmap[i] >> 8, cmap[n + i] >> 8, cmap[2 * n + i] >> 8)
                )
            rows.append(row)
        return width, height, rows
    if photo == 2 and spp >= 3:  # RGB (+ ignored extra samples)
        for y in range(height):
            base = y * width * spp
            row = []
            for x in range(width):
                p = base + x * spp
                row.append((raw[p], raw[p + 1], raw[p + 2]))
            rows.append(row)
        return width, height, rows
    raise NotImplementedError(
        f"PhotometricInterpretation {photo} with {spp} samples"
    )


# ---------------------------------------------------------------------------
# encode (single IFD, little-endian)


def tiff_encode(
    px: list[list[tuple[int, int, int]]],
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
    gray: bool = False,
    big_endian: bool = False,
    tiles: tuple[int, int] | None = None,
    quality: int = 90,
) -> bytes:
    """rows of (r, g, b) -> TIFF bytes. compression in
    {'none', 'packbits', 'lzw', 'deflate', 'jpeg'}; predictor applies
    horizontal differencing (LZW-style, valid with any compression per
    spec — not with 'jpeg'); gray writes 1 sample/pixel from the red
    channel. ``tiles=(tw, th)`` writes the TILED layout (tags 322-325,
    dims must be multiples of 16 per spec; edge tiles zero-padded to
    full size) instead of strips. ``compression='jpeg'`` (r9) writes
    new-style JPEG-in-TIFF (Compression 7, PhotometricInterpretation
    6): each strip/tile is an independent baseline JPEG at
    ``quality``; lossy like any JPEG, but the engine decode of the
    TIFF equals the engine JPEG round trip of each strip EXACTLY
    (same codec both ways)."""
    height = len(px)
    width = len(px[0])
    spp = 1 if gray else 3
    rps = rows_per_strip or height
    e = ">" if big_endian else "<"
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5, "deflate": 8,
               "jpeg": 7}[compression]
    if compression == "jpeg" and (gray or predictor):
        raise ValueError("JPEG-in-TIFF: RGB chunky, no predictor")

    def pack_seg(seg: bytes) -> bytes:
        if compression == "none":
            return bytes(seg)
        if compression == "packbits":
            return packbits_encode(bytes(seg))
        if compression == "deflate":
            import zlib

            return zlib.compress(bytes(seg), 6)
        return lzw_encode(bytes(seg))

    def raw_line(y: int, x0: int, x1: int) -> bytearray:
        line = bytearray()
        for x in range(x0, x1):
            if y >= height or x >= width:
                line += bytes(spp)  # edge-tile padding
                continue
            r, g, bl = px[y][x]
            line += bytes([r & 0xFF] if gray else [r & 0xFF, g & 0xFF, bl & 0xFF])
        if predictor:
            for i in range(len(line) - 1, spp - 1, -1):
                line[i] = (line[i] - line[i - spp]) & 0xFF
        return line

    def jpeg_seg(y0, y1, x0, x1):
        from data_migration_etl_scripts_spark.operators.jpeg import (
            jpeg_encode,
        )

        rows = []
        for y in range(y0, y1):
            row = []
            for x in range(x0, x1):
                row.append(px[y][x] if (y < height and x < width)
                           else (0, 0, 0))
            rows.append(row)
        return jpeg_encode(rows, quality=quality)

    # raster -> per-strip (or per-tile) encoded segments
    strips: list[bytes] = []
    if compression == "jpeg":
        if tiles is not None:
            tw, th = tiles
            if tw % 16 or th % 16:
                raise ValueError(f"tile dims {tw}x{th} must be multiples of 16")
            for y0 in range(0, height, th):
                for x0 in range(0, width, tw):
                    strips.append(jpeg_seg(y0, y0 + th, x0, x0 + tw))
        else:
            for y0 in range(0, height, rps):
                strips.append(jpeg_seg(y0, min(y0 + rps, height), 0, width))
    elif tiles is not None:
        tw, th = tiles
        if tw % 16 or th % 16:
            raise ValueError(f"tile dims {tw}x{th} must be multiples of 16")
        for y0 in range(0, height, th):
            for x0 in range(0, width, tw):
                seg = bytearray()
                for y in range(y0, y0 + th):
                    seg += raw_line(y, x0, x0 + tw)
                strips.append(pack_seg(seg))
    else:
        for y0 in range(0, height, rps):
            seg = bytearray()
            for y in range(y0, min(y0 + rps, height)):
                seg += raw_line(y, 0, width)
            strips.append(pack_seg(seg))

    n_strips = len(strips)
    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    extra = bytearray()  # out-of-line values, appended after the IFD

    def entry(tag: int, typ: int, values: list[int]) -> None:
        cnt = len(values)
        size = _TYPE_SIZES[typ] * cnt
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack(e + f"{cnt}{fmt}", *values).ljust(4, b"\x00")
            entries.append((tag, typ, cnt, int.from_bytes(packed, "big" if big_endian else "little")))
        else:
            entries.append((tag, typ, cnt, ("extra", len(extra))))  # type: ignore[arg-type]
            extra.extend(struct.pack(e + f"{cnt}{fmt}", *values))

    header = 8
    # layout: header | IFD | extra values | strip data
    # IFD size depends on entry count — fixed set below
    entry(_T_WIDTH, 3, [width])
    entry(_T_HEIGHT, 3, [height])
    entry(_T_BITS, 3, [8] * spp)
    entry(_T_COMPRESSION, 3, [comp_id])
    entry(_T_PHOTOMETRIC, 3,
          [6 if compression == "jpeg" else (1 if gray else 2)])
    offsets_tag = _T_TILE_OFFSETS if tiles is not None else _T_STRIP_OFFSETS
    entry(offsets_tag, 4, [0] * n_strips)  # patched below
    entry(_T_SPP, 3, [spp])
    if tiles is not None:
        entry(_T_TILE_WIDTH, 3, [tiles[0]])
        entry(_T_TILE_LENGTH, 3, [tiles[1]])
        entry(_T_TILE_COUNTS, 4, [len(s) for s in strips])
    else:
        entry(_T_ROWS_PER_STRIP, 3, [rps])
        entry(_T_STRIP_COUNTS, 4, [len(s) for s in strips])
    if predictor:
        entry(_T_PREDICTOR, 3, [2])
    entries.sort(key=lambda x: x[0])

    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = header + ifd_size
    # extra is complete (out-of-line values, including the StripOffsets
    # placeholder when n_strips > 1), so the data base is final: compute
    # the strip offsets once and write them into their recorded slot
    data_off = extra_off + len(extra)
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    fixed: list[bytes] = []
    for tag, typ, cnt, val in entries:
        if tag == offsets_tag and cnt == 1:
            val_b = struct.pack(e + "I", strip_offs[0])
        elif isinstance(val, tuple):
            slot = val[1]
            if tag == offsets_tag:
                extra[slot:slot + 4 * cnt] = struct.pack(
                    e + f"{cnt}I", *strip_offs
                )
            val_b = struct.pack(e + "I", extra_off + slot)
        else:
            val_b = val.to_bytes(4, "big" if big_endian else "little")
        fixed.append(struct.pack(e + "HHI", tag, typ, cnt) + val_b)

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(e + "I", header)
    out += struct.pack(e + "H", len(entries))
    for eb in fixed:
        out += eb
    out += struct.pack(e + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
