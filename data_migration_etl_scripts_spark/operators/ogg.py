"""Ogg container (RFC 3533) demux: page walk, segment lacing, packet
reassembly, and the Ogg-FLAC mapping — the free-software audio
container of the crawl, next to operators/mp4.py and mpegts.py.

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (PCM extraction over
binary audio columns; ``.ogg``/``.oga`` files in web crawls).

Everything here is STRUCTURAL container layout — the "OggS" capture
pattern, version/header-type flags, granule/serial/sequence fields,
the page CRC-32 (polynomial 0x04C11DB7, zero init and zero final XOR
per RFC 3533 — the byte table is computed at module load, not
recalled), 255-valued segment lacing with packet continuation across
pages, and serial-number stream demux. Zero tabulated spec constants,
so no Annex-B seam: codec payloads route to the codec layers.

Codec mappings:
  - Ogg FLAC (https://xiph.org/flac/ogg_mapping.html): the first
    packet is 0x7F "FLAC" + version + header count + the native
    "fLaC" stream including STREAMINFO; audio packets are native
    FLAC frames. ``ogg_extract_flac`` rebuilds the native FLAC file
    byte-exactly, which ``operators/flac.py`` then decodes bit-exact
    (CRC + MD5 verified) — a REAL end-to-end path.
  - Vorbis ("\\x01vorbis") streams route to operators/vorbis.py
    (r10): full header-triad/setup parsing plus the silence
    operating point decode; nonzero floor curves raise at ITS
    documented synthesis plug. Opus ("OpusHead") routes to
    operators/opus.py (r12): TOC/frame packing + the RFC 6716 range
    coder + the CELT-silence operating point; non-silent CELT is
    seam-gated, SILK raises namefully.

``ogg_wrap_flac`` builds the inverse (native FLAC -> Ogg FLAC pages,
bounded page sizes, correct lacing incl. the 255-boundary cases and
a terminating lacing value) so wrap -> extract round-trips are
self-checking byte-exactly against the engine's own FLAC encoder."""

from __future__ import annotations

import struct

__all__ = ["ogg_pages", "ogg_packets", "ogg_extract_flac",
           "ogg_wrap_flac", "ogg_stream_kinds"]


def _crc_table():
    t = _crc_table._t
    if t is None:
        t = []
        for i in range(256):
            c = i << 24
            for _ in range(8):
                c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else (c << 1)
            t.append(c & 0xFFFFFFFF)
        _crc_table._t = t
    return t


_crc_table._t = None


def _page_crc(page: bytes) -> int:
    """RFC 3533 page CRC: 0x04C11DB7, init 0, no reflection, no
    final XOR, computed with the CRC field zeroed."""
    t = _crc_table()
    crc = 0
    for b in page:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ t[((crc >> 24) ^ b) & 0xFF]
    return crc


def ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, [segment bytes]) for
    each page; CRC-validated. Tolerates a truncated trailing page
    (common in crawled files)."""
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos: pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture pattern at {pos}")
        if data[pos + 4] != 0:
            raise ValueError(f"Ogg version {data[pos + 4]}")
        htype = data[pos + 5]
        granule, serial, seq, crc = struct.unpack_from(
            "<qIII", data, pos + 6)
        nsegs = data[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > n:
            return  # truncated tail
        laces = data[pos + 27: lace_end]
        body_len = sum(laces)
        if lace_end + body_len > n:
            return  # truncated tail
        page = bytearray(data[pos: lace_end + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _page_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at {pos}")
        segs = []
        off = lace_end
        for lace in laces:
            segs.append((lace, data[off: off + lace]))
            off += lace
        yield htype, granule, serial, seq, segs
        pos = lace_end + body_len


def ogg_packets(data: bytes):
    """Reassemble logical packets per stream: -> {serial: [packet
    bytes, ...]} (lacing values of 255 continue a packet, including
    across pages via the continuation flag).

    RFC 3533 loss handling: a packet left open when the next page
    lacks the continuation flag is DISCARDED (its tail was lost), as
    is any packet still open at end of stream; and when a stream is
    joined mid-packet (first page seen carries the continuation flag
    with no packet open), the leading segments through the orphan's
    terminating lace are skipped rather than glued onto the next
    packet."""
    streams: dict[int, list[bytes]] = {}
    open_pkt: dict[int, bytearray] = {}
    for htype, _granule, serial, _seq, segs in ogg_pages(data):
        buf = open_pkt.setdefault(serial, bytearray())
        skip_orphan = False
        if htype & 0x01:
            if not buf:
                # joined mid-packet: the page opens with the tail of a
                # packet whose head we never saw — discard through its
                # terminating lace
                skip_orphan = True
        elif buf:
            # previous page left a packet open but this page does not
            # continue it: the tail is lost — discard, don't emit
            buf.clear()
        for lace, seg in segs:
            if skip_orphan:
                if lace < 255:
                    skip_orphan = False
                continue
            buf += seg
            if lace < 255:  # packet terminates here
                streams.setdefault(serial, []).append(bytes(buf))
                buf.clear()
        # a packet still open at EOS is truncated: fall out of the
        # loop without emitting it
    return streams


def ogg_stream_kinds(data: bytes) -> dict[int, str]:
    """First-packet codec identification per stream serial."""
    kinds = {}
    for serial, pkts in ogg_packets(data).items():
        if not pkts:
            continue
        p0 = pkts[0]
        if p0[:5] == b"\x7fFLAC":
            kinds[serial] = "flac"
        elif p0[:7] == b"\x01vorbis":
            kinds[serial] = "vorbis"
        elif p0[:8] == b"OpusHead":
            kinds[serial] = "opus"
        else:
            kinds[serial] = "unknown"
    return kinds


def ogg_extract_flac(data: bytes) -> bytes:
    """Ogg bytes -> the native FLAC stream of the first Ogg-FLAC
    logical stream (mapping: packet 0 = 0x7F 'FLAC' + major/minor +
    16-bit header-packet count + the native 'fLaC' signature and
    STREAMINFO; subsequent header packets are native metadata blocks;
    audio packets are native frames). Vorbis/Opus streams raise
    namefully at the documented plug point."""
    streams = ogg_packets(data)
    kinds = ogg_stream_kinds(data)
    for serial, pkts in streams.items():
        if kinds.get(serial) != "flac":
            continue
        p0 = pkts[0]
        if len(p0) < 13 or p0[9:13] != b"fLaC":
            raise ValueError("malformed Ogg-FLAC first packet")
        # native stream = everything after the 9-byte mapping header,
        # then the remaining packets verbatim
        return p0[9:] + b"".join(pkts[1:])
    present = sorted(set(kinds.values()))
    if "vorbis" in present or "opus" in present:
        raise NotImplementedError(
            f"Ogg stream codecs {present}: Vorbis/Opus decode needs "
            "their tabulated codebooks — documented plug point "
            "(operators/ogg.py docstring); only Ogg FLAC decodes"
        )
    raise ValueError(f"no Ogg-FLAC stream found (streams: {present})")


def _page(htype: int, granule: int, serial: int, seq: int,
          segs: list[bytes], laces: list[int]) -> bytes:
    hdr = bytearray(b"OggS\x00")
    hdr.append(htype)
    hdr += struct.pack("<qIII", granule, serial, seq, 0)
    hdr.append(len(laces))
    hdr += bytes(laces)
    page = bytes(hdr) + b"".join(segs)
    crc = _page_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def ogg_wrap_flac(flac: bytes, serial: int = 0x5FAC) -> bytes:
    """Native FLAC bytes -> a single-stream Ogg FLAC file (the
    structural inverse of :func:`ogg_extract_flac`): packet 0 is the
    mapping header + signature + STREAMINFO on its own BOS page,
    remaining metadata blocks one packet each, then the frame data as
    one packet laced across pages. Round-trips byte-exactly."""
    if flac[:4] != b"fLaC":
        raise ValueError("not a native FLAC stream")
    # split metadata blocks to find the frame-data start
    pos = 4
    blocks = []
    while True:
        hdr = flac[pos]
        length = int.from_bytes(flac[pos + 1: pos + 4], "big")
        blocks.append(flac[pos: pos + 4 + length])
        pos += 4 + length
        if hdr & 0x80:
            break
    frames = flac[pos:]
    n_extra = len(blocks) - 1
    pkt0 = (b"\x7fFLAC\x01\x00" + struct.pack(">H", n_extra)
            + b"fLaC" + blocks[0])

    def lace_packet(pkt: bytes):
        laces = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        return laces

    out = bytearray()
    out += _page(0x02, 0, serial, 0, [pkt0], lace_packet(pkt0))
    seq = 1
    for blk in blocks[1:]:
        out += _page(0, 0, serial, seq, [blk], lace_packet(blk))
        seq += 1
    # frame data: one logical packet, laced across pages of <= 255
    # segments each; continuation flag on follow-on pages
    laces = lace_packet(frames)
    off = 0
    first = True
    while laces:
        chunk_laces = laces[:255]
        laces = laces[255:]
        size = sum(chunk_laces)
        htype = (0 if first else 0x01) | (0x04 if not laces else 0)
        out += _page(htype, -1 if laces else 0, serial, seq,
                     [frames[off: off + size]], chunk_laces)
        off += size
        seq += 1
        first = False
    return bytes(out)
