"""Minimal MP4 / ISO-BMFF (ISO 14496-12/-15) demux: extract the H.264
parameter sets and the first sync video sample as an Annex-B stream —
the container step between a crawled ``.mp4`` and
``operators/h264.py``'s I-frame decoder.

Reference parity note: LLM-data-pipeline addendum surface (first-frame
decode for thumbnails/hashing over binary video columns).

Everything here is STRUCTURAL container layout (box walk with 32/64-
bit sizes, ``moov>trak>mdia>minf>stbl`` sample tables, ``avcC``
parameter sets, ``stss`` sync table, ``stsc/stco/stsz`` offset
arithmetic, length-prefixed-NAL to start-code conversion) — zero
tabulated spec constants, so no Annex-B seam: the seam story lives in
the codec layer (h264.py's CAVLC tables).

Scope: the FIRST sync sample of the FIRST AVC video track — from the
classic ``stbl`` sample tables OR (r9) from movie fragments
(``moof > traf > tfhd/trun`` with base-data-offset /
default-base-is-moof addressing, trex/tfhd default sample sizes and
flags, and the sample_is_non_sync_sample bit for sync selection).
Editing lists and non-AVC codecs raise namefully.

``mp4_wrap_h264`` builds the inverse for tests: a minimal
single-sample MP4 around an Annex-B stream (the engine's encoder
output) — unfragmented by default, ``fragmented=True`` emits the
fMP4 layout (empty stbl + mvex/trex + one moof/mdat pair) — so
demux+decode round-trips are self-checking end to end without any
foreign fixture."""

from __future__ import annotations

import struct

__all__ = ["mp4_boxes", "mp4_extract_h264", "mp4_wrap_h264",
           "mp4_extract_aac", "mp4_wrap_aac"]


def mp4_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (box_type, payload_start, payload_end) for the boxes in
    ``data[start:end]`` (one nesting level; recurse by calling again
    on a payload range)."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        typ = data[pos + 4: pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated 64-bit box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of file
        if size < hdr or pos + size > end:
            raise ValueError(f"box {typ!r} overruns its container")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, path: list[bytes], start: int, end: int):
    """First box at ``path`` below [start, end); returns (s, e)."""
    for typ, s, e in mp4_boxes(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            return _find(data, path[1:], s, e)
    raise ValueError(f"box {b'/'.join(path)!r} not found")


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, pos))


def mp4_extract_h264(data: bytes) -> bytes:
    """MP4 bytes -> Annex-B stream of SPS + PPS + the first sync video
    sample's NAL units (flat stbl files and fragmented moof files)."""
    # valid ISO-BMFF may open with free/skip/wide (or even mdat) before
    # ftyp/moov — require a known top-level box type up front, then let
    # the moov walk below do the real validation
    if data[4:8] not in (b"ftyp", b"styp", b"moov", b"free", b"skip",
                         b"wide", b"mdat", b"pdin", b"uuid", b"moof",
                         b"sidx", b"meta"):
        raise ValueError("not an ISO-BMFF file (no known top-level box)")
    fragmented = any(t == b"moof" for t, _s, _e in mp4_boxes(data))
    moov = _find(data, [b"moov"], 0, len(data))

    # first trak whose stsd carries an avc1/avc3 entry
    last_err = None
    for typ, ts, te in mp4_boxes(data, *moov):
        if typ != b"trak":
            continue
        try:
            stbl = _find(data, [b"mdia", b"minf", b"stbl"], ts, te)
            stsd_s, stsd_e = _find(data, [b"stsd"], *stbl)
            # stsd: version/flags u32, entry_count u32, then entries
            n_entries = struct.unpack_from(">I", data, stsd_s + 4)[0]
            entry_pos = stsd_s + 8
            avcc = None
            for _ in range(n_entries):
                esize = struct.unpack_from(">I", data, entry_pos)[0]
                etype = data[entry_pos + 4: entry_pos + 8]
                if etype in (b"avc1", b"avc3"):
                    # visual sample entry: 8 (hdr) + 78 bytes of fixed
                    # fields before the extension boxes
                    for btyp, bs, be in mp4_boxes(
                        data, entry_pos + 8 + 78, entry_pos + esize
                    ):
                        if btyp == b"avcC":
                            avcc = (bs, be)
                            break
                if avcc:
                    break
                entry_pos += esize
            if avcc is None:
                raise ValueError("no avc1/avcC entry in this track")
        except ValueError as e:
            last_err = e
            continue
        if fragmented:
            tkhd_s, _tkhd_e = _find(data, [b"tkhd"], ts, te)
            version = data[tkhd_s]
            # track_ID after version/flags + creation/modification
            tid_off = tkhd_s + 4 + (16 if version == 1 else 8)
            track_id = struct.unpack_from(">I", data, tid_off)[0]
            return _assemble_fmp4(data, avcc, track_id)
        return _assemble(data, stbl, avcc)
    raise ValueError(f"no AVC video track found ({last_err})")


def _param_sets(data: bytes, avcc: tuple):
    """avcC box -> (Annex-B SPS+PPS bytes, NAL length-field size)."""
    s, e = avcc
    if data[s] != 1:
        raise ValueError(f"avcC configurationVersion {data[s]}")
    nal_len = (data[s + 4] & 3) + 1
    pos = s + 5
    out = bytearray()
    n_sps = data[pos] & 0x1F
    pos += 1
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", data, pos)[0]
        out += b"\x00\x00\x00\x01" + data[pos + 2: pos + 2 + ln]
        pos += 2 + ln
    n_pps = data[pos]
    pos += 1
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", data, pos)[0]
        out += b"\x00\x00\x00\x01" + data[pos + 2: pos + 2 + ln]
        pos += 2 + ln
    return out, nal_len


def _nals_to_annexb(data: bytes, off: int, size: int, nal_len: int,
                    out: bytearray) -> bytes:
    end_off = off + size
    while off + nal_len <= end_off:
        ln = int.from_bytes(data[off: off + nal_len], "big")
        off += nal_len
        out += b"\x00\x00\x00\x01" + data[off: off + ln]
        off += ln
    return bytes(out)


def _fmp4_samples(data: bytes, track_id: int):
    """Yield (offset, size, sample_flags) for every sample of the
    given track across the movie fragments: moof > traf > tfhd
    (defaults + base addressing) and trun (per-sample sizes/flags)."""
    for typ, ms, me in mp4_boxes(data):
        if typ != b"moof":
            continue
        moof_start = ms - 8  # box header start (moof sizes are 32-bit)
        for t2, ts, te in mp4_boxes(data, ms, me):
            if t2 != b"traf":
                continue
            tfhd_s, _e2 = _find(data, [b"tfhd"], ts, te)
            tf_flags = struct.unpack_from(">I", data, tfhd_s)[0] & 0xFFFFFF
            if struct.unpack_from(">I", data, tfhd_s + 4)[0] != track_id:
                continue
            pos = tfhd_s + 8
            base = moof_start
            if tf_flags & 0x1:           # base-data-offset-present
                base = struct.unpack_from(">Q", data, pos)[0]
                pos += 8
            if tf_flags & 0x2:           # sample-description-index
                pos += 4
            def_size = None
            if tf_flags & 0x8:           # default-sample-duration
                pos += 4
            if tf_flags & 0x10:
                def_size = struct.unpack_from(">I", data, pos)[0]
                pos += 4
            def_flags = 0
            if tf_flags & 0x20:
                def_flags = struct.unpack_from(">I", data, pos)[0]
                pos += 4
            for t3, rs, re_ in mp4_boxes(data, ts, te):
                if t3 != b"trun":
                    continue
                tr_flags = struct.unpack_from(">I", data, rs)[0] & 0xFFFFFF
                count = struct.unpack_from(">I", data, rs + 4)[0]
                pos = rs + 8
                if not tr_flags & 0x1:
                    raise NotImplementedError(
                        "trun without data_offset — implicit mdat "
                        "chaining not supported"
                    )
                data_off = struct.unpack_from(">i", data, pos)[0]
                pos += 4
                first_flags = None
                if tr_flags & 0x4:
                    first_flags = struct.unpack_from(">I", data, pos)[0]
                    pos += 4
                off = base + data_off
                for i in range(count):
                    if tr_flags & 0x100:   # sample-duration
                        pos += 4
                    size = def_size
                    if tr_flags & 0x200:
                        size = struct.unpack_from(">I", data, pos)[0]
                        pos += 4
                    if size is None:
                        raise ValueError(
                            "fMP4 sample without a size (no trun "
                            "sizes, no tfhd default)"
                        )
                    sflags = def_flags
                    if tr_flags & 0x400:
                        sflags = struct.unpack_from(">I", data, pos)[0]
                        pos += 4
                    elif i == 0 and first_flags is not None:
                        sflags = first_flags
                    if tr_flags & 0x800:   # composition offset
                        pos += 4
                    yield off, size, sflags
                    off += size


def _assemble_fmp4(data: bytes, avcc: tuple, track_id: int) -> bytes:
    """First sync sample of the given track across the movie
    fragments (sample_is_non_sync_sample = bit 16 of sample flags)."""
    out, nal_len = _param_sets(data, avcc)
    for off, size, sflags in _fmp4_samples(data, track_id):
        if not sflags & 0x10000:  # sample_is_non_sync
            return _nals_to_annexb(data, off, size, nal_len, out)
    raise ValueError("no sync sample in any movie fragment")


def _assemble(data: bytes, stbl: tuple, avcc: tuple) -> bytes:
    out, nal_len = _param_sets(data, avcc)

    # sample tables -> offset/size of the first sync sample
    tables: dict[bytes, tuple[int, int]] = {}
    for typ, bs, be in mp4_boxes(data, *stbl):
        tables[typ] = (bs, be)
    # sync sample number (1-based); no stss => every sample is sync
    sync_no = 1
    if b"stss" in tables:
        bs, _be = tables[b"stss"]
        if struct.unpack_from(">I", data, bs + 4)[0] >= 1:
            sync_no = struct.unpack_from(">I", data, bs + 8)[0]
    # sizes
    bs, _be = tables[b"stsz"]
    uniform, count = struct.unpack_from(">II", data, bs + 4)
    if sync_no > count:
        raise ValueError("sync sample beyond stsz count")
    if uniform:
        size = uniform
        before = [uniform] * (sync_no - 1)
    else:
        sizes = _u32s(data, bs + 12, sync_no)
        size = sizes[sync_no - 1]
        before = sizes[: sync_no - 1]
    # sample -> chunk via stsc, then chunk offset via stco/co64
    bs, _be = tables[b"stsc"]
    n_stsc = struct.unpack_from(">I", data, bs + 4)[0]
    stsc = [struct.unpack_from(">III", data, bs + 8 + 12 * i)
            for i in range(n_stsc)]  # (first_chunk, per_chunk, desc)
    if b"stco" in tables:
        bs, _be = tables[b"stco"]
        n_off = struct.unpack_from(">I", data, bs + 4)[0]
        offsets = _u32s(data, bs + 8, n_off)
    else:
        bs, _be = tables[b"co64"]
        n_off = struct.unpack_from(">I", data, bs + 4)[0]
        offsets = list(struct.unpack_from(f">{n_off}Q", data, bs + 8))
    # walk chunks to locate the sample
    sample = 1
    chunk_idx = 0
    for i, (first, per, _d) in enumerate(stsc):
        last_chunk = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(offsets)
        for ch in range(first, last_chunk + 1):
            if sample + per > sync_no:
                chunk_idx = ch - 1
                off = offsets[chunk_idx]
                off += sum(before[sample - 1: sync_no - 1])
                return _nals_to_annexb(data, off, size, nal_len, out)
            sample += per
    raise ValueError("sync sample not reachable through stsc/stco")


# ----------------------------------------------------------- test mux

def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def mp4_wrap_h264(annexb: bytes, width: int, height: int,
                  fragmented: bool = False) -> bytes:
    """Wrap an Annex-B H.264 stream (SPS+PPS+one IDR picture, e.g. the
    engine encoders' output) as a minimal MP4 with one video track and
    one sync sample — the structural inverse of
    :func:`mp4_extract_h264` for self-checking round trips.
    ``fragmented=True`` emits the fMP4 layout instead: empty sample
    tables + mvex/trex in the moov, then one moof (tfhd with
    default-base-is-moof, trun with data_offset + sample size) and its
    mdat — the DASH/streaming-origin shape."""
    from data_migration_etl_scripts_spark.operators.h264 import nal_units

    sps = pps = None
    frame_nals = []
    for ref, typ, rbsp in nal_units(annexb):
        from data_migration_etl_scripts_spark.operators.h264 import _escape

        raw = bytes([(ref << 5) | typ]) + _escape(rbsp)
        if typ == 7:
            sps = raw
        elif typ == 8:
            pps = raw
        else:
            frame_nals.append(raw)
    if sps is None or pps is None or not frame_nals:
        raise ValueError("need SPS, PPS and at least one picture NAL")
    sample = b"".join(
        struct.pack(">I", len(n)) + n for n in frame_nals
    )

    avcc = (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)
    avc1 = (b"\x00" * 6 + struct.pack(">H", 1)          # data_ref_idx
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)                       # frame count
            + b"\x00" * 32                               # compressorname
            + struct.pack(">H", 0x18)                    # depth
            + struct.pack(">h", -1)                      # pre_defined
            + _box(b"avcC", avcc))
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + _box(b"avc1", avc1))
    if fragmented:
        # empty sample tables: all samples live in movie fragments
        stts = _box(b"stts", struct.pack(">II", 0, 0))
        stss = b""
        stsc = _box(b"stsc", struct.pack(">II", 0, 0))
        stsz = _box(b"stsz", struct.pack(">III", 0, 0, 0))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz
                    + _box(b"stco", struct.pack(">II", 0, 0)))
    else:
        stts = _box(b"stts", struct.pack(">IIII", 0, 1, 1, 1000))
        stss = _box(b"stss", struct.pack(">III", 0, 1, 1))
        stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, 1, 1))
        stsz = _box(b"stsz", struct.pack(">IIII", 0, 0, 1, len(sample)))
        # stco offset patched after layout below
        stco_payload = struct.pack(">III", 0, 1, 0)
        stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz
                    + _box(b"stco", stco_payload))
    dref = _box(b"dref", struct.pack(">II", 0, 1)
                + _box(b"url ", struct.pack(">I", 1)))
    dinf = _box(b"dinf", dref)
    vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\x00" * 12 + b"spark-graft\x00")
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 1000, 1000,
                                     0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">IIIII", 0x7, 0, 0, 1, 0)
                + struct.pack(">IIHHHH", 1000, 0, 0, 0, 0, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, 1000)
                + struct.pack(">iH", 0x10000, 0x0100) + b"\x00" * 10
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    trak = _box(b"trak", tkhd + mdia)
    if fragmented:
        trex = _box(b"trex", struct.pack(">IIIIII", 0, 1, 1, 1000, 0, 0))
        moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                    + b"isomiso5dash")
        mfhd = _box(b"mfhd", struct.pack(">II", 0, 1))
        # tfhd: default-base-is-moof (0x20000), track 1
        tfhd = _box(b"tfhd", struct.pack(">II", 0x20000, 1))
        # trun: data-offset (0x1) + sample-size (0x200), one sample;
        # data_offset patched to moof size + mdat header below
        trun = _box(b"trun", struct.pack(">IIiI", 0x201, 1, 0,
                                         len(sample)))
        moof = bytearray(_box(b"moof", mfhd + _box(b"traf", tfhd + trun)))
        idx = bytes(moof).find(b"trun") + 4 + 8  # flags + count
        struct.pack_into(">i", moof, idx, len(moof) + 8)
        return ftyp + moov + bytes(moof) + _box(b"mdat", sample)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomavc1")
    mdat = _box(b"mdat", sample)
    # patch the single stco entry to the mdat payload offset
    out = bytearray(ftyp + moov + mdat)
    data_off = len(ftyp) + len(moov) + 8
    idx = bytes(out).find(b"stco") + 4 + 8  # version/flags + count
    struct.pack_into(">I", out, idx, data_off)
    return bytes(out)


# ----------------------------------------------------------- AAC audio

def _track_id(data: bytes, ts: int, te: int) -> int:
    tkhd_s, _e = _find(data, [b"tkhd"], ts, te)
    version = data[tkhd_s]
    tid_off = tkhd_s + 4 + (16 if version == 1 else 8)
    return struct.unpack_from(">I", data, tid_off)[0]


def _stbl_samples(data: bytes, stbl: tuple):
    """All (offset, size) pairs from the classic sample tables."""
    tables = {typ: (bs, be) for typ, bs, be in mp4_boxes(data, *stbl)}
    bs, _be = tables[b"stsz"]
    uniform, count = struct.unpack_from(">II", data, bs + 4)
    sizes = [uniform] * count if uniform else _u32s(data, bs + 12, count)
    bs, _be = tables[b"stsc"]
    n_stsc = struct.unpack_from(">I", data, bs + 4)[0]
    stsc = [struct.unpack_from(">III", data, bs + 8 + 12 * i)
            for i in range(n_stsc)]
    if b"stco" in tables:
        bs, _be = tables[b"stco"]
        n_off = struct.unpack_from(">I", data, bs + 4)[0]
        offsets = _u32s(data, bs + 8, n_off)
    else:
        bs, _be = tables[b"co64"]
        n_off = struct.unpack_from(">I", data, bs + 4)[0]
        offsets = list(struct.unpack_from(f">{n_off}Q", data, bs + 8))
    out = []
    si = 0
    for i, (first, per, _d) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(offsets)
        for ch in range(first, last + 1):
            off = offsets[ch - 1]
            for _ in range(per):
                if si >= count:
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


def _read_descriptor(data: bytes, pos: int):
    """MPEG-4 expandable-class descriptor header -> (tag, payload
    start, payload end)."""
    tag = data[pos]
    pos += 1
    ln = 0
    for _ in range(4):
        b = data[pos]
        pos += 1
        ln = (ln << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    return tag, pos, pos + ln


def _parse_esds(data: bytes, s: int, e: int) -> tuple[int, int]:
    """esds box payload -> (rate_idx, channels) from the
    AudioSpecificConfig (14496-3): ES_Descriptor(3) >
    DecoderConfigDescriptor(4) > DecSpecificInfo(5)."""
    tag, ps, pe = _read_descriptor(data, s + 4)  # skip version/flags
    if tag != 0x03:
        raise ValueError(f"esds: expected ES_Descriptor, got tag {tag}")
    pos = ps + 2  # ES_ID
    flags = data[pos]
    pos += 1
    if flags & 0x80:   # streamDependenceFlag
        pos += 2
    if flags & 0x40:   # URL_Flag
        pos += 1 + data[pos]
    if flags & 0x20:   # OCRstreamFlag
        pos += 2
    tag, ds, de = _read_descriptor(data, pos)
    if tag != 0x04:
        raise ValueError("esds: DecoderConfigDescriptor missing")
    oti = data[ds]
    if oti not in (0x40, 0x66, 0x67, 0x68):  # MPEG-4 / MPEG-2 AAC
        raise NotImplementedError(
            f"audio objectTypeIndication {oti:#x} is not AAC"
        )
    tag, cs, ce = _read_descriptor(data, ds + 13)
    if tag != 0x05:
        raise ValueError("esds: DecSpecificInfo missing")
    b0, b1 = data[cs], data[cs + 1]
    aot = b0 >> 3
    if aot != 2:
        raise NotImplementedError(
            f"AudioSpecificConfig object type {aot} — AAC-LC (2) only"
        )
    rate_idx = ((b0 & 7) << 1) | (b1 >> 7)
    if rate_idx == 15:
        # explicit 24-bit samplingFrequency follows the index, then
        # the 4-bit channelConfiguration (14496-3 ASC syntax). ADTS
        # carries only the 4-bit index, so map the explicit rate back
        # to its table entry (exact match; else the nearest rate —
        # some encoders write a standard rate explicitly).
        from data_migration_etl_scripts_spark.operators.aac import _RATES

        b2, b3, b4 = data[cs + 2], data[cs + 3], data[cs + 4]
        freq = ((b1 & 0x7F) << 17) | (b2 << 9) | (b3 << 1) | (b4 >> 7)
        rate_idx = min(range(len(_RATES)),
                       key=lambda i: abs(_RATES[i] - freq))
        channels = (b4 >> 3) & 0xF
        return rate_idx, channels
    channels = (b1 >> 3) & 0xF
    return rate_idx, channels


def _adts_hdr_bytes(rate_idx: int, channels: int,
                    frame_len: int) -> bytes:
    """7-byte ADTS header (no CRC, fullness 0x7FF) — bit-identical to
    operators/aac.py's engine encoder headers, so wrap->extract
    round-trips byte-exactly."""
    return bytes([
        0xFF, 0xF1,
        (1 << 6) | (rate_idx << 2) | (channels >> 2),
        ((channels & 3) << 6) | (frame_len >> 11),
        (frame_len >> 3) & 0xFF,
        ((frame_len & 7) << 5) | 0x1F,
        0xFC,
    ])


def mp4_extract_aac(data: bytes) -> bytes:
    """MP4 bytes -> ADTS AAC stream of ALL samples of the first AAC
    audio (``mp4a``) track, from the classic ``stbl`` tables or (for
    fragmented files) the moof/traf/trun walk — the audio sibling of
    :func:`mp4_extract_h264`, feeding ``operators/aac.py``."""
    if data[4:8] not in (b"ftyp", b"styp", b"moov", b"free", b"skip",
                         b"wide", b"mdat", b"pdin", b"uuid", b"moof",
                         b"sidx", b"meta"):
        raise ValueError("not an ISO-BMFF file (no known top-level box)")
    fragmented = any(t == b"moof" for t, _s, _e in mp4_boxes(data))
    moov = _find(data, [b"moov"], 0, len(data))
    last_err = None
    for typ, ts, te in mp4_boxes(data, *moov):
        if typ != b"trak":
            continue
        try:
            stbl = _find(data, [b"mdia", b"minf", b"stbl"], ts, te)
            stsd_s, _stsd_e = _find(data, [b"stsd"], *stbl)
            n_entries = struct.unpack_from(">I", data, stsd_s + 4)[0]
            entry_pos = stsd_s + 8
            esds = None
            for _ in range(n_entries):
                esize = struct.unpack_from(">I", data, entry_pos)[0]
                if data[entry_pos + 4: entry_pos + 8] == b"mp4a":
                    version = struct.unpack_from(
                        ">H", data, entry_pos + 16)[0]
                    # v0: 28 fixed bytes after the 8-byte sample-entry
                    # header; QuickTime v1 adds 16 more
                    box_at = entry_pos + 8 + 28 + (16 if version else 0)
                    for btyp, bs, be in mp4_boxes(
                        data, box_at, entry_pos + esize
                    ):
                        if btyp == b"esds":
                            esds = (bs, be)
                            break
                if esds:
                    break
                entry_pos += esize
            if esds is None:
                raise ValueError("no mp4a/esds entry in this track")
            rate_idx, channels = _parse_esds(data, *esds)
        except ValueError as e:
            last_err = e
            continue
        if fragmented:
            samples = list(_fmp4_samples(data, _track_id(data, ts, te)))
            samples = [(off, size) for off, size, _f in samples]
        else:
            samples = _stbl_samples(data, stbl)
        if not samples:
            raise ValueError("AAC track has no samples")
        out = bytearray()
        for off, size in samples:
            out += _adts_hdr_bytes(rate_idx, channels, 7 + size)
            out += data[off: off + size]
        return bytes(out)
    raise ValueError(f"no AAC audio track found ({last_err})")


def mp4_wrap_aac(adts: bytes, fragmented: bool = False,
                 explicit_rate: bool = False) -> bytes:
    """Wrap an ADTS AAC stream (e.g. the engine encoders' output) as a
    minimal MP4 with one audio track — the structural inverse of
    :func:`mp4_extract_aac` for self-checking round trips.
    ``fragmented=True`` emits the fMP4 layout (empty stbl + mvex/trex,
    one moof/mdat with per-sample trun sizes). ``explicit_rate=True``
    codes the ASC with samplingFrequencyIndex 15 + the 24-bit explicit
    samplingFrequency (the variant some encoders emit even for
    standard rates), pinning the extract side's explicit-rate parse."""
    from data_migration_etl_scripts_spark.operators.aac import (
        _RATES,
        adts_frames,
    )

    # frame body = frame bytes minus the 7/9-byte ADTS header
    payloads = []
    rate_idx = channels = None
    pos = 0
    for hdr, _r, _end in adts_frames(adts):
        rate_idx, channels = hdr["rate_idx"], hdr["channels"]
        head = 7 if hdr["crc_absent"] else 9
        payloads.append(adts[pos + head: pos + hdr["frame_len"]])
        pos += hdr["frame_len"]
    if not payloads:
        raise ValueError("no ADTS frames to wrap")
    rate = _RATES[rate_idx]

    if explicit_rate:
        asc = bytes([
            (2 << 3) | (15 >> 1),
            (1 << 7) | ((rate >> 17) & 0x7F),
            (rate >> 9) & 0xFF,
            (rate >> 1) & 0xFF,
            ((rate & 1) << 7) | (channels << 3),
        ])
    else:
        asc = bytes([
            (2 << 3) | (rate_idx >> 1),
            ((rate_idx & 1) << 7) | (channels << 3),
        ])
    dsi = bytes([0x05, len(asc)]) + asc
    dcd_payload = (bytes([0x40, 0x15]) + b"\x00" * 11 + dsi)
    dcd = bytes([0x04, len(dcd_payload)]) + dcd_payload
    sl = bytes([0x06, 1, 2])
    es_payload = b"\x00\x00\x00" + dcd + sl
    es = bytes([0x03, len(es_payload)]) + es_payload
    esds = _box(b"esds", struct.pack(">I", 0) + es)
    mp4a = (b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HH", 0, 0)       # version/revision
            + b"\x00" * 4                    # vendor
            + struct.pack(">HH", channels, 16)
            + struct.pack(">HH", 0, 0)       # compression/packet
            + struct.pack(">I", rate << 16)  # 16.16 sample rate
            + esds)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + _box(b"mp4a", mp4a))
    n = len(payloads)
    sample_data = b"".join(payloads)
    if fragmented:
        stts = _box(b"stts", struct.pack(">II", 0, 0))
        stsc = _box(b"stsc", struct.pack(">II", 0, 0))
        stsz = _box(b"stsz", struct.pack(">III", 0, 0, 0))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz
                    + _box(b"stco", struct.pack(">II", 0, 0)))
    else:
        stts = _box(b"stts", struct.pack(">IIII", 0, 1, n, 1024))
        stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
        stsz = _box(b"stsz", struct.pack(">III", 0, 0, n)
                    + b"".join(struct.pack(">I", len(p))
                               for p in payloads))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz
                    + _box(b"stco", struct.pack(">III", 0, 1, 0)))
    dref = _box(b"dref", struct.pack(">II", 0, 1)
                + _box(b"url ", struct.pack(">I", 1)))
    smhd = _box(b"smhd", struct.pack(">IHH", 0, 0, 0))
    minf = _box(b"minf", smhd + _box(b"dinf", dref) + stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"soun"
                + b"\x00" * 12 + b"spark-graft\x00")
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, rate,
                                     1024 * n, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">IIIII", 0x7, 0, 0, 1, 0)
                + struct.pack(">IIHHHH", 1024 * n, 0, 0, 0, 0x0100, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", 0, 0))
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, rate, 1024 * n)
                + struct.pack(">iH", 0x10000, 0x0100) + b"\x00" * 10
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    trak = _box(b"trak", tkhd + mdia)
    if fragmented:
        trex = _box(b"trex", struct.pack(">IIIIII", 0, 1, 1, 1024, 0, 0))
        moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                    + b"isomiso5dash")
        mfhd = _box(b"mfhd", struct.pack(">II", 0, 1))
        tfhd = _box(b"tfhd", struct.pack(">II", 0x20000, 1))
        trun_payload = struct.pack(">IIi", 0x201, n, 0) + b"".join(
            struct.pack(">I", len(p)) for p in payloads)
        trun = _box(b"trun", trun_payload)
        moof = bytearray(_box(b"moof", mfhd + _box(b"traf",
                                                   tfhd + trun)))
        idx = bytes(moof).find(b"trun") + 4 + 8  # flags + count
        struct.pack_into(">i", moof, idx, len(moof) + 8)
        return ftyp + moov + bytes(moof) + _box(b"mdat", sample_data)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    out = bytearray(ftyp + moov + _box(b"mdat", sample_data))
    data_off = len(ftyp) + len(moov) + 8
    idx = bytes(out).find(b"stco") + 4 + 8
    struct.pack_into(">I", out, idx, data_off)
    return bytes(out)
