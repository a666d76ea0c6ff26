"""MPEG transport stream (ISO/IEC 13818-1) demux: extract the H.264
Annex-B video and/or ADTS AAC audio elementary streams from ``.ts``
segments — the HLS/broadcast container next to ``operators/mp4.py``'s
ISO-BMFF demux, feeding ``operators/h264.py`` / ``operators/aac.py``.

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (crawled HLS segments
are the second most common video container after MP4).

Everything here is STRUCTURAL container layout — 188-byte packets,
PAT/PMT section walk with the MPEG-2 CRC-32 (the polynomial is a
formula, computed not tabulated at module load), adaptation-field
skip, PES reassembly across packets, PES-header length arithmetic —
zero tabulated spec constants, so no Annex-B seam: the seam story
lives in the codec layers. The stream_type registry values used
(0x1B = AVC video, 0x0F = ADTS AAC, 0x03/0x04 = MPEG audio) are
header enums like the ADTS rate table.

``ts_wrap`` builds the inverse for tests (PAT + PMT + packetized PES
with adaptation-field stuffing), so demux round-trips are
self-checking end to end without any foreign fixture: the H.264 ES
rides Annex-B and the AAC ES rides ADTS inside TS, both byte-exact
through wrap -> extract.

Scope: unencrypted single-program streams; scrambled packets, DVB
sections spanning multiple PAT/PMT packets, and non-AVC/AAC/MPEG
stream types raise or are skipped namefully."""

from __future__ import annotations

__all__ = ["ts_demux", "ts_extract_h264", "ts_extract_aac", "ts_wrap"]

_PKT = 188

#: ISO 13818-1 stream_type registry values we route (header enums)
_ST_H264 = 0x1B
_ST_AAC_ADTS = 0x0F
_ST_MPEG_AUDIO = (0x03, 0x04)


def _crc32_mpeg2(data: bytes) -> int:
    """MPEG-2 section CRC-32: poly 0x04C11DB7, init 0xFFFFFFFF, no
    reflection, no final XOR (formula-level; table built at runtime
    from the polynomial)."""
    table = _crc32_mpeg2._table
    if table is None:
        table = []
        for i in range(256):
            c = i << 24
            for _ in range(8):
                c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else (c << 1)
            table.append(c & 0xFFFFFFFF)
        _crc32_mpeg2._table = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) ^ b) & 0xFF]
    return crc


_crc32_mpeg2._table = None


def _packets(data: bytes):
    """Yield (pid, pusi, payload bytes) for each packet carrying a
    payload; adaptation-only and null packets are skipped."""
    n = len(data)
    if n % _PKT:
        # tolerate a truncated tail (common in crawled segments)
        n -= n % _PKT
    for pos in range(0, n, _PKT):
        if data[pos] != 0x47:
            raise ValueError(f"lost TS sync at offset {pos}")
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        pid = ((b1 & 0x1F) << 8) | b2
        if pid == 0x1FFF:
            continue  # null packet
        if b3 & 0xC0:
            raise NotImplementedError(
                "scrambled TS packet (transport_scrambling_control)"
            )
        afc = (b3 >> 4) & 3
        off = pos + 4
        if afc in (2, 3):
            af_len = data[off]
            off += 1 + af_len
        if afc in (1, 3) and off < pos + _PKT:
            yield pid, bool(b1 & 0x40), data[off: pos + _PKT]


def _section(payload: bytes, pusi: bool) -> bytes:
    """PSI section bytes from a PUSI packet payload (pointer_field
    skip); single-packet sections only (PAT/PMT of a one-program HLS
    segment always fit)."""
    if not pusi:
        raise ValueError("PSI section does not start in this packet")
    ptr = payload[0]
    return payload[1 + ptr:]


def _parse_pat(sec: bytes) -> dict[int, int]:
    """PAT section -> {program_number: pmt_pid}."""
    if sec[0] != 0x00:
        raise ValueError(f"PAT table_id {sec[0]:#x}")
    length = ((sec[1] & 0x0F) << 8) | sec[2]
    end = 3 + length - 4  # strip CRC
    if _crc32_mpeg2(sec[:3 + length]) != 0:
        raise ValueError("PAT CRC mismatch")
    progs = {}
    pos = 8
    while pos + 4 <= end:
        num = (sec[pos] << 8) | sec[pos + 1]
        pid = ((sec[pos + 2] & 0x1F) << 8) | sec[pos + 3]
        if num != 0:  # 0 = network PID
            progs[num] = pid
        pos += 4
    return progs


def _parse_pmt(sec: bytes) -> list[tuple[int, int]]:
    """PMT section -> [(stream_type, elementary_pid), ...]."""
    if sec[0] != 0x02:
        raise ValueError(f"PMT table_id {sec[0]:#x}")
    length = ((sec[1] & 0x0F) << 8) | sec[2]
    end = 3 + length - 4
    if _crc32_mpeg2(sec[:3 + length]) != 0:
        raise ValueError("PMT CRC mismatch")
    pi_len = ((sec[10] & 0x0F) << 8) | sec[11]
    pos = 12 + pi_len
    streams = []
    while pos + 5 <= end:
        st = sec[pos]
        pid = ((sec[pos + 1] & 0x1F) << 8) | sec[pos + 2]
        es_len = ((sec[pos + 3] & 0x0F) << 8) | sec[pos + 4]
        streams.append((st, pid))
        pos += 5 + es_len
    return streams


def _pes_to_es(pes: bytes) -> bytes:
    """One reassembled PES packet -> elementary-stream bytes (header
    per 13818-1 2.4.3.7: start code, stream_id, length, '10' flags,
    PES_header_data_length skip)."""
    if pes[:3] != b"\x00\x00\x01":
        raise ValueError("PES packet without start-code prefix")
    sid = pes[3]
    if not (0xC0 <= sid <= 0xEF or sid == 0xBD):
        # padding / program streams etc.: no ES payload for us
        return b""
    if (pes[6] & 0xC0) != 0x80:
        raise ValueError("PES optional-header marker bits missing")
    hdr_len = pes[8]
    return pes[9 + hdr_len:]


def ts_demux(data: bytes) -> dict[str, bytes]:
    """TS segment -> {"h264": Annex-B bytes, "aac": ADTS bytes,
    "mpeg_audio": MPEG-1/2 audio bytes} (keys present only when the
    PMT declares the stream and it carried data). PES packets are
    reassembled per PID in stream order."""
    if len(data) < _PKT or data[0] != 0x47:
        raise ValueError("not an MPEG transport stream (no 0x47 sync)")
    pmt_pids: set[int] = set()
    es_pid_kind: dict[int, str] = {}
    buffers: dict[int, list[bytes]] = {}
    open_pes: dict[int, bytearray] = {}

    for pid, pusi, payload in _packets(data):
        if pid == 0 and not pmt_pids:
            pmt_pids = set(_parse_pat(_section(payload, pusi)).values())
            continue
        if pid in pmt_pids and not es_pid_kind:
            for st, epid in _parse_pmt(_section(payload, pusi)):
                if st == _ST_H264:
                    es_pid_kind[epid] = "h264"
                elif st == _ST_AAC_ADTS:
                    es_pid_kind[epid] = "aac"
                elif st in _ST_MPEG_AUDIO:
                    es_pid_kind[epid] = "mpeg_audio"
            continue
        if pid in es_pid_kind:
            if pusi:
                if pid in open_pes:
                    buffers.setdefault(pid, []).append(
                        _pes_to_es(bytes(open_pes[pid])))
                open_pes[pid] = bytearray(payload)
            elif pid in open_pes:
                open_pes[pid] += payload
    for pid, buf in open_pes.items():
        buffers.setdefault(pid, []).append(_pes_to_es(bytes(buf)))

    out: dict[str, bytes] = {}
    for pid, kind in es_pid_kind.items():
        if pid in buffers:
            es = b"".join(buffers[pid])
            if es:
                out[kind] = es
    if not es_pid_kind:
        raise ValueError("no PMT with routable stream types found")
    return out


def ts_extract_h264(data: bytes) -> bytes:
    """TS segment -> the AVC track's Annex-B bytes."""
    out = ts_demux(data)
    if "h264" not in out:
        raise ValueError("no AVC (stream_type 0x1B) track in TS")
    return out["h264"]


def ts_extract_aac(data: bytes) -> bytes:
    """TS segment -> the ADTS AAC track's bytes."""
    out = ts_demux(data)
    if "aac" not in out:
        raise ValueError("no ADTS AAC (stream_type 0x0F) track in TS")
    return out["aac"]


# ------------------------------------------------------------ test mux

def _psi_packet(pid: int, sec: bytes, counter: int) -> bytes:
    pkt = bytearray([0x47, 0x40 | (pid >> 8), pid & 0xFF,
                     0x10 | (counter & 0xF), 0x00])  # pointer_field 0
    pkt += sec
    pkt += b"\xff" * (_PKT - len(pkt))
    return bytes(pkt)


def _make_section(table_id: int, body: bytes, tsi: int = 1) -> bytes:
    """table_id + length + ids/version + body + CRC (the generic PSI
    section framing shared by PAT and PMT)."""
    payload = (bytes([tsi >> 8, tsi & 0xFF, 0xC1, 0x00, 0x00])
               + body)
    length = len(payload) + 4  # + CRC
    sec = bytes([table_id, 0xB0 | (length >> 8), length & 0xFF]) + payload
    crc = _crc32_mpeg2(sec)
    return sec + crc.to_bytes(4, "big")


def _pes(stream_id: int, es: bytes) -> bytes:
    ln = len(es) + 3
    if ln > 0xFFFF:
        ln = 0  # unbounded; legal per 13818-1 for VIDEO streams only
    return (b"\x00\x00\x01" + bytes([stream_id])
            + bytes([ln >> 8, ln & 0xFF])
            + b"\x80\x00\x00"   # '10' marker, no flags, no header data
            + es)


#: max ES bytes in one bounded PES: 0xFFFF covers the 3 optional-header
#: bytes plus the payload
_PES_AUDIO_MAX = 0xFFFF - 3


def _pes_chunks(stream_id: int, es: bytes) -> list[bytes]:
    """ES bytes -> one or more PES packets. 13818-1 permits
    PES_packet_length = 0 (unbounded) only for video elementary
    streams; audio ES longer than a bounded PES can carry is split
    into multiple bounded packets (the demux side reassembles per PID
    in stream order, so extract(wrap(x)) stays byte-exact)."""
    if 0xE0 <= stream_id <= 0xEF:
        return [_pes(stream_id, es)]
    return [_pes(stream_id, es[o: o + _PES_AUDIO_MAX])
            for o in range(0, len(es), _PES_AUDIO_MAX)] or [
        _pes(stream_id, b"")]


def _packetize(pid: int, pes_list: list[bytes]) -> bytes:
    """TS-packetize one or more PES packets on a PID: each PES starts
    a fresh TS packet with payload_unit_start_indicator set; the
    continuity counter runs across the whole PID."""
    out = bytearray()
    counter = 0
    for pes in pes_list:
        pos = 0
        first = True
        while pos < len(pes):
            chunk = pes[pos: pos + 184]
            pos += len(chunk)
            hdr = bytearray([0x47, (0x40 if first else 0) | (pid >> 8),
                             pid & 0xFF, 0x10 | (counter & 0xF)])
            counter += 1
            first = False
            if len(chunk) < 184:
                # pad with an adaptation field of stuffing bytes
                stuff = 184 - len(chunk) - 1
                hdr[3] = (hdr[3] & 0x0F) | 0x30
                af = bytes([stuff]) + (
                    (b"\x00" + b"\xff" * (stuff - 1)) if stuff else b"")
                out += hdr + af + chunk
            else:
                out += hdr + chunk
    return bytes(out)


def ts_wrap(h264: bytes | None = None, aac: bytes | None = None) -> bytes:
    """Wrap Annex-B H.264 and/or ADTS AAC bytes (e.g. the engine
    encoders' output) as a single-program transport stream — the
    structural inverse of :func:`ts_demux` for self-checking round
    trips (extract(wrap(x)) == x byte-exactly)."""
    if h264 is None and aac is None:
        raise ValueError("nothing to wrap")
    pmt_pid, vid_pid, aud_pid = 0x1000, 0x0100, 0x0101
    pat = _make_section(0x00, bytes([0, 1, 0xE0 | (pmt_pid >> 8),
                                     pmt_pid & 0xFF]))
    streams = b""
    pcr_pid = vid_pid if h264 is not None else aud_pid
    if h264 is not None:
        streams += bytes([_ST_H264, 0xE0 | (vid_pid >> 8),
                          vid_pid & 0xFF, 0xF0, 0x00])
    if aac is not None:
        streams += bytes([_ST_AAC_ADTS, 0xE0 | (aud_pid >> 8),
                          aud_pid & 0xFF, 0xF0, 0x00])
    pmt = _make_section(0x02, bytes([0xE0 | (pcr_pid >> 8),
                                     pcr_pid & 0xFF, 0xF0, 0x00])
                        + streams)
    out = bytearray()
    out += _psi_packet(0, pat, 0)
    out += _psi_packet(pmt_pid, pmt, 0)
    if h264 is not None:
        out += _packetize(vid_pid, _pes_chunks(0xE0, h264))
    if aac is not None:
        out += _packetize(aud_pid, _pes_chunks(0xC0, aac))
    return bytes(out)
