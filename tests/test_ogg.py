"""Ogg container (operators/ogg.py): page CRC validation, lacing
(255-boundary + cross-page continuation), Ogg-FLAC mapping round
trips against the engine FLAC encoder, codec identification, and the
named Vorbis/Opus plug-point raises."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import ogg
from data_migration_etl_scripts_spark.operators.flac import (
    flac_decode,
    flac_encode,
)


def _tone(n=4000, rate=8000):
    return [[int(12000 * math.sin(2 * math.pi * 440 * t / rate))
             for t in range(n)]]


def test_wrap_extract_flac_identity_and_decode():
    native = flac_encode(_tone(), rate=8000)
    wrapped = ogg.ogg_wrap_flac(native)
    assert ogg.ogg_extract_flac(wrapped) == native
    rate, nch, bps, chans = flac_decode(ogg.ogg_extract_flac(wrapped))
    assert (rate, nch, bps) == (8000, 1, 16)
    assert ogg.ogg_stream_kinds(wrapped) == {0x5FAC: "flac"}


def test_lacing_boundaries():
    """Frame payloads at exact 255-lace boundaries (multiple-of-255
    packet needs the terminating 0 lace) and > 255-segment payloads
    (cross-page continuation) round-trip."""
    for n in (900, 5000, 60000):
        native = flac_encode(_tone(n), rate=8000)
        assert ogg.ogg_extract_flac(ogg.ogg_wrap_flac(native)) == native
    # synthetic: force an exact multiple-of-255 single packet
    pkt = bytes(range(256)) * 255
    pkt = pkt[: 255 * 17]
    laces = [255] * 17 + [0]
    page = ogg._page(0x06, 0, 7, 0, [pkt], laces)
    streams = ogg.ogg_packets(b"" + page)
    assert streams[7] == [pkt]


def test_crc_validated():
    native = flac_encode(_tone(), rate=8000)
    wrapped = bytearray(ogg.ogg_wrap_flac(native))
    wrapped[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(ogg.ogg_pages(bytes(wrapped)))


def test_vorbis_opus_plug_point():
    pkt = b"\x01vorbis" + b"\x00" * 22
    page = ogg._page(0x02, 0, 3, 0, [pkt], [len(pkt)])
    with pytest.raises(NotImplementedError, match="Vorbis|vorbis"):
        ogg.ogg_extract_flac(page)
    kinds = ogg.ogg_stream_kinds(page)
    assert kinds == {3: "vorbis"}


def test_truncated_tail_tolerated():
    native = flac_encode(_tone(), rate=8000)
    wrapped = ogg.ogg_wrap_flac(native)
    # appending half a page must not break the full pages before it
    assert ogg.ogg_extract_flac(wrapped + wrapped[:30]) == native


def test_multimodal_dispatch_ogg():
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    native = flac_encode(_tone(), rate=8000)
    wrapped = ogg.ogg_wrap_flac(native)
    assert mm.payload_format(wrapped) == "ogg"
    rate, mono = mm.audio_decode_rate(wrapped)
    assert rate == 8000 and len(mono) == 4000
    # and matches decoding the bare FLAC
    rate2, mono2 = mm.audio_decode_rate(native)
    assert mono == mono2


def test_unterminated_packets_dropped():
    """RFC 3533 loss handling (round-10 ADVICE fix): a packet left
    open when the next page lacks the continuation flag is discarded,
    as is a packet still open at end of stream."""
    serial = 7
    # page 0: one lace of 255 -> packet stays open
    p0 = ogg._page(0x02, 0, serial, 0, [b"A" * 255], [255])
    # page 1: NO continuation flag, one complete packet "B"
    p1 = ogg._page(0x00, 0, serial, 1, [b"B" * 10], [10])
    pkts = ogg.ogg_packets(p0 + p1)
    assert pkts == {serial: [b"B" * 10]}          # open "A" tail lost
    # open buffer at EOS: dropped, not emitted
    pkts = ogg.ogg_packets(p0)
    assert pkts.get(serial, []) == []


def test_midstream_join_skips_orphan_continuation():
    """Joining a stream on a continuation page: the orphan tail
    segments (through their terminating lace) are skipped, not glued
    onto the next packet."""
    serial = 9
    # continuation page carrying: orphan tail (20 bytes, terminating
    # lace) then a fresh complete packet "X"
    pg = ogg._page(0x01, 0, serial, 5, [b"Z" * 20, b"X" * 8], [20, 8])
    pkts = ogg.ogg_packets(pg)
    assert pkts == {serial: [b"X" * 8]}
    # orphan spanning two continuation pages: both skipped
    pg0 = ogg._page(0x01, 0, serial, 5, [b"Z" * 255], [255])
    pg1 = ogg._page(0x01, 0, serial, 6, [b"Z" * 9, b"Y" * 4], [9, 4])
    pkts = ogg.ogg_packets(pg0 + pg1)
    assert pkts == {serial: [b"Y" * 4]}
