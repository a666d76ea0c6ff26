"""Opus staged operating point (operators/opus.py, r12): TOC/frame
packing pins, the RFC 6716 range coder (hand trace + exhaustive
round trips), the CELT-silence decode path, Ogg-Opus end to end
through the multimodal dispatch, seam-loader validation, and the
named scope raises."""

from __future__ import annotations

import random

import pytest

from data_migration_etl_scripts_spark.operators import opus as op


# ------------------------------------------------------ TOC/packing


def test_config_table_durations():
    """Table 2 of RFC 6716: SILK quads of {10,20,40,60} ms, hybrid
    pairs of {10,20}, CELT quads of {2.5,5,10,20} at 48 kHz."""
    assert [op._config_samples(c) for c in (0, 1, 2, 3)] == \
        [480, 960, 1920, 2880]
    assert [op._config_samples(c) for c in (12, 13, 14, 15)] == \
        [480, 960, 480, 960]
    assert [op._config_samples(c) for c in (16, 17, 18, 19)] == \
        [120, 240, 480, 960]
    assert op._config_samples(31) == 960
    assert op._config_mode(0) == "silk"
    assert op._config_mode(14) == "hybrid"
    assert op._config_mode(16) == "celt"


def test_packet_codes_0_to_3():
    toc = 31 << 3
    p0 = op.parse_packet(bytes([toc]) + b"abc")
    assert p0["frames"] == [b"abc"] and not p0["stereo"]
    p1 = op.parse_packet(bytes([toc | 1]) + b"abcd")
    assert p1["frames"] == [b"ab", b"cd"]
    with pytest.raises(ValueError, match="R3"):
        op.parse_packet(bytes([toc | 1]) + b"abc")
    # code 2: explicit first length (one byte)
    p2 = op.parse_packet(bytes([toc | 2, 2]) + b"abcde")
    assert p2["frames"] == [b"ab", b"cde"]
    with pytest.raises(ValueError, match="R4"):
        op.parse_packet(bytes([toc | 2, 9]) + b"ab")
    # code 3 CBR, 3 frames
    p3 = op.parse_packet(bytes([toc | 3, 3]) + b"abcdef")
    assert p3["frames"] == [b"ab", b"cd", b"ef"]
    with pytest.raises(ValueError, match="R6"):
        op.parse_packet(bytes([toc | 3, 3]) + b"abcde")
    # code 3 VBR with padding: count byte 0x80|0x40|2, pad len 1
    pkt = bytes([toc | 3, 0xC2, 1, 1]) + b"a" + b"bc" + b"\x00"
    p3v = op.parse_packet(pkt)
    assert p3v["frames"] == [b"a", b"bc"]
    with pytest.raises(ValueError, match="R5"):
        op.parse_packet(bytes([toc | 3, 0x80]))


def test_two_byte_frame_length():
    """Lengths 252..1275 use the 252+4*second form: 300 = 252+4*12."""
    toc = 31 << 3
    body = bytes(300)
    pkt = bytes([toc | 2, 252, 12]) + body + b"tail"
    p = op.parse_packet(pkt)
    assert len(p["frames"][0]) == 300 and p["frames"][1] == b"tail"
    rt = op.build_packet(31, False, [bytes(300), b"x", b"y"])
    back = op.parse_packet(rt)
    assert back["frames"] == [bytes(300), b"x", b"y"]


def test_packet_duration_cap():
    toc = 3 << 3       # SILK 60 ms frames
    with pytest.raises(ValueError, match="120 ms"):
        op.parse_packet(bytes([toc | 3, 3]) + b"abcdef")


def test_build_packet_round_trips():
    rnd = random.Random(7)
    for _ in range(50):
        config = rnd.choice([16, 19, 23, 31])
        frames = [bytes(rnd.randrange(0, 40))
                  for _ in range(rnd.randrange(1, 5))]
        pkt = op.build_packet(config, rnd.random() < 0.5, frames)
        back = op.parse_packet(pkt)
        assert back["frames"] == frames
        assert back["config"] == config


# ------------------------------------------------------ range coder


def test_range_decoder_hand_trace():
    """§4.1 init + renormalization traced by hand on buffer
    [0xA5, 0x3C]: rem=0xA5, val = 127 - (0xA5>>1) = 45, rng = 128;
    three renorm steps (rng 128 -> 2^15 -> 2^23 -> 2^31) consume the
    second byte then zeros: step 1: sym = (0xA5<<8|0x3C)>>1 =
    0x52 9E, val = (45<<8 + (255 & ~0x9E)) = 11520+97 = 11617;
    step 2: sym = (0x3C<<8|0)>>1 = 0x1E00, low byte 0x00 ->
    val = 11617<<8 + 255; step 3: byte 0 again ->
    val = ((11617<<8+255)<<8 + 255)."""
    dec = op.RangeDecoder(bytes([0xA5, 0x3C]))
    v1 = 45 * 256 + (255 & ~0x9E)
    assert v1 == 11617
    v2 = v1 * 256 + 255
    v3 = (v2 * 256 + 255) & (op._TOP - 1)
    assert dec.rng == 1 << 31
    assert dec.val == v3
    assert dec.rem == 0         # past-end reads are zero (§4.1.2)


def test_range_coder_round_trips_and_icdf():
    """Exhaustive-ish scripts of bit_logp / uniform encode / icdf
    symbols round-trip bit-exactly through done()."""
    icdf_tab = [200, 120, 60, 20, 0]      # 5 symbols, ftb 8
    rnd = random.Random(42)
    for trial in range(60):
        script = []
        for _ in range(rnd.randrange(1, 80)):
            kind = rnd.choice(["bit", "enc", "icdf"])
            if kind == "bit":
                script.append(("bit", rnd.randrange(1, 16),
                               rnd.randrange(2)))
            elif kind == "enc":
                ft = rnd.randrange(2, 300)
                script.append(("enc", ft, rnd.randrange(ft)))
            else:
                script.append(("icdf", 8, rnd.randrange(5)))
        enc = op.RangeEncoder()
        for kind, a, v in script:
            if kind == "bit":
                enc.bit_logp(v, a)
            elif kind == "enc":
                enc.encode(v, v + 1, a)
            else:
                fl = 256 - icdf_tab[v - 1] if v > 0 else 0
                fh = 256 - icdf_tab[v]
                enc.encode(fl, fh, 256)
        data = enc.done()
        dec = op.RangeDecoder(data)
        for kind, a, v in script:
            if kind == "bit":
                assert dec.bit_logp(a) == v, (trial, script)
            elif kind == "enc":
                fs = dec.decode(a)
                assert fs == v, (trial, a, v, fs)
                dec.update(v, v + 1, a)
            else:
                assert dec.icdf(icdf_tab, a) == v, (trial, script)


def test_silence_flag_is_one_range_coded_bit():
    """The engine's silence payload decodes as silence=1 at logp 15,
    and the all-zero payload (reads past end) decodes as silence=0
    with overwhelming probability mass on the MPS."""
    enc = op.RangeEncoder()
    enc.bit_logp(1, 15)
    payload = enc.done()
    assert op.RangeDecoder(payload).bit_logp(15) == 1
    assert op.RangeDecoder(b"\x00").bit_logp(15) == 0


# --------------------------------------------------- frames / scope


def test_celt_silence_frame_decodes_to_zeros():
    enc = op.RangeEncoder()
    enc.bit_logp(1, 15)
    fr = enc.done()
    for config, n in ((16, 120), (19, 960), (31, 960)):
        out = op.decode_frame(fr, config, 2)
        assert len(out) == 2 and len(out[0]) == n
        assert not any(out[0]) and not any(out[1])


def test_scope_raises_are_named():
    with pytest.raises(NotImplementedError, match="silk"):
        op.decode_frame(b"\x00", 0, 1)
    with pytest.raises(NotImplementedError, match="hybrid"):
        op.decode_frame(b"\x00", 13, 1)
    # a non-silent CELT frame without the seam names the loader
    saved = dict(op.OPUS)
    op.OPUS["ebands"] = None
    op.OPUS["alloc"] = None
    try:
        with pytest.raises(NotImplementedError,
                           match="SPARK_GRAFT_OPUS_TABLES"):
            op.decode_frame(b"\x00", 31, 1)
        # with the seam injected the raise narrows to the staged
        # decode boundary
        op.load_opus_tables({
            "ebands": list(range(0, 44, 2)),
            "alloc": [[1] * 11 for _ in range(21)],
        })
        with pytest.raises(NotImplementedError, match="PVQ"):
            op.decode_frame(b"\x00", 31, 1)
    finally:
        op.OPUS.clear()
        op.OPUS.update(saved)


def test_seam_loader_validation():
    with pytest.raises(ValueError, match="ebands"):
        op.load_opus_tables({"ebands": [0, 1, 1]})
    with pytest.raises(ValueError, match="alloc"):
        op.load_opus_tables({"alloc": [[1] * 11] * 20})
    with pytest.raises(ValueError, match="alloc"):
        op.load_opus_tables({"alloc": [[-1] * 11] * 21})


# ------------------------------------------------------ Ogg mapping


def test_opus_head_parse_and_errors():
    import struct

    head = (b"OpusHead" + bytes([1, 2])
            + struct.pack("<HIh", 312, 44100, -128) + b"\x00")
    h = op.parse_opus_head(head)
    assert h == {"channels": 2, "pre_skip": 312,
                 "input_rate": 44100, "gain": -128, "family": 0}
    with pytest.raises(ValueError, match="OpusHead"):
        op.parse_opus_head(b"OpusHeadX")
    with pytest.raises(NotImplementedError, match="mapping family"):
        op.parse_opus_head(head[:18] + b"\x02")
    with pytest.raises(ValueError, match="1..2"):
        op.parse_opus_head(b"OpusHead" + bytes([1, 3])
                           + struct.pack("<HIh", 0, 48000, 0)
                           + b"\x00")


def test_ogg_opus_end_to_end_silence():
    """Engine Ogg-Opus streams decode to zeros at 48 kHz with the
    exact pre-skip trim, across frame sizes, packings and channel
    counts — all table-free."""
    for cfg, ch, fpp, skip, frames in ((31, 1, 1, 0, 3),
                                       (19, 2, 2, 100, 4),
                                       (16, 1, 3, 7, 6)):
        b = op.opus_encode_silence(frames=frames, config=cfg,
                                   channels=ch,
                                   frames_per_packet=fpp,
                                   pre_skip=skip)
        rate, nch, chans = op.opus_decode(b)
        assert (rate, nch) == (48000, ch)
        want = frames * op._config_samples(cfg) - skip
        assert all(len(c) == want for c in chans)
        assert not any(any(c) for c in chans)


def test_ogg_kind_detection_and_dispatch():
    from data_migration_etl_scripts_spark.operators.ogg import (
        ogg_stream_kinds,
    )
    from data_migration_etl_scripts_spark.operators import (
        multimodal as mm,
    )

    b = op.opus_encode_silence(frames=2, config=31)
    assert set(ogg_stream_kinds(bytes(b)).values()) == {"opus"}
    rate, mono = mm.audio_decode_rate(bytes(b))
    assert rate == 48000
    assert len(mono) == 2 * 960 and not any(mono)
