"""Vorbis I (operators/vorbis.py): canonical codeword assignment
(spec worked example + error cases), packed-float decode, full
header-triad/setup parsing over engine streams, the silence operating
point end to end through the Ogg layer, lapping sample accounting,
granule truncation, the named synthesis plug point, and the seam
loader."""

from __future__ import annotations

import pytest

from data_migration_etl_scripts_spark.operators import ogg
from data_migration_etl_scripts_spark.operators import vorbis as V


def test_codeword_assignment_spec_example():
    """The Vorbis I spec's section-3 worked example: lengths
    [2,4,4,4,4,2,3,3] produce exactly these codewords."""
    book = V._assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert book == {(2, 0b00): 0, (4, 0b0100): 1, (4, 0b0101): 2,
                    (4, 0b0110): 3, (4, 0b0111): 4, (2, 0b10): 5,
                    (3, 0b110): 6, (3, 0b111): 7}


def test_codeword_assignment_errors_and_edges():
    with pytest.raises(ValueError, match="overspecified"):
        V._assign_codewords([1, 1, 1])
    with pytest.raises(ValueError, match="underspecified"):
        V._assign_codewords([2, 2, 2])
    # single used entry: one 1-bit codeword regardless of length
    assert V._assign_codewords([0, 3, 0]) == {(3, 0): 1}
    assert V._assign_codewords([]) == {}
    # unused entries skip numbering
    book = V._assign_codewords([1, 0, 1])
    assert book == {(1, 0): 0, (1, 1): 2}


def test_packed_float():
    """Vorbis 32-bit float: 21-bit signed mantissa, 10-bit exponent
    biased at 788."""
    w = V._WL()
    w.u((790 << 21) | 3, 32)      # +3 * 2^2 = 12
    assert V._RL(w.tobytes()).f32() == 12.0
    w = V._WL()
    w.u((1 << 31) | (788 << 21) | 5, 32)   # -5 * 2^0
    assert V._RL(w.tobytes()).f32() == -5.0


def test_lookup1_values():
    assert V._lookup1_values(8, 3) == 2     # 2^3 = 8
    assert V._lookup1_values(9, 2) == 3
    assert V._lookup1_values(10, 2) == 3    # 4^2 > 10
    assert V._lookup1_values(1, 4) == 1


def test_silence_round_trip_mono():
    b = V.vorbis_encode_silence(frames=5, rate=8000, channels=1)
    rate, nch, pcm = V.vorbis_decode(b)
    assert (rate, nch) == (8000, 1)
    # 5 frames of blocksize 256: first primes, 4 return 128 each
    assert len(pcm[0]) == 4 * 128
    assert all(v == 0.0 for v in pcm[0])


def test_silence_round_trip_shapes():
    for ch, rate, be in ((2, 44100, 8), (1, 16000, 6), (2, 11025, 11)):
        b = V.vorbis_encode_silence(frames=3, rate=rate, channels=ch,
                                    blockexp=be)
        r2, c2, pcm = V.vorbis_decode(b)
        n = 1 << be
        assert (r2, c2) == (rate, ch)
        assert all(len(p) == 2 * (n // 2) for p in pcm)


def test_setup_parse_contents():
    """The engine silence stream's setup header parses into the full
    config: codebook with canonical codewords, floor1 geometry,
    residue, mapping, mode."""
    b = V.vorbis_encode_silence(frames=1, rate=8000, channels=2)
    pkts = ogg.ogg_packets(b)
    (serial, packets), = pkts.items()
    cfg = V.parse_vorbis_headers(packets)
    assert cfg["channels"] == 2 and cfg["rate"] == 8000
    assert cfg["bs0"] == cfg["bs1"] == 256
    (book,) = cfg["books"]
    assert book["dims"] == 1 and book["entries"] == 2
    assert book["codewords"] == {(1, 0): 0, (1, 1): 1}
    (floor,) = cfg["floors"]
    assert floor["type"] == 1 and floor["partitions"] == 1
    assert floor["xs"] == [0, 64, 32]
    (res,) = cfg["residues"]
    assert res["type"] == 0 and res["classifications"] == 1
    (mapping,) = cfg["mappings"]
    assert mapping["mux"] == [0, 0] and mapping["cfg"] == [(0, 0)]
    (mode,) = cfg["modes"]
    assert mode["blockflag"] == 0


def test_granule_truncation():
    """The final Ogg granule position trims the lapped tail (the
    standard way Vorbis encodes non-multiple-of-block lengths)."""
    b = bytearray(V.vorbis_encode_silence(frames=4, rate=8000))
    # rewrite the LAST page's granule to 300 (< the 3*128 = 384 full
    # count) and fix its CRC
    # find the last page's byte offset
    import struct
    pos = 0
    last_off = None
    data = bytes(b)
    while pos + 27 <= len(data):
        nsegs = data[pos + 26]
        body = sum(data[pos + 27: pos + 27 + nsegs])
        if pos + 27 + nsegs + body > len(data):
            break
        last_off = pos
        pos = pos + 27 + nsegs + body
    assert last_off is not None
    struct.pack_into("<q", b, last_off + 6, 300)
    page_end = pos
    chunk = bytearray(b[last_off:page_end])
    chunk[22:26] = b"\x00\x00\x00\x00"
    crc = ogg._page_crc(bytes(chunk))
    struct.pack_into("<I", b, last_off + 22, crc)
    rate, nch, pcm = V.vorbis_decode(bytes(b))
    assert len(pcm[0]) == 300


def test_missing_db_table_raises_namefully():
    """Nonzero floors decode (r10 second block), but rendering needs
    the inverse-dB seam: with the seam empty the decode raises at
    the documented table plug by env-var name."""
    saved = V.VORBIS["floor1_inverse_db"]
    V.load_vorbis_tables({"floor1_inverse_db":
                          [(i / 255.0) ** 2 for i in range(256)]})
    try:
        b, _exp = V.vorbis_encode_quantized(frames=2)
        V.VORBIS["floor1_inverse_db"] = None
        with pytest.raises(NotImplementedError,
                           match="SPARK_GRAFT_VORBIS_TABLES"):
            V.vorbis_decode(b)
    finally:
        V.VORBIS["floor1_inverse_db"] = saved


def _db_table():
    return [(i / 255.0) ** 2 for i in range(256)]


@pytest.fixture
def _db_seam():
    saved = V.VORBIS["floor1_inverse_db"]
    V.load_vorbis_tables({"floor1_inverse_db": _db_table()})
    yield
    V.VORBIS["floor1_inverse_db"] = saved


def test_quantized_round_trip_float_exact(_db_seam):
    """Flat floors + pseudorandom integer residues through real
    stream codebooks: decode equals the encoder's INDEPENDENT
    equal-size lap replay float-exactly (mono and stereo, both
    block sizes, different amplitudes) — pinning floor render,
    classword/partition order, VQ values, IMDCT and window against
    each other. The signal is genuinely nonzero."""
    for kw in ({"frames": 4, "channels": 1},
               {"frames": 3, "channels": 2, "blockexp": 7,
                "floor_y": 100},
               {"frames": 5, "channels": 1, "blockexp": 9,
                "floor_y": 220, "seed": 3}):
        b, exp = V.vorbis_encode_quantized(rate=8000, **kw)
        rate, ch, pcm = V.vorbis_decode(b)
        assert rate == 8000 and ch == kw["channels"]
        for c in range(ch):
            assert pcm[c] == exp[c], kw
        assert any(v != 0.0 for v in pcm[0])


def test_quantized_coupled_stereo_type2(_db_seam):
    """One square-polar coupling step + residue type 2 over the
    interleaved bundle: decode applies the inverse mapping in
    reverse step order and still matches the replay float-exactly."""
    b, exp = V.vorbis_encode_quantized(frames=3, channels=2,
                                       coupled=True, seed=99)
    rate, ch, pcm = V.vorbis_decode(b)
    assert ch == 2
    for c in range(2):
        assert pcm[c] == exp[c]
    # the two channels genuinely differ (coupling is not identity)
    assert pcm[0] != pcm[1]


def test_floor_amplitude_scales_output(_db_seam):
    """Same residues, higher floor index -> strictly larger RMS (the
    dB table is monotone in this fixture)."""
    b1, _ = V.vorbis_encode_quantized(frames=3, floor_y=80, seed=5)
    b2, _ = V.vorbis_encode_quantized(frames=3, floor_y=200, seed=5)
    _, _, p1 = V.vorbis_decode(b1)
    _, _, p2 = V.vorbis_decode(b2)
    e1 = sum(v * v for v in p1[0])
    e2 = sum(v * v for v in p2[0])
    assert e2 > e1 > 0


def test_header_validation_errors():
    b = V.vorbis_encode_silence(frames=1)
    (serial, packets), = ogg.ogg_packets(b).items()
    with pytest.raises(ValueError, match="3 header"):
        V.vorbis_decode_packets(packets[:2])
    ident = bytearray(packets[0])
    ident[7] = 9    # version != 0
    with pytest.raises(ValueError, match="version"):
        V.parse_vorbis_headers([bytes(ident)] + packets[1:])
    setup = bytearray(packets[2])
    setup[8] ^= 0xFF   # break the codebook sync
    with pytest.raises(ValueError, match="sync"):
        V.parse_vorbis_headers(packets[:2] + [bytes(setup)])


def test_seam_loader_validates():
    with pytest.raises(ValueError, match="256"):
        V.load_vorbis_tables({"floor1_inverse_db": [0.5] * 10})
    with pytest.raises(ValueError, match="0, 1"):
        V.load_vorbis_tables({"floor1_inverse_db": [2.0] * 256})
    saved = V.VORBIS["floor1_inverse_db"]
    try:
        assert V.load_vorbis_tables(
            {"floor1_inverse_db": [i / 255.0 for i in range(256)]}
        ) == 1
    finally:
        V.VORBIS["floor1_inverse_db"] = saved


def test_multimodal_dispatch_vorbis():
    """audio_decode_rate routes Ogg-Vorbis through the new decoder."""
    from data_migration_etl_scripts_spark.operators import (
        multimodal as mm,
    )

    b = V.vorbis_encode_silence(frames=4, rate=8000, channels=1)
    assert mm.payload_format(b) == "ogg"
    rate, mono = mm.audio_decode_rate(b)
    assert rate == 8000 and len(mono) == 3 * 128
    assert all(v == 0.0 for v in mono)


def test_residue_type0_interleave_and_seq_lookup():
    """Residue type 0 scatters each dims-length VQ vector with stride
    step = psize // dims (untouched by the engine encoder, which uses
    types 1/2) — pinned against a hand-computed expectation; and
    lookup vectors with seq_p accumulate left to right."""
    mults = [(i * 7 + 3) % 16 for i in range(64)]
    vq = {"dims": 4, "entries": 16, "lengths": [4] * 16,
          "codewords": V._assign_codewords([4] * 16),
          "lookup": 2, "min": -8.0, "delta": 1.0, "seq_p": 0,
          "mults": mults}
    classbook = {"dims": 1, "entries": 2, "lengths": [1, 1],
                 "codewords": V._assign_codewords([1, 1]),
                 "lookup": 0}
    books = [classbook, vq]
    res = {"type": 0, "begin": 0, "end": 32, "psize": 32,
           "classifications": 2, "classbook": 0,
           "cascades": [1, 1], "books": [[1] + [None] * 7,
                                         [1] + [None] * 7]}
    # one partition: classword 0 (1 bit), then step=8 codewords of
    # 4 bits each (uniform canonical: entry i <-> code i, MSB-first)
    w = V._WL()
    w.u(0, 1)
    entries = [3, 0, 15, 7, 9, 1, 12, 5]
    for e in entries:
        for bit in range(3, -1, -1):
            w.u((e >> bit) & 1, 1)
    r = V._RL(w.tobytes())
    (vec,) = V._residue_decode(r, res, books, [False], 32)
    step = 32 // 4
    for k, e in enumerate(entries):
        vals = [mults[e * 4 + d] * 1.0 + (-8.0) for d in range(4)]
        for d in range(4):
            assert vec[k + d * step] == vals[d], (k, d)
    # seq_p accumulation (lookup type 2)
    vq_seq = dict(vq, seq_p=1)
    vals = V._vq_values(vq_seq, 5)
    run = 0.0
    for d in range(4):
        run += mults[5 * 4 + d] - 8.0
        assert vals[d] == run
    # lookup type 1: component index via the integer root
    vq1 = {"dims": 2, "entries": 9, "lookup": 1, "min": 1.0,
           "delta": 2.0, "seq_p": 0, "mults": [5, 0, 7]}
    # lookup1_values(9, 2) = 3: entry 7 -> indices (7 % 3, 7 // 3 % 3)
    # = (1, 2) -> mults (0, 7)
    assert V._vq_values(vq1, 7) == [0 * 2.0 + 1.0, 7 * 2.0 + 1.0]


def test_mixed_blocksize_silence_lapping():
    """A hand-built two-mode stream (short 256 / long 1024) with
    all-silent floors: the absolute-position lap accounting must
    return exactly sum(prev/4 + cur/4) samples across the
    short->long->short transitions (the spec's window-switch
    arithmetic), all zeros."""
    w = V._WL()
    w.u(0, 32)
    w.u(1, 8)          # mono
    w.u(8000, 32)
    w.u(0, 32); w.u(0, 32); w.u(0, 32)
    w.u(8, 4)          # bs0 = 256
    w.u(10, 4)         # bs1 = 1024
    w.u(1, 1)
    ident = b"\x01vorbis" + w.tobytes()
    comment = (b"\x03vorbis" + (1).to_bytes(4, "little") + b"x"
               + (0).to_bytes(4, "little") + b"\x01")
    # setup: same single codebook/floor/residue/mapping as the engine
    # silence stream, but TWO modes (short, long)
    w = V._WL()
    w.u(0, 8)
    w.u(0x564342, 24)
    w.u(1, 16); w.u(2, 24); w.u(0, 1); w.u(0, 1)
    w.u(0, 5); w.u(0, 5); w.u(0, 4)
    w.u(0, 6); w.u(0, 16)              # time
    w.u(0, 6)                          # one floor
    w.u(1, 16); w.u(1, 5); w.u(0, 4)
    w.u(0, 3); w.u(0, 2); w.u(1, 8)    # class: dim 1, book 0
    w.u(0, 2); w.u(6, 4); w.u(32, 6)
    w.u(0, 6)                          # one residue
    w.u(0, 16); w.u(0, 24); w.u(0, 24); w.u(0, 24)
    w.u(0, 6); w.u(0, 8)
    w.u(0, 3); w.u(0, 1)
    w.u(0, 6)                          # one mapping
    w.u(0, 16); w.u(0, 1); w.u(0, 1); w.u(0, 2)
    w.u(0, 8); w.u(0, 8); w.u(0, 8)
    w.u(1, 6)                          # TWO modes
    w.u(0, 1); w.u(0, 16); w.u(0, 16); w.u(0, 8)   # mode 0: short
    w.u(1, 1); w.u(0, 16); w.u(0, 16); w.u(0, 8)   # mode 1: long
    w.u(1, 1)
    setup = b"\x05vorbis" + w.tobytes()

    def audio(mode):
        aw = V._WL()
        aw.u(0, 1)
        aw.u(mode, 1)          # mode number (1 bit: two modes)
        if mode:
            aw.u(0, 1)         # prev window flag (short neighbor)
            aw.u(0, 1)         # next window flag
        aw.u(0, 1)             # floor nonzero = 0
        return aw.tobytes()

    seq = [0, 1, 1, 0, 0]      # short, long, long, short, short
    sizes = [256, 1024, 1024, 256, 256]
    pkts = [ident, comment, setup] + [audio(m) for m in seq]
    rate, ch, pcm = V.vorbis_decode_packets(pkts)
    want = sum(sizes[i - 1] // 4 + sizes[i] // 4
               for i in range(1, len(sizes)))
    assert rate == 8000 and ch == 1
    # (64+256) + (256+256) + (256+64) + (64+64) = 1280
    assert len(pcm[0]) == want == 1280
    assert all(v == 0.0 for v in pcm[0])


def test_floor0_curve_hand_math():
    """Order-1 LSP curve pinned against a from-scratch evaluation of
    the spec formulas: bark map, odd-order p = 1 - cos^2(w) and
    q = (cos(c0) - cos(w))^2, and the amplitude-normalized
    exponential."""
    import math

    floor = {"type": 0, "order": 1, "rate": 8000,
             "bark_map_size": 4, "amplitude_bits": 6,
             "amplitude_offset": 10, "books": [0], "_maps": {}}
    amp, c0 = 40, 2.0
    got = V._floor0_curve(floor, (amp, [c0]), 8)

    def bark(x):
        return (13.1 * math.atan(0.00074 * x)
                + 2.24 * math.atan(1.85e-8 * x * x) + 1e-4 * x)

    scale = 4 / bark(4000.0)
    for i in range(8):
        m = min(3, int(bark(4000.0 * i / 8) * scale))
        cw = math.cos(math.pi * m / 4)
        p = 1.0 - cw * cw
        q = (math.cos(c0) - cw) ** 2
        want = math.exp(min(709.0, 0.11512925
                            * (amp * 10 / (63 * math.sqrt(p + q))
                               - 10)))
        assert got[i] == want, i


def test_floor0_round_trips_table_free():
    """The floor0 quantized operating point decodes float-exactly
    against the encoder's independent-lap expectation with the seam
    EMPTY — floor0, unlike floor1, consults no tabulated constant."""
    saved = V.VORBIS["floor1_inverse_db"]
    V.VORBIS["floor1_inverse_db"] = None
    V._env_load_done = True
    try:
        for ch, coupled in ((1, False), (2, False), (2, True)):
            b, expected = V.vorbis_encode_quantized(
                frames=4, channels=ch, coupled=coupled, floor0=True)
            rate, nch, outs = V.vorbis_decode(b)
            assert nch == ch
            for c in range(ch):
                assert outs[c] == expected[c], (ch, coupled, c)
    finally:
        V.VORBIS["floor1_inverse_db"] = saved


def test_floor0_zero_amplitude_means_unused_channel():
    """A zero amplitude marks the channel unused for the frame
    (6.2.2) — _floor0_read returns None without touching the
    coefficient books."""
    floor = {"type": 0, "order": 4, "rate": 8000,
             "bark_map_size": 64, "amplitude_bits": 6,
             "amplitude_offset": 10, "books": [0], "_maps": {}}

    class _Bits:
        def __init__(self, vals):
            self.vals = list(vals)

        def u(self, n):
            return self.vals.pop(0)

    assert V._floor0_read(_Bits([0]), floor, []) is None


def test_floor0_config_validation():
    """floor0 setup cross-validation: out-of-range coefficient books
    and books without a value mapping are rejected at parse time."""
    w = V._WL()
    w.u(0, 16)      # floor type 0
    w.u(4, 8)       # order
    w.u(8000, 16)
    w.u(64, 16)
    w.u(6, 6)
    w.u(10, 8)
    w.u(0, 4)       # one book
    w.u(9, 8)       # book index out of range
    with pytest.raises(ValueError, match="out of range"):
        V._parse_floor(V._RL(w.tobytes()), 1, [{"lookup": 1}])
    w2 = V._WL()
    w2.u(0, 16)
    w2.u(4, 8)
    w2.u(8000, 16)
    w2.u(64, 16)
    w2.u(6, 6)
    w2.u(10, 8)
    w2.u(0, 4)
    w2.u(0, 8)      # book 0, but it has no value mapping
    with pytest.raises(ValueError, match="value mapping"):
        V._parse_floor(V._RL(w2.tobytes()), 1, [{"lookup": 0}])
