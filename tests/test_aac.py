"""AAC-LC codec (operators/aac.py): ADTS walk, seam-empty silence
round trip (the container self-check operating point), quantized
encode->decode float-exactness + source-error bound through synthetic
injected codebooks, MDCT/IMDCT perfect reconstruction, KBD window
Princen-Bradley identity, TNS formula checks, M/S + intensity-stereo
linearity identities, PNS determinism, and the named seam/scope
errors."""

from __future__ import annotations

import math
import random

import pytest

from data_migration_etl_scripts_spark.operators import aac as a


@pytest.fixture(autouse=True)
def _isolated_tables():
    saved = {k: dict(v) for k, v in a.TABLES.items()}
    yield
    for k in a.TABLES:
        a.TABLES[k].clear()
        a.TABLES[k].update(saved[k])


def _synthetic_tables():
    """Fixed-length synthetic codebooks (prefix-free by construction)
    plus even synthetic band grids — any valid tables round-trip; the
    real Annex-B books matter only for foreign streams."""
    sf = [[7, i, i] for i in range(121)]
    spec11 = [[9, x * 17 + y, x, y]
              for x in range(17) for y in range(17)]
    spec5 = [[7, (x + 4) * 9 + (y + 4), x, y]
             for x in range(-4, 5) for y in range(-4, 5)]
    spec1 = []
    for code in range(81):
        v = code
        vals = []
        for _ in range(4):
            vals.append(v % 3 - 1)
            v //= 3
        spec1.append([7, code] + vals)
    swb_long = [0, 4, 8, 12, 16, 20, 28, 36, 44, 52, 64, 76, 92, 108,
                128, 156, 190, 232, 280, 344, 420, 512, 620, 744, 1024]
    swb_short = [0, 4, 8, 12, 20, 28, 44, 68, 128]
    return {
        "sf": sf,
        "spectral": {"11": spec11, "5": spec5, "1": spec1},
        "swb_long": {"4": swb_long},
        "swb_short": {"4": swb_short},
    }


# ------------------------------------------------------------- windows

def test_sine_and_kbd_windows_princen_bradley():
    for shape in (0, 1):
        for n_half in (128, 1024):
            w = a._win_half(n_half, shape, False)
            assert all(0.0 < v <= 1.0 for v in w)
            assert all(w[i] <= w[i + 1] + 1e-12
                       for i in range(n_half - 1))
            for i in range(n_half):
                pb = w[i] ** 2 + w[n_half - 1 - i] ** 2
                assert abs(pb - 1.0) < 1e-9, (shape, n_half, i, pb)
            r = a._win_half(n_half, shape, True)
            assert r == w[::-1]


def test_mdct_imdct_perfect_reconstruction():
    """Forward _mdct_mat -> _imdct_mat -> sine-window overlap-add is
    the identity (pins both normalizations)."""
    import numpy as np

    rnd = random.Random(7)
    n = 4096
    x = np.array([rnd.uniform(-1, 1) for _ in range(n)])
    xp = np.concatenate([np.zeros(1024), x, np.zeros(2048)])
    win = np.array(a._win_half(1024, 0, False)
                   + a._win_half(1024, 0, True))
    fmat = a._mdct_mat(2048)
    synth = a._Synth()
    ics = {"seq": 0, "shape": 0, "short": False}
    out = []
    for f in range((len(xp) - 1024) // 1024):
        spec = fmat @ (xp[1024 * f: 1024 * f + 2048] * win)
        out += synth.add([spec.tolist()], ics)
    got = np.array(out[1024: 1024 + n])
    assert np.max(np.abs(got - x)) < 1e-9


# ---------------------------------------------------------------- ADTS

def test_adts_errors():
    with pytest.raises(ValueError, match="sync"):
        list(a.adts_frames(b"\x00\x00\x00\x00\x00\x00\x00"))
    # MPEG-1 Layer III sync (layer bits != 00) is NOT ADTS
    with pytest.raises(ValueError):
        list(a.adts_frames(bytes([0xFF, 0xFB, 0x90, 0, 0, 0, 0])))
    b = bytearray(a.aac_encode_silence(frames=1))
    b[2] = (0 << 6) | (b[2] & 0x3F)  # profile 0 = MAIN
    with pytest.raises(NotImplementedError, match="AAC-LC"):
        list(a.adts_frames(bytes(b)))


def test_silence_roundtrip_seam_empty_mono_and_stereo():
    """max_sfb = 0 frames consult zero tables on either side: the
    whole ADTS/element/ICS/filterbank path round-trips with the seam
    EMPTY (the I_PCM / layer3-table-0 role)."""
    for k in a.TABLES:
        a.TABLES[k].clear()
    for ch in (1, 2):
        data = a.aac_encode_silence(frames=5, rate_idx=4, channels=ch)
        rate, nch, chans = a.aac_decode(data)
        assert rate == 44100 and nch == ch
        assert len(chans) == ch and len(chans[0]) == 5 * 1024
        assert all(v == 0.0 for c in chans for v in c)


# ----------------------------------------------------------- quantized

def test_quantized_roundtrip_float_exact_and_source_bound():
    """encode -> decode is FLOAT-EXACT against the encoder's replayed
    recon, and the recon tracks the source within a quantization
    bound (the one-sided-scaling tripwire: a dequant or scalefactor
    formula bug breaks this even though the round trip stays
    consistent)."""
    a.load_aac_tables(_synthetic_tables())
    n = 3000
    pcm = [0.5 * math.sin(2 * math.pi * 440 * t / 44100)
           + 0.2 * math.sin(2 * math.pi * 1320 * t / 44100)
           for t in range(n)]
    data, recon = a.aac_encode_quantized(pcm, rate_idx=4,
                                         global_gain=130)
    rate, nch, chans = a.aac_decode(data)
    assert (rate, nch) == (44100, 1)
    assert chans[0] == recon  # bit-exact float replay
    err = sum(abs(recon[1024 + i] - pcm[i]) for i in range(n)) / n
    assert err < 0.001, err


def test_quantized_escape_magnitudes_roundtrip():
    """Loud input forces escape-sequence magnitudes (|q| >= 16)
    through book 11's formula-level escape path both directions."""
    a.load_aac_tables(_synthetic_tables())
    pcm = [0.9 * math.sin(2 * math.pi * 220 * t / 44100)
           for t in range(2048)]
    data, recon = a.aac_encode_quantized(pcm, rate_idx=4,
                                         global_gain=135)
    rate, nch, chans = a.aac_decode(data)
    assert chans[0] == recon
    err = sum(abs(recon[1024 + i] - pcm[i])
              for i in range(2048)) / 2048
    assert err < 0.005, err


def test_quantized_seam_raises_namefully():
    a.load_aac_tables(_synthetic_tables())
    data, _ = a.aac_encode_quantized([0.1] * 1024)
    for k in a.TABLES:
        a.TABLES[k].clear()
    with pytest.raises(NotImplementedError, match="load_aac_tables"):
        a.aac_decode(data)


def test_loader_validates():
    with pytest.raises(ValueError, match="sf"):
        a.load_aac_tables({"sf": [[7, 0, 121]]})
    with pytest.raises(ValueError, match="prefix-free"):
        a.load_aac_tables({"sf": [[2, 1, 0], [3, 2, 1]]})
    with pytest.raises(ValueError, match="unsigned"):
        a.load_aac_tables({"spectral": {"11": [[9, 0, -1, 0]]}})
    with pytest.raises(ValueError, match="offsets"):
        a.load_aac_tables({"swb_long": {"4": [0, 8, 4, 1024]}})
    with pytest.raises(ValueError, match="rate index"):
        a.load_aac_tables({"swb_long": {"13": [0, 1024]}})


# ----------------------------------------------------------------- TNS

def test_tns_lpc_formula_and_filter_inverse():
    """sin() inverse quantizer + order recursion, and the all-pole
    synthesis being the exact inverse of the FIR analysis filter."""
    lpc = a._tns_lpc(1, 1, 0, [3])
    iqfac = ((1 << 3) - 0.5) / (math.pi / 2)
    assert abs(lpc[0] - math.sin(3 / iqfac)) < 1e-12
    # negative coef: sign-extend 4-bit 13 -> -3, uses iqfac_m
    lpc_m = a._tns_lpc(1, 1, 0, [13])
    iqm = ((1 << 3) + 0.5) / (math.pi / 2)
    assert abs(lpc_m[0] - math.sin(-3 / iqm)) < 1e-12

    rnd = random.Random(5)
    lpc = a._tns_lpc(3, 1, 0, [3, 14, 6])
    for direction in (0, 1):
        x = [rnd.uniform(-10, 10) for _ in range(40)]
        y = list(x)
        # FIR analysis in the filter's own scan order
        idx = (list(range(29, 9, -1)) if direction
               else list(range(10, 30)))
        for i_pos in range(len(idx) - 1, -1, -1):
            i = idx[i_pos]
            acc = x[i]
            for j, c in enumerate(lpc, 1):
                if i_pos - j >= 0:
                    acc += c * x[idx[i_pos - j]]
            y[i] = acc
        a._tns_apply(y, 10, 30, lpc, direction)
        assert all(abs(y[i] - x[i]) < 1e-9 for i in range(40))


# ---------------------------------------------------------------- CPE

def _cpe_stream(ms_present: int, left_pairs, right_pairs,
                right_cb: int = 5, is_pos_idx: int | None = None):
    """Hand-rolled single-CPE ADTS frame: common_window, ONLY_LONG,
    max_sfb = 1 over the synthetic grid (band 0 = 4 bins = 2 pairs of
    book 5), global_gain 60."""
    w = a._W()
    w.u(1, 3)      # CPE
    w.u(0, 4)
    w.u(1, 1)      # common_window
    w.u(0, 1)      # ics_reserved
    w.u(0, 2)      # ONLY_LONG
    w.u(0, 1)      # sine
    w.u(1, 6)      # max_sfb = 1
    w.u(0, 1)      # predictor
    w.u(ms_present, 2)
    if ms_present == 1:
        w.u(1, 1)  # ms_used[0][0]
    for ch, pairs in ((0, left_pairs), (1, right_pairs)):
        w.u(60, 8)     # global_gain
        cb = 5 if ch == 0 else right_cb
        w.u(cb, 4)     # one section
        w.u(1, 5)      # sect_len 1
        if ch == 1 and right_cb in (14, 15):
            w.u(60 + is_pos_idx, 7)  # dpcm is_position (sf book)
        else:
            w.u(60, 7)  # delta-0 scalefactor (synthetic sf book)
        w.u(0, 1)      # pulse
        w.u(0, 1)      # tns
        w.u(0, 1)      # gain control
        if not (ch == 1 and right_cb in (14, 15)):
            for x, y in pairs:   # book 5: code = (x+4)*9 + (y+4)
                w.u((x + 4) * 9 + (y + 4), 7)
    w.u(7, 3)
    w.byte_align_zero()
    payload = w.tobytes()
    hdr = a._W()
    a._adts_header(hdr, 4, 2, 7 + len(payload))
    return hdr.tobytes() + payload


def test_cpe_ms_linearity():
    """decode(M/S stream with spectra (m, s)) equals the sum/diff of
    the plain stream's channels — M/S applies post-dequant and the
    filterbank is linear."""
    a.load_aac_tables(_synthetic_tables())
    m = [(2, -1), (3, 1)]
    s = [(1, 1), (-2, 0)]
    for msp in (1, 2):
        rate, nch, (l_ms, r_ms) = a.aac_decode(
            _cpe_stream(msp, m, s))
        rate, nch, (l0, r0) = a.aac_decode(_cpe_stream(0, m, s))
        assert nch == 2
        for i in range(1024):
            assert abs(l_ms[i] - (l0[i] + r0[i])) < 1e-12
            assert abs(r_ms[i] - (l0[i] - r0[i])) < 1e-12


def test_cpe_intensity_stereo():
    """Right-channel intensity band reconstructs as the left scaled
    by +/- 2^(-is_position/4); cb 14 flips the sign."""
    a.load_aac_tables(_synthetic_tables())
    m = [(2, -1), (3, 1)]
    for cb, sign in ((15, 1.0), (14, -1.0)):
        rate, nch, (l, r) = a.aac_decode(
            _cpe_stream(0, m, [], right_cb=cb, is_pos_idx=2))
        scale = sign * 2.0 ** (-0.25 * 2)
        for i in range(1024):
            assert abs(r[i] - scale * l[i]) < 1e-12


def test_pns_deterministic_and_scaled():
    """A NOISE_HCB band decodes deterministically (engine LCG) and
    scales with the coded noise energy."""
    a.load_aac_tables(_synthetic_tables())

    def noise_stream(first_noise: int):
        w = a._W()
        w.u(0, 3)      # SCE
        w.u(0, 4)
        w.u(60, 8)     # global_gain
        w.u(0, 1)
        w.u(0, 2)
        w.u(0, 1)
        w.u(1, 6)      # max_sfb = 1
        w.u(0, 1)
        w.u(13, 4)     # NOISE_HCB section
        w.u(1, 5)
        w.u(first_noise, 9)   # first noise energy (9-bit)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.u(7, 3)
        w.byte_align_zero()
        payload = w.tobytes()
        hdr = a._W()
        a._adts_header(hdr, 4, 1, 7 + len(payload))
        return hdr.tobytes() + payload

    _, _, (c1,) = a.aac_decode(noise_stream(300))
    _, _, (c2,) = a.aac_decode(noise_stream(300))
    assert c1 == c2 and any(v != 0.0 for v in c1)
    _, _, (c3,) = a.aac_decode(noise_stream(308))  # +8 -> 4x energy
    e1 = sum(v * v for v in c1)
    e3 = sum(v * v for v in c3)
    assert abs(e3 / e1 - 16.0) < 1e-6


def test_unknown_container_elements():
    """CCE/PCE raise namefully; DSE and FIL are skipped."""
    a.load_aac_tables(_synthetic_tables())

    def with_prefix(ele_bits):
        w = a._W()
        for v, n in ele_bits:
            w.u(v, n)
        a._silent_sce(w)
        payload = w.tobytes()
        hdr = a._W()
        a._adts_header(hdr, 4, 1, 7 + len(payload))
        return hdr.tobytes() + payload

    # DSE: tag 0, no align, 2 bytes payload
    data = with_prefix([(4, 3), (0, 4), (0, 1), (2, 8), (0xAB, 8),
                        (0xCD, 8)])
    rate, nch, chans = a.aac_decode(data)
    assert all(v == 0.0 for v in chans[0])
    # FIL: count 3 -> 3 bytes payload
    data = with_prefix([(6, 3), (3, 4), (0, 8), (0, 8), (0, 8)])
    rate, nch, chans = a.aac_decode(data)
    assert len(chans[0]) == 1024
    with pytest.raises(NotImplementedError, match="CCE|PCE|program"):
        a.aac_decode(with_prefix([(5, 3)]))


# ------------------------------------------------------------ MP4 twin

def test_mp4_wrap_extract_aac_identity():
    """extract(wrap(x)) == x byte-exactly for engine ADTS streams, in
    both the classic-stbl and fragmented layouts, and the extracted
    stream still decodes float-exact."""
    from data_migration_etl_scripts_spark.operators import mp4

    a.load_aac_tables(_synthetic_tables())
    pcm = [0.4 * math.sin(2 * math.pi * 500 * t / 44100)
           for t in range(2500)]
    adts, recon = a.aac_encode_quantized(pcm, rate_idx=4,
                                         global_gain=130)
    for frag in (False, True):
        wrapped = mp4.mp4_wrap_aac(adts, fragmented=frag)
        back = mp4.mp4_extract_aac(wrapped)
        assert back == adts, f"fragmented={frag}"
        rate, nch, chans = a.aac_decode(back)
        assert chans[0] == recon


def test_mp4_wrap_extract_aac_silence_stereo():
    from data_migration_etl_scripts_spark.operators import mp4

    adts = a.aac_encode_silence(frames=3, rate_idx=7, channels=2)
    back = mp4.mp4_extract_aac(mp4.mp4_wrap_aac(adts))
    assert back == adts
    rate, nch, chans = a.aac_decode(back)
    assert (rate, nch) == (22050, 2)


def test_mp4_extract_aac_no_audio_track_raises():
    from data_migration_etl_scripts_spark.operators import h264, mp4

    ys = [[100] * 32 for _ in range(32)]
    cbs = [[128] * 16 for _ in range(16)]
    video = mp4.mp4_wrap_h264(
        h264.encode_ipcm_yuv(ys, cbs, cbs), 32, 32)
    with pytest.raises(ValueError, match="no AAC audio track"):
        mp4.mp4_extract_aac(video)
    # and the video extractor keeps working on audio-only files
    audio = mp4.mp4_wrap_aac(a.aac_encode_silence(frames=1))
    with pytest.raises(ValueError, match="no AVC video track"):
        mp4.mp4_extract_h264(audio)


def test_multimodal_dispatch_aac():
    """audio_decode_rate routes ADTS (layer-00 sync) and audio-only
    MP4s to the AAC decoder; payload_format labels them; the feature
    kernel survives an audio-only ISO-BMFF payload."""
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    adts = a.aac_encode_silence(frames=2, rate_idx=8, channels=1)
    rate, mono = mm.audio_decode_rate(adts)
    assert rate == 16000 and len(mono) == 2048
    assert mm.payload_format(adts) == "aac"

    from data_migration_etl_scripts_spark.operators.mp4 import mp4_wrap_aac

    wrapped = mp4_wrap_aac(adts)
    rate, mono = mm.audio_decode_rate(wrapped)
    assert rate == 16000 and all(v == 0.0 for v in mono)
    assert mm.payload_format(wrapped) == "mp4"
    feats = mm._real_features(wrapped, 6)
    assert feats[0] == pytest.approx(2048 / 16000)
    assert all(v == 0.0 for v in feats[2:])


def test_id3_tags_stripped_before_dispatch():
    """Crawled MP3/AAC files carry ID3v2 headers and/or ID3v1
    trailers — audio_decode_rate strips both (synchsafe-size walk)
    before codec-sync dispatch."""
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    adts = a.aac_encode_silence(frames=2, rate_idx=8, channels=1)
    frame_payload = b"\x03TIT2\x00\x00\x00\x05\x00\x00\x00song"
    size = len(frame_payload)
    id3v2 = (b"ID3\x04\x00\x00"
             + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
             + frame_payload)
    id3v1 = b"TAG" + b"\x00" * 125
    tagged = id3v2 + id3v2 + adts + id3v1  # stacked v2 tags happen
    rate, mono = mm.audio_decode_rate(tagged)
    assert rate == 16000 and len(mono) == 2048
    # a WAV with no tags is untouched
    raw = mm.wav_encode([0.0] * 80)
    assert mm._strip_id3(raw) == raw


def test_quantized_short_windows_roundtrip():
    """The EIGHT_SHORT operating point (LONG_START -> SHORT... ->
    LONG_STOP): decode is float-exact against the encoder's replay,
    the window-sequence overlap identities hold (source-error bound
    across the long/short transitions), and the stream really carries
    all three sequences."""
    a.load_aac_tables(_synthetic_tables())
    n = 4000
    pcm = [0.5 * math.sin(2 * math.pi * 660 * t / 44100)
           for t in range(n)]
    data, recon = a.aac_encode_quantized(pcm, rate_idx=4,
                                         global_gain=124, short=True)
    rate, nch, chans = a.aac_decode(data)
    assert chans[0] == recon
    err = sum(abs(recon[1024 + i] - pcm[i]) for i in range(n)) / n
    assert err < 0.002, err
    seqs = []
    for hdr, r, _end in a.adts_frames(data):
        r.u(3 + 4 + 8 + 1)  # SCE + tag + global_gain + reserved
        seqs.append(r.u(2))
    assert seqs[0] == 1 and seqs[-1] == 3 and 2 in seqs


def test_cpe_independent_windows():
    """common_window = 0: each channel parses its own ics_info (the
    per-channel path) — both channels reconstruct independently."""
    a.load_aac_tables(_synthetic_tables())
    w = a._W()
    w.u(1, 3)      # CPE
    w.u(0, 4)
    w.u(0, 1)      # common_window = 0
    for pairs in ([(2, -1), (3, 1)], [(1, 1), (-2, 0)]):
        w.u(60, 8)     # global_gain
        w.u(0, 1)      # ics_reserved
        w.u(0, 2)      # ONLY_LONG
        w.u(0, 1)      # sine
        w.u(1, 6)      # max_sfb = 1
        w.u(0, 1)      # predictor
        w.u(5, 4)      # section: book 5
        w.u(1, 5)
        w.u(60, 7)     # delta-0 scalefactor
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        for x, y in pairs:
            w.u((x + 4) * 9 + (y + 4), 7)
    w.u(7, 3)
    w.byte_align_zero()
    payload = w.tobytes()
    hdr = a._W()
    a._adts_header(hdr, 4, 2, 7 + len(payload))
    rate, nch, (l, r) = a.aac_decode(hdr.tobytes() + payload)
    assert nch == 2 and any(v != 0.0 for v in l) and l != r


def test_adts_crc_present_skipped():
    """protection_absent = 0: the 16-bit CRC after the header is
    skipped and the frame still decodes (foreign broadcast streams
    carry it)."""
    plain = a.aac_encode_silence(frames=1, rate_idx=8)
    hdr, _r, _e = next(a.adts_frames(plain))
    body = plain[7: hdr["frame_len"]]
    w = a._W()
    w.u(0xFFF, 12)
    w.u(0, 1)
    w.u(0, 2)
    w.u(0, 1)      # protection_absent = 0 -> CRC follows
    w.u(1, 2)
    w.u(8, 4)
    w.u(0, 1)
    w.u(1, 3)
    w.u(0, 4)
    w.u(9 + len(body), 13)
    w.u(0x7FF, 11)
    w.u(0, 2)
    w.u(0xBEEF, 16)  # CRC bytes (value not validated — skipped)
    rate, nch, chans = a.aac_decode(w.tobytes() + body)
    assert rate == 16000 and len(chans[0]) == 1024


def test_lfe_and_extra_program_elements():
    """LFE parses as its SCE-shaped self; a second audio element in
    the same frame is parsed for bit sync but the FIRST program wins
    (multi-program broadcast streams decode their primary)."""
    # LFE-only frame: silent SCE body with the element id rewritten
    w = a._W()
    w.u(3, 3)    # LFE
    w.u(0, 4)
    w.u(0, 8)
    w.u(0, 1)
    w.u(0, 2)
    w.u(0, 1)
    w.u(0, 6)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(7, 3)
    w.byte_align_zero()
    payload = w.tobytes()
    hdr = a._W()
    a._adts_header(hdr, 8, 1, 7 + len(payload))
    rate, nch, chans = a.aac_decode(hdr.tobytes() + payload)
    assert (rate, nch, len(chans[0])) == (16000, 1, 1024)
    # SCE + LFE in one frame: the SCE is the program, LFE skipped
    w2 = a._W()
    for ele_id in (0, 3):
        w2.u(ele_id, 3)
        w2.u(0, 4)
        w2.u(0, 8)
        w2.u(0, 1)
        w2.u(0, 2)
        w2.u(0, 1)
        w2.u(0, 6)
        w2.u(0, 1)
        w2.u(0, 1)
        w2.u(0, 1)
        w2.u(0, 1)
    w2.u(7, 3)
    w2.byte_align_zero()
    payload = w2.tobytes()
    hdr = a._W()
    a._adts_header(hdr, 8, 1, 7 + len(payload))
    rate, nch, chans = a.aac_decode(hdr.tobytes() + payload)
    assert (nch, len(chans[0])) == (1, 1024)


def test_quantized_roundtrip_property():
    """Property: ANY bounded random PCM at ANY sane global gain
    round-trips float-exact against the encoder replay, in both long
    and short-window modes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.data_too_large])
    @given(st.data())
    def run(data):
        a.load_aac_tables(_synthetic_tables())
        rnd = data.draw(st.randoms(use_true_random=False))
        n = data.draw(st.integers(500, 2000))
        gg = data.draw(st.integers(118, 140))
        short = data.draw(st.booleans())
        pcm = [rnd.randrange(-800, 801) / 1000.0 for _ in range(n)]
        adts, recon = a.aac_encode_quantized(pcm, rate_idx=4,
                                             global_gain=gg,
                                             short=short)
        rate, nch, chans = a.aac_decode(adts)
        assert chans[0] == recon

    run()


def _noise_ics_bits(w, n_bands: int, energies: list[int]):
    """One channel's ics payload: all-NOISE sections over ``n_bands``
    bands with the given coded energies (first 9-bit raw, then dpcm
    via the synthetic sf book where code 60 = delta 0)."""
    w.u(60, 8)             # global_gain
    w.u(13, 4)             # NOISE_HCB section
    w.u(n_bands, 5)        # sect_len
    w.u(energies[0], 9)    # first noise energy (9-bit raw)
    for e in energies[1:]:
        w.u(60 + e, 7)     # dpcm noise energy (synthetic sf book)
    w.u(0, 1)              # pulse
    w.u(0, 1)              # tns
    w.u(0, 1)              # gain control


def _cpe_noise_common(ms_present: int, g_left: int, g_right: int):
    """Single-CPE frame, common_window, max_sfb=1, both channels one
    NOISE band."""
    w = a._W()
    w.u(1, 3)      # CPE
    w.u(0, 4)
    w.u(1, 1)      # common_window
    w.u(0, 1)      # ics_reserved
    w.u(0, 2)      # ONLY_LONG
    w.u(0, 1)      # sine
    w.u(1, 6)      # max_sfb = 1
    w.u(0, 1)      # predictor
    w.u(ms_present, 2)
    if ms_present == 1:
        w.u(1, 1)  # ms_used[0][0]
    _noise_ics_bits(w, 1, [g_left])
    _noise_ics_bits(w, 1, [g_right])
    w.u(7, 3)
    w.byte_align_zero()
    payload = w.tobytes()
    hdr = a._W()
    a._adts_header(hdr, 4, 2, 7 + len(payload))
    return hdr.tobytes() + payload


def test_cpe_pns_ms_correlation():
    """ms_used set on a both-channels NOISE band: the right channel
    reuses the SAME left-channel random vector — fully correlated
    noise, per the 14496-3 text faad2 quotes verbatim (neither faad2
    nor FDK inverts the sign; round-11 ADVICE fix reversing the r10
    advisory's sign claim) — without ms_used the channels draw
    independent noise."""
    a.load_aac_tables(_synthetic_tables())
    rate, nch, (l, r) = a.aac_decode(_cpe_noise_common(2, 300, 300))
    assert nch == 2 and any(v != 0.0 for v in l)
    for i in range(1024):
        assert abs(r[i] - l[i]) < 1e-12
    # independent vectors when ms is absent (same coded energy; the
    # time-domain energies differ per vector because the MDCT first
    # half isn't phase-invariant — only a loose band)
    rate, nch, (l0, r0) = a.aac_decode(_cpe_noise_common(0, 300, 300))
    amp = max(abs(v) for v in l0)
    assert max(abs(r0[i] - l0[i]) for i in range(1024)) > 0.1 * amp
    el, er = sum(v * v for v in l0), sum(v * v for v in r0)
    assert 0.25 < er / el < 4.0
    # correlated but energy-offset: r = 4 * l (+8 coded = 16x energy)
    rate, nch, (l4, r4) = a.aac_decode(_cpe_noise_common(2, 300, 308))
    for i in range(1024):
        assert abs(r4[i] - 4.0 * l4[i]) < 1e-9


def test_cpe_pns_common_window0_uses_per_channel_ics():
    """common_window=0: each channel's PNS band walk uses its OWN
    ics geometry (round-10 ADVICE fix) — right coding 2 noise bands
    to the left's 1 fills both of ITS bands (2x energy), not just
    the bands of the left channel's grid."""
    a.load_aac_tables(_synthetic_tables())

    def chan_bits(w, max_sfb: int, energies):
        w.u(60, 8)     # global_gain
        w.u(0, 1)      # ics_reserved
        w.u(0, 2)      # ONLY_LONG
        w.u(0, 1)      # sine
        w.u(max_sfb, 6)
        w.u(0, 1)      # predictor
        w.u(13, 4)     # NOISE section
        w.u(max_sfb, 5)
        w.u(energies[0], 9)
        for e in energies[1:]:
            w.u(60 + e, 7)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)

    def build(right_bands: int):
        w = a._W()
        w.u(1, 3)
        w.u(0, 4)
        w.u(0, 1)      # common_window = 0
        chan_bits(w, 1, [300])
        chan_bits(w, right_bands, [300] + [0] * (right_bands - 1))
        w.u(7, 3)
        w.byte_align_zero()
        payload = w.tobytes()
        hdr = a._W()
        a._adts_header(hdr, 4, 2, 7 + len(payload))
        return hdr.tobytes() + payload

    rate, nch, (l1, r1) = a.aac_decode(build(1))
    rate, nch, (l2, r2) = a.aac_decode(build(2))
    el = sum(v * v for v in l1)
    e1 = sum(v * v for v in r1)
    e2 = sum(v * v for v in r2)
    # independent vectors: time-domain energies are only loosely
    # comparable (deterministic LCG, so these bands are stable)
    assert 0.25 < e1 / el < 4.0
    assert e2 / e1 > 1.4        # the 2nd right-band noise is applied


def test_mp4_asc_explicit_sampling_frequency():
    """An ASC coding samplingFrequencyIndex 15 + the 24-bit explicit
    rate (round-10 fix — previously raised NotImplementedError)
    extracts byte-identically to the index-coded variant."""
    from data_migration_etl_scripts_spark.operators import mp4

    a.load_aac_tables(_synthetic_tables())
    for ridx, ch in ((4, 1), (7, 2), (11, 1)):
        adts = a.aac_encode_silence(frames=2, rate_idx=ridx,
                                    channels=ch)
        wrapped = mp4.mp4_wrap_aac(adts, explicit_rate=True)
        assert mp4.mp4_extract_aac(wrapped) == adts, (ridx, ch)
    # a non-table explicit rate maps to the nearest standard index
    # (here: 44100 stays itself; synthesize 44000 by patching the ASC)
    adts = a.aac_encode_silence(frames=1, rate_idx=4, channels=1)
    wrapped = bytearray(mp4.mp4_wrap_aac(adts, explicit_rate=True))
    marker = bytes([(2 << 3) | 7, (1 << 7) | ((44100 >> 17) & 0x7F),
                    (44100 >> 9) & 0xFF])
    at = bytes(wrapped).find(marker)
    assert at > 0
    freq = 44000
    wrapped[at + 1] = (1 << 7) | ((freq >> 17) & 0x7F)
    wrapped[at + 2] = (freq >> 9) & 0xFF
    wrapped[at + 3] = (freq >> 1) & 0xFF
    wrapped[at + 4] = ((freq & 1) << 7) | (wrapped[at + 4] & 0x78)
    assert mp4.mp4_extract_aac(bytes(wrapped)) == adts
