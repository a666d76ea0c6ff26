"""HE-AAC v1 SBR (operators/sbr.py): QMF formula pins against naive
evaluations, hand-computed band tables and grids, envelope write/parse
round trips, channel decoupling, the full engine operating point
(silent core + SBR FIL -> deterministic adjusted noise at 2x rate),
and the seam/scope raises."""

from __future__ import annotations

import cmath
import math

import pytest

from data_migration_etl_scripts_spark.operators import aac as a
from data_migration_etl_scripts_spark.operators import sbr as sb


def _synth_tables(fs_out=32000, k0=8, k2=16):
    win = [math.sin(math.pi * (n + 0.5) / 640) / 64.0
           for n in range(640)]
    seed = 7
    noise = []
    for _ in range(512):
        seed = (seed * 1103515245 + 12345) & 0x7FFFFFFF
        re = seed / 0x40000000 - 1.0
        seed = (seed * 1103515245 + 12345) & 0x7FFFFFFF
        im = seed / 0x40000000 - 1.0
        noise.append([re, im])
    book = [[0, "0"], [1, "10"], [-1, "110"], [2, "1110"],
            [-2, "11110"], [3, "111110"], [-3, "111111"]]
    return {
        "qmf_window": win,
        "noise": noise,
        "huff": {n: book for n in sb._BOOKS},
        "start_freq_map": {fs_out: [k0] * 16},
        "stop_freq_map": {fs_out: [k2] * 14},
        "invf_bw": [0.0, 0.6, 0.9, 0.98],
        "limiter_gains": [0.70795, 1.0, 1.41254, 1e10],
        "smooth_window": [0.33333, 0.30150, 0.21816, 0.11516,
                          0.03183],
    }


@pytest.fixture
def seam():
    saved = dict(sb.SBR)
    saved_huff = dict(sb.SBR["huff"])
    sb.load_sbr_tables(_synth_tables())
    yield
    sb.SBR.update(saved)
    sb.SBR["huff"] = saved_huff


def _header(**over):
    h = {"amp_res": 1, "start_freq": 0, "stop_freq": 0,
         "xover_band": 0, "freq_scale": 0, "alter_scale": 0,
         "noise_bands": 2, "limiter_bands": 2, "limiter_gains": 2,
         "interpol_freq": 1, "smoothing_mode": 1}
    h.update(over)
    return h


# ------------------------------------------------------------- QMF


def test_qmf_analysis_matches_naive_sum(seam):
    """Three analysis steps pinned against a from-scratch evaluation
    of the defining sums: the FIFO after the steps is the reversed
    concatenation of the inputs, z = FIFO * decimated window, the
    five-tap fold, and the complex modulation — catching any FIFO
    shift/reversal or fold indexing drift."""
    import random

    rnd = random.Random(3)
    blocks = [[rnd.uniform(-1, 1) for _ in range(32)]
              for _ in range(3)]
    ana = sb.QmfAnalysis32()
    outs = [ana.step(b) for b in blocks]

    fifo = [0.0] * 320
    c = [sb.SBR["qmf_window"][2 * n] for n in range(320)]
    for bi, block in enumerate(blocks):
        fifo = block[::-1] + fifo[:-32]
        z = [fifo[n] * c[n] for n in range(320)]
        u = [sum(z[n + 64 * j] for j in range(5)) for n in range(64)]
        want = [sum(u[n] * cmath.exp(1j * math.pi / 64.0
                                     * (k + 0.5) * (2 * n - 1))
                    for n in range(64)) for k in range(32)]
        for k in range(32):
            assert abs(outs[bi][k] - want[k]) < 1e-9, (bi, k)


def test_qmf_synthesis_matches_naive_sum(seam):
    """Two synthesis steps pinned against a from-scratch evaluation:
    demodulation into the v FIFO, the 10-segment g shuffle, and the
    windowed dot product."""
    import random

    rnd = random.Random(4)
    slots = [[complex(rnd.uniform(-1, 1), rnd.uniform(-1, 1))
              for _ in range(64)] for _ in range(2)]
    syn = sb.QmfSynthesis64()
    outs = [syn.step(s) for s in slots]

    c = sb.SBR["qmf_window"]
    v = [0.0] * 1280
    for si, bands in enumerate(slots):
        v = [0.0] * 128 + v[:-128]
        for n in range(128):
            v[n] = sum((bands[k]
                        * cmath.exp(1j * math.pi / 128.0 * (k + 0.5)
                                    * (2 * n - 255))).real
                       for k in range(64)) / 64.0
        g = [0.0] * 640
        for j in range(5):
            for n in range(64):
                g[128 * j + n] = v[256 * j + n]
                g[128 * j + 64 + n] = v[256 * j + 192 + n]
        want = [sum(g[64 * j + n] * c[64 * j + n] for j in range(10))
                for n in range(64)]
        for n in range(64):
            assert abs(outs[si][n] - want[n]) < 1e-9, (si, n)


# ------------------------------------------------------ band tables


def test_band_tables_hand_computed(seam):
    """freq_scale 0, k0 = 8, k2 = 16: linear master 8..16; low table
    takes every second edge; two noise bands split the low table; the
    2.048 MHz patch rule yields (2, 6) + (6, 2) whose widths cover
    M = 8 — all hand-derived from the documented formulas."""
    bands = sb.derive_bands(_header(), 32000)
    assert bands["master"] == list(range(8, 17))
    assert bands["f"][1] == list(range(8, 17))
    assert bands["f"][0] == [8, 10, 12, 14, 16]
    assert (bands["kx"], bands["m"], bands["n_q"]) == (8, 8, 2)
    assert bands["f_noise"] == [8, 12, 16]
    assert bands["patches"] == [(2, 6), (6, 2)]
    assert sum(w for _, w in bands["patches"]) == bands["m"]
    assert bands["f_lim"][0] == 0 and bands["f_lim"][-1] == 8


def test_band_tables_log_mode_monotone(seam):
    """freq_scale 2 produces a strictly increasing master table from
    k0 to k2 for a spread of band edges."""
    for k2 in (20, 32, 40):
        sb.load_sbr_tables(_synth_tables(32000, 8, k2))
        bands = sb.derive_bands(_header(freq_scale=2), 32000)
        m = bands["master"]
        assert m[0] == 8 and m[-1] == k2
        assert all(m[i] < m[i + 1] for i in range(len(m) - 1))
        assert sum(w for _, w in bands["patches"]) == bands["m"]
        assert all(s >= 1 for s, _ in bands["patches"])


# ---------------------------------------------------- grid + parse


class _R:
    def __init__(self, bits):
        self.bits = bits
        self.pos = 0

    def u(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bits[self.pos]
            self.pos += 1
        return v


def _bits(w):
    return _R(list(w.bits))


def test_grid_fixfix_borders(seam):
    w = a._W()
    w.u(0, 2)   # FIXFIX
    w.u(2, 2)   # num_env = 4
    w.u(1, 1)   # freq_res high
    g = sb._parse_grid(_bits(w), amp_res=1)
    assert g["num_env"] == 4
    assert g["borders"] == [0, 4, 8, 12, 16]
    assert g["freq_res"] == [1, 1, 1, 1]
    assert g["l_a"] == -1
    assert g["noise_borders"] == [0, 8, 16]


def test_grid_fixvar_borders_and_la(seam):
    """FIXVAR with var_bord 0 and two relative borders of 4: borders
    accumulate from the END (16, 12, 8 -> [0? no: first border is 0
    only in concept...) — hand-derived: t_E = [0? -- the leading
    border of FIXVAR is fixed at 0]. pointer 2 -> l_A = numEnv + 1 -
    pointer = 2."""
    w = a._W()
    w.u(1, 2)   # FIXVAR
    w.u(0, 2)   # var_bord 0
    w.u(2, 2)   # num_rel 2 -> num_env 3
    w.u(1, 2)   # rel 2*1+2 = 4
    w.u(1, 2)   # rel 4
    w.u(2, 2)   # pointer (2 bits: ceil(log2(4)))
    w.u(1, 1)   # freq_res (read in reverse order)
    w.u(0, 1)
    w.u(1, 1)
    g = sb._parse_grid(_bits(w), amp_res=1)
    assert g["num_env"] == 3
    assert g["borders"] == [0, 8, 12, 16]
    # reversed read: last written bit lands on env 0
    assert g["freq_res"] == [1, 0, 1]
    assert g["l_a"] == 3 + 1 - 2
    assert g["noise_borders"] == [0, g["borders"][2], 16]


def _varfix_grid(pointer):
    w = a._W()
    w.u(2, 2)   # VARFIX
    w.u(0, 2)   # var_bord 0
    w.u(2, 2)   # num_rel 2 -> num_env 3
    w.u(1, 2)   # rel 2*1+2 = 4
    w.u(1, 2)   # rel 4 -> borders [0, 4, 8, 16]
    w.u(pointer, 2)
    for _ in range(3):
        w.u(0, 1)
    return sb._parse_grid(_bits(w), amp_res=1)


def test_grid_varfix_la_and_middleborder(seam):
    """4.6.18.3.3: VARFIX l_A = pointer - 1 only when pointer > 1
    (pointer 1 does NOT start sinusoids at envelope 0), and the
    noise-floor middleBorder is t_E[1] for pointer 0, t_E[L_E-1] for
    pointer 1, t_E[pointer-1] otherwise."""
    g0 = _varfix_grid(0)
    assert g0["l_a"] == -1
    assert g0["noise_borders"] == [0, 4, 16]       # t_E[1]
    g1 = _varfix_grid(1)
    assert g1["l_a"] == -1                          # NOT 0
    assert g1["noise_borders"] == [0, 8, 16]        # t_E[L_E-1]
    g2 = _varfix_grid(2)
    assert g2["l_a"] == 1
    assert g2["noise_borders"] == [0, 4, 16]        # t_E[pointer-1]


def test_grid_fixvar_low_pointer_middleborder(seam):
    """FIXVAR with pointer <= 1 and num_env >= 3 splits the noise
    floors at t_E[L_E-1], not t_E[1] (the two coincide only for
    num_env == 2)."""
    for pointer in (0, 1):
        w = a._W()
        w.u(1, 2)   # FIXVAR
        w.u(0, 2)   # var_bord 0
        w.u(2, 2)   # num_rel 2 -> num_env 3
        w.u(1, 2)   # rel 4
        w.u(1, 2)   # rel 4 -> borders [0, 8, 12, 16]
        w.u(pointer, 2)
        for _ in range(3):
            w.u(0, 1)
        g = sb._parse_grid(_bits(w), amp_res=1)
        assert g["l_a"] == -1
        assert g["noise_borders"] == [0, 12, 16]    # t_E[L_E-1]


def test_envelope_write_parse_round_trip(seam):
    """write_sbr_sce -> parse_sbr_data inverts exactly: grids, flat
    and sloped envelopes through the injected huffman books, noise
    floors, invf modes."""
    h = _header()
    bands = sb.derive_bands(h, 32000)
    w = a._W()
    env = [[30, 31, 29, 29, 30, 32, 31, 30],
           [28, 28, 28, 28, 28, 28, 28, 28]]
    noise = [[10, 11], [12, 12]]
    sb.write_sbr_sce(w, h, bands, 2, 1, env, noise, invf_mode=2)
    data = sb.parse_sbr_data(_bits(w), h, bands, is_cpe=False)
    ch = data["ch"][0]
    assert ch["grid"]["num_env"] == 2
    assert ch["env"] == env
    assert ch["noise"] == noise
    assert ch["invf"] == [2, 2]
    assert not data["coupling"]


def test_decouple_even_balance_splits_evenly(seam):
    g = {"amp_res": 1}
    e0, e1, q0, q1 = sb.decouple([[10]], [[12]], [[5]], [[12]], g)
    # balance at the pan centre: each side gets half the (doubled)
    # sum energy = 2^(10+6)
    assert abs(e0[0][0] - 2.0 ** 16) < 1e-6
    assert abs(e1[0][0] - 2.0 ** 16) < 1e-6
    assert abs(q0[0][0] - 2.0 ** 1) < 1e-9
    assert abs(q1[0][0] - 2.0 ** 1) < 1e-9
    # balance off-centre moves energy to channel 0 monotonically
    e0b, e1b, _, _ = sb.decouple([[10]], [[14]], [[5]], [[12]], g)
    assert e0b[0][0] > e0[0][0] > 0
    assert e1b[0][0] < e1[0][0]
    assert abs((e0b[0][0] + e1b[0][0]) - 2.0 ** 17) < 1e-6


def test_cpe_coupled_parse_and_decouple(seam):
    """Hand-built sbr_channel_pair_element with bs_coupling = 1: one
    grid (copied to channel 1), shared invf, channel-0 envelopes
    through the plain books and channel-1 through the BALANCE books
    (5-bit start), per the coupled element order — then the decoupled
    energies preserve the doubled sum."""
    h = _header()
    bands = sb.derive_bands(h, 32000)
    w = a._W()
    w.u(0, 1)       # bs_data_extra
    w.u(1, 1)       # bs_coupling
    w.u(0, 2)       # grid ch0: FIXFIX
    w.u(0, 2)       # num_env 1
    w.u(0, 1)       # freq_res low
    w.u(0, 1)       # dtdf ch0: df_env[0]
    w.u(0, 1)       # df_noise[0]
    w.u(0, 1)       # dtdf ch1
    w.u(0, 1)
    for _ in range(bands["n_q"]):
        w.u(1, 2)   # invf (shared)
    # ch0 envelope: amp_res forced 0 by the 1-env FIXFIX rule ->
    # 7-bit start, f_env_15 deltas
    w.u(33, 7)
    for _ in range(bands["n"][0] - 1):
        w.u(0, 1)   # delta 0 ('0' in the synthetic book)
    # ch0 noise: 5-bit start + f_env_30 deltas
    w.u(14, 5)
    for _ in range(bands["n_q"] - 1):
        w.u(0, 1)
    # ch1 (balance): 6-bit start (7 - 1), f_env_bal_15 deltas
    w.u(12, 6)
    for _ in range(bands["n"][0] - 1):
        w.u(0, 1)
    # ch1 noise balance: SAME 5-bit start as mono (Table 4.63 —
    # only the envelope start shrinks for the balance channel)
    w.u(11, 5)
    for _ in range(bands["n_q"] - 1):
        w.u(0, 1)
    w.u(0, 1)       # add_harmonic ch0
    w.u(0, 1)       # add_harmonic ch1
    w.u(0, 1)       # extended
    data = sb.parse_sbr_data(_bits(w), h, bands, is_cpe=True)
    assert data["coupling"]
    c0, c1 = data["ch"]
    assert c0["grid"]["num_env"] == 1 and c1["grid"]["num_env"] == 1
    assert c0["grid"]["amp_res"] == 0       # forced by 1-env FIXFIX
    assert c0["invf"] == c1["invf"] == [1, 1]
    assert c0["env"] == [[33] * bands["n"][0]]
    assert c1["env"] == [[12] * bands["n"][0]]
    assert c0["noise"] == [[14, 14]] and c1["noise"] == [[11, 11]]
    e0, e1, q0, q1 = sb.decouple(c0["env"], c1["env"], c0["noise"],
                                 c1["noise"], c0["grid"])
    # the per-channel energies sum to the doubled coded sum energy
    a05 = 0.5   # amp_res 0 -> a = 0.5
    want = 2.0 ** (33 * a05 + 7.0)
    assert abs(e0[0][0] + e1[0][0] - want) < 1e-6 * want
    wantq = 2.0 ** (7.0 - 14)
    assert abs(q0[0][0] + q1[0][0] - wantq) < 1e-9


def test_ps_extension_raises_namefully(seam):
    h = _header()
    bands = sb.derive_bands(h, 32000)
    w = a._W()
    sb.write_sbr_sce(w, h, bands, 1, 0, [[0] * bands["n"][0]],
                     [[30] * bands["n_q"]], 0)
    w.bits[-1] = 1              # flip bs_extended_data on
    w.u(1, 4)                   # cnt
    w.u(2, 2)                   # extension id 2 = PS
    w.u(0, 6)
    with pytest.raises(NotImplementedError, match="Parametric"):
        sb.parse_sbr_data(_bits(w), h, bands, is_cpe=False)


def test_hf_generation_transposes_core_content(seam):
    """With a real tone in the core, the HF generator must place
    energy into the patched high bands: patch (2, 6) copies source
    bands 2..7 to targets 8..13, so a tone landing in core QMF band 3
    appears at target band 9 — and with bs_invf_mode 0 the chirp is
    zero, making the patch an exact copy of the source sequence."""
    h = _header()
    bands = sb.derive_bands(h, 32000)
    st = sb.SbrChannel()
    # core at 16 kHz: QMF band b covers [b, b+1) * 250 Hz * ... each
    # of the 32 analysis bands spans fs/64 = 250 Hz; band 3 centre =
    # 3.5 * 250 = 875 Hz
    core = [math.sin(2 * math.pi * 875.0 * t / 16000.0)
            for t in range(1024)]
    xlow = list(st.hist)
    for i in range(32):
        xlow.append(st.ana.step(core[32 * i: 32 * i + 32]))
    xhigh, bw = sb.hf_generate(xlow, bands, [0] * bands["n_q"],
                               [], 2, 34)
    assert bw == [0.0, 0.0]
    assert set(xhigh) == set(range(8, 16))
    # exact copy: target 9 <- source 3 (patch (2,6): 8<-2, 9<-3, ...)
    for t in range(32):
        assert xhigh[9][t] == xlow[t + 2][3]
    # the tone band dominates its neighbour (the synthetic test
    # window leaks, so this is an ordering check — the exact-copy
    # assertion above is the real transposition pin)
    e9 = sum(abs(v) ** 2 for v in xhigh[9])
    e8 = sum(abs(v) ** 2 for v in xhigh[8])
    assert e9 > e8 > 0
    # nonzero inverse filtering changes the patched sequence but
    # keeps it finite (chirped two-tap LPC extension)
    xh2, bw2 = sb.hf_generate(xlow, bands, [3] * bands["n_q"],
                              [0.98, 0.98], 2, 34)
    assert bw2 == [0.98, 0.98]
    assert any(xh2[9][t] != xhigh[9][t] for t in range(32))
    assert all(abs(v) < 1e6 for v in xh2[9])


def test_envelope_delta_time_coding(seam):
    """A hand-built payload with df_env = [0, 1]: the second
    envelope's values accumulate the time deltas onto the first
    envelope's bands (same resolution), per 4.6.18.3.5."""
    h = _header()
    bands = sb.derive_bands(h, 32000)
    w = a._W()
    w.u(0, 1)       # bs_data_extra
    w.u(0, 2)       # FIXFIX
    w.u(1, 2)       # num_env 2
    w.u(0, 1)       # freq_res low
    w.u(0, 1)       # df_env[0] = 0
    w.u(1, 1)       # df_env[1] = 1 (delta-time)
    w.u(0, 1)       # df_noise[0]
    w.u(0, 1)       # df_noise[1]
    for _ in range(bands["n_q"]):
        w.u(0, 2)   # invf
    # envelope 0: start 20, f-deltas +1, -1, +2 over n_low = 4 bands
    w.u(20, 6)
    for bits in ("10", "110", "1110"):
        for c in bits:
            w.u(1 if c == "1" else 0, 1)
    # envelope 1: t-deltas +1 per band
    for _ in range(4):
        w.u(1, 1)   # "10" = +1
        w.u(0, 1)
    # two noise floors, flat at 15
    for _ in range(2):
        w.u(15, 5)
        w.u(0, 1)   # delta 0
    w.u(0, 1)       # add_harmonic
    w.u(0, 1)       # extended
    data = sb.parse_sbr_data(_bits(w), h, bands, is_cpe=False)
    ch = data["ch"][0]
    assert ch["env"][0] == [20, 21, 20, 22]
    assert ch["env"][1] == [21, 22, 21, 23]
    assert ch["noise"] == [[15, 15], [15, 15]]


# ------------------------------------------------------- end to end


def test_sbr_stream_decodes_at_double_rate(seam):
    b = a.aac_encode_sbr(frames=3, rate_idx=8, num_env=2, freq_res=1,
                         env_val=40, noise_val=10, invf_mode=2)
    rate, nch, chans = a.aac_decode(b)
    assert (rate, nch) == (32000, 1)
    assert len(chans[0]) == 3 * 2048
    # deterministic: a second decode is float-identical
    rate2, nch2, chans2 = a.aac_decode(b)
    assert chans2 == chans
    # the adjusted noise is audible at this envelope level
    assert sum(v * v for v in chans[0]) > 1e-6


def test_pre_sbr_header_frames_upsampled(seam):
    """ADTS frames decoded BEFORE the first SBR header arrives are
    zero-order-hold upsampled to the doubled output rate once SBR
    activates, so the stream's duration bookkeeping stays exact."""
    lead = a.aac_encode_silence(frames=1, rate_idx=8, channels=1)
    body = a.aac_encode_sbr(frames=2, rate_idx=8, num_env=2,
                            freq_res=1, env_val=40, noise_val=10,
                            invf_mode=2)
    rate, nch, chans = a.aac_decode(lead + body)
    assert (rate, nch) == (32000, 1)
    # 1 core-only frame (upsampled 1024 -> 2048) + 2 SBR frames
    assert len(chans[0]) == 3 * 2048
    # the silent leading frame stays silent after upsampling
    assert all(v == 0.0 for v in chans[0][:2048])
    # the SBR frames carry the adjusted noise
    assert sum(v * v for v in chans[0][2048:]) > 1e-6


def test_sbr_energy_follows_envelope(seam):
    """Higher coded envelope values must produce more output energy
    (the adjuster's target-energy contract), and the minimum noise
    floor with a tiny envelope is near-silence."""
    def power(env_val, noise_val):
        b = a.aac_encode_sbr(frames=2, rate_idx=8, env_val=env_val,
                             noise_val=noise_val)
        _, _, chans = a.aac_decode(b)
        return sum(v * v for v in chans[0]) / len(chans[0])

    p_low, p_mid, p_high = (power(20, 10), power(30, 10),
                            power(40, 10))
    assert p_low < p_mid < p_high
    assert power(0, 30) < 1e-12


def test_sbr_header_only_once_then_data_frames(seam):
    """The header persists across frames: frames 2.. carry
    bs_header_flag = 0 and still decode (state carried), matching a
    stream that repeats the header every frame."""
    full = a.aac_encode_sbr(frames=2, rate_idx=8, env_val=30)
    rate, nch, chans = a.aac_decode(full)
    assert len(chans[0]) == 2 * 2048


def test_sbr_missing_tables_raise_namefully():
    saved = dict(sb.SBR)
    saved_huff = dict(sb.SBR["huff"])
    try:
        sb.load_sbr_tables(_synth_tables())
        b = a.aac_encode_sbr(frames=1, rate_idx=8)
        for k in sb.SBR:
            sb.SBR[k] = None
        sb.SBR["huff"] = {}
        sb._env_load_done = True
        with pytest.raises(NotImplementedError,
                           match="SPARK_GRAFT_SBR_TABLES"):
            a.aac_decode(b)
    finally:
        sb.SBR.update(saved)
        sb.SBR["huff"] = saved_huff
        sb._env_load_done = True


def test_loader_validation(seam):
    with pytest.raises(ValueError, match="640"):
        sb.load_sbr_tables({"qmf_window": [0.0] * 100})
    with pytest.raises(ValueError, match="512"):
        sb.load_sbr_tables({"noise": [[0, 0]] * 3})
    with pytest.raises(ValueError, match="prefix-free"):
        sb.load_sbr_tables(
            {"huff": {"t_env_15": [[0, "0"], [1, "01"]]}})
    with pytest.raises(ValueError, match="unknown SBR huffman"):
        sb.load_sbr_tables({"huff": {"bogus": [[0, "0"]]}})


# ----------------------------------------- r12: hand walks (CABAC
# lesson applied: shared derivations pinned by expectations produced
# OUTSIDE the code, before any foreign fixture exists)


def test_envelope_noise_bit_consumption_hand_walk(seam):
    """Bit-exact huffman/start-value accounting for one SCE FIXFIX
    frame, every codeword derived by hand from the synthetic book
    (0:'0' 1:'10' -1:'110' 2:'1110' -2:'11110' 3:'111110'): the
    parse must land on the exact bit positions computed here AND
    yield the hand-accumulated values."""
    h = _header()                 # amp_res 1
    bands = sb.derive_bands(h, 32000)
    assert bands["n"][0] == 4 and bands["n_q"] == 2
    w = a._W()
    w.u(0, 1)       # bs_data_extra
    w.u(0, 2)       # FIXFIX
    w.u(0, 2)       # num_env 1 (forces amp_res 0 -> 7-bit start)
    w.u(0, 1)       # freq_res low
    w.u(0, 1)       # df_env[0] = 0
    w.u(0, 1)       # df_noise[0] = 0
    for _ in range(bands["n_q"]):
        w.u(2, 2)   # invf
    # envelope: start 21 (7 bits), then +2 -1 +3 ->
    # [21, 23, 22, 25]; codewords 1110 / 110 / 111110 = 13 bits
    w.u(21, 7)
    for bit in "1110" "110" "111110":
        w.u(int(bit), 1)
    # noise: start 12 (5 bits), then -2 -> [12, 10]; 11110 = 5 bits
    w.u(12, 5)
    for bit in "11110":
        w.u(int(bit), 1)
    w.u(0, 1)       # add_harmonic
    w.u(0, 1)       # extended
    # hand bit budget: 1+2+2+1 (extra+grid) + 1+1 (dtdf) + 2*2
    #   (invf) + 7+13 (envelope) + 5+5 (noise) + 1+1 = 44
    assert len(w.bits) == 44
    r = _bits(w)
    data = sb.parse_sbr_data(r, h, bands, is_cpe=False)
    assert r.pos == 44            # consumed exactly, no slack
    ch = data["ch"][0]
    assert ch["env"] == [[21, 23, 22, 25]]
    assert ch["noise"] == [[12, 10]]
    assert ch["invf"] == [2, 2]
    # dequant walk (amp_res forced 0 by the 1-env FIXFIX rule):
    # a = 0.5 -> E = 2^(v/2 + 6); noise Q = 2^(6 - v)
    lin = sb.dequant_env(ch["env"], ch["grid"])
    assert lin[0][0] == 2.0 ** (21 * 0.5 + 6.0)
    assert lin[0][3] == 2.0 ** (25 * 0.5 + 6.0)
    qlin = sb.dequant_noise(ch["noise"])
    assert qlin[0] == [2.0 ** (6.0 - 12.0), 2.0 ** (6.0 - 10.0)]


def test_gain_calculation_hand_walk(seam):
    """The full 4.6.18.7 gain chain for one FIXFIX envelope computed
    INDEPENDENTLY from the documented contract + the injected seam
    tables: G = sqrt(E_o / ((1+E_c)(1+Q))), Q_M = sqrt(E_o*Q/(1+Q)),
    per-limiter-band boost = min(sqrt(sum_o/got), +2 dB), noise
    cycling through the seam table in (slot, band) order — then
    every output sample of adjust() must equal the hand value."""
    import cmath

    h = _header(smoothing_mode=1, limiter_gains=3)  # no smoothing,
    bands = sb.derive_bands(h, 32000)               # 1e10 limiter
    kx, m = bands["kx"], bands["m"]
    assert (kx, m) == (8, 8)
    grid = {"num_env": 1, "freq_res": [0], "borders": [0, 16],
            "pointer": 0, "l_a": -1, "num_noise": 1,
            "noise_borders": [0, 16], "amp_res": 0}
    ch = {"grid": grid, "harm": [0] * bands["n"][1]}
    env_raw = [[20, 22, 24, 26]]
    noise_raw = [[14, 9]]
    env_lin = sb.dequant_env(env_raw, grid)
    noise_lin = sb.dequant_noise(noise_raw)
    c = 3.0
    nslots = 32
    xhigh = {kx + k: [complex(c, 0.0)] * nslots for k in range(m)}
    start_idx = 5
    got_idx, got_sidx = sb.adjust(
        xhigh, ch, bands, env_lin, noise_lin, 0, start_idx, h,
        0, {})

    # ---- independent recomputation ----
    ftab = bands["f"][0]
    e_orig = [0.0] * m
    for b in range(len(ftab) - 1):
        for k in range(ftab[b], ftab[b + 1]):
            e_orig[k - kx] = 2.0 ** (env_raw[0][b] * 0.5 + 6.0)
    q_map = [2.0 ** (6.0 - noise_raw[0][sb._noise_band_of(
        bands, kx + k)]) for k in range(m)]
    e_c = c * c
    import math as _math

    g = [_math.sqrt(e_orig[k] / ((1 + e_c) * (1 + q_map[k])))
         for k in range(m)]
    q_m = [_math.sqrt(e_orig[k] * q_map[k] / (1 + q_map[k]))
           for k in range(m)]
    flim = bands["f_lim"]
    for i in range(len(flim) - 1):
        lo, hi = flim[i], flim[i + 1]
        sum_o = sum(e_orig[lo:hi]) + 1e-12
        got = sum(g[k] * g[k] * e_c + q_m[k] * q_m[k]
                  for k in range(lo, hi)) + 1e-12
        boost = min(_math.sqrt(sum_o / got), 1.584893192)
        for k in range(lo, hi):
            g[k] *= boost
            q_m[k] *= boost
    noise_v = sb.SBR["noise"]
    idx = start_idx
    for t in range(nslots):
        for k in range(m):
            want = complex(c, 0.0) * g[k]
            if q_m[k]:
                idx = (idx + 1) & 511
                want += q_m[k] * noise_v[idx]
            gotv = xhigh[kx + k][t]
            assert abs(gotv - want) < 1e-9 * max(1.0, abs(want)), \
                (t, k)
    assert got_idx == idx
    assert got_sidx == nslots     # one sine-phase step per slot


# --------------------------------- r12: cross-frame VAR borders


def _var_stream(spill=True):
    grids = [
        {"class": "fixvar", "var_bord": 0, "rel": [],
         "pointer": 0, "freq_res": [0]},
        {"class": "fixvar", "var_bord": 2 if spill else 0,
         "rel": [8], "pointer": 0, "freq_res": [0, 0]},
        {"class": "varfix", "var_bord": 2 if spill else 0,
         "rel": [6], "pointer": 0, "freq_res": [0, 0]},
    ]
    env_rows = [
        [[20] * 4],
        [[20] * 4, [26] * 4],
        [[23] * 4, [20] * 4],
    ]
    noise_rows = [
        [[20, 20]],
        [[20, 20], [20, 20]],
        [[20, 20], [20, 20]],
    ]
    return a.aac_encode_sbr(frames=3, rate_idx=8, invf_mode=2,
                            grids=grids, env_rows=env_rows,
                            noise_rows=noise_rows)


def test_var_borders_cross_frame_decode(seam):
    """FIXVAR spilling 2 border units into the next frame, consumed
    by a VARFIX leading gap: the +6-step envelope (2^6 energy) must
    cover its ABSOLUTE slot range — including the spilled slots at
    the head of frame 2 — and the following +3-step envelope its
    own. Checked by band-energy ratios in windows well inside each
    region (unit = 128 output samples; windows keep >= 1.5-unit
    margins for the synthesis smear)."""
    b = _var_stream(spill=True)
    rate, nch, chans = a.aac_decode(b)
    assert (rate, nch) == (32000, 1)
    s = chans[0]
    assert len(s) == 3 * 2048

    def energy(lo, hi):
        return sum(v * v for v in s[lo:hi]) / (hi - lo)

    # the synthesis filterbank delays output by ~289 samples: every
    # window shifts right and keeps >= 1.5-unit margins
    eA = energy(2048 + 800, 2048 + 1280)    # f1 env 20
    eB = energy(3800, 4500)                 # f1 env 26 + SPILL
    eC = energy(4750, 5050)                 # f2 env 23
    assert 32.0 < eB / eA < 128.0, eB / eA      # ~2^6
    assert 4.0 < eB / eC < 16.0, eB / eC        # ~2^3
    # and within the spilled region itself (first 2 units of frame
    # 2, shifted past the delay) the HIGH envelope holds
    eSpill = energy(4400, 4600)
    assert eSpill / eA > 16.0, eSpill / eA
    # determinism
    assert a.aac_decode(b) == (rate, nch, chans)


def test_varfix_without_pending_spill_raises(seam):
    grids = [{"class": "varfix", "var_bord": 2, "rel": [6],
              "pointer": 0, "freq_res": [0, 0]}]
    b = a.aac_encode_sbr(frames=1, rate_idx=8, invf_mode=2,
                         grids=grids,
                         env_rows=[[[20] * 4, [20] * 4]],
                         noise_rows=[[[20, 20], [20, 20]]])
    with pytest.raises(ValueError, match="spilled envelope"):
        a.aac_decode(b)


def test_var_grid_write_parse_round_trip(seam):
    """write_sbr_sce_grid walks the exact parse order for both VAR
    classes (freq_res reversal included)."""
    h = _header()
    bands = sb.derive_bands(h, 32000)
    for spec, want_borders in (
            ({"class": "fixvar", "var_bord": 2, "rel": [8],
              "pointer": 0, "freq_res": [1, 0]}, [0, 10, 18]),
            ({"class": "varfix", "var_bord": 2, "rel": [6],
              "pointer": 0, "freq_res": [0, 1]}, [2, 8, 16])):
        w = a._W()
        sb.write_sbr_sce_grid(w, h, bands, spec,
                              [[20] * bands["n"][spec["freq_res"][0]],
                               [22] * bands["n"][spec["freq_res"][1]]],
                              [[15, 15], [15, 15]], 1)
        data = sb.parse_sbr_data(_bits(w), h, bands, is_cpe=False)
        ch = data["ch"][0]
        assert ch["grid"]["borders"] == want_borders
        assert ch["grid"]["freq_res"] == spec["freq_res"]
        assert ch["env"][0][0] == 20 and ch["env"][1][0] == 22
        assert ch["noise"] == [[15, 15], [15, 15]]
