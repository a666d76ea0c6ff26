"""HE-AAC v2 Parametric Stereo, staged (operators/ps.py + the sbr/
aac wiring): ps_data parse hand walks (header persistence, FIX/VAR
borders, freq/time-differential IID with clipping), the IID mixing
contract pinned by independently computed energies, the spec's
slot-linear interpolation, seam validation, and the named
hybrid/decorrelator boundaries."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import aac as a
from data_migration_etl_scripts_spark.operators import ps as p
from data_migration_etl_scripts_spark.operators import sbr as sb

from test_sbr import _synth_tables, seam  # noqa: F401

_PS_BOOK = [[0, "0"], [1, "10"], [-1, "110"], [2, "1110"],
            [-2, "11110"], [4, "111110"], [-4, "1111110"],
            [7, "11111110"], [-7, "111111110"]]

_COARSE = [-25, -18, -14, -10, -6, -3, -1, 0, 1, 3, 6, 10, 14,
           18, 25]


@pytest.fixture
def ps_seam(seam):       # noqa: F811  (stacks on the SBR seam)
    sb.load_sbr_tables({
        "ps_huff": {n: _PS_BOOK for n in sb._PS_BOOKS},
        "ps_iid_quant": {
            "coarse": _COARSE,
            "fine": [float(v) for v in range(-30, 32, 2)][:31]},
        "ps_icc_quant": [1.0, 0.937, 0.84118, 0.60092, 0.36764,
                         0.0, -0.589, -1.0],
    })
    yield
    sb.SBR["ps_huff"] = None
    sb.SBR["ps_iid_quant"] = None
    sb.SBR["ps_icc_quant"] = None


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


def test_ps_data_parse_hand_walk(ps_seam):
    """Hand-built ps_data: header (iid on, mode 0; icc off; ext
    off), FIX class, one envelope, freq-differential deltas
    [2, -1, 0 x8] -> accumulated indices [2, 1, 1, ...] — with the
    exact bit count asserted."""
    w = a._W()
    w.u(1, 1)   # enable header
    w.u(1, 1)   # enable iid
    w.u(0, 3)   # iid_mode 0 -> 10 bands, coarse
    w.u(0, 1)   # icc off
    w.u(0, 1)   # ext off
    w.u(0, 1)   # FIX
    w.u(1, 2)   # num_env 1
    w.u(0, 1)   # dt 0
    for bits in ["1110", "110"] + ["0"] * 8:
        for c in bits:
            w.u(int(c), 1)
    ps = p.parse_ps_data(_R(list(w.bits)), None)
    assert ps["consumed"] == len(w.bits) == 11 + 4 + 3 + 8
    assert ps["num_env"] == 1 and ps["borders"] == [32]
    assert ps["iid_idx"] == [[2] + [1] * 9]
    assert ps["icc_idx"] == []


def test_ps_header_persistence_and_time_differential(ps_seam):
    """Frame 2 without a header reuses frame 1's config, and its
    dt=1 envelope accumulates onto frame 1's LAST envelope."""
    w = a._W()
    w.u(0, 1)   # no header (persisted config)
    w.u(0, 1)   # FIX
    w.u(1, 2)   # num_env 1
    w.u(1, 1)   # dt = 1
    for bits in ["10"] * 10:        # +1 per band
        for c in bits:
            w.u(int(c), 1)
    prev = {"config": {"enable_iid": 1, "iid_mode": 0,
                       "enable_icc": 0, "icc_mode": 0,
                       "enable_ext": 0},
            "iid_idx": [3, 3, 3, 3, 3, 0, 0, 0, 0, 0]}
    ps = p.parse_ps_data(_R(list(w.bits)), prev)
    assert ps["iid_idx"] == [[4] * 5 + [1] * 5]


def test_ps_var_borders_and_clipping(ps_seam):
    w = a._W()
    w.u(1, 1)
    w.u(1, 1)
    w.u(0, 3)
    w.u(0, 1)
    w.u(0, 1)
    w.u(1, 1)   # VAR
    w.u(1, 2)   # 2 envelopes
    w.u(15, 5)  # border 16
    w.u(31, 5)  # border 32
    for _e in range(2):
        w.u(0, 1)
        for bits in ["11111110"] + ["111110"] * 9:  # 7 then +4s
            for c in bits:
                w.u(int(c), 1)
    ps = p.parse_ps_data(_R(list(w.bits)), None)
    assert ps["borders"] == [16, 32]
    # coarse clip at +-7: 7, 11->7, 15->7...
    assert ps["iid_idx"][0] == [7] * 10


def test_iid_scales_contract(ps_seam):
    """c_l/c_r from the documented contract: P ratio = 10^(v/10),
    P_l + P_r = 2."""
    for idx in (-7, -3, 0, 2, 7):
        cl, cr = p.iid_scales(idx, False)
        v = _COARSE[idx + 7]
        assert abs(cl * cl + cr * cr - 2.0) < 1e-12
        assert abs(cl * cl / (cr * cr) - 10.0 ** (v / 10.0)) < 1e-9


def test_frame_slot_scales_interpolation(ps_seam):
    """Spec H-interpolation: from the previous applied pair to the
    envelope target linearly across its slots, then hold."""
    ps = {"config": {"enable_iid": 1, "iid_mode": 0,
                     "enable_icc": 0},
          "num_env": 1, "borders": [16],
          "iid_idx": [[2] * 10], "icc_idx": []}
    prev = (1.0, 1.0)
    scales, final = p.frame_slot_scales(ps, prev)
    tgt = p.iid_scales(2, False)
    assert final == tgt
    for t in range(16):
        f = (t + 1) / 16
        want = 1.0 + (tgt[0] - 1.0) * f
        assert abs(scales[t][0] - want) < 1e-12, t
    for t in range(16, 32):     # past the last border: hold
        assert scales[t] == tgt
    # num_env 0: previous pair holds the whole frame
    scales0, f0 = p.frame_slot_scales(
        {"config": {"enable_iid": 1, "iid_mode": 0},
         "num_env": 0, "borders": [], "iid_idx": [],
         "icc_idx": []}, tgt)
    assert scales0 == [tgt] * 32 and f0 == tgt


def test_staged_boundaries_raise_namefully(ps_seam):
    base = {"config": {"enable_iid": 1, "iid_mode": 0,
                       "enable_icc": 1},
            "num_env": 1, "borders": [32],
            "iid_idx": [[0] * 10], "icc_idx": [[0] * 9 + [3]]}
    with pytest.raises(NotImplementedError, match="decorrelator"):
        p.frame_slot_scales(base, None)
    vary = dict(base, icc_idx=[],
                iid_idx=[[1] * 9 + [2]],
                config={"enable_iid": 1, "iid_mode": 0,
                        "enable_icc": 0})
    with pytest.raises(NotImplementedError, match="hybrid"):
        p.frame_slot_scales(vary, None)


def test_ps_seam_raises_and_validation(seam):  # noqa: F811
    sb.SBR["ps_huff"] = None
    r = _R([1] * 64)
    with pytest.raises(NotImplementedError,
                       match="SPARK_GRAFT_SBR_TABLES"):
        p.parse_ps_data(r, None)
    with pytest.raises(ValueError, match="ps_iid_quant"):
        sb.load_sbr_tables({"ps_iid_quant": {"coarse": [0] * 14,
                                             "fine": [0] * 31}})
    with pytest.raises(ValueError, match="ps_icc_quant"):
        sb.load_sbr_tables({"ps_icc_quant": [0] * 7})
    with pytest.raises(ValueError, match="unknown PS huffman"):
        sb.load_sbr_tables({"ps_huff": {"bogus": _PS_BOOK}})


def test_he_aac_v2_end_to_end_energy_contract(ps_seam):
    """Engine HE-AAC v2 stream (mono core + SBR + PS, constant IID
    index 4 = +10 dB): decodes to STEREO at 2x rate; the steady-
    state channel energies obey P_l/P_r = 10 and P_l + P_r =
    2 * P_mono against an INDEPENDENTLY decoded v1 stream —
    both facts computed outside the PS code."""
    b = a.aac_encode_sbr(frames=4, rate_idx=8, num_env=1,
                         freq_res=0, env_val=40, noise_val=10,
                         invf_mode=2, ps_iid=4)
    rate, nch, chans = a.aac_decode(b)
    assert (rate, nch) == (32000, 2)
    assert all(len(c) == 4 * 2048 for c in chans)
    el = sum(v * v for v in chans[0][4096:])
    er = sum(v * v for v in chans[1][4096:])
    assert abs(el / er - 10.0) < 1e-9
    b0 = a.aac_encode_sbr(frames=4, rate_idx=8, num_env=1,
                          freq_res=0, env_val=40, noise_val=10,
                          invf_mode=2)
    _, n0, ch0 = a.aac_decode(b0)
    assert n0 == 1
    em = sum(v * v for v in ch0[0][4096:])
    assert abs((el + er) / (2.0 * em) - 1.0) < 1e-9
    # determinism
    assert a.aac_decode(b) == (rate, nch, chans)


def test_he_aac_v2_negative_iid_pans_right(ps_seam):
    b = a.aac_encode_sbr(frames=3, rate_idx=8, num_env=1,
                         freq_res=0, env_val=40, noise_val=10,
                         invf_mode=2, ps_iid=-4)
    _, nch, chans = a.aac_decode(b)
    assert nch == 2
    el = sum(v * v for v in chans[0][4096:])
    er = sum(v * v for v in chans[1][4096:])
    # index -4 -> coarse grid value -10 dB -> P_r/P_l = 10
    assert abs(er / el - 10.0) < 1e-9


def test_ps_mid_stream_activation_duplicates_history(ps_seam):
    """PS arriving after plain v1 frames upgrades the output to
    stereo and duplicates the earlier mono history so channel
    lengths agree."""
    v1 = a.aac_encode_sbr(frames=1, rate_idx=8, num_env=1,
                          freq_res=0, env_val=35, noise_val=12,
                          invf_mode=2)
    v2 = a.aac_encode_sbr(frames=2, rate_idx=8, num_env=1,
                          freq_res=0, env_val=35, noise_val=12,
                          invf_mode=2, ps_iid=2)
    rate, nch, chans = a.aac_decode(v1 + v2)
    assert nch == 2
    assert len(chans[0]) == len(chans[1]) == 3 * 2048
    assert chans[0][:2048] == chans[1][:2048]   # duplicated lead-in
