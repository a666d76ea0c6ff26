"""CABAC entropy layer (operators/h264_cabac.py + the h264.py CABAC
decode path and CAVLC->CABAC transcoder): arithmetic-engine round
trips with the exact consumed==emitted sync identity, context-init
formula, loader validation, named seam raises, and end-to-end
transcode equality over every engine operating point (I_PCM, dense
and sparse Intra_16x16/Intra_4x4, multi-slice, IPPP P_16x16 /
P_8x8 / all-skip / declared-multi-ref)."""

from __future__ import annotations

import random

import pytest

from data_migration_etl_scripts_spark.operators import h264 as h
from data_migration_etl_scripts_spark.operators import h264_cabac as C

from test_h264 import (  # noqa: F401  (shared fixtures/helpers)
    _grad_clip,
    _grad_image,
    _isolated_tables,
    _synthetic_cavlc,
)


@pytest.fixture(autouse=True)
def _isolated_cabac_tables():
    saved = {"range_lps": C.CABAC["range_lps"],
             "trans_lps": C.CABAC["trans_lps"],
             "init": dict(C.CABAC["init"])}
    yield
    C.CABAC["range_lps"] = saved["range_lps"]
    C.CABAC["trans_lps"] = saved["trans_lps"]
    C.CABAC["init"].clear()
    C.CABAC["init"].update(saved["init"])


def _synth_cabac():
    """Synthetic-but-valid seam tables: LPS share shrinks with state
    and grows with the range quarter; any such tables round-trip (the
    arithmetic identities are value-independent)."""
    rl = [[max(2, min(240, ((q + 1) * (128 - 2 * s)) // 2 + 2))
           for q in range(4)] for s in range(64)]
    tl = [max(0, s - 1 - s // 8) for s in range(64)]
    init = {k: [[(i * 5) % 16 - 8, 40 + (i * 7) % 48]
                for i in range(277)]
            for k in ("I", "P0", "P1", "P2")}
    return {"range_lps": rl, "trans_lps": tl, "init": init}


# ------------------------------------------------- arithmetic engine

def test_engine_round_trip_and_sync_identity():
    """Random decision/bypass scripts ending in terminate(1): decode
    reproduces every bin, context states evolve identically on both
    sides, and the decoder's total bit consumption EQUALS the
    encoder's emission at the terminate — the accounting identity
    (first-bit discard) that makes I_PCM realignment exact."""
    C.load_cabac_tables(_synth_cabac())
    rnd = random.Random(42)
    for trial in range(25):
        n = rnd.randrange(1, 300)
        script = [(rnd.choice("dddb"), rnd.randrange(276),
                   rnd.randrange(2)) for _ in range(n)]
        script.append(("t", 0, 1))
        bits: list[int] = []
        est = C.init_ctx_states(28, "I")
        enc = C.CabacEncoder(bits.append)
        for kind, ctx, bit in script:
            if kind == "d":
                enc.decision(est[ctx], bit)
            elif kind == "b":
                enc.bypass(bit)
            else:
                enc.terminate(bit)
        pos = [0]

        def rb():
            p = pos[0]
            pos[0] += 1
            return bits[p] if p < len(bits) else 0

        dst = C.init_ctx_states(28, "I")
        dec = C.CabacDecoder(rb)
        for kind, ctx, bit in script:
            got = (dec.decision(dst[ctx]) if kind == "d"
                   else dec.bypass() if kind == "b"
                   else dec.terminate())
            assert got == bit, (trial, kind, ctx)
        assert pos[0] == len(bits), (trial, pos[0], len(bits))
        assert est == dst


def test_ctx_init_formula():
    """preCtxState = Clip3(1, 126, ((m * Clip3(0,51,QP)) >> 4) + n),
    split at 64 into (pStateIdx, valMPS)."""
    tabs = _synth_cabac()
    tabs["init"]["I"][0] = [20, 30]    # qp 28: (20*28)>>4 + 30 = 65
    tabs["init"]["I"][1] = [-40, 60]   # (-(40*28))>>4 + 60 = -10 -> 1
    C.load_cabac_tables(tabs)
    st = C.init_ctx_states(28, "I")
    assert st[0] == [65 - 64, 1]       # preCtxState 65 -> MPS 1
    assert st[1] == [63 - 1, 0]        # clipped to 1 -> MPS 0


def test_loader_validates_and_seam_raises_namefully():
    with pytest.raises(ValueError, match="range_lps"):
        C.load_cabac_tables({"range_lps": [[1, 2, 3]]})
    with pytest.raises(ValueError, match="range_lps"):
        C.load_cabac_tables({"range_lps": [[0, 2, 3, 4]] * 64})
    with pytest.raises(ValueError, match="trans_lps"):
        C.load_cabac_tables({"trans_lps": [99] * 64})
    with pytest.raises(ValueError, match="init"):
        C.load_cabac_tables({"init": {"I": [[0, 64]] * 10}})
    with pytest.raises(ValueError, match="P0"):
        C.load_cabac_tables({"init": {"B7": [[0, 64]] * 277}})
    # missing seam raises at the documented plug, by name
    C.CABAC["range_lps"] = None
    C.CABAC["trans_lps"] = None
    C.CABAC["init"].clear()
    with pytest.raises(NotImplementedError, match="CABAC"):
        C.init_ctx_states(26, "I")
    h.load_cavlc_tables({"cbp_intra": [[i, i] for i in range(48)]})
    ys, cbs, crs = _grad_image(32, 32, seed=2)
    b, _ = h.encode_quantized_yuv(ys, cbs, crs, qp=30, dense=True)
    with pytest.raises(NotImplementedError,
                       match="SPARK_GRAFT_CABAC_TABLES"):
        h.decode_iframe_yuv(h.transcode_to_cabac(b))


# ---------------------------------------------- end-to-end transcode

def _tables():
    C.load_cabac_tables(_synth_cabac())
    h.load_cavlc_tables(_synthetic_cavlc())


def test_transcode_ipcm_iframe():
    C.load_cabac_tables(_synth_cabac())
    px_y = [[(x * 7 + y * 3) % 256 for x in range(48)]
            for y in range(32)]
    cb = [[118 + (x % 9) for x in range(24)] for _ in range(16)]
    cr = [[132 + (y % 7) for _ in range(24)] for y in range(16)]
    b = h.encode_ipcm_yuv(px_y, cb, cr)
    tb = h.transcode_to_cabac(b)
    assert h.decode_iframe_yuv(tb) == h.decode_iframe_yuv(b)
    # the transcoded PPS really is CABAC
    for ref, typ, rbsp in h.nal_units(tb):
        if typ == 8:
            assert h.parse_pps(rbsp)["entropy"] == 1
    with pytest.raises(ValueError, match="already CABAC"):
        h.transcode_to_cabac(tb)


def test_transcode_quantized_modes_and_slices():
    """Dense/sparse x Intra_16x16/Intra_4x4 and multi-slice pictures
    reconstruct identically through the CABAC path (residual
    categories 0-4, intra modes, chroma modes, cbp, qp_delta)."""
    _tables()
    ys, cbs, crs = _grad_image(48, 48, seed=4)
    for mode, dense in (("i16", True), ("i4", True),
                        ("i16", False), ("i4", False)):
        b, _ = h.encode_quantized_yuv(ys, cbs, crs, qp=26,
                                      mb_mode=mode, dense=dense)
        tb = h.transcode_to_cabac(b)
        assert h.decode_iframe_yuv(tb) == h.decode_iframe_yuv(b), (
            mode, dense)
    b, _ = h.encode_quantized_yuv(ys, cbs, crs, qp=28, slices=3)
    tb = h.transcode_to_cabac(b)
    assert h.decode_iframe_yuv(tb) == h.decode_iframe_yuv(b)


def test_transcode_video_p_modes():
    """IPPP clips: P_16x16 with fractional MVs, P_8x8 sub-partitions,
    declared num_ref=2 (ref_idx bins), and all-skip pictures."""
    _tables()
    h.load_cavlc_tables({"cbp_inter": [[i, i] for i in range(48)]})
    frames = _grad_clip(3)
    for kw in ({"mvs": [(5, -3), (2, 7)]},
               {"mb_mode": "p8x8", "mvs": [(1, 1), (-2, 3)]},
               {"declare_num_ref": 2}):
        b, recons = h.encode_video_yuv(frames, qp=8, **kw)
        tb = h.transcode_to_cabac(b)
        w, hh, out = h.decode_video_yuv(tb)
        assert out == recons, kw
    px = [[((x * 7 + y * 3) % 256, x % 256, y % 256)
           for x in range(32)] for y in range(32)]
    b = h.encode_video_skip(px, frames=3)
    assert (h.decode_video_yuv(h.transcode_to_cabac(b))[2]
            == h.decode_video_yuv(b)[2])


def test_transcode_property_random_clips():
    """Property: random small clips (both P modes, random QPs and
    MVs) survive CAVLC -> CABAC -> decode bit-exactly."""
    _tables()
    h.load_cavlc_tables({"cbp_inter": [[i, i] for i in range(48)]})
    rnd = random.Random(11)
    for trial in range(6):
        w = 16 * rnd.randrange(1, 4)
        hgt = 16 * rnd.randrange(1, 3)
        n = rnd.randrange(2, 4)
        frames = []
        for _ in range(n):
            ys = [[rnd.randrange(256) for _ in range(w)]
                  for _ in range(hgt)]
            cs = [[rnd.randrange(256) for _ in range(w // 2)]
                  for _ in range(hgt // 2)]
            frames.append((ys, cs, [row[:] for row in cs]))
        mvs = [(rnd.randrange(-8, 9), rnd.randrange(-8, 9))
               for _ in range(n - 1)]
        b, recons = h.encode_video_yuv(
            frames, qp=rnd.randrange(6, 31), mvs=mvs,
            mb_mode=rnd.choice(["p16", "p8x8"]))
        tb = h.transcode_to_cabac(b)
        w2, h2, out = h.decode_video_yuv(tb)
        assert out == recons, trial


def test_cabac_fixture_row_env_gated(tmp_path, monkeypatch):
    """The multimodal CABAC payload row appears only when the env
    table seam is set (workers re-import the module), and the added
    payload decodes back to the CAVLC original's picture."""
    import json

    from data_migration_etl_scripts_spark.operators import (
        multimodal as mm,
    )

    h.load_cavlc_tables(_synthetic_cavlc())
    monkeypatch.delenv(C._TABLES_ENV, raising=False)
    base = mm.synthetic_real_media_rows(include_mpeg=True)
    p = tmp_path / "cabac.json"
    p.write_text(json.dumps(_synth_cabac()))
    monkeypatch.setenv(C._TABLES_ENV, str(p))
    monkeypatch.setattr(C, "_env_load_done", False)
    rows = mm.synthetic_real_media_rows(include_mpeg=True)
    # the seam now gates TWO payload rows: the transcoded quantized
    # I picture (n+30) and the transcoded all-B_Skip clip (n+35, r11)
    assert len(rows) == len(base) + 2
    by_id = {r[0]: r for r in rows}
    mid, mtype, payload, _meta = by_id[12 + 30]
    assert mtype == "video"
    w, hh, frames = h.decode_video_yuv(bytes(payload))
    # same picture as the CAVLC quantized fixture row it transcodes
    assert h.decode_video_yuv(bytes(by_id[12 + 21][2]))[2] == frames
    # the CABAC-B clip: 3 frames, B_Skip recon == the I picture
    bid, btype, bpayload, _m = by_id[12 + 35]
    assert btype == "video"
    w, hh, bframes = h.decode_video_yuv(bytes(bpayload))
    assert len(bframes) == 3
    assert bframes[2] == bframes[0]
