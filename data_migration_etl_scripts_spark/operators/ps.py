"""HE-AAC v2 Parametric Stereo — staged r12 operating point.

Reference parity note: no codec surface exists in the reference ETL
repo; this serves the multimodal ingest path (low-bitrate crawled
audio is commonly HE-AAC v2).

Build-vs-seam split (ISO/IEC 14496-3 §8.6.4):

- **ps_data() bitstream** — structure: header persistence, IID/ICC
  mode -> parameter-count mapping, FIX/VAR envelope borders,
  freq- and time-differential index coding with per-grid clipping,
  the extension-block skip.
- **Seam data** (extends the SBR family,
  ``$SPARK_GRAFT_SBR_TABLES``): the six IID/ICC delta huffman books
  (``ps_huff``) and the IID/ICC quantization grids
  (``ps_iid_quant`` coarse 15 / fine 31 dB values,
  ``ps_icc_quant`` 8 correlations) — tabulated spec data.
- **Reconstruction — the staged boundary**: streams whose IID is
  CONSTANT across parameter bands within each envelope decode
  EXACTLY: uniform panning commutes with any filterbank, so the
  hybrid sub-band split (whose prototype filters are further seam
  data) is provably irrelevant, and the per-slot mixing follows the
  spec's linear interpolation between envelope borders. Per-band
  IID variation names the hybrid filterbank; any ICC content names
  the decorrelator. Both are the documented next boundaries.

The implemented mixing contract (pinned by energy tests): with
iid dB value v and c = 10^(v/20),
``c_l = sqrt(2) * c / sqrt(1 + c^2)``,
``c_r = sqrt(2) / sqrt(1 + c^2)`` —
so P_l/P_r = 10^(v/10) and P_l + P_r = 2 * P_mono (the same
factor-two convention as the SBR channel decoupling).
"""

from __future__ import annotations

import math

#: parameter-band count per iid/icc mode (modes 3..5 = fine IID)
_NR_PAR = (10, 20, 34, 10, 20, 34)
#: envelope count per (frame_class, num_env_idx)
_NUM_ENV = ((0, 1, 2, 4), (1, 2, 3, 4))


def _need_ps(kind: str):
    from data_migration_etl_scripts_spark.operators import sbr as sb

    val = sb.SBR.get(kind)
    if val is None:
        sb._try_env_tables()
        val = sb.SBR.get(kind)
    if val is None:
        raise NotImplementedError(
            f"Parametric Stereo table family {kind!r} is tabulated "
            "spec data — inject load_sbr_tables({'" + kind +
            "': ...}) or $SPARK_GRAFT_SBR_TABLES")
    return val


def _huff_read(r, books: dict, name: str) -> int:
    book = books.get(name)
    if book is None:
        raise NotImplementedError(
            f"PS huffman book {name!r} missing from the ps_huff "
            "seam family")
    code = ""
    for _ in range(24):
        code += str(r.u(1))
        if code in book:
            return book[code]
    raise ValueError(f"PS huffman desync in book {name}")


def parse_ps_data(r, prev: dict | None) -> dict:
    """One ps_data() payload -> {"config", "borders", "iid_idx"
    (list per envelope of per-band indices), "icc_idx", "consumed"}.
    ``prev`` carries the persisted header config and the previous
    frame's final indices for time-differential coding."""
    start = r.pos
    books = _need_ps("ps_huff")
    cfg = dict((prev or {}).get("config") or
               {"enable_iid": 0, "iid_mode": 0,
                "enable_icc": 0, "icc_mode": 0, "enable_ext": 0})
    if r.u(1):          # bs_enable_ps_header
        cfg["enable_iid"] = r.u(1)
        if cfg["enable_iid"]:
            cfg["iid_mode"] = r.u(3)
            if cfg["iid_mode"] > 5:
                raise ValueError(f"bs_iid_mode {cfg['iid_mode']}")
        cfg["enable_icc"] = r.u(1)
        if cfg["enable_icc"]:
            cfg["icc_mode"] = r.u(3)
            if cfg["icc_mode"] > 5:
                raise ValueError(f"bs_icc_mode {cfg['icc_mode']}")
        cfg["enable_ext"] = r.u(1)
    frame_class = r.u(1)
    num_env = _NUM_ENV[frame_class][r.u(2)]
    if frame_class:
        borders = [r.u(5) + 1 for _ in range(num_env)]
        if any(b > 32 for b in borders) or any(
                borders[i] >= borders[i + 1]
                for i in range(len(borders) - 1)):
            raise ValueError(f"PS envelope borders invalid {borders}")
    else:
        borders = [((e + 1) * 32) // max(1, num_env)
                   for e in range(num_env)]

    def read_param_set(kind: str, mode: int, prev_idx, clip_hi):
        nr = _NR_PAR[mode]
        fine = kind == "iid" and mode >= 3
        suffix = ("_fine" if fine else
                  "_coarse") if kind == "iid" else ""
        out = []
        last = prev_idx
        for _e in range(num_env):
            dt = r.u(1)
            vals = []
            if dt:
                base = last if last is not None else [0] * nr
                for i in range(nr):
                    b = base[i] if i < len(base) else 0
                    vals.append(b + _huff_read(
                        r, books, f"{kind}_t{suffix}"))
            else:
                acc = 0
                for _i in range(nr):
                    acc += _huff_read(r, books, f"{kind}_f{suffix}")
                    vals.append(acc)
            lo = -clip_hi if kind == "iid" else 0
            vals = [max(lo, min(clip_hi, v)) for v in vals]
            out.append(vals)
            last = vals
        return out

    iid_idx = []
    if cfg["enable_iid"]:
        hi = 15 if cfg["iid_mode"] >= 3 else 7
        iid_idx = read_param_set(
            "iid", cfg["iid_mode"],
            (prev or {}).get("iid_idx"), hi)
    icc_idx = []
    if cfg["enable_icc"]:
        icc_idx = read_param_set(
            "icc", cfg["icc_mode"],
            (prev or {}).get("icc_idx"), 7)
    if cfg["enable_ext"]:
        cnt = r.u(4)
        if cnt == 15:
            cnt += r.u(8)
        r.pos += 8 * cnt
    return {"config": cfg, "frame_class": frame_class,
            "num_env": num_env, "borders": borders,
            "iid_idx": iid_idx, "icc_idx": icc_idx,
            "consumed": r.pos - start}


def iid_scales(idx: int, fine: bool) -> tuple:
    """(c_l, c_r) from a (clipped) IID index through the seam
    quantization grid."""
    grids = _need_ps("ps_iid_quant")
    grid = grids["fine" if fine else "coarse"]
    off = (len(grid) - 1) // 2
    v = grid[idx + off]
    c = 10.0 ** (v / 20.0)
    den = math.sqrt(1.0 + c * c)
    return math.sqrt(2.0) * c / den, math.sqrt(2.0) / den


def frame_slot_scales(ps: dict, prev_scale) -> tuple:
    """Per-QMF-slot (c_l, c_r) for one 32-slot frame with the spec's
    linear interpolation from the previous applied value to each
    envelope's target at its border. Returns (scales, final_pair).

    Staged-boundary guards: per-band IID variation inside an
    envelope raises (hybrid filterbank scope); any ICC content
    raises (decorrelator scope)."""
    cfg = ps["config"]
    if ps["icc_idx"] and any(any(v != 0 for v in env)
                             for env in ps["icc_idx"]):
        raise NotImplementedError(
            "PS ICC (inter-channel coherence) needs the allpass "
            "decorrelator — IID-only streams decode")
    prev = prev_scale or (1.0, 1.0)
    scales = [None] * 32
    if not cfg["enable_iid"] or ps["num_env"] == 0:
        return [prev] * 32, prev
    fine = cfg["iid_mode"] >= 3
    b0 = 0
    for e in range(ps["num_env"]):
        env = ps["iid_idx"][e]
        if any(v != env[0] for v in env):
            raise NotImplementedError(
                "per-parameter-band IID needs the hybrid "
                "filterbank (seam prototype filters) — "
                "constant-IID envelopes decode exactly")
        target = iid_scales(env[0], fine)
        b1 = ps["borders"][e]
        n = max(1, b1 - b0)
        for t in range(b0, min(b1, 32)):
            f = (t - b0 + 1) / n
            scales[t] = (prev[0] + (target[0] - prev[0]) * f,
                         prev[1] + (target[1] - prev[1]) * f)
        prev = target
        b0 = b1
    for t in range(b0, 32):    # borders ending early: hold
        scales[t] = prev
    return scales, prev
