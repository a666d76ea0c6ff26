"""H.264/AVC CABAC entropy layer (ISO/IEC 14496-10 clause 9.3) —
the arithmetic decoding/encoding engines, context initialization,
binarizations, and per-syntax-element context-index derivations used
by ``operators/h264.py`` when a PPS signals
entropy_coding_mode_flag = 1 (Main/High-profile streams, i.e. most
real crawled video).

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (frame extraction over
binary video columns). Scope: frame macroblocks, I/P/B slices (B
r11), CAVLC-equivalent syntax surface.

Build-vs-seam split (the repo's standing codec policy):

STRUCTURAL (formula-level, built here):
  - the binary arithmetic decoder (9.3.3.2): 9-bit offset init,
    LPS subdivision, MPS/LPS state transitions, renormalization,
    bypass, and terminate decoding
  - the encoder mirror (9.3.4): low/range subdivision, PutBit with
    outstanding-bit resolution and the first-bit discard, bypass,
    terminate, flush. The first-bit discard makes the decoder's
    bit position after a terminate==1 EXACTLY the encoder's
    post-flush position (consumed = 9 + renorms = emitted), which is
    what lets I_PCM byte realignment and end_of_slice trailing
    data line up bit-exactly — an accounting identity of the spec's
    procedures, verified by the engine round-trip tests
  - context-state initialization from (m, n) pairs:
    preCtxState = Clip3(1, 126, ((m * Clip3(0, 51, SliceQPY)) >> 4)
    + n), split at 64 into (pStateIdx, valMPS)
  - binarizations: U, TU, FL (LSB-first), UEG0 (uCoff 14) for
    residual levels, UEG3 (uCoff 9, signed) for mvd
  - per-element context index derivations (Table 9-39 structure +
    clause 9.3.3.1.x neighbor rules) for the I/P/B syntax surface:
    mb_skip_flag (P offset 11, B offset 24), mb_type (I tree, P
    prefix + intra suffix, and the r11 B tree: Table 9-37 group
    binarization at 27..32 with the intra suffix at 32..35),
    sub_mb_type (P 21..23; B Table 9-38 at 36..39), per-LIST
    ref_idx/mvd (separate list-0/list-1 neighbor grids; direct and
    skip regions contribute no refs/mvds per the 9.3.3.1.1.6/7 skip
    rules), intra pred modes, intra_chroma_pred_mode,
    coded_block_pattern, mb_qp_delta, coded_block_flag,
    significant/last maps, levels, end_of_slice. B slices need no
    new seam data: cabac_init_idc selects the same P0/P1/P2 init
    columns for P and B (9.3.1.1). CONFORMANCE STANDING (r11): the arithmetic engine
    and the I/P ctxIdx surface are pinned against NON-engine-derived
    expectations in tests/test_h264_cabac_conformance.py — hand-traced
    9.3.3.2 state evolution over hand-written bit vectors, plus
    hand-derived clause-9.3.3.1 context walks asserted through a
    trace hook on both coder sides (this caught and fixed the P
    mb_type binIdx-2 dual-context bug round trips could never see).
    Residual caveat: decoding a REAL foreign Main-profile stream
    additionally needs the genuine Annex-B tables; the env-gated
    foreign-fixture harness ($SPARK_GRAFT_CABAC_FIXTURE) pins that
    end-to-end once real data is injected.

ANNEX-B SEAM DATA (tabulated, injected — never recalled):
  - rangeTabLPS (64 states x 4 range quarters, Table 9-44)
  - transIdxLPS (64 states, Table 9-45); transIdxMPS is the formula
    s -> min(s + 1, 62) with 63 fixed
  - the context-initialization (m, n) tables (Tables 9-12..9-33):
    one full vector per slice class — key "I" for I slices and
    "P0"/"P1"/"P2" for P slices by cabac_init_idc
  Loader: :func:`load_cabac_tables` or the
  ``$SPARK_GRAFT_CABAC_TABLES`` JSON env seam. Engine round trips
  inject ANY valid tables (tests use synthetic ones): the arithmetic
  identities hold for all rangeTabLPS in [1, 255], so correctness of
  the structure is pinned table-free; the real Annex-B values matter
  only for foreign streams.
"""

from __future__ import annotations

import json
import os

__all__ = ["load_cabac_tables", "CABAC"]

_TABLES_ENV = "SPARK_GRAFT_CABAC_TABLES"
_env_load_done = False

#: CABAC seam storage: "range_lps" = 64x4 ints, "trans_lps" = 64 ints,
#: "init" = {"I"/"P0"/"P1"/"P2": [[m, n] x >=277]} (>= 436 pairs to
#: cover the High-profile 8x8 contexts), "sig8x8_map"/"last8x8_map" =
#: the 63-entry Table 9-43 position->ctxIdxInc mappings (r12)
CABAC: dict[str, object] = {"range_lps": None, "trans_lps": None,
                            "init": {}, "sig8x8_map": None,
                            "last8x8_map": None}


def load_cabac_tables(source) -> int:
    """Inject CABAC seam tables (dict, JSON string, or path). Returns
    the number of table families loaded. Keys:

    - ``"range_lps"``: 64 rows of 4 ints in [1, 255] (Table 9-44)
    - ``"trans_lps"``: 64 ints in [0, 62] (Table 9-45)
    - ``"init"``: mapping of slice-class key (``"I"``, ``"P0"``,
      ``"P1"``, ``"P2"``) to >= 277 ``[m, n]`` pairs indexed by
      ctxIdx (Tables 9-12..9-33 flattened per class)
    """
    if isinstance(source, (str, bytes)):
        s = source.decode() if isinstance(source, bytes) else source
        if "{" not in s:
            with open(s, "rb") as f:
                source = json.load(f)
        else:
            source = json.loads(s)
    if not isinstance(source, dict):
        raise ValueError("CABAC table source must be a dict/JSON")
    loaded = 0
    rl = source.get("range_lps")
    if rl is not None:
        if len(rl) != 64 or any(len(row) != 4 for row in rl):
            raise ValueError("range_lps must be 64 rows of 4 values")
        rows = [[int(v) for v in row] for row in rl]
        if any(not 1 <= v <= 255 for row in rows for v in row):
            raise ValueError("range_lps values must be in [1, 255]")
        CABAC["range_lps"] = rows
        loaded += 1
    tl = source.get("trans_lps")
    if tl is not None:
        if len(tl) != 64:
            raise ValueError("trans_lps must be 64 values")
        vals = [int(v) for v in tl]
        if any(not 0 <= v <= 63 for v in vals):
            raise ValueError("trans_lps values must be in [0, 63]")
        CABAC["trans_lps"] = vals
        loaded += 1
    init = source.get("init")
    if init is not None:
        for key, pairs in init.items():
            if key not in ("I", "P0", "P1", "P2"):
                raise ValueError(f"init key {key!r} not one of "
                                 "I/P0/P1/P2")
            if len(pairs) < 277:
                raise ValueError(
                    f"init[{key!r}] must cover ctxIdx 0..276 "
                    f"(got {len(pairs)} pairs)")
            CABAC["init"][key] = [(int(m), int(n)) for m, n in pairs]
        loaded += 1
    for name, hi in (("sig8x8_map", 14), ("last8x8_map", 8)):
        vals = source.get(name)
        if vals is not None:
            if len(vals) != 63 or any(not 0 <= int(v) <= hi
                                      for v in vals):
                raise ValueError(
                    f"{name} must be 63 ctxIdxInc values in "
                    f"[0, {hi}] (Table 9-43, frame coding)")
            CABAC[name] = [int(v) for v in vals]
            loaded += 1
    return loaded


def _try_env_tables() -> bool:
    global _env_load_done
    if _env_load_done:
        return False
    _env_load_done = True
    src = os.environ.get(_TABLES_ENV)
    if not src:
        return False
    try:
        load_cabac_tables(src)
        return True
    except (OSError, ValueError, json.JSONDecodeError):
        return False


def _need(kind: str):
    t = CABAC.get(kind) if kind != "init" else CABAC["init"]
    if not t and _try_env_tables():
        t = CABAC.get(kind) if kind != "init" else CABAC["init"]
    if not t:
        raise NotImplementedError(
            f"CABAC {kind} tables are Annex-B data — "
            "load_cabac_tables({...}) or $SPARK_GRAFT_CABAC_TABLES "
            "injects them (module docstring seam note)"
        )
    return t


def seam_available() -> bool:
    """True when all three CABAC table families are loaded (or load
    from the env seam). Gates the CABAC fixture row in
    operators/multimodal.py: Spark workers re-import this module, so
    a worker-decodable CABAC payload requires the env seam."""
    if not (CABAC["range_lps"] and CABAC["trans_lps"] and CABAC["init"]):
        _try_env_tables()
    return bool(CABAC["range_lps"] and CABAC["trans_lps"]
                and CABAC["init"])


def init_ctx_states(slice_qp: int, slice_key: str) -> list:
    """ctxIdx -> mutable [pStateIdx, valMPS] from the injected (m, n)
    init pairs (9.3.1.1): preCtxState = Clip3(1, 126,
    ((m * Clip3(0, 51, SliceQPY)) >> 4) + n)."""
    init = _need("init")
    pairs = init.get(slice_key)
    if pairs is None:
        raise NotImplementedError(
            f"CABAC init table for slice class {slice_key!r} not "
            "loaded — inject it via load_cabac_tables"
        )
    qp = max(0, min(51, slice_qp))
    states = []
    for m, n in pairs:
        pre = max(1, min(126, ((m * qp) >> 4) + n))
        if pre <= 63:
            states.append([63 - pre, 0])
        else:
            states.append([pre - 64, 1])
    return states


# ------------------------------------------------ arithmetic engines


class CabacDecoder:
    """9.3.3.2 binary arithmetic decoder over a bit-read callable."""

    def __init__(self, read_bit) -> None:
        self.rb = read_bit
        self.range_lps = _need("range_lps")
        self.trans_lps = _need("trans_lps")
        self.init_engine()

    def init_engine(self) -> None:
        self.rng = 510
        off = 0
        for _ in range(9):
            off = (off << 1) | self.rb()
        self.off = off

    def decision(self, st: list) -> int:
        lps = self.range_lps[st[0]][(self.rng >> 6) & 3]
        self.rng -= lps
        if self.off >= self.rng:
            bit = 1 - st[1]
            self.off -= self.rng
            self.rng = lps
            if st[0] == 0:
                st[1] = 1 - st[1]
            st[0] = self.trans_lps[st[0]]
        else:
            bit = st[1]
            if st[0] < 62:
                st[0] += 1
        while self.rng < 256:
            self.rng <<= 1
            self.off = (self.off << 1) | self.rb()
        return bit

    def bypass(self) -> int:
        self.off = (self.off << 1) | self.rb()
        if self.off >= self.rng:
            self.off -= self.rng
            return 1
        return 0

    def terminate(self) -> int:
        self.rng -= 2
        if self.off >= self.rng:
            return 1
        while self.rng < 256:
            self.rng <<= 1
            self.off = (self.off << 1) | self.rb()
        return 0


class CabacEncoder:
    """9.3.4 binary arithmetic encoder over a bit-write callable.
    Implements the first-bit discard and outstanding-bit resolution,
    which make total emitted bits equal the decoder's consumption at
    every terminate — the property the engine round trips pin."""

    def __init__(self, write_bit) -> None:
        self.wb = write_bit
        self.range_lps = _need("range_lps")
        self.trans_lps = _need("trans_lps")
        self.init_engine()

    def init_engine(self) -> None:
        self.low = 0
        self.rng = 510
        self.outstanding = 0
        self.first = True

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.wb(b)
        while self.outstanding:
            self.wb(1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.rng < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.rng <<= 1
            self.low <<= 1

    def decision(self, st: list, bit: int) -> int:
        lps = self.range_lps[st[0]][(self.rng >> 6) & 3]
        self.rng -= lps
        if bit != st[1]:
            self.low += self.rng
            self.rng = lps
            if st[0] == 0:
                st[1] = 1 - st[1]
            st[0] = self.trans_lps[st[0]]
        elif st[0] < 62:
            st[0] += 1
        self._renorm()
        return bit

    def bypass(self, bit: int) -> int:
        self.low <<= 1
        if bit:
            self.low += self.rng
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512
        return bit

    def terminate(self, bit: int) -> int:
        self.rng -= 2
        if bit:
            self.low += self.rng
            self._flush()
        else:
            self._renorm()
        return bit

    def _flush(self) -> None:
        self.rng = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.wb((self.low >> 8) & 1)
        self.wb(1)


# ------------------------------------------------ neighbor ctx model

#: significance-map context offsets per ctxBlockCat (frame coding)
_SIGOFF = {0: 0, 1: 15, 2: 29, 3: 44, 4: 47}
#: coeff_abs_level_minus1 context offsets per ctxBlockCat; cat 5
#: (8x8 luma, High) sits at ctxIdxOffset 426 = 227 + 199
_LEVOFF = {0: 0, 1: 10, 2: 20, 3: 30, 4: 39, 5: 199}


def _need_8x8(states: list):
    """The cat-5 surfaces are seam-gated twice: Table 9-43 position
    maps AND init pairs covering ctxIdx 0..435."""
    smap = CABAC.get("sig8x8_map")
    lmap = CABAC.get("last8x8_map")
    if smap is None or lmap is None:
        _try_env_tables()
        smap = CABAC.get("sig8x8_map")
        lmap = CABAC.get("last8x8_map")
    if smap is None or lmap is None:
        raise NotImplementedError(
            "8x8 CABAC significance maps (Table 9-43) are tabulated "
            "spec data — inject load_cabac_tables({'sig8x8_map': "
            "[...63], 'last8x8_map': [...63]}) or "
            "$SPARK_GRAFT_CABAC_TABLES")
    if len(states) < 436:
        raise NotImplementedError(
            "8x8 CABAC contexts (transform_size_8x8_flag 399..401, "
            "sig/last 402..425, abs 426..435) need init pairs "
            "covering ctxIdx 0..435 — the loaded init table stops "
            f"at {len(states) - 1}")
    return smap, lmap


class MbState:
    """Per-picture neighbor state the context derivations read:
    per-MB info dicts plus 4x4-granular cbf / |mvd| / ref grids.
    Shared by the decoder adapter and the slice writer so both sides
    derive every ctxIdx from the same data."""

    def __init__(self, wm: int, hm: int, avail) -> None:
        self.wm, self.hm = wm, hm
        self.avail = avail      # (mbx, mby) -> bool, same-slice rule
        self.info = [[None] * wm for _ in range(hm)]
        self.cbf_l = [[0] * (4 * wm) for _ in range(4 * hm)]
        self.cbf_c = ([[0] * (2 * wm) for _ in range(2 * hm)],
                      [[0] * (2 * wm) for _ in range(2 * hm)])
        #: per-list |mvd| and decoded-ref grids (index = list); B
        #: slices (r11) derive ref_idx/mvd contexts per list — blocks
        #: a list does not predict from stay at the defaults (ref
        #: None, mvd 0), which is also how direct/skip regions
        #: contribute (they carry no mvd and their derived refs are
        #: excluded per the 9.3.3.1.1.6 skip rule)
        self.mvd = ([[(0, 0)] * (4 * wm) for _ in range(4 * hm)],
                    [[(0, 0)] * (4 * wm) for _ in range(4 * hm)])
        self.ref = ([[None] * (4 * wm) for _ in range(4 * hm)],
                    [[None] * (4 * wm) for _ in range(4 * hm)])
        self.prev_qpd_nz = False    # per-slice; reset by slice_start

    def slice_start(self) -> None:
        self.prev_qpd_nz = False

    def mbinfo(self, mbx: int, mby: int):
        if 0 <= mbx < self.wm and 0 <= mby < self.hm \
                and self.avail(mbx, mby):
            return self.info[mby][mbx]
        return None

    def note_skip(self, mbx: int, mby: int) -> None:
        self.info[mby][mbx] = {"skip": True, "intra": False,
                               "inxn": False, "ipcm": False,
                               "i16": False, "cbp": 0, "cmode": 0,
                               "ldc": 0, "cdc": [0, 0],
                               "bdirect": True}
        for by in range(4 * mby, 4 * mby + 4):
            for bx in range(4 * mbx, 4 * mbx + 4):
                for lst in (0, 1):
                    self.ref[lst][by][bx] = 0
                    self.mvd[lst][by][bx] = (0, 0)
        self.prev_qpd_nz = False

    def note_mb(self, mbx: int, mby: int, *, intra: bool, inxn: bool,
                ipcm: bool, i16: bool, cbp: int, cmode: int,
                ldc: int, cdc, bdirect: bool = False,
                t8: bool = False) -> None:
        if ipcm:
            cbp, ldc, cdc = 0x2F, 1, [1, 1]
            for by in range(4 * mby, 4 * mby + 4):
                for bx in range(4 * mbx, 4 * mbx + 4):
                    self.cbf_l[by][bx] = 1
            for grid in self.cbf_c:
                for by in range(2 * mby, 2 * mby + 2):
                    for bx in range(2 * mbx, 2 * mbx + 2):
                        grid[by][bx] = 1
            self.prev_qpd_nz = False
        if intra:
            for by in range(4 * mby, 4 * mby + 4):
                for bx in range(4 * mbx, 4 * mbx + 4):
                    for lst in (0, 1):
                        self.ref[lst][by][bx] = None
                        self.mvd[lst][by][bx] = (0, 0)
        self.info[mby][mbx] = {"skip": False, "intra": intra,
                               "inxn": inxn, "ipcm": ipcm,
                               "i16": i16, "cbp": cbp,
                               "cmode": cmode, "ldc": ldc,
                               "cdc": list(cdc), "bdirect": bdirect,
                               "t8": t8}

    def note_mvd(self, mbx, mby, px, py, pw, ph, ax, ay,
                 lst: int = 0) -> None:
        for by in range((16 * mby + py) // 4,
                        (16 * mby + py + ph) // 4):
            for bx in range((16 * mbx + px) // 4,
                            (16 * mbx + px + pw) // 4):
                self.mvd[lst][by][bx] = (ax, ay)

    def note_ref(self, mbx, mby, px, py, pw, ph, ref,
                 lst: int = 0) -> None:
        for by in range((16 * mby + py) // 4,
                        (16 * mby + py + ph) // 4):
            for bx in range((16 * mbx + px) // 4,
                            (16 * mbx + px + pw) // 4):
                self.ref[lst][by][bx] = ref


class CabacSyntax:
    """Syntax-element coder: read_* methods parse via a CabacDecoder,
    write_* methods emit via a CabacEncoder — both walk the same
    binarization trees and derive every ctxIdx through the shared
    MbState, so encode -> decode is bit-exact by construction."""

    def __init__(self, engine, states: list, model: MbState,
                 decoding: bool) -> None:
        self.eng = engine
        self.st = states
        self.m = model
        self.dec = decoding
        #: optional conformance trace: when set to a list, every
        #: context-coded bin appends its ctxIdx, every bypass bin
        #: appends "bp", every terminate appends 276 — the hook the
        #: hand-derived clause-9.3.3.1 walk tests pin against
        self.trace = None
        self.cur_intra = False     # set once the MB's mb_type is known
        #: the MB being coded: its own earlier blocks/partitions ARE
        #: neighbor-visible (grids carry them) even though its info
        #: dict is only written at MB end
        self.cur_mb = (-1, -1)

    def start_mb(self, mbx: int, mby: int) -> None:
        self.cur_mb = (mbx, mby)

    # --------------------------------------------------- primitives

    def _bit(self, ctx: int, val=None) -> int:
        if self.trace is not None:
            self.trace.append(ctx)
        if self.dec:
            return self.eng.decision(self.st[ctx])
        return self.eng.decision(self.st[ctx], val)

    def _bp(self, val=None) -> int:
        if self.trace is not None:
            self.trace.append("bp")
        if self.dec:
            return self.eng.bypass()
        return self.eng.bypass(val)

    def _term(self, val=None) -> int:
        if self.trace is not None:
            self.trace.append(276)
        if self.dec:
            return self.eng.terminate()
        return self.eng.terminate(val)

    def _unary(self, ctx_of, val=None, cmax: int | None = None) -> int:
        """U / TU binarization with per-bin-index contexts. With
        ``cmax``, the terminating 0 is omitted at cmax (TU)."""
        if self.dec:
            k = 0
            while cmax is None or k < cmax:
                if not self._bit(ctx_of(k)):
                    break
                k += 1
                if k > 4096:
                    raise ValueError("CABAC unary run too long")
            return k
        for i in range(val):
            self._bit(ctx_of(i), 1)
        if cmax is None or val < cmax:
            self._bit(ctx_of(val), 0)
        return val

    def _egk(self, k: int, val=None) -> int:
        """Exp-Golomb order-k suffix, all bypass (9.3.2.3)."""
        if self.dec:
            v = 0
            while self._bp():
                v += 1 << k
                k += 1
                if k > 40:
                    raise ValueError("CABAC EGk suffix overlong")
            mag = 0
            for _ in range(k):     # k magnitude bits, MSB first
                mag = (mag << 1) | self._bp()
            return v + mag
        s = val
        while s >= (1 << k):
            self._bp(1)
            s -= 1 << k
            k += 1
        self._bp(0)
        for i in range(k - 1, -1, -1):
            self._bp((s >> i) & 1)
        return val

    # --------------------------------------------- macroblock level

    def mb_skip(self, mbx: int, mby: int, val=None,
                is_b: bool = False) -> int:
        """mb_skip_flag: ctxIdxOffset 11 for P, 24 for B (Table 9-34);
        the increment counts available non-skipped neighbors either
        way (9.3.3.1.1.1)."""
        inc = 0
        for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
            ninf = self.m.mbinfo(nx, ny)
            if ninf is not None and not ninf["skip"]:
                inc += 1
        return self._bit((24 if is_b else 11) + inc, val)

    def end_of_slice(self, val=None) -> int:
        return self._term(val)

    def _i16_fields(self, base_luma: int, ctx_b4, ctx_b5, ctx_b6,
                    mb16=None):
        """Shared I_16x16 field bins after the terminate bin: cbp_luma
        flag, cbp_chroma (0/10/11), 2 pred-mode bins. ``mb16`` is the
        1..24 value when writing; returns the 1..24 value."""
        if mb16 is not None:
            mm = mb16 - 1
            pred = mm % 4
            rest = mm // 4
            chroma = rest % 3
            luma = 1 if rest >= 3 else 0
            self._bit(base_luma, luma)
            if chroma:
                self._bit(ctx_b4[0], 1)
                self._bit(ctx_b4[1], chroma - 1)
                self._bit(ctx_b5[1], (pred >> 1) & 1)
                self._bit(ctx_b6, pred & 1)
            else:
                self._bit(ctx_b4[0], 0)
                self._bit(ctx_b5[0], (pred >> 1) & 1)
                self._bit(ctx_b6, pred & 1)
            return mb16
        luma = self._bit(base_luma)
        if self._bit(ctx_b4[0]):
            chroma = 1 + self._bit(ctx_b4[1])
            pred = (self._bit(ctx_b5[1]) << 1) | self._bit(ctx_b6)
        else:
            chroma = 0
            pred = (self._bit(ctx_b5[0]) << 1) | self._bit(ctx_b6)
        return 1 + pred + 4 * chroma + 12 * luma

    def mb_type_i(self, mbx: int, mby: int, val=None) -> int:
        """I-slice mb_type (0 = I_NxN, 1..24 = I_16x16, 25 = I_PCM).
        Returns the value; on the write side the I_PCM terminate(1)
        FLUSHES the engine (the caller then writes aligned pcm bytes
        and re-inits both sides)."""
        inc = 0
        for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
            ninf = self.m.mbinfo(nx, ny)
            if ninf is not None and not ninf["inxn"]:
                inc += 1
        if val is not None:
            if val == 0:
                self._bit(3 + inc, 0)
                return 0
            self._bit(3 + inc, 1)
            if val == 25:
                self._term(1)
                return 25
            self._term(0)
            return self._i16_fields(6, (7, 8), (9, 9), 10, val)
        if not self._bit(3 + inc):
            return 0
        if self._term():
            return 25
        return self._i16_fields(6, (7, 8), (9, 9), 10)

    def mb_type_p(self, val=None) -> int:
        """P-slice mb_type in the decoder's unified numbering:
        0..3 = P_L0_16x16 / 16x8 / 8x16 / P_8x8; 5 + i = intra type i
        (P_8x8ref0 has no CABAC binarization — callers recode it as
        P_8x8 with explicit zero refs)."""
        if val is not None:
            if val >= 5:
                self._bit(14, 1)
                iv = val - 5
                if iv == 0:
                    self._bit(17, 0)
                    return val
                self._bit(17, 1)
                if iv == 25:
                    self._term(1)
                    return val
                self._term(0)
                self._i16_fields(18, (19, 19), (20, 20), 20, iv)
                return val
            self._bit(14, 0)
            b1 = 1 if val in (1, 2) else 0
            self._bit(15, b1)
            b2 = {0: 0, 3: 1, 1: 1, 2: 0}[val]
            # Table 9-39 binIdx 2 carries the dual inc "2, 3": the
            # {16x16, 8x8} branch (b1=0) uses ctxIdx 16, the
            # {16x8, 8x16} branch (b1=1) uses 17 — r11 conformance
            # fix; both engine sides previously used 16 for both
            # branches, invisible to round trips by construction
            self._bit(17 if b1 else 16, b2)
            return val
        if self._bit(14):
            if not self._bit(17):
                return 5
            if self._term():
                return 30
            return 5 + self._i16_fields(18, (19, 19), (20, 20), 20)
        if self._bit(15):
            return 1 if self._bit(17) else 2
        return 3 if self._bit(16) else 0

    def sub_mb_type(self, val=None) -> int:
        if val is not None:
            if val == 0:
                self._bit(21, 1)
            elif val == 1:
                self._bit(21, 0)
                self._bit(22, 0)
            else:
                self._bit(21, 0)
                self._bit(22, 1)
                self._bit(23, 1 if val == 2 else 0)
            return val
        if self._bit(21):
            return 0
        if not self._bit(22):
            return 1
        return 2 if self._bit(23) else 3

    # ------------------------------------------------- B slices (r11)

    def mb_type_b(self, mbx: int, mby: int, val=None) -> int:
        """B-slice mb_type in the decoder's unified numbering
        (0 = B_Direct_16x16, 1..21 = the Table 7-14 shapes, 22 =
        B_8x8, 23 + i = intra type i). Binarization per Table 9-37:
        '0' = direct; '10x' = L0/L1 16x16; '11' + a 4-bit group where
        values 0..7 map to mb_type 3..10, 13 opens the intra suffix
        (ctxIdxOffset 32), 14 = B_L1_L0_8x16, 15 = B_8x8, and 8..12
        take a fifth bit for mb_type 12..21. ctxIdx: bin0 27 + inc
        (neighbor counts exclude B_Skip/B_Direct per 9.3.3.1.1.3),
        bin1 30, first group bit 31, every later bin 32."""
        inc = 0
        for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
            ninf = self.m.mbinfo(nx, ny)
            if ninf is not None and not ninf.get("bdirect"):
                inc += 1
        if val is not None:
            if val == 0:
                self._bit(27 + inc, 0)
                return val
            self._bit(27 + inc, 1)
            if val in (1, 2):
                self._bit(30, 0)
                self._bit(32, val - 1)
                return val
            self._bit(30, 1)
            if val >= 23:
                group, tail = 13, None
            elif 3 <= val <= 10:
                group, tail = val - 3, None
            elif val == 11:
                group, tail = 14, None
            elif val == 22:
                group, tail = 15, None
            else:               # 12..21: five-bit form
                full = val + 4
                group, tail = full >> 1, full & 1
            self._bit(31, (group >> 3) & 1)
            self._bit(32, (group >> 2) & 1)
            self._bit(32, (group >> 1) & 1)
            self._bit(32, group & 1)
            if tail is not None:
                self._bit(32, tail)
            if val >= 23:
                iv = val - 23
                if iv == 0:
                    self._bit(32, 0)
                    return val
                self._bit(32, 1)
                if iv == 25:
                    self._term(1)
                    return val
                self._term(0)
                self._i16_fields(33, (34, 34), (35, 35), 35, iv)
            return val
        if not self._bit(27 + inc):
            return 0
        if not self._bit(30):
            return 1 + self._bit(32)
        group = ((self._bit(31) << 3) | (self._bit(32) << 2)
                 | (self._bit(32) << 1) | self._bit(32))
        if group < 8:
            return group + 3
        if group == 13:
            if not self._bit(32):
                return 23
            if self._term():
                return 48      # 23 + I_PCM
            return 23 + self._i16_fields(33, (34, 34), (35, 35), 35)
        if group == 14:
            return 11
        if group == 15:
            return 22
        return ((group << 1) | self._bit(32)) - 4

    def sub_mb_type_b(self, val=None) -> int:
        """B sub_mb_type (Table 9-38 binarization; spec Table 7-18
        numbering, 0 = B_Direct_8x8 .. 12 = B_Bi_4x4). ctxIdx: bins
        0..2 at 36/37/38, every later bin 39."""
        if val is not None:
            if val == 0:
                self._bit(36, 0)
            elif val in (1, 2):
                self._bit(36, 1)
                self._bit(37, 0)
                self._bit(39, val - 1)
            elif val <= 6:
                self._bit(36, 1)
                self._bit(37, 1)
                self._bit(38, 0)
                self._bit(39, (val - 3) >> 1)
                self._bit(39, (val - 3) & 1)
            elif val <= 10:
                self._bit(36, 1)
                self._bit(37, 1)
                self._bit(38, 1)
                self._bit(39, 0)
                self._bit(39, (val - 7) >> 1)
                self._bit(39, (val - 7) & 1)
            else:
                self._bit(36, 1)
                self._bit(37, 1)
                self._bit(38, 1)
                self._bit(39, 1)
                self._bit(39, val - 11)
            return val
        if not self._bit(36):
            return 0
        if not self._bit(37):
            return 1 + self._bit(39)
        t = 3
        if self._bit(38):
            if self._bit(39):
                return 11 + self._bit(39)
            t += 4
        t += self._bit(39) << 1
        t += self._bit(39)
        return t

    # ------------------------------------------------- inter fields

    def ref_idx(self, mbx, mby, px, py, pw, ph, val=None,
                lst: int = 0) -> int:
        bx0 = (16 * mbx + px) // 4
        by0 = (16 * mby + py) // 4
        inc = 0
        for w, (nbx, nby) in ((1, (bx0 - 1, by0)), (2, (bx0, by0 - 1))):
            if nbx < 0 or nby < 0:
                continue
            if (nbx // 4, nby // 4) != self.cur_mb:
                ninf = self.m.mbinfo(nbx // 4, nby // 4)
                if ninf is None or ninf["skip"] or ninf["intra"]:
                    continue
            rv = self.m.ref[lst][nby][nbx]
            if rv is not None and rv > 0:
                inc += w
        ctx_of = lambda i: (54 + inc) if i == 0 else (58 if i == 1
                                                      else 59)
        ref = self._unary(ctx_of, val)
        self.m.note_ref(mbx, mby, px, py, pw, ph, ref, lst)
        return ref

    def _mvd_comp(self, base: int, inc: int, val=None) -> int:
        ctx_of = lambda i: base + (inc if i == 0
                                   else (2 + i if i < 4 else 6))
        if val is None:
            pre = self._unary(ctx_of, cmax=9)
            mag = 9 + self._egk(3) if pre == 9 else pre
            if mag == 0:
                return 0
            return -mag if self._bp() else mag
        mag = abs(val)
        self._unary(ctx_of, min(mag, 9), cmax=9)
        if mag >= 9:
            self._egk(3, mag - 9)
        if mag:
            self._bp(1 if val < 0 else 0)
        return val

    def mvd_pair(self, mbx, mby, px, py, pw, ph, val=None,
                 lst: int = 0):
        bx0 = (16 * mbx + px) // 4
        by0 = (16 * mby + py) // 4
        out = []
        for comp, base in ((0, 40), (1, 47)):
            s = 0
            for nbx, nby in ((bx0 - 1, by0), (bx0, by0 - 1)):
                if nbx < 0 or nby < 0:
                    continue
                if (nbx // 4, nby // 4) != self.cur_mb:
                    ninf = self.m.mbinfo(nbx // 4, nby // 4)
                    if ninf is None or ninf["intra"]:
                        continue
                s += self.m.mvd[lst][nby][nbx][comp]
            inc = 0 if s < 3 else (1 if s <= 32 else 2)
            out.append(self._mvd_comp(base, inc,
                                      None if val is None
                                      else val[comp]))
        self.m.note_mvd(mbx, mby, px, py, pw, ph,
                        abs(out[0]), abs(out[1]), lst)
        return tuple(out)

    # ------------------------------------------------- intra fields

    def i4_mode(self, val=None):
        """(prev_flag, rem3 | None) — ctx 68 / 69, FL LSB-first."""
        if val is not None:
            flag, rem = val
            self._bit(68, flag)
            if not flag:
                for i in range(3):
                    self._bit(69, (rem >> i) & 1)
            return val
        if self._bit(68):
            return (1, None)
        rem = 0
        for i in range(3):
            rem |= self._bit(69) << i
        return (0, rem)

    def intra_chroma_mode(self, mbx, mby, val=None) -> int:
        inc = 0
        for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
            ninf = self.m.mbinfo(nx, ny)
            if (ninf is not None and ninf["intra"]
                    and not ninf["ipcm"] and ninf["cmode"] != 0):
                inc += 1
        ctx_of = lambda i: (64 + inc) if i == 0 else 67
        return self._unary(ctx_of, val, cmax=3)

    # ---------------------------------------------------------- cbp

    def cbp(self, mbx, mby, val=None) -> int:
        """Full coded_block_pattern (luma | chroma << 4)."""
        def luma_flag(nx, ny, blk8):
            ninf = self.m.mbinfo(nx, ny)
            if ninf is None:
                return 0        # unavailable counts as coded
            if ninf["skip"]:
                return 1
            return 0 if (ninf["cbp"] >> blk8) & 1 else 1

        luma = 0
        for i in range(4):
            ix, iy = i % 2, i // 2
            if ix:
                a = 0 if (luma >> (i - 1)) & 1 else 1
            else:
                a = luma_flag(mbx - 1, mby, i + 1)
            if iy:
                b = 0 if (luma >> (i - 2)) & 1 else 1
            else:
                b = luma_flag(mbx, mby - 1, i + 2)
            bit = self._bit(73 + a + 2 * b,
                            None if val is None else (val >> i) & 1)
            luma |= bit << i

        def chroma_flag(nx, ny, two):
            ninf = self.m.mbinfo(nx, ny)
            if ninf is None or ninf["skip"]:
                return 0
            cc = ninf["cbp"] >> 4
            return 1 if (cc == 2 if two else cc != 0) else 0

        inc0 = (chroma_flag(mbx - 1, mby, False)
                + 2 * chroma_flag(mbx, mby - 1, False))
        b0 = self._bit(77 + inc0,
                       None if val is None else (1 if val >> 4 else 0))
        chroma = 0
        if b0:
            inc1 = (chroma_flag(mbx - 1, mby, True)
                    + 2 * chroma_flag(mbx, mby - 1, True))
            b1 = self._bit(81 + inc1,
                           None if val is None
                           else (1 if (val >> 4) == 2 else 0))
            chroma = 2 if b1 else 1
        return luma | (chroma << 4)

    def qp_delta(self, val=None) -> int:
        ctx_of = lambda i: ((60 + (1 if self.m.prev_qpd_nz else 0))
                            if i == 0 else (62 if i == 1 else 63))
        if val is not None:
            mapped = 2 * val - 1 if val > 0 else -2 * val
            self._unary(ctx_of, mapped)
            self.m.prev_qpd_nz = val != 0
            return val
        k = self._unary(ctx_of)
        v = (k + 1) // 2 if k % 2 else -(k // 2)
        self.m.prev_qpd_nz = v != 0
        return v

    # ----------------------------------------------------- residual

    def _cbf_inc(self, cat: int, pos) -> int:
        def mb_level(value_of):
            inc = 0
            mbx, mby = pos[0], pos[1]
            for w, (nx, ny) in ((1, (mbx - 1, mby)),
                                (2, (mbx, mby - 1))):
                ninf = self.m.mbinfo(nx, ny)
                if ninf is None:
                    inc += w if self.cur_intra else 0
                elif ninf["ipcm"]:
                    inc += w
                else:
                    inc += w * value_of(ninf)
            return inc

        if cat == 0:
            return mb_level(lambda i: i["ldc"] if i["i16"] else 0)
        if cat == 3:
            ci = pos[2]
            return mb_level(lambda i: i["cdc"][ci])
        if cat in (1, 2):
            grid, div = self.m.cbf_l, 4
            bx, by = pos
        else:
            ci, bx, by = pos
            grid, div = self.m.cbf_c[ci], 2
        inc = 0
        for w, (nbx, nby) in ((1, (bx - 1, by)), (2, (bx, by - 1))):
            if nbx < 0 or nby < 0:
                inc += w if self.cur_intra else 0
                continue
            if (nbx // div, nby // div) == self.cur_mb:
                inc += w * grid[nby][nbx]   # own earlier block
                continue
            ninf = self.m.mbinfo(nbx // div, nby // div)
            if ninf is None:
                inc += w if self.cur_intra else 0
            else:
                inc += w * grid[nby][nbx]
        return inc

    def _store_cbf(self, cat: int, pos, cbf: int, cur: dict) -> None:
        if cat == 0:
            cur["ldc"] = cbf
        elif cat == 3:
            cur["cdc"][pos[2]] = cbf
        elif cat in (1, 2):
            self.m.cbf_l[pos[1]][pos[0]] = cbf
        elif cat == 5:
            # the 8x8's coded status covers all four 4x4 cells so a
            # 4x4-transformed neighbor's cbf inference sees it
            bx, by = pos
            for dy in (0, 1):
                for dx in (0, 1):
                    self.m.cbf_l[by + dy][bx + dx] = cbf
        else:
            ci, bx, by = pos
            self.m.cbf_c[ci][by][bx] = cbf

    def transform8_flag(self, mbx: int, mby: int, val=None) -> int:
        """transform_size_8x8_flag (9.3.3.1.1.10): ctxIdx 399 +
        condTermA + condTermB over the neighbor MBs' flags."""
        _need_8x8(self.st)
        inc = 0
        for nbx, nby in ((mbx - 1, mby), (mbx, mby - 1)):
            ninf = self.m.mbinfo(nbx, nby)
            if ninf is not None and ninf.get("t8"):
                inc += 1
        return self._bit(399 + inc, val)

    def block(self, cat: int, pos, n: int, cur: dict, scan=None):
        """residual_block_cabac: coded_block_flag, significance map,
        levels (reverse scan) — returns the scan-order coefficient
        list. ``cur`` collects the current MB's DC cbf values for
        :meth:`MbState.note_mb`.

        cat 5 (High 8x8 luma, r12): coded_block_flag is NOT coded
        for maxNumCoeff==64 under ChromaArrayType 1/2 (7.3.5.3.3 —
        the cbp bit already said the 8x8 is coded); sig/last ctxIdx
        come from the seam Table 9-43 position maps at offsets
        402/417, levels at 426."""
        if cat == 5:
            return self._block8(pos, cur, scan)
        cbf_ctx = 85 + cat * 4 + self._cbf_inc(cat, pos)
        if scan is not None:
            cbf = 1 if any(scan) else 0
            self._bit(cbf_ctx, cbf)
            self._store_cbf(cat, pos, cbf, cur)
            if not cbf:
                return scan
            sigbase = 105 + _SIGOFF[cat]
            lastbase = 166 + _SIGOFF[cat]
            last_at = max(i for i, v in enumerate(scan) if v)
            for i in range(min(last_at + 1, n - 1)):
                inc = min(i, 2) if cat == 3 else i
                sig = 1 if scan[i] else 0
                self._bit(sigbase + inc, sig)
                if sig:
                    self._bit(lastbase + inc, 1 if i == last_at else 0)
            self._levels(cat, scan, last_at)
            return scan
        out = [0] * n
        cbf = self._bit(cbf_ctx)
        self._store_cbf(cat, pos, cbf, cur)
        if not cbf:
            return out
        sigbase = 105 + _SIGOFF[cat]
        lastbase = 166 + _SIGOFF[cat]
        sig = [0] * n
        last_at = n - 1
        for i in range(n - 1):
            inc = min(i, 2) if cat == 3 else i
            if self._bit(sigbase + inc):
                sig[i] = 1
                if self._bit(lastbase + inc):
                    last_at = i
                    break
        else:
            # loop ran out without a last flag: the final position is
            # implicitly significant (coded_block_flag said non-empty)
            sig[n - 1] = 1
        self._levels(cat, out, last_at, sig)
        return out

    def _block8(self, pos, cur: dict, scan=None):
        smap, lmap = _need_8x8(self.st)
        self._store_cbf(5, pos, 1, cur)
        if scan is not None:
            last_at = max(i for i, v in enumerate(scan) if v)
            for i in range(min(last_at + 1, 63)):
                sig = 1 if scan[i] else 0
                self._bit(402 + smap[i], sig)
                if sig:
                    self._bit(417 + lmap[i],
                              1 if i == last_at else 0)
            self._levels(5, scan, last_at)
            return scan
        out = [0] * 64
        sig = [0] * 64
        last_at = 63
        for i in range(63):
            if self._bit(402 + smap[i]):
                sig[i] = 1
                if self._bit(417 + lmap[i]):
                    last_at = i
                    break
        else:
            sig[63] = 1
        self._levels(5, out, last_at, sig)
        return out

    def _levels(self, cat: int, scan, last_at: int, sig=None) -> None:
        """coeff_abs_level_minus1 + sign from last_at down to 0.
        Write mode when ``sig`` is None (levels read from scan)."""
        base = 227 + _LEVOFF[cat]
        cap = 3 if cat == 3 else 4
        num_gt1 = num_eq1 = 0
        for i in range(last_at, -1, -1):
            present = scan[i] != 0 if sig is None else sig[i]
            if not present:
                continue
            inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
            ctx_of = (lambda b, _i0=inc0:
                      base + (_i0 if b == 0
                              else 5 + min(cap, num_gt1)))
            if sig is None:
                m1 = abs(scan[i]) - 1
                self._unary(ctx_of, min(m1, 14), cmax=14)
                if m1 >= 14:
                    self._egk(0, m1 - 14)
                self._bp(1 if scan[i] < 0 else 0)
            else:
                pre = self._unary(ctx_of, cmax=14)
                m1 = 14 + self._egk(0) if pre == 14 else pre
                neg = self._bp()
                scan[i] = -(m1 + 1) if neg else m1 + 1
            if m1 == 0:
                num_eq1 += 1
            else:
                num_gt1 += 1
