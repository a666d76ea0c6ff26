"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage:
    python tools/selfcheck.py              # all queries
    python tools/selfcheck.py q1 dedup_*   # substring filters
    python tools/selfcheck.py --json SELFCHECK_r03.json   # + artifact
    SELFCHECK_SF_DIR=/root/testdata/sf0.001 python tools/selfcheck.py

With ``--json PATH`` a machine-readable per-query artifact (status,
row counts, value hashes, seconds) is written — committed per round so
queries outside the driver's pinned board carry durable correctness
evidence.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v) -> str:
    """Canonicalize a value for hashing (engine-agnostic)."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon(f)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


# ------------------------------------------------------- range asserts
#
# Partial oracles for rows-only queries: the full result can't be
# hash-matched (HLL/t-digest values and k-means codebooks are
# engine-specific), but big parts of it CAN be pinned against DuckDB —
# exact counts, tolerance-bracketed quantiles, per-pair cosine values,
# recall floors. A rows-only query with a range check gets status
# "range_ok" instead of "rows_only" in the artifact.


def _range_sketch_profile(con, cols, rows) -> list[str]:
    """sketch_profile_events: n_rows exact; approx_distinct within 5%
    of the exact distinct; each approx quantile inside the exact
    rank-bracket [q-0.02, q+0.02] computed by DuckDB."""
    exact = {
        r[0]: r[1:]
        for r in con.sql(
            """
            SELECT event_type, count(*) AS n_rows,
                   count(DISTINCT user_id) AS nd,
                   quantile_cont(user_id, 0.48) q5lo, quantile_cont(user_id, 0.52) q5hi,
                   quantile_cont(user_id, 0.88) q9lo, quantile_cont(user_id, 0.92) q9hi,
                   quantile_cont(user_id, 0.97) q99lo, quantile_cont(user_id, 1.00) q99hi
            FROM events GROUP BY event_type
            """
        ).fetchall()
    }
    idx = {c: i for i, c in enumerate(cols)}
    bad = []
    for r in rows:
        g = r[idx["event_type"]]
        n_rows, nd, q5lo, q5hi, q9lo, q9hi, q99lo, q99hi = exact[g]
        if r[idx["n_rows"]] != n_rows:
            bad.append(f"{g}: n_rows {r[idx['n_rows']]} != exact {n_rows}")
        if abs(r[idx["approx_distinct"]] - nd) > 0.05 * nd:
            bad.append(f"{g}: approx_distinct {r[idx['approx_distinct']]} vs exact {nd} (>5%)")
        for col, lo, hi in (("p5", q5lo, q5hi), ("p9", q9lo, q9hi), ("p99", q99lo, q99hi)):
            v = r[idx[col]]
            if not (lo <= v <= hi):
                bad.append(f"{g}: {col}={v} outside exact bracket [{lo}, {hi}]")
    if len(rows) != len(exact):
        bad.append(f"group count {len(rows)} != exact {len(exact)}")
    return bad


def _range_ivf_trained(con, cols, rows) -> list[str]:
    """ann_topk_ivf_trained: the returned SET is codebook-specific
    (k-means has no SQL twin), but every returned cosine must equal
    the DuckDB-recomputed exact cosine for that (query, corpus) pair,
    ranks must follow descending cosine, and recall@5 vs the exact
    brute-force top-5 must clear the pytest-pinned floor (0.6)."""
    idx = {c: i for i, c in enumerate(cols)}
    pairs = ", ".join(
        f"({int(r[idx['query_id']])}, {int(r[idx['rank']])}, "
        f"{int(r[idx['corpus_id']])}, {float(r[idx['cosine']])!r})"
        for r in rows
    )
    bad = []
    if not pairs:
        return ["empty result"]
    mism = con.sql(
        f"""
        WITH got(query_id, rank, corpus_id, cosine) AS (VALUES {pairs}),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
              FROM embeddings)
        SELECT g.query_id, g.corpus_id, g.cosine,
               round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS exact_cos
        FROM got g JOIN v q ON q.vec_id = g.query_id JOIN v c ON c.vec_id = g.corpus_id
        WHERE abs(g.cosine - round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6)) > 1e-9
        """
    ).fetchall()
    for q, c, got, want in mism:
        bad.append(f"pair ({q},{c}): cosine {got} != exact {want}")
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r[idx["query_id"]], []).append(
            (r[idx["rank"]], r[idx["cosine"]], r[idx["corpus_id"]])
        )
    for q, lst in by_q.items():
        lst.sort()
        coss = [c for _, c, _ in lst]
        if coss != sorted(coss, reverse=True):
            bad.append(f"query {q}: ranks not in descending-cosine order")
    exact_top = con.sql(
        """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                          sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
                   FROM embeddings)
        SELECT query_id, corpus_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id ASC) AS rn
            FROM v q CROSS JOIN v c
            WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND q.nrm > 0 AND c.nrm > 0
        ) WHERE rn <= 5
        """
    ).fetchall()
    want_pairs = {(q, c) for q, c in exact_top}
    got_pairs = {
        (r[idx["query_id"]], r[idx["corpus_id"]]) for r in rows
    }
    recall = len(want_pairs & got_pairs) / max(len(want_pairs), 1)
    if recall < 0.6:
        bad.append(f"recall@5 {recall:.3f} below 0.6 floor")
    return bad


def _range_multimodal_decode(con, cols, rows) -> list[str]:
    """multimodal_real_decode: the decode kernels themselves are pinned
    by pytest goldens (tests/test_jpeg.py, test_mpeg_audio.py,
    test_multimodal_real.py); this range assert pins the SPARK side —
    that the Arrow/mapInPandas transport delivers, for every payload,
    exactly the features the kernel computes driver-side on the same
    bytes — plus independent structural facts (8x8 image dims, audio
    durations and sine RMS levels derivable from the fixture recipe)."""
    import json as _json

    from data_migration_etl_scripts_spark.operators import multimodal as mm

    fixture = {
        mid: (mtype, bytes(content))
        for mid, mtype, content, _meta in mm.synthetic_real_media_rows(
            24, include_mpeg=True
        )
    }
    idx = {c: i for i, c in enumerate(cols)}
    bad = []
    if len(rows) != len(fixture):
        bad.append(f"row count {len(rows)} != fixture {len(fixture)}")
    for r in rows:
        mid = r[idx["media_id"]]
        mtype, payload = fixture[mid]
        if r[idx["media_type"]] != mtype:
            bad.append(f"id {mid}: media_type {r[idx['media_type']]} != {mtype}")
        if r[idx["n_bytes"]] != len(payload):
            bad.append(f"id {mid}: n_bytes {r[idx['n_bytes']]} != {len(payload)}")
        got = _json.loads(r[idx["feature_json"]])
        want = mm._real_features(payload, 6)
        # FloatType round trip: compare at float32 precision
        if len(got) != len(want) or any(
            abs(g - w) > max(1e-5, 1e-6 * abs(w)) for g, w in zip(got, want)
        ):
            bad.append(f"id {mid}: feature {got} != driver-side recompute {want}")
        # independent structural facts, not recomputed through the kernel
        # (extended rows: 29 = 16x16 progressive JPEG, 30 = 12x10 WebP,
        # 33 = 11x9 LZW+predictor TIFF, 34 = 14x6 big-endian gray TIFF)
        want_dims = {
            29: [16.0, 16.0], 30: [12.0, 10.0],
            33: [11.0, 9.0], 34: [14.0, 6.0], 37: [9.0, 7.0],
            39: [40.0, 35.0],  # r7: tiled LZW+predictor TIFF
            41: [18.0, 12.0], 42: [18.0, 12.0],  # r7: CMYK/YCCK JPEG
            48: [24.0, 20.0],  # r9: JPEG-in-TIFF (Compression 7)
        }.get(mid, [8.0, 8.0])
        if mtype == "image" and got[:2] != want_dims:
            bad.append(f"id {mid}: image dims {got[:2]} != {want_dims}")
        if mtype == "audio":
            if mid == 61:
                # r11 floor0 (LSP) Ogg-Vorbis: deterministic synthetic
                # residues, not a sine — the per-feature equality
                # against the driver-side recompute (above) is the
                # value pin; here only the exact lapped duration
                # (4 blocks of 256 -> 3 x 128 emitted samples @ 8 kHz)
                if abs(got[0] - 384 / 8000) > 1e-3:
                    bad.append(
                        f"id {mid}: floor0 duration {got[0]} != "
                        f"{384 / 8000}")
                continue
            if mid in (49, 50, 56, 63):
                # silence operating points: r9 AAC (bare ADTS @16k x4
                # frames, MP4-wrapped stereo @22.05k x3 frames),
                # r10 Ogg-Vorbis (@8k, 4 short blocks -> 3 lapped
                # 128-sample frames) and r12 Ogg-Opus (4 CELT 20 ms
                # frames @48k minus 312 pre-skip) — the structural
                # facts are the exact frame-grid duration and an
                # all-zero signal
                want_dur = {49: 4096 / 16000, 50: 3072 / 22050,
                            56: 384 / 8000,
                            63: (4 * 960 - 312) / 48000}[mid]
                if abs(got[0] - want_dur) > 1e-3:
                    bad.append(
                        f"id {mid}: silence duration {got[0]} != {want_dur}")
                if any(abs(v) > 1e-9 for v in got[2:]):
                    bad.append(f"id {mid}: silence payload has energy {got}")
                continue
            if not (0.02 <= got[0] <= 0.15):  # 100ms WAVs / 24-85ms MPEG
                bad.append(f"id {mid}: audio duration {got[0]}s outside [0.02, 0.15]")
            # sine RMS, real signal not hash. Layer III (ids 38, 40)
            # keeps its 576-sample MDCT delay at the head, so band 0 is
            # the silent lead-in — the tone lives in the later bands.
            band = max(got[3:]) if mid in (38, 40) else got[2]
            if not (0.1 <= band <= 0.9):
                bad.append(f"id {mid}: band RMS {band} outside sine range")
    return bad


def _range_bpe_tokenize(con, cols, rows) -> list[str]:
    """bpe_tokenize_corpus: the iterative merge loop has no SQL twin,
    but three invariants are independently checkable per document
    against DuckDB: (1) row set == docs with non-null text; (2) word
    count <= n_tokens <= non-space chars + words (every word is 1..len
    tokens, EOW fused); (3) reconstruction — the first 8 tokens with
    '</w>' markers and spaces stripped are a prefix of the lowercased
    text with ASCII whitespace removed."""
    import re as _re

    ws = _re.compile(r"\s+", flags=_re.ASCII)  # kernel's exact splitter
    idx = {c: i for i, c in enumerate(cols)}
    exact = {}
    for d, text in con.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall():
        parts = [w for w in ws.split(text.lower()) if w]
        squash = "".join(parts)
        exact[d] = (len(parts), len(squash), squash)
    bad = []
    if {r[idx["doc_id"]] for r in rows} != set(exact):
        bad.append(
            f"doc set mismatch: {len(rows)} rows vs {len(exact)} non-null docs"
        )
        return bad
    for r in rows:
        d = r[idx["doc_id"]]
        words, chars, squash = exact[d]
        n = r[idx["n_tokens"]]
        if not (words <= n <= chars + words):
            bad.append(f"doc {d}: n_tokens {n} outside [{words}, {chars + words}]")
        head = r[idx["token_head"]].replace("</w>", "").replace(" ", "")
        if not squash.startswith(head):
            bad.append(
                f"doc {d}: token head {head[:40]!r} not a prefix of the text"
            )
    return bad


def _range_unigram_tokenize(con, cols, rows) -> list[str]:
    """unigram_tokenize_corpus: the EM training loop has no SQL twin
    (lattice parity and monotone likelihood are pinned by pytest), but
    three invariants are independently checkable per document against
    DuckDB: (1) row set == docs with non-null text; (2) word count <=
    n_pieces <= non-space chars + words (each word is 1..len+1 pieces
    of '▁'+word); (3) reconstruction — the first 8 pieces with the
    '▁' markers and spaces stripped are a prefix of the lowercased
    text with ASCII whitespace removed."""
    import re as _re

    ws = _re.compile(r"\s+", flags=_re.ASCII)  # kernel's exact splitter
    idx = {c: i for i, c in enumerate(cols)}
    exact = {}
    for d, text in con.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall():
        parts = [w for w in ws.split(text.lower()) if w]
        squash = "".join(parts)
        exact[d] = (len(parts), len(squash), squash)
    bad = []
    if {r[idx["doc_id"]] for r in rows} != set(exact):
        return [
            f"doc set mismatch: {len(rows)} rows vs {len(exact)} non-null docs"
        ]
    for r in rows:
        d = r[idx["doc_id"]]
        words, chars, squash = exact[d]
        n = r[idx["n_pieces"]]
        if not (words <= n <= chars + words):
            bad.append(
                f"doc {d}: n_pieces {n} outside [{words}, {chars + words}]"
            )
        head = r[idx["piece_head"]].replace("▁", "").replace(" ", "")
        if not squash.startswith(head):
            bad.append(
                f"doc {d}: piece head {head[:40]!r} not a prefix of the text"
            )
    return bad


def _range_video_frames(con, cols, rows) -> list[str]:
    """video_frame_extract: the fixture GIFs are deterministic formulas,
    so every output row is recomputable driver-side — rebuild each
    sampled frame from the recipe (8x8 base gradient + moving 2x2
    block), re-encode as BMP, and demand the exact (media_id,
    frame_idx, t_ms, width, height, frame_md5) row set. The two AVI/
    MJPEG rows (ids 8-9) are pinned by driver-side re-decode of the
    same container bytes (exact md5 — pins the Spark transport) plus
    facts independent of the codec: 16x16 dims and t_ms from the
    10 fps strh clock."""
    import hashlib as _hl

    from data_migration_etl_scripts_spark.operators import multimodal as mm
    from data_migration_etl_scripts_spark.operators.avi import (
        avi_decode_frames,
    )

    want = set()
    for i in range(8):  # synthetic_video_media(n=8), every_n=2 -> frames 0, 2
        base = [[((x * 31 + i) % 256, (y * 53) % 256, 64)
                 for x in range(8)] for y in range(8)]
        for f in (0, 2):
            fr = [row[:] for row in base]
            bx, by = (f * 2) % 6, (f + i) % 6
            for y in range(by, by + 2):
                for x in range(bx, bx + 2):
                    fr[y][x] = (255, f * 60 % 256, i * 40 % 256)
            md5 = _hl.md5(mm.bmp_encode(fr)).hexdigest()
            want.add((i, f, f * 100, 8, 8, md5))
    for mid, _t, content, _m in mm.synthetic_video_rows(
            8, include_avi=True, include_h264=True):
        if mid < 8:
            continue
        if mid == 10:
            # r9: the table-free H.264 IPPP clip — re-decode the same
            # bytes driver-side (motion-compensated P pictures must
            # all equal the IDR: all-skip copies) at the 25 fps
            # nominal clock the kernel stamps
            from data_migration_etl_scripts_spark.operators.h264 import (
                decode_video,
            )

            w, h, vframes = decode_video(bytes(content))
            if (w, h, len(vframes)) != (16, 16, 4):
                return [f"H.264 fixture: unexpected shape "
                        f"{(w, h, len(vframes))}"]
            if any(fr != vframes[0] for fr in vframes[1:]):
                return ["H.264 all-skip clip frames diverge"]
            for f in (0, 2):
                md5 = _hl.md5(mm.bmp_encode(vframes[f])).hexdigest()
                want.add((mid, f, f * 40, 16, 16, md5))
            continue
        w, h, fps_milli, frames = avi_decode_frames(bytes(content))
        if (w, h, fps_milli, len(frames)) != (16, 16, 10000, 4):
            return [f"AVI fixture {mid}: unexpected shape "
                    f"{(w, h, fps_milli, len(frames))}"]
        for f in (0, 2):
            md5 = _hl.md5(mm.bmp_encode(frames[f][1])).hexdigest()
            want.add((mid, f, f * 100, 16, 16, md5))
    idx = {c: i for i, c in enumerate(cols)}
    got = {
        (r[idx["media_id"]], r[idx["frame_idx"]], r[idx["t_ms"]],
         r[idx["width"]], r[idx["height"]], r[idx["frame_md5"]])
        for r in rows
    }
    bad = []
    if got != want:
        for t in sorted(want - got):
            bad.append(f"missing frame row {t[:3]} (or pixel/md5 drift)")
        for t in sorted(got - want):
            bad.append(f"unexpected frame row {t[:3]}")
    return bad


def _range_training_shards(con, cols, rows) -> list[str]:
    """corpus_to_training_shards: the BPE merge choice has no SQL twin,
    but everything around it does — the kept-doc set (quality >= the
    exact 25th percentile, DuckDB quantile_cont twin), and the shipped
    artifacts themselves: every tar re-read driver-side (stdlib
    tarfile) must contain exactly {json, bin} members for exactly the
    kept doc ids, each json record self-consistent, each bin an
    int32-LE array whose length equals the record's token count, token
    counts inside the per-doc [words, chars+words] bracket, and the
    FULL reconstruction invariant: tokens joined minus '</w>' equals
    the lowercased text with ASCII whitespace removed. Manifest rows
    must match the on-disk files byte-for-byte."""
    import json as _json
    import os as _os
    import re as _re
    import struct as _struct
    import tarfile as _tar

    from data_migration_etl_scripts_spark.operators import curation as cu
    from data_migration_etl_scripts_spark.operators import text as tx

    bad = []
    kept_sql = cu.filter_by_quantile_sql(
        tx.quality_score_sql("documents", "doc_id", "text"),
        "quality", 0.25,
    )
    ws = _re.compile(r"\s+", flags=_re.ASCII)
    kept = {}
    for d, text in con.sql(
        f"SELECT k.doc_id, d.text FROM ({kept_sql}) k "
        "JOIN documents d USING (doc_id) WHERE d.text IS NOT NULL"
    ).fetchall():
        parts = [w for w in ws.split(text.lower()) if w]
        kept[d] = (len(parts), len("".join(parts)), "".join(parts))
    idx = {c: i for i, c in enumerate(cols)}
    # manifest carries tar basenames; the query writes to this fixed dir
    out_dir = f"/tmp/dmess_shards/train_{_os.path.basename(SF_DIR.rstrip('/'))}"
    seen_keys: set[int] = set()
    n_members = 0
    for r in rows:
        f = _os.path.join(out_dir, r[idx["file"]])
        if not _os.path.isfile(f):
            bad.append(f"manifest file missing on disk: {f}")
            continue
        size = _os.path.getsize(f)
        if size != r[idx["n_bytes"]]:
            bad.append(f"{f}: n_bytes {r[idx['n_bytes']]} != disk {size}")
        if size % 512:
            bad.append(f"{f}: size not 512-block aligned")
        keys_here = set()
        with _tar.open(f) as t:
            members = {m.name: t.extractfile(m).read() for m in t.getmembers()}
        n_members += len(members)
        recs = {}
        for name, payload in members.items():
            key_s, ext = name.rsplit(".", 1)
            key = int(key_s)
            keys_here.add(key)
            if key not in kept:
                bad.append(f"{f}: member {name} is not a kept doc")
                continue
            if ext == "json":
                recs[key] = _json.loads(payload)
            elif ext == "bin":
                if len(payload) % 4:
                    bad.append(f"{f}: {name} not int32-aligned")
                recs.setdefault(key, {})["__nbin"] = len(payload) // 4
                recs[key].setdefault("__first", None)
                if len(payload) >= 4:
                    recs[key]["__first"] = _struct.unpack("<i", payload[:4])[0]
            else:
                bad.append(f"{f}: unexpected member ext {ext}")
        for key, rec in recs.items():
            if "n_tokens" not in rec:
                continue
            words, chars, squash = kept[key]
            if rec["doc_id"] != key:
                bad.append(f"{f}: record {key} carries doc_id {rec['doc_id']}")
            if not (words <= rec["n_tokens"] <= chars + words):
                bad.append(
                    f"doc {key}: n_tokens {rec['n_tokens']} outside "
                    f"[{words}, {chars + words}]"
                )
            toks = rec.get("tokens") or []
            if len(toks) != rec["n_tokens"]:
                bad.append(f"doc {key}: tokens len != n_tokens")
            if "".join(toks).replace("</w>", "") != squash:
                bad.append(f"doc {key}: token reconstruction != text")
            if rec.get("__nbin") is not None and rec["__nbin"] != rec["n_tokens"]:
                bad.append(
                    f"doc {key}: bin ids {rec['__nbin']} != n_tokens"
                )
        if len(keys_here) != r[idx["n_items"]]:
            bad.append(
                f"{f}: n_items {r[idx['n_items']]} != {len(keys_here)} sample keys"
            )
        if keys_here and (
            min(keys_here) != r[idx["key_min"]] or max(keys_here) != r[idx["key_max"]]
        ):
            bad.append(f"{f}: key_min/key_max don't match members")
        seen_keys |= keys_here
    if seen_keys != set(kept):
        bad.append(
            f"shipped keys != kept docs ({len(seen_keys)} vs {len(kept)})"
        )
    if n_members != 2 * len(kept):
        bad.append(f"member count {n_members} != 2 * kept {len(kept)}")
    return bad


def _range_audio_mel(con, cols, rows) -> list[str]:
    """audio_mel_features: the FFT/mel kernel is pinned by pytest
    (tests/test_melspec.py — naive-DFT parity, Parseval, tone
    localization); this range assert pins the SPARK side by
    recomputing each payload's exact mel fingerprint driver-side from
    the same fixture bytes, plus independent structural facts (true
    sample rates from the fixture recipe, the frame-count formula)."""
    import hashlib as _hl
    import struct as _struct

    from data_migration_etl_scripts_spark.operators import melspec as msp
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    fixture = {
        mid: bytes(content)
        for mid, mtype, content, _m in mm.synthetic_real_media_rows(
            24, include_mpeg=True
        )
        if mtype == "audio"
    }
    idx = {c: i for i, c in enumerate(cols)}
    bad = []
    if {r[idx["media_id"]] for r in rows} != set(fixture):
        return [f"row id set != audio fixture ids ({len(rows)} rows)"]
    for r in rows:
        mid = r[idx["media_id"]]
        rate, mono = mm.audio_decode_rate(fixture[mid])
        if r[idx["rate"]] != rate:
            bad.append(f"id {mid}: rate {r[idx['rate']]} != true {rate}")
        want_frames = max(0, (len(mono) - 256) // 160 + 1) if len(mono) >= 256 else 0
        if r[idx["n_frames"]] != want_frames:
            bad.append(
                f"id {mid}: n_frames {r[idx['n_frames']]} != formula {want_frames}"
            )
        mel = msp.log_mel_spectrogram(mono, rate, n_fft=256, hop=160, n_mels=16)
        blob = b"".join(_struct.pack("<16f", *row) for row in mel)
        if r[idx["mel_md5"]] != _hl.md5(blob).hexdigest():
            bad.append(f"id {mid}: mel fingerprint != driver-side recompute")
    return bad


def _range_image_neardup(con, cols, rows) -> list[str]:
    """image_neardup_pairs: DuckDB cannot decode pixels, but the
    fixture is deterministic shared bytes — recompute every dHash AND
    the exact brute-force pair set driver-side and demand set
    equality (this is a FULL oracle, just not a SQL one). Also pin
    the structural invariants the fixture encodes: every same-pixel
    container pair and every brightness-shifted copy at hamming 0."""
    import itertools as _it

    from data_migration_etl_scripts_spark.operators import imagehash as ihx
    from data_migration_etl_scripts_spark.operators.multimodal import image_decode

    hashes = {}
    for mid, _t, content, _m in ihx.synthetic_imagehash_media_rows(4):
        _w, _h, px = image_decode(bytes(content))
        hashes[mid] = ihx.dhash_bits(px)

    def ham(a, b):
        return bin(hashes[a] ^ hashes[b]).count("1")

    want = {
        (a, b, ham(a, b))
        for a, b in _it.combinations(sorted(hashes), 2)
        if ham(a, b) <= 6
    }
    idx = {c: i for i, c in enumerate(cols)}
    got = {
        (r[idx["id_a"]], r[idx["id_b"]], r[idx["hamming"]]) for r in rows
    }
    bad = []
    if got != want:
        for t in sorted(want - got):
            bad.append(f"missing pair {t}")
        for t in sorted(got - want):
            bad.append(f"unexpected pair {t}")
    for k in range(4):
        b = 10 * k
        for other in (b + 1, b + 2, b + 3):  # PNG, WebP, brightened
            if ham(b, other) != 0:
                bad.append(f"invariance broken: ham({b},{other}) != 0")
    return bad


def _range_compression(con, cols, rows) -> list[str]:
    """compression_signal: DEFLATE has no SQL twin, but zlib at a
    fixed level is deterministic — recompute every row exactly
    driver-side from the DuckDB-fetched text (a full oracle), and pin
    the independent fact that median bits-per-byte sits in the
    natural-language band (well under the 8.0 of incompressible
    data)."""
    import zlib as _z

    idx = {c: i for i, c in enumerate(cols)}
    texts = dict(con.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall())
    bad = []
    if {r[idx["doc_id"]] for r in rows} != set(texts):
        return [f"doc set mismatch ({len(rows)} rows)"]
    bpbs = []
    for r in rows:
        raw = texts[r[idx["doc_id"]]].encode("utf-8")
        comp = len(_z.compress(raw, 6))
        want = (len(raw), comp,
                round(8.0 * comp / len(raw), 6) if raw else 0.0)
        got = (r[idx["n_bytes"]], r[idx["n_compressed"]],
               r[idx["bits_per_byte"]])
        if got != want:
            bad.append(f"doc {r[idx['doc_id']]}: {got} != recompute {want}")
        bpbs.append(got[2])
    bpbs.sort()
    med = bpbs[len(bpbs) // 2]
    if not 1.0 <= med <= 6.0:
        bad.append(f"median bits/byte {med} outside natural-language band")
    return bad


def _range_video_neardup(con, cols, rows) -> list[str]:
    """video_neardup_pairs: frame hashes and the matched-frame rollup
    recomputed EXACTLY driver-side from the same fixture bytes (a full
    oracle, just not a SQL one), plus the structural invariants: every
    base's three lossy renderings pair up, and no pair bridges
    different base clips."""
    from data_migration_etl_scripts_spark.operators import videohash as vhx
    from data_migration_etl_scripts_spark.operators.avi import (
        avi_decode_frames,
    )
    from data_migration_etl_scripts_spark.operators.imagehash import dhash_bits
    from data_migration_etl_scripts_spark.operators.multimodal import (
        gif_decode_frames,
    )

    hashes = {}
    for mid, _t, content, _m in vhx.synthetic_videohash_media_rows(3):
        b = bytes(content)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            _w, _h, frames = gif_decode_frames(b, max_frames=64)
            px = [r for _d, r in frames]
        else:
            _w, _h, _f, frames = avi_decode_frames(b, max_frames=64)
            px = [r for _t2, r in frames]
        hashes[mid] = [dhash_bits(p) for p in px]

    def ham(x, y):
        return bin(x ^ y).count("1")

    want = set()
    for a in sorted(hashes):
        for b in sorted(hashes):
            if a >= b:
                continue
            m = sum(
                1 for x in hashes[a]
                if any(ham(x, y) <= 6 for y in hashes[b])
            )
            if m >= 2:
                want.add((a, b, m))
    idx = {c: i for i, c in enumerate(cols)}
    got = {
        (r[idx["id_a"]], r[idx["id_b"]], r[idx["matched_frames"]])
        for r in rows
    }
    bad = []
    if got != want:
        for t in sorted(want - got):
            bad.append(f"missing pair {t}")
        for t in sorted(got - want):
            bad.append(f"unexpected pair {t}")
    pair_ids = {(a, b) for a, b, _m in got}
    for k in range(3):
        for a, b in ((10 * k, 10 * k + 1), (10 * k, 10 * k + 2),
                     (10 * k + 1, 10 * k + 2)):
            if (a, b) not in pair_ids:
                bad.append(f"lossy-rendering pair ({a},{b}) missing")
    for a, b in pair_ids:
        if a // 10 != b // 10:
            bad.append(f"pair ({a},{b}) bridges different base clips")
    return bad


def _range_audio_neardup(con, cols, rows) -> list[str]:
    """audio_neardup_pairs: fingerprint + pair set recomputed EXACTLY
    driver-side from the same fixture bytes (a full oracle, just not a
    SQL one). Also pin the structural invariants the fixture encodes:
    every lossless-container copy and the half-gain float-WAV copy at
    hamming 0 (log-gradient gain invariance), and no pair bridging
    different base clips."""
    import itertools as _it

    from data_migration_etl_scripts_spark.operators import audiohash as afx
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
    )

    hashes = {}
    for mid, _t, content, _m in afx.synthetic_audiohash_media_rows(4):
        rate, mono = audio_decode_rate(bytes(content))
        hashes[mid] = afx.afp_bits(mono, rate)

    def ham(a, b):
        return bin(hashes[a] ^ hashes[b]).count("1")

    want = {
        (a, b, ham(a, b))
        for a, b in _it.combinations(sorted(hashes), 2)
        if ham(a, b) <= 6
    }
    idx = {c: i for i, c in enumerate(cols)}
    got = {
        (r[idx["id_a"]], r[idx["id_b"]], r[idx["hamming"]]) for r in rows
    }
    bad = []
    if got != want:
        for t in sorted(want - got):
            bad.append(f"missing pair {t}")
        for t in sorted(got - want):
            bad.append(f"unexpected pair {t}")
    for k in range(4):
        b = 10 * k
        for other in (b + 1, b + 2):  # FLAC copy, half-gain float WAV
            if ham(b, other) != 0:
                bad.append(f"invariance broken: ham({b},{other}) != 0")
    for a, b, _h in got:
        if a // 10 != b // 10:
            bad.append(f"pair ({a},{b}) bridges different base clips")
    return bad


def _range_audio_resample(con, cols, rows) -> list[str]:
    """audio_resample_16k: the windowed-sinc kernel is pinned by pytest
    (tests/test_resample.py — amplitude preservation, anti-aliasing,
    round-trip SNR); this range assert pins the SPARK side by
    recomputing each payload's exact resampled fingerprint driver-side
    from the same fixture bytes, plus facts independent of the kernel:
    dst_rate, the ceil(n*L/M) output-length formula, and sine-RMS
    preservation through the rate change (the fixture tones' RMS is
    derivable from their recipes)."""
    import hashlib as _hl
    import math as _math
    import struct as _struct

    import numpy as _np

    from data_migration_etl_scripts_spark.operators import multimodal as mm
    from data_migration_etl_scripts_spark.operators import resample as rs

    fixture = {
        mid: bytes(content)
        for mid, mtype, content, _m in mm.synthetic_real_media_rows(
            24, include_mpeg=True
        )
        if mtype == "audio"
    }
    idx = {c: i for i, c in enumerate(cols)}
    bad = []
    if {r[idx["media_id"]] for r in rows} != set(fixture):
        return [f"row id set != audio fixture ids ({len(rows)} rows)"]
    for r in rows:
        mid = r[idx["media_id"]]
        rate, mono = mm.audio_decode_rate(fixture[mid])
        if r[idx["src_rate"]] != rate:
            bad.append(f"id {mid}: src_rate {r[idx['src_rate']]} != {rate}")
        if r[idx["dst_rate"]] != 16000:
            bad.append(f"id {mid}: dst_rate != 16000")
        g = _math.gcd(rate, 16000)
        want_out = (len(mono) * (16000 // g) + rate // g - 1) // (rate // g)
        if (r[idx["n_in"]], r[idx["n_out"]]) != (len(mono), want_out):
            bad.append(
                f"id {mid}: lengths {(r[idx['n_in']], r[idx['n_out']])} "
                f"!= ({len(mono)}, {want_out})"
            )
        y = rs.resample(mono, rate, 16000)
        blob = _struct.pack(f"<{len(y)}f", *y.astype(_np.float32))
        if r[idx["pcm_md5"]] != _hl.md5(blob).hexdigest():
            bad.append(f"id {mid}: pcm fingerprint != driver-side recompute")
        # independent: resampling must conserve in-band signal power
        rms_in = _math.sqrt(sum(v * v for v in mono) / max(1, len(mono)))
        rms_out = float(_np.sqrt((y * y).mean()))
        if rms_in > 0.01 and not 0.9 <= rms_out / rms_in <= 1.1:
            bad.append(
                f"id {mid}: RMS ratio {rms_out / rms_in:.3f} outside [0.9, 1.1]"
            )
    return bad


def _range_pca_whiten(con, cols, rows) -> list[str]:
    """embed_pca_whiten: eigendecomposition has no SQL form, but its
    defining properties are checkable without trusting the engine:
    (1) the returned components have identity covariance (whitening),
    (2) they are an exactly LINEAR map of the input embeddings
    (lstsq residual ~ 0 — no hash fake can pass this), and (3) the
    recovered map spans the same top-16 eigen-subspace as an
    independent numpy PCA of the same parquet (principal-angle
    cosines), sidestepping the near-degenerate per-vector rotation
    ambiguity of a flat spectrum."""
    import numpy as np

    bad: list[str] = []
    data = con.sql(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    X = np.array([list(e) for _vid, e in data], dtype=np.float64)
    idx = {c: i for i, c in enumerate(cols)}
    k = 16
    by_id = {r[idx["vec_id"]]: [r[idx[f"pc_{j}"]] for j in range(k)] for r in rows}
    if len(rows) != len(data):
        bad.append(f"row count {len(rows)} != embeddings {len(data)}")
        return bad
    Y = np.array([by_id[vid] for vid, _e in data], dtype=np.float64)
    # (1) whitening: population covariance of the output is I
    C = np.cov(Y.T, bias=True)
    dev = np.abs(C - np.eye(k)).max()
    if dev > 5e-3:
        bad.append(f"whitened covariance deviates from I by {dev:.2e}")
    # (2) exact linearity in X (projection = affine map)
    A = np.hstack([X, np.ones((len(X), 1))])
    M, *_ = np.linalg.lstsq(A, Y, rcond=None)
    resid = np.abs(A @ M - Y).max()
    if resid > 1e-4:  # rounding to 6dp bounds the true residual
        bad.append(f"output is not a linear map of the input (resid {resid:.2e})")
    # (3) top-k subspace alignment vs independent numpy PCA
    mu = X.mean(axis=0)
    lam, u = np.linalg.eigh((X - mu).T @ (X - mu) / len(X))
    u_top = u[:, ::-1][:, :k]
    w_dir = M[:-1]  # (64, 16) recovered projection directions
    q_w, _ = np.linalg.qr(w_dir)
    sv = np.linalg.svd(u_top.T @ q_w, compute_uv=False)
    if sv.min() < 0.99:
        bad.append(f"subspace principal-angle cos {sv.min():.4f} < 0.99")
    return bad


def _range_mfcc_stack(con, cols, rows) -> list[str]:
    """audio_mfcc_stack: DCT/delta formulas are pinned by pytest
    (test_melspec.py); this pins the Spark side by recomputing each
    payload's full mel->MFCC->delta->delta-delta stack fingerprint
    driver-side from the same fixture bytes."""
    import hashlib as _hl
    import struct as _struct

    from data_migration_etl_scripts_spark.operators import melspec as msp
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    fixture = {
        mid: bytes(content)
        for mid, mtype, content, _m in mm.synthetic_real_media_rows(
            24, include_mpeg=True
        )
        if mtype == "audio"
    }
    idx = {c: i for i, c in enumerate(cols)}
    bad = []
    if {r[idx["media_id"]] for r in rows} != set(fixture):
        return [f"row id set != audio fixture ids ({len(rows)} rows)"]
    for r in rows:
        mid = r[idx["media_id"]]
        rate, mono = mm.audio_decode_rate(fixture[mid])
        mel = msp.log_mel_spectrogram(mono, rate, n_fft=256, hop=160, n_mels=16)
        mfcc = msp.mfcc_from_mel(mel, n_mfcc=8)
        d1 = msp.delta_features(mfcc)
        d2 = msp.delta_features(d1)
        blob = b"".join(
            _struct.pack("<24f", *(c + v + a)) for c, v, a in zip(mfcc, d1, d2)
        )
        if r[idx["n_dims"]] != 24 or r[idx["n_frames"]] != len(mfcc):
            bad.append(f"id {mid}: shape {r[idx['n_frames']]}x{r[idx['n_dims']]} != {len(mfcc)}x24")
        if r[idx["mfcc_md5"]] != _hl.md5(blob).hexdigest():
            bad.append(f"id {mid}: stack fingerprint != driver-side recompute")
    return bad


RANGE_CHECKS = {
    "audio_mfcc_stack": _range_mfcc_stack,
    "embed_pca_whiten": _range_pca_whiten,
    "sketch_profile_events": _range_sketch_profile,
    "ann_topk_ivf_trained": _range_ivf_trained,
    "multimodal_real_decode": _range_multimodal_decode,
    "bpe_tokenize_corpus": _range_bpe_tokenize,
    "unigram_tokenize_corpus": _range_unigram_tokenize,
    "video_frame_extract": _range_video_frames,
    "corpus_to_training_shards": _range_training_shards,
    "audio_mel_features": _range_audio_mel,
    "audio_neardup_pairs": _range_audio_neardup,
    "video_neardup_pairs": _range_video_neardup,
    "compression_signal": _range_compression,
    "audio_resample_16k": _range_audio_resample,
    "image_neardup_pairs": _range_image_neardup,
}


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    filters = args
    import __spark_entry__ as entrymod
    from data_migration_etl_scripts_spark import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # engine-generated datasets (tools/gen_sf.py) are Spark
            # directory writes; the driver's testdata are single files
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}

    failures = []
    board: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        spark.catalog.clearCache()  # operators may persist(); keep runs independent
        rec = board[name] = {
            "status": None, "spark_rows": None, "oracle_rows": None,
            "spark_hash": None, "oracle_hash": None, "secs": None,
        }
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            failures.append(name)
            rec["status"] = "spark_error"
            continue
        if name not in oracles:
            checker = RANGE_CHECKS.get(name)
            if checker is not None:
                violations = checker(con, [c.lower() for c in scols], srows)
                if violations:
                    print(f"FAIL  {name}: RANGE ASSERT\n  " + "\n  ".join(violations))
                    failures.append(name)
                    rec.update(status="range_fail", spark_rows=len(srows),
                               secs=round(time.time() - t0, 2))
                else:
                    rec.update(status="range_ok", spark_rows=len(srows),
                               secs=round(time.time() - t0, 2))
                    print(f"ok~   {name}: range-assert ok ({len(srows)} rows, {time.time()-t0:.1f}s)")
                continue
            rec.update(status="rows_only", spark_rows=len(srows),
                       secs=round(time.time() - t0, 2))
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: ORACLE ERROR\n{traceback.format_exc()}")
            failures.append(name)
            rec["status"] = "oracle_error"
            continue
        scols_l = [c.lower() for c in scols]
        sh, sn = table_hash(scols_l, srows)
        oh, on = table_hash(ocols, orows)
        rec.update(spark_rows=sn, oracle_rows=on, spark_hash=sh, oracle_hash=oh,
                   secs=round(time.time() - t0, 2))
        if sorted(scols_l) != sorted(ocols):
            print(f"FAIL  {name}: COLUMNS spark={sorted(scols_l)} oracle={sorted(ocols)}")
            failures.append(name)
            rec["status"] = "columns_mismatch"
        elif sn != on:
            print(f"FAIL  {name}: ROWCOUNT spark={sn} oracle={on}")
            failures.append(name)
            rec["status"] = "rowcount_mismatch"
        elif sh != oh:
            print(f"FAIL  {name}: HASH mismatch ({sn} rows)")
            _diff(scols_l, srows, ocols, orows)
            failures.append(name)
            rec["status"] = "hash_mismatch"
        else:
            print(f"ok    {name}: {sn} rows match ({time.time()-t0:.1f}s)")
            rec["status"] = "ok"

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    if json_path:
        import json

        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(qs),
            "n_pass": len(qs) - len(failures),
            "queries": board,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"artifact: {json_path}")
    spark.stop()
    return 1 if failures else 0


def _diff(scols, srows, ocols, orows, limit=3):
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = {"|".join(canon(r[i]) for i in so) for r in srows}
    oset = {"|".join(canon(r[i]) for i in oo) for r in orows}
    cols = sorted(scols)
    print(f"      cols: {cols}")
    for line in list(sset - oset)[:limit]:
        print(f"      spark-only:  {line}")
    for line in list(oset - sset)[:limit]:
        print(f"      oracle-only: {line}")


if __name__ == "__main__":
    raise SystemExit(main())
