"""Baseline JPEG (SOF0) codec: encode/decode round trips within DCT
loss, subsampling + restart-marker paths, foreign-decoder interop, and
corrupt-payload errors."""

from __future__ import annotations

import glob
import os

import pytest

from data_migration_etl_scripts_spark.operators import jpeg as jp
from data_migration_etl_scripts_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
)

W, H = 21, 13  # odd sizes exercise edge-block padding


def _gradient():
    return [
        [(x * 12 % 256, y * 19 % 256, (x + y) * 7 % 256) for x in range(W)]
        for y in range(H)
    ]


def _max_err(a, b):
    return max(
        abs(a[y][x][c] - b[y][x][c])
        for y in range(len(a))
        for x in range(len(a[0]))
        for c in range(3)
    )


def test_roundtrip_444_high_quality():
    img = _gradient()
    blob = jpeg_encode(img, quality=95, subsampling="444")
    w, h, rows = jpeg_decode(blob)
    assert (w, h) == (W, H)
    assert _max_err(rows, img) <= 6  # DCT loss only


def test_roundtrip_420_subsampling():
    img = _gradient()
    blob = jpeg_encode(img, quality=95, subsampling="420")
    w, h, rows = jpeg_decode(blob)
    assert (w, h) == (W, H)
    # chroma is quarter-res: tolerance reflects subsampling loss
    assert _max_err(rows, img) <= 24


def test_roundtrip_flat_near_exact():
    flat = [[(100, 150, 200)] * 16 for _ in range(16)]
    blob = jpeg_encode(flat, quality=95)
    _, _, rows = jpeg_decode(blob)
    assert _max_err(rows, flat) <= 2


def test_quality_monotonic_size():
    img = _gradient()
    hi = jpeg_encode(img, quality=95)
    lo = jpeg_encode(img, quality=40)
    assert len(lo) < len(hi)
    _, _, rows = jpeg_decode(lo)
    assert _max_err(rows, img) <= 48  # coarse quant, still recognizable


def test_restart_markers_roundtrip():
    img = _gradient()
    blob = jpeg_encode(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    w, h, rows = jpeg_decode(blob)
    assert (w, h) == (W, H)
    assert _max_err(rows, img) <= 10


def test_image_decode_dispatches_jpeg():
    from data_migration_etl_scripts_spark.operators.multimodal import image_decode

    img = _gradient()
    w, h, rows = image_decode(jpeg_encode(img, quality=95))
    assert (w, h) == (W, H)
    assert _max_err(rows, img) <= 6


def test_foreign_decoder_interop():
    """Decode JPEGs produced by OTHER encoders (any baseline .jpg on
    the system python installs) — the decoder reads quant/Huffman
    tables from the stream, so this catches self-consistent-but-wrong
    table handling that round-trip tests cannot."""
    candidates = [
        p
        for pat in (
            "/usr/lib/python3*/test/imghdrdata/python.jpg",
            "/mnt/*/model_tools_env/*/python/install/lib/python3*/test/imghdrdata/python.jpg",
        )
        for p in glob.glob(pat)
    ]
    decoded = 0
    for p in candidates[:2]:
        blob = open(p, "rb").read()
        try:
            w, h, rows = jpeg_decode(blob)
        except NotImplementedError:  # progressive sample — fine to skip
            continue
        assert w > 0 and h > 0 and len(rows) == h and len(rows[0]) == w
        assert all(0 <= c <= 255 for c in rows[0][0])
        decoded += 1
    if not candidates:
        pytest.skip("no system sample JPEGs found")


def test_corrupt_payloads_raise():
    img = _gradient()
    blob = jpeg_encode(img, quality=90)
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01" + blob[2:])  # bad SOI
    with pytest.raises(ValueError):
        jpeg_decode(blob[: len(blob) // 2])  # truncated entropy data
    # flipping a baseline stream's SOF0 to SOF2 makes its scan header
    # (Ss=0, Se=63) ILLEGAL for progressive — explicit error, never
    # garbage pixels (r6: SOF2 itself now decodes; see the progressive
    # tests below)
    prog = bytearray(blob)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        jpeg_decode(bytes(prog))
    # genuinely unsupported frame types still raise NotImplementedError
    loss = bytearray(blob)
    loss[i + 1] = 0xC3  # lossless sequential
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(loss))


def test_grayscale_single_component():
    """Hand-build a 1-component scan by re-using the encoder's luma
    plane machinery: encode a gray image and check decode(r==g==b)."""
    img = [[(v, v, v) for v in range(0, 160, 10)] for _ in range(8)]
    blob = jpeg_encode(img, quality=95)
    _, _, rows = jpeg_decode(blob)
    for row in rows:
        for r, g, b in row:
            assert abs(r - g) <= 4 and abs(g - b) <= 4  # gray stays gray


def test_random_images_roundtrip_within_dct_loss():
    """Property: arbitrary small RGB images round-trip within a
    quality-95 DCT-loss bound at any size (including 8-multiples and
    ragged edges), for both subsampling modes."""
    import random

    rng = random.Random(12345)
    for trial in range(6):
        w = rng.randint(1, 24)
        h = rng.randint(1, 24)
        img = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        for sub in ("444", "420"):
            blob = jpeg_encode(img, quality=95, subsampling=sub)
            ww, hh, rows = jpeg_decode(blob)
            assert (ww, hh) == (w, h), (trial, sub, w, h, ww, hh)
            if sub == "444":
                # random noise is the DCT's worst case: generous but
                # finite bound still catches structural decode bugs
                # (wrong offsets produce errors near 255)
                assert _max_err(rows, img) <= 64, (trial, w, h)
            else:
                # 2x2-averaging uncorrelated chroma legitimately loses
                # a lot of RGB fidelity; the structural invariant for
                # 4:2:0 is that LUMA survives
                def luma(px):
                    return 0.299 * px[0] + 0.587 * px[1] + 0.114 * px[2]

                yerr = max(
                    abs(luma(rows[y][x]) - luma(img[y][x]))
                    for y in range(h) for x in range(w)
                )
                assert yerr <= 64, (trial, w, h, yerr)


def test_fill_bytes_before_markers_are_skipped():
    """JPEG permits 0xFF fill bytes before any marker; pad a valid
    stream's segment boundaries and require identical decode."""
    img = _gradient()
    blob = jpeg_encode(img, quality=95)
    # inject fill bytes before the SOF0 marker
    i = blob.index(b"\xff\xc0")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    w, h, rows = jpeg_decode(padded)
    assert (w, h) == (W, H)
    assert rows == jpeg_decode(blob)[2]


def test_malformed_sof_component_count_raises():
    """r7: 4-component streams DECODE now (Adobe CMYK/YCCK); a SOF that
    CLAIMS 4 components but carries 3 descriptors is malformed and must
    raise cleanly, not struct-error mid-parse."""
    blob = bytearray(jpeg_encode(_gradient(), quality=90))
    i = blob.index(b"\xff\xc0")
    # SOF segment: ff c0 len(2) prec(1) h(2) w(2) ncomp(1) ...
    blob[i + 9] = 4  # claim 4 components, segment still holds 3
    with pytest.raises(ValueError, match="more components"):
        jpeg_decode(bytes(blob))


# ---------------------------------------------- progressive (SOF2, r6)


def test_progressive_decode_equals_baseline_exactly():
    # same quantized coefficients -> after all 5 scans the progressive
    # decode must equal the baseline decode BIT-FOR-BIT
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )

    img = _gradient()
    for sub in ("444", "420"):
        for q in (95, 60):
            base = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
            prog = jpeg_decode(jpeg_encode_progressive(img, quality=q, subsampling=sub))
            assert prog == base


def test_progressive_eob_runs_and_refinement_on_smooth_image():
    # a smooth 64x64 ramp leaves band 6-63 almost empty: EOB runs span
    # many blocks (EOBRUN > 1 path) and the refinement scan carries
    # correction bits for the surviving low-frequency coefficients
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )

    img = [[(x * 2, (x + y), y * 2) for x in range(64)] for y in range(64)]
    blob = jpeg_encode_progressive(img, quality=85)
    w, h, rows = jpeg_decode(blob)
    assert (w, h) == (64, 64)
    base = jpeg_decode(jpeg_encode(img, quality=85))[2]
    assert rows == base


def test_progressive_noise_image_exercises_zrl_and_high_categories():
    import random

    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )

    rng = random.Random(3)
    img = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(24)] for _ in range(16)]
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=90))
    base = jpeg_decode(jpeg_encode(img, quality=90))
    assert prog == base


def test_progressive_stream_structure():
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )

    blob = jpeg_encode_progressive(_gradient(), quality=90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in blob          # SOF2, not SOF0
    assert blob.count(b"\xff\xda") == 11  # 1 DC + 3x3 AC + 1 DC-refine


def test_progressive_truncated_raises():
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )
    import pytest

    blob = jpeg_encode_progressive(_gradient(), quality=90)
    with pytest.raises(ValueError):
        jpeg_decode(blob[: len(blob) // 3])


def test_image_decode_dispatches_progressive_jpeg():
    from data_migration_etl_scripts_spark.operators.jpeg import (
        jpeg_encode_progressive,
    )
    from data_migration_etl_scripts_spark.operators.multimodal import image_decode

    img = _gradient()
    w, h, rows = image_decode(jpeg_encode_progressive(img, quality=95))
    assert (w, h) == (W, H)
    assert _max_err(rows, img) <= 6  # DCT loss only


def test_cmyk_and_ycck_roundtrip():
    # r7: Adobe 4-component decode (inverted-value convention)
    px = [[((x * 17 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * x + y) % 256)
           for x in range(24)] for y in range(16)]
    for ycck in (False, True):
        b = jp.jpeg_encode_cmyk(px, quality=95, ycck=ycck)
        assert b[:2] == b"\xff\xd8"
        assert b"Adobe" in b[:64]  # APP14 present
        w, h, out = jp.jpeg_decode(b)
        assert (w, h) == (24, 16)
        rmse = (sum(
            (a - c) ** 2
            for ro, rw in zip(out, px) for p, q in zip(ro, rw)
            for a, c in zip(p, q)
        ) / (24 * 16 * 3)) ** 0.5
        assert rmse < 4.0, ("ycck" if ycck else "cmyk", rmse)


def test_cmyk_pure_colors_exact_convention():
    # solid blocks pin the inverted-CMYK convention: pure red/white/black
    for color in ((255, 0, 0), (255, 255, 255), (0, 0, 0)):
        px = [[color] * 16 for _ in range(16)]
        _w, _h, out = jp.jpeg_decode(jp.jpeg_encode_cmyk(px, quality=98))
        assert max(abs(a - c) for p in out for q in p
                   for a, c in zip(q, color)) <= 4
