"""WebP lossless (VP8L) codec: bit-exact encode/decode round trips
across every transform / cache / LZ77 combination, container handling,
documented seams, and the multimodal dispatch."""

from __future__ import annotations

import random
import struct

import pytest

from data_migration_etl_scripts_spark.operators.webp import (
    _prefix_decode_value,
    _prefix_encode_value,
    _LSBReader,
    _LSBWriter,
    webp_decode,
    webp_encode,
)

W, H = 13, 9


def _gradient():
    return [[(x * 19 % 256, (x + y) * 7 % 256, y * 23 % 256)
             for x in range(W)] for y in range(H)]


def test_roundtrip_default_exact():
    img = _gradient()
    blob = webp_encode(img)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    w, h, back = webp_decode(blob)
    assert (w, h) == (W, H)
    assert back == img  # LOSSLESS: bit-exact


@pytest.mark.parametrize("kw", [
    {"cache_bits": 0},
    {"rle": False},
    {"subtract_green": False},
    {"cache_bits": 0, "rle": False, "subtract_green": False},
    {"cache_bits": 11},
])
def test_roundtrip_feature_matrix(kw):
    img = _gradient()
    assert webp_decode(webp_encode(img, **kw))[2] == img


def test_roundtrip_noise_full_alphabets():
    rng = random.Random(5)
    img = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(24)] for _ in range(16)]
    assert webp_decode(webp_encode(img))[2] == img


def test_roundtrip_flat_rle_runs():
    flat = [[(10, 200, 30)] * 16 for _ in range(8)]
    blob = webp_encode(flat)
    assert webp_decode(blob)[2] == flat
    # distance-1 runs compress: far smaller than 128 literal pixels
    assert len(blob) < 120


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes_roundtrip(mode):
    img = _gradient()
    assert webp_decode(webp_encode(img, predictor_mode=mode))[2] == img
    rng = random.Random(mode)
    noise = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
              for _ in range(17)] for _ in range(11)]
    assert webp_decode(webp_encode(noise, predictor_mode=mode))[2] == noise


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (3, 2), (4, 2),
                                                 (16, 1), (17, 0)])
def test_palette_roundtrip_with_bundling(n_colors, width_bits):
    pal = [((i * 37) % 256, (i * 91) % 256, (i * 13) % 256)
           for i in range(n_colors)]
    img = [[pal[(x + 2 * y) % n_colors] for x in range(11)] for y in range(7)]
    blob = webp_encode(img, palette=True, subtract_green=False)
    assert webp_decode(blob)[2] == img


def test_palette_rejects_too_many_colors():
    rng = random.Random(1)
    img = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(30)] for _ in range(30)]
    with pytest.raises(ValueError, match="256 distinct"):
        webp_encode(img, palette=True, subtract_green=False)


def test_prefix_value_scheme_is_self_inverse():
    for v in list(range(1, 70)) + [127, 128, 129, 1000, 4096, 65536]:
        code, extra_val, extra_n = _prefix_encode_value(v)
        w = _LSBWriter()
        w.write(extra_val, extra_n)
        r = _LSBReader(w.flush() or b"\x00")
        assert _prefix_decode_value(code, r) == v


def test_container_errors():
    with pytest.raises(ValueError, match="not a WebP"):
        webp_decode(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        webp_decode(
            b"RIFF" + struct.pack("<I", 12) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        )
    blob = bytearray(webp_encode(_gradient()))
    blob[20] ^= 0xFF  # corrupt the entropy stream
    with pytest.raises(Exception):
        webp_decode(bytes(blob))


def test_truncated_stream_raises():
    blob = webp_encode(_gradient())
    with pytest.raises(ValueError):
        webp_decode(blob[: len(blob) // 2])


def test_2d_distance_seam_is_loud():
    # hand-flip an encoded ref's distance to a 2D code is intricate;
    # instead pin the seam contract: the decoder refuses 2D codes with
    # the documented message rather than guessing offsets
    from data_migration_etl_scripts_spark.operators import webp as wp

    assert "not reproduced from memory" in wp._DIST_2D_SEAM


def test_image_decode_dispatches_webp():
    from data_migration_etl_scripts_spark.operators.multimodal import image_decode

    img = _gradient()
    assert image_decode(webp_encode(img)) == (W, H, img)


def test_real_features_webp_vs_png_same_pixels(spark):
    # the same pixels through WebP and PNG containers must produce the
    # same decoded features (pixels, not container bytes)
    from data_migration_etl_scripts_spark.operators import multimodal as mm

    img = _gradient()
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(webp_encode(img)), "{}"),
            (1, "image", bytearray(mm.png_encode(img)), "{}"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in
           mm.extract_features(media, dim=6, decoder="real").collect()}
    assert out[0].feature == out[1].feature
    assert out[0].n_bytes != out[1].n_bytes


@pytest.mark.parametrize("cte", [(40, 200, 17), (130, 7, 250), (0, 0, 0), (255, 255, 255)])
def test_color_transform_roundtrip(cte):
    img = _gradient()
    assert webp_decode(webp_encode(img, color_transform=cte))[2] == img


def test_color_transform_composes_with_predictor():
    img = _gradient()
    blob = webp_encode(img, color_transform=(130, 7, 250), predictor_mode=11)
    assert webp_decode(blob)[2] == img


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_meta_prefix_groups_roundtrip(bits):
    img = _gradient()
    blob = webp_encode(img, meta_bits=bits, cache_bits=0, rle=False)
    assert webp_decode(blob)[2] == img
    rng = random.Random(bits)
    noise = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
              for _ in range(19)] for _ in range(12)]
    blob = webp_encode(noise, meta_bits=bits, cache_bits=0, rle=False)
    assert webp_decode(blob)[2] == noise
