"""dHash perceptual image hashing + banded hamming near-dup pairs:
invariances, edit sensitivity, pigeonhole recall, Spark == DuckDB twin
parity on the relational half."""

from __future__ import annotations

import itertools
import random

import duckdb
import pytest

from data_migration_etl_scripts_spark.operators import imagehash as ih
from data_migration_etl_scripts_spark.operators import multimodal as mm
from data_migration_etl_scripts_spark.operators.webp import webp_encode


def _base(k=0):
    return [
        [((x * (7 + 5 * k) + 13) % 200, (y * (11 + 3 * k)) % 200,
          ((x + 1) * (y + 1) * (k + 1)) % 200)
         for x in range(24)]
        for y in range(16)
    ]


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_dhash_container_invariant():
    px = _base()
    h_bmp = ih.dhash_bits(mm.image_decode(mm.bmp_encode(px))[2])
    h_png = ih.dhash_bits(mm.image_decode(mm.png_encode(px))[2])
    h_webp = ih.dhash_bits(mm.image_decode(webp_encode(px))[2])
    assert h_bmp == h_png == h_webp


def test_dhash_brightness_invariant():
    px = _base()
    shifted = [[(r + 20, g + 20, b + 20) for r, g, b in row] for row in px]
    assert ih.dhash_bits(px) == ih.dhash_bits(shifted)


def test_dhash_local_edit_small_distance_noise_far():
    px = _base()
    edited = [row[:] for row in px]
    for y in range(4):
        for x in range(4):
            r, g, b = edited[y][x]
            edited[y][x] = (255 - r, 255 - g, 255 - b)
    noise = [[((x * 97 + y * 31) % 256, (x * 53) % 256, (y * 77) % 256)
              for x in range(24)] for y in range(16)]
    h0 = ih.dhash_bits(px)
    assert 0 < _ham(h0, ih.dhash_bits(edited)) <= 8
    assert _ham(h0, ih.dhash_bits(noise)) > 15


def test_dhash_jpeg_survives_lossy_compression():
    from data_migration_etl_scripts_spark.operators.jpeg import jpeg_encode

    px = _base()
    h0 = ih.dhash_bits(px)
    h_jpg = ih.dhash_bits(mm.image_decode(jpeg_encode(px, quality=85))[2])
    assert _ham(h0, h_jpg) <= 6  # perceptual: DCT loss barely moves it


def test_banded_pairs_equal_bruteforce_and_pigeonhole_recall(spark):
    rng = random.Random(11)
    hashes = []
    base_vals = [rng.getrandbits(64) for _ in range(12)]
    vid = 0
    for v in base_vals:
        hashes.append((vid, v)); vid += 1
        flip = v
        for _ in range(rng.randrange(0, 7)):  # within max_hamming=6
            flip ^= 1 << rng.randrange(64)
        hashes.append((vid, flip)); vid += 1
    signed = [(m, v - (1 << 64) if v >= 1 << 63 else v) for m, v in hashes]
    hdf = spark.createDataFrame(signed, "media_id long, dhash long")
    got = sorted(tuple(r) for r in ih.dhash_neardup_pairs(hdf).collect())
    by_id = dict(hashes)
    want = sorted(
        (a, b, _ham(by_id[a], by_id[b]))
        for a, b in itertools.combinations(sorted(by_id), 2)
        if _ham(by_id[a], by_id[b]) <= 6
    )
    assert got == want  # exact recall: pigeonhole guarantees every pair


def test_spark_pairs_match_duckdb_twin(spark):
    rng = random.Random(2)
    vals = [rng.getrandbits(64) for _ in range(20)]
    vals += [v ^ (1 << rng.randrange(64)) for v in vals[:6]]
    signed = [(i, v - (1 << 64) if v >= 1 << 63 else v)
              for i, v in enumerate(vals)]
    hdf = spark.createDataFrame(signed, "media_id long, dhash long")
    got = sorted(tuple(r) for r in ih.dhash_neardup_pairs(hdf).collect())
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE ht AS SELECT * FROM (VALUES "
        + ",".join(f"({m},{v})" for m, v in signed)
        + ") t(media_id, dhash)"
    )
    want = sorted(con.sql(ih.dhash_neardup_pairs_sql("ht")).fetchall())
    assert got == want


def test_parameter_validation():
    with pytest.raises(ValueError, match="pigeonhole"):
        ih.dhash_neardup_pairs(None, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide 64"):
        ih.dhash_neardup_pairs(None, max_hamming=2, n_bands=7)


def test_image_dhash_kernel(spark):
    media = spark.createDataFrame(
        ih.synthetic_imagehash_media_rows(1), mm.MEDIA_SCHEMA
    )
    out = {r.media_id: r.dhash for r in ih.image_dhash(media).collect()}
    assert len(out) == 6
    assert out[0] == out[1] == out[2] == out[3]  # containers + brightness
    assert out[0] != out[5]
