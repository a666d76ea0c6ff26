"""Perceptual image hashing + near-duplicate pairs — image dedup for
training corpora (the LAION-style pipeline stage), bridging the
multimodal codecs and the engine's banded dedup family.

dHash (difference hash): decode -> grayscale -> 9x8 box-mean resize ->
row-wise left>right gradient -> 64 bits. Invariant to uniform
brightness shifts and to the CONTAINER (the same pixels through BMP,
PNG, or lossless WebP hash identically — pinned in tests); robust to
small local edits (few flipped bits).

Scale split (the engine's dedup discipline):
- the HASH is the only Python stage (pixel decode, Arrow-batched
  mapInPandas, one image in memory at a time);
- the PAIR SEARCH is pure relational: split each 64-bit hash into
  ``n_bands`` equal bit-bands, equi-join on (band_id, band_value) —
  by pigeonhole, any pair within hamming distance < n_bands shares at
  least one band, so recall is EXACT for max_hamming <= n_bands - 1 —
  then filter candidates by bit_count(xor) <= max_hamming. Never
  all-pairs; both the band join and the popcount run JVM-side in
  codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dhash_bits(
    pixels: list[list[tuple[int, int, int]]], hash_w: int = 8, hash_h: int = 8
) -> int:
    """Top-down RGB rows -> dHash integer (``hash_w * hash_h`` bits).
    Grayscale via the Rec.601 luma weights, (hash_w+1) x hash_h
    box-mean resize, bit = left cell brighter than its right
    neighbor. MSB-first in raster order."""
    h = len(pixels)
    w = len(pixels[0])
    gw, gh = hash_w + 1, hash_h
    # box-mean resize: average the source cells each grid cell covers
    grid = [[0.0] * gw for _ in range(gh)]
    for gy in range(gh):
        y0, y1 = gy * h // gh, max(gy * h // gh + 1, (gy + 1) * h // gh)
        for gx in range(gw):
            x0, x1 = gx * w // gw, max(gx * w // gw + 1, (gx + 1) * w // gw)
            acc = 0.0
            for y in range(y0, min(y1, h)):
                row = pixels[y]
                for x in range(x0, min(x1, w)):
                    r, g, b = row[x]
                    acc += 0.299 * r + 0.587 * g + 0.114 * b
            grid[gy][gx] = acc / ((min(y1, h) - y0) * (min(x1, w) - x0))
    bits = 0
    for gy in range(gh):
        for gx in range(hash_w):
            bits = (bits << 1) | (1 if grid[gy][gx] > grid[gy][gx + 1] else 0)
    return bits


DHASH_SCHEMA = "media_id long, dhash long"


def image_dhash(df: DataFrame) -> DataFrame:
    """binary image column -> (media_id, dhash): the only Python stage
    of the image-dedup pipeline (decode via the stdlib codec dispatch).
    The 64-bit hash is stored as a signed long (bit patterns intact)."""
    from data_migration_etl_scripts_spark.operators.multimodal import image_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                _w, _h, px = image_decode(bytes(content))
                bits = dhash_bits(px)
                if bits >= 1 << 63:  # two's-complement into LongType
                    bits -= 1 << 64
                out["media_id"].append(mid)
                out["dhash"].append(bits)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(kernel, schema=DHASH_SCHEMA)


def dhash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """(id, hash) -> near-dup pairs (id_a < id_b, hamming).

    Pure relational after the hash stage: band equi-join (pigeonhole-
    exact recall for ``max_hamming < n_bands``) + popcount filter,
    both codegen. Band values extract via unsigned shift+mask so the
    signed-long storage never leaks sign bits across bands."""
    if max_hamming >= n_bands:
        raise ValueError(
            "pigeonhole recall needs max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col(hash_col), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_bands)
    ])
    banded = hashes.select(
        F.col(id_col).alias("vid"),
        F.col(hash_col).alias("hsh"),
        F.posexplode(bands).alias("band_id", "band_val"),
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.bit_count(
                F.col("a.hsh").bitwiseXOR(F.col("b.hsh"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def dhash_neardup_pairs_sql(
    table: str,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> str:
    """DuckDB twin of :func:`dhash_neardup_pairs` over a hash table
    (same banding + popcount). The signed long reinterprets as
    unsigned through a HUGEINT add so band extraction matches Spark's
    shiftrightunsigned; band rows expand as a UNION ALL (n_bands is a
    small constant)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    u = (
        f"(CAST(hsh AS HUGEINT) + CASE WHEN hsh < 0 "
        "THEN 18446744073709551616 ELSE 0 END)"
    )
    band_selects = " UNION ALL ".join(
        f"SELECT vid, hsh, {i} AS band_id, "
        f"CAST(({u} // {1 << (i * width)}) % {mask + 1} AS BIGINT) AS band_val "
        "FROM h"
        for i in range(n_bands)
    )
    return f"""
        WITH h AS (SELECT {id_col} AS vid, {hash_col} AS hsh FROM {table}),
        banded AS ({band_selects})
        SELECT DISTINCT a.vid AS id_a, b.vid AS id_b,
               bit_count(xor(a.hsh, b.hsh)) AS hamming
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.vid < b.vid
        WHERE bit_count(xor(a.hsh, b.hsh)) <= {max_hamming}
    """


def synthetic_imagehash_media_rows(n_base: int = 4) -> list[tuple]:
    """Deterministic image table with KNOWN near-dup structure (pure
    Python — shared by the board query and the selfcheck oracle):
    for each base image k, id 10k = BMP, 10k+1 = the SAME pixels as
    PNG, 10k+2 = same pixels as lossless WebP (hamming 0 triplets),
    10k+3 = uniformly brightened (+12; dHash-invariant -> hamming 0),
    10k+4 = one corner region inverted (small hamming), and one
    unrelated noise image per k at 10k+5."""
    from data_migration_etl_scripts_spark.operators.multimodal import (
        bmp_encode,
        png_encode,
    )
    from data_migration_etl_scripts_spark.operators.webp import webp_encode

    rows = []
    for k in range(n_base):
        # per-base gradient FREQUENCIES differ (not just offsets):
        # dHash is offset-invariant, so distinct bases need distinct
        # spatial structure to stay far apart in hamming space
        base = [
            [((x * (7 + 5 * k) + 13) % 200, (y * (11 + 3 * k)) % 200,
              ((x + 1) * (y + 1) * (k + 1)) % 200)
             for x in range(24)]
            for y in range(16)
        ]
        bright = [[(r + 12, g + 12, b + 12) for r, g, b in row] for row in base]
        edited = [row[:] for row in base]
        for y in range(4):
            for x in range(4):
                r, g, b = edited[y][x]
                edited[y][x] = (255 - r, 255 - g, 255 - b)
        noise = [
            [((x * 97 + y * 31 + k * 151) % 256, (x * 53 + k) % 256, (y * 77) % 256)
             for x in range(24)]
            for y in range(16)
        ]
        rows.append((10 * k, "image", bytearray(bmp_encode(base)), "{}"))
        rows.append((10 * k + 1, "image", bytearray(png_encode(base)), "{}"))
        rows.append((10 * k + 2, "image", bytearray(webp_encode(base)), "{}"))
        rows.append((10 * k + 3, "image", bytearray(bmp_encode(bright)), "{}"))
        rows.append((10 * k + 4, "image", bytearray(bmp_encode(edited)), "{}"))
        rows.append((10 * k + 5, "image", bytearray(bmp_encode(noise)), "{}"))
    return rows
