"""Video near-duplicate detection — the last cell of the per-modality
dedup matrix (text minhash, embedding cosine, image dHash, audio
spectral fingerprint, and now video): per-FRAME perceptual hashes +
a frame-level banded hamming join rolled up to video pairs, the
standard shape of a production video-dedup index (frame hashes are
the index keys; clip identity emerges from how many frames match).

Pipeline (the engine's dedup discipline):
- `video_frame_hashes` is the only Python stage: one mapInPandas pass
  decodes each clip (animated GIF / AVI-MJPEG via the stdlib codec
  dispatch) and emits (media_id, frame_idx, fhash) — the same 64-bit
  dHash the image stage uses (`imagehash.dhash_bits`), so a frame is
  near a frame regardless of which container it came from.
- the pair search is pure relational: band equi-join on frame hashes
  (pigeonhole-exact recall for hamming <= n_bands-1), popcount
  filter, then a groupBy (video_a, video_b) rollup counting DISTINCT
  matched frame indices — two clips pair when at least
  ``min_matched_frames`` of their frames match. Never all-pairs;
  everything after the hash stage is JVM-side codegen.

At 100 TB the frame-hash relation is the persisted index (same
pattern as the minhash band index in `operators/ingest.py`): new
clips hash map-side and probe the band join incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_HASH_SCHEMA = "media_id long, frame_idx int, fhash long"


def video_frame_hashes(df: DataFrame, max_frames: int = 64) -> DataFrame:
    """binary video column -> (media_id, frame_idx, fhash): decode
    (GIF/AVI dispatch) + per-frame dHash in ONE Arrow-batched
    mapInPandas pass — no intermediate BMP re-encode round trip."""
    from data_migration_etl_scripts_spark.operators.imagehash import dhash_bits
    from data_migration_etl_scripts_spark.operators.multimodal import (
        gif_decode_frames,
    )

    def frame_pixels(content: bytes):
        if content[:6] in (b"GIF87a", b"GIF89a"):
            _w, _h, frames = gif_decode_frames(content, max_frames=max_frames)
            for i, (_delay, rows) in enumerate(frames):
                yield i, rows
        elif content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            from data_migration_etl_scripts_spark.operators.avi import (
                avi_decode_frames,
            )

            _w, _h, _fps, frames = avi_decode_frames(
                content, max_frames=max_frames
            )
            for i, (_t, rows) in enumerate(frames):
                yield i, rows
        else:
            raise NotImplementedError(
                "real video codecs need ffmpeg — plug the codec kernel in here"
            )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "fhash": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, rows in frame_pixels(bytes(content)):
                    bits = dhash_bits(rows)
                    if bits >= 1 << 63:  # two's-complement into LongType
                        bits -= 1 << 64
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["fhash"].append(bits)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=FRAME_HASH_SCHEMA
    )


def video_neardup_pairs(
    frame_hashes: DataFrame,
    min_matched_frames: int = 2,
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """(media_id, frame_idx, fhash) -> video pairs (id_a < id_b,
    matched_frames) where ``matched_frames`` counts DISTINCT frame
    indices of clip a that have at least one near-frame (hamming <=
    max_hamming, pigeonhole-exact via the band join) in clip b.

    All relational: band explode -> equi-join -> popcount filter ->
    distinct (pair, frame_idx_a) -> count. The hot key (a ubiquitous
    frame hash, e.g. black frames) is bounded by the distinct-frame
    rollup — a clip can contribute each of its frames once per pair."""
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
        F.shiftrightunsigned(F.col("fhash"), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_bands)
    ])
    banded = frame_hashes.select(
        F.col("media_id").alias("vid"),
        F.col("frame_idx").alias("fidx"),
        F.col("fhash").alias("hsh"),
        F.posexplode(bands).alias("band_id", "band_val"),
    )
    matched = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .where(
            F.bit_count(F.col("a.hsh").bitwiseXOR(F.col("b.hsh")))
            <= max_hamming
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.fidx").alias("fidx_a"),
        )
        .distinct()
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("matched_frames"))
        .where(F.col("matched_frames") >= min_matched_frames)
    )


def synthetic_videohash_media_rows(n_base: int = 3) -> list[tuple]:
    """Deterministic video table with KNOWN near-dup structure (pure
    Python — shared by the board query and the selfcheck oracle): for
    each base clip k (4 frames, 16x16, per-base gradient frequencies
    + a moving block), id 10k = AVI/MJPEG at quality 92, 10k+1 = the
    SAME frames re-encoded at quality 70 (lossy near-dup), 10k+2 =
    the same frames as an animated GIF (different container AND
    different lossy path), and one unrelated clip at 10k+3."""
    from data_migration_etl_scripts_spark.operators.avi import avi_encode_mjpeg
    from data_migration_etl_scripts_spark.operators.multimodal import (
        gif_encode_frames,
    )

    rows = []
    for k in range(n_base):
        frames = []
        for f in range(4):
            fr = [[((x * (9 + 4 * k) + 7) % 200, (y * (13 + 3 * k)) % 200,
                    ((x + 2) * (y + 1) * (k + 2)) % 200)
                   for x in range(16)] for y in range(16)]
            bx, by = (f * 4) % 12, (f * 3 + k) % 12
            for y in range(by, by + 4):
                for x in range(bx, bx + 4):
                    fr[y][x] = (250, (f * 60 + k * 35) % 256, 10)
            frames.append(fr)
        # unrelated clip: per-base DISTINCT spatial structure (stripes /
        # columns / checker), so unrelated clips are far from every
        # base AND from each other in dHash space
        def unrel_px(x, y, f):
            if k % 3 == 0:
                v = (y * 47 + f * 19) % 256
            elif k % 3 == 1:
                v = (x * 43 + f * 19) % 256
            else:
                v = ((x + y) * 37 + f * 19) % 256
            return (v, (v * 3 + 50) % 256, (255 - v) % 256)

        unrelated = [
            [[unrel_px(x, y, f) for x in range(16)] for y in range(16)]
            for f in range(4)
        ]
        rows.append((10 * k, "video",
                     bytearray(avi_encode_mjpeg(frames, fps=10, quality=92)),
                     "{}"))
        rows.append((10 * k + 1, "video",
                     bytearray(avi_encode_mjpeg(frames, fps=10, quality=70)),
                     "{}"))
        # GIF variant: palette-quantized (GIF's 256-color reality) —
        # a different lossy path than JPEG, still dHash-near
        quant = [[[(r & 0xE0, g & 0xE0, b & 0xE0) for r, g, b in row]
                  for row in fr] for fr in frames]
        rows.append((10 * k + 2, "video",
                     bytearray(gif_encode_frames(quant, delay_ms=100)),
                     "{}"))
        rows.append((10 * k + 3, "video",
                     bytearray(avi_encode_mjpeg(unrelated, fps=10, quality=92)),
                     "{}"))
    return rows
