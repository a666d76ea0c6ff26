"""Continuous MEDIA ingest as Structured Streaming — the multimodal
twin of the text loop in `streaming/ingest.py`: every arriving file
of media rows is decode-VALIDATED and perceptually deduped against
all previously admitted media before touching state.

Loop per micro-batch (inside ``foreachBatch``):

1. decode-validate + fingerprint in ONE Arrow-batched kernel: each
   payload runs through the REAL codec dispatch (image_decode /
   audio_decode_rate / GIF-AVI frame decode) and hashes (image dHash,
   audio spectral fingerprint, video = dHash of the first frame — the
   gate-grade clip key; full frame-level video dedup is the batch
   operator in `operators/videohash.py`). Undecodable payloads carry
   their error string instead of poisoning the wave;
2. corrupt rows quarantine to ``corrupt/batch-{id}/`` (full rows +
   error, per-batch overwrite — the audit trail a crawl operator
   greps);
3. within-batch exact dedup (keep min media_id per fingerprint);
4. survivors classify against the persisted HISTORY fingerprints via
   the banded hamming join (pigeonhole-exact recall for hamming <=
   n_bands-1, same relational core as every dedup stage): near-dups
   of history quarantine to ``dups/batch-{id}/`` with the id they
   duplicate;
5. admitted rows write to ``accepted/batch-{id}/`` and their
   fingerprints to ``hashes/batch-{id}/``.

Exactly-once discipline is inherited verbatim from the text loop:
checkpointed file source, every state write a per-batch-directory
overwrite of deterministic content, and the history read EXCLUDES the
wave's own ``batch-{id}`` directory — a crash replay rewrites
byte-identical outputs and can never classify a wave as a duplicate
of itself.

State grows one 8-byte hash row per admitted item, never with media
bytes; the banded join broadcasts the (small) incoming wave against
the history index."""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators.multimodal import MEDIA_SCHEMA

_FP_SCHEMA = (
    "media_id long, media_type string, ok boolean, err string, phash long"
)
_EMPTY_HASHES = "media_id long, media_type string, phash long"


def media_fingerprints(df: DataFrame) -> DataFrame:
    """(media_id, media_type, content) -> (media_id, media_type, ok,
    err, phash): decode-validate and fingerprint in one kernel pass.
    ok=False rows carry the decoder's error instead of a hash."""
    from data_migration_etl_scripts_spark.operators.audiohash import afp_bits
    from data_migration_etl_scripts_spark.operators.imagehash import dhash_bits
    from data_migration_etl_scripts_spark.operators.multimodal import (
        audio_decode_rate,
        gif_decode_frames,
        image_decode,
    )

    def one(mtype: str, b: bytes) -> int:
        if mtype == "image":
            _w, _h, px = image_decode(b)
            return dhash_bits(px)
        if mtype == "audio":
            rate, mono = audio_decode_rate(b)
            return afp_bits(mono, rate)
        if mtype == "video":
            if b[:6] in (b"GIF87a", b"GIF89a"):
                _w, _h, frames = gif_decode_frames(b, max_frames=1)
                return dhash_bits(frames[0][1])
            if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                from data_migration_etl_scripts_spark.operators.avi import (
                    avi_decode_frames,
                )

                _w, _h, _f, frames = avi_decode_frames(b, max_frames=1)
                return dhash_bits(frames[0][1])
            if (b[:4] == b"\x00\x00\x00\x01" or b[:3] == b"\x00\x00\x01"
                    or (len(b) >= 12 and b[4:8] in (b"ftyp", b"styp"))
                    or (len(b) > 188 and b[0] == 0x47
                        and b[188] == 0x47)):
                # H.264 Annex B / MP4 / MPEG-TS (r9): first I frame
                from data_migration_etl_scripts_spark.operators.h264 import (
                    decode_iframe,
                )

                if b[0] == 0x47:
                    from data_migration_etl_scripts_spark.operators.mpegts import (
                        ts_extract_h264,
                    )

                    b = ts_extract_h264(b)
                elif b[4:8] in (b"ftyp", b"styp"):
                    from data_migration_etl_scripts_spark.operators.mp4 import (
                        mp4_extract_h264,
                    )

                    b = mp4_extract_h264(b)
                _w, _h, rows = decode_iframe(b)
                return dhash_bits(rows)
            raise NotImplementedError("unrecognized video container")
        raise ValueError(f"unknown media_type {mtype!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "media_type", "ok", "err", "phash")}
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                ok, err, phash = True, None, 0
                try:
                    if content is None:
                        raise ValueError("null payload")
                    bits = one(mtype, bytes(content))
                    phash = bits - (1 << 64) if bits >= 1 << 63 else bits
                except Exception as exc:  # noqa: BLE001 — gate, not crash
                    ok, err = False, f"{type(exc).__name__}: {exc}"
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["ok"].append(ok)
                out["err"].append(err)
                out["phash"].append(phash)
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "content").mapInPandas(
        kernel, schema=_FP_SCHEMA
    )


def _banded(df: DataFrame, n_bands: int) -> DataFrame:
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col("phash"), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_bands)
    ])
    return df.select(
        "media_id", "media_type", "phash",
        F.posexplode(bands).alias("band_id", "band_val"),
    )


def read_media_hashes(
    spark: SparkSession, state_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """History fingerprints from the per-batch hash dirs, optionally
    excluding one wave's own directory (the replay-safety read)."""
    root = os.path.join(state_dir, "hashes")
    if not os.path.isdir(root):
        return None
    dirs = [
        os.path.join(root, d) for d in sorted(os.listdir(root))
        if d.startswith("batch-")
        and (exclude_batch is None or d != f"batch-{exclude_batch:06d}")
        and os.path.isdir(os.path.join(root, d))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_media_accepted(spark: SparkSession, state_dir: str) -> DataFrame:
    root = os.path.join(state_dir, "accepted")
    dirs = [os.path.join(root, d) for d in sorted(os.listdir(root))
            if d.startswith("batch-")]
    return spark.read.parquet(*dirs)


def stream_media_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    max_hamming: int = 6,
    n_bands: int = 8,
    await_termination: bool = True,
):
    """Drain ``source_dir`` (availableNow) of media-row parquet files
    through the decode-gate/dedup-admit loop. ``state_dir`` holds
    accepted/, hashes/, corrupt/, dups/, checkpoint/. Returns the
    StreamingQuery; call repeatedly as files land."""
    if max_hamming >= n_bands or 64 % n_bands:
        raise ValueError("need max_hamming < n_bands and n_bands | 64")
    checkpoint = os.path.join(state_dir, "checkpoint")

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        me = f"batch-{batch_id:06d}"
        fps = media_fingerprints(batch_df).localCheckpoint(eager=True)
        corrupt = fps.where(~F.col("ok"))
        batch_df_c = batch_df.join(
            corrupt.select("media_id", "err"), "media_id"
        )
        batch_df_c.write.mode("overwrite").parquet(
            os.path.join(state_dir, "corrupt", me)
        )
        valid = fps.where(F.col("ok")).drop("ok", "err")
        # within-batch exact dedup: min id per fingerprint
        keep = valid.groupBy("phash").agg(F.min("media_id").alias("media_id"))
        valid = valid.join(keep, ["media_id", "phash"], "semi")
        # classify against history (wave's own dir excluded — replay)
        history = read_media_hashes(spark, state_dir, exclude_batch=batch_id)
        if history is not None:
            wave_b = _banded(valid, n_bands)
            hist_b = _banded(history, n_bands).select(
                F.col("media_id").alias("dup_of"),
                F.col("phash").alias("hist_hash"),
                "band_id", "band_val",
            )
            dup_ids = (
                wave_b.join(hist_b, ["band_id", "band_val"])
                .where(
                    F.bit_count(
                        F.col("phash").bitwiseXOR(F.col("hist_hash"))
                    ) <= max_hamming
                )
                .groupBy("media_id")
                .agg(F.min("dup_of").alias("dup_of"))
            )
        else:
            dup_ids = None
        if dup_ids is not None:
            batch_df.join(dup_ids, "media_id").write.mode(
                "overwrite"
            ).parquet(os.path.join(state_dir, "dups", me))
            admitted = valid.join(
                dup_ids.select("media_id"), "media_id", "anti"
            )
        else:
            spark.createDataFrame(
                [], batch_df.schema.add("dup_of", "long")
            ).write.mode("overwrite").parquet(
                os.path.join(state_dir, "dups", me)
            )
            admitted = valid
        batch_df.join(admitted.select("media_id"), "media_id", "semi") \
            .write.mode("overwrite").parquet(
                os.path.join(state_dir, "accepted", me)
            )
        admitted.select("media_id", "media_type", "phash").write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, "hashes", me))

    wave = (
        spark.readStream.schema(MEDIA_SCHEMA).parquet(source_dir)
    )
    q = (
        wave.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
