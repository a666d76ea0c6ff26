"""Continuous corpus ingest as Structured Streaming: every arriving
file of documents is deduped against ALL previously accepted documents
before being admitted — the streaming composition of
``operators/ingest.py``.

Loop per micro-batch (inside ``foreachBatch``):

1. within-batch exact dedup (keep min doc_id per content hash) — a
   batch may carry its own duplicates;
2. classify survivors against the persisted history indexes
   (content-hash table + minhash band table) — 'exact_dup'/'near_dup'
   rejected, 'new' accepted;
3. append accepted docs to the corpus sink, and append their index
   rows to both index tables so the NEXT batch sees them as history.

Exactly-once: the streaming checkpoint dedups source files across
restarts. A crashed batch may replay step 3's appends, but duplicate
index rows are harmless by construction — the exact join goes through
``distinct()`` on content_hash and the near join counts
``count_distinct(hist doc_id)`` — so replays cannot change any later
batch's verdicts, and the corpus sink append is guarded by the
checkpoint's batch commit log.

State grows with accepted docs (16 B + bands rows each), never with
corpus bytes; at 1000 executors the per-batch joins shuffle only
hash/band keys, with the (small) incoming batch as the broadcast side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_etl_scripts_spark.operators import ingest as ig

_EMPTY_HASHES = "doc_id long, content_hash string"
_EMPTY_BANDS = "doc_id long, band_id int, band_key string"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return spark.read.schema(schema).parquet(path)
    except Exception:
        pass
    return spark.createDataFrame([], schema)


def stream_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    schema: T.StructType | str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    await_termination: bool = True,
):
    """Drain ``source_dir`` (availableNow) through the dedup-admit loop.

    ``state_dir`` holds corpus/, hashes/, bands/, checkpoint/. Returns
    the StreamingQuery. Call repeatedly as new files land — the
    checkpoint skips files already processed.
    """
    corpus_dir = os.path.join(state_dir, "corpus")
    hashes_dir = os.path.join(state_dir, "hashes")
    bands_dir = os.path.join(state_dir, "bands")
    checkpoint = os.path.join(state_dir, "checkpoint")

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # 1. within-batch exact dedup: keep the smallest id per content
        hashed = ig.content_hash_table(batch_df, id_col, text_col)
        keep = hashed.groupBy("content_hash").agg(F.min("doc_id").alias(id_col))
        batch = batch_df.join(keep.select(id_col), id_col, "semi")
        # 2. classify vs history indexes
        hist_h = _read_or_empty(spark, hashes_dir, _EMPTY_HASHES)
        hist_b = _read_or_empty(spark, bands_dir, _EMPTY_BANDS)
        verdicts = ig.dedup_incoming(
            batch, hist_h, hist_b, id_col, text_col, k=k, bands=bands
        )
        accepted_ids = verdicts.where(F.col("verdict") == "new").select("doc_id")
        accepted = batch.join(
            accepted_ids.withColumnRenamed("doc_id", id_col), id_col, "semi"
        )
        # materialize before the index appends extend history (both
        # index writes must see THIS batch's acceptance set, not a
        # re-evaluation against already-updated state)
        accepted = accepted.localCheckpoint()
        # 3. admit + extend history
        accepted.write.mode("append").parquet(corpus_dir)
        ig.content_hash_table(accepted, id_col, text_col).write.mode(
            "append"
        ).parquet(hashes_dir)
        ig.minhash_band_table(
            accepted, id_col, text_col, k=k, bands=bands
        ).write.mode("append").parquet(bands_dir)

    query = (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(source_dir)
        .writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
