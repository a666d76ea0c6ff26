"""Continuous corpus ingest as Structured Streaming: every arriving
file of documents is deduped against ALL previously accepted documents
before being admitted — the streaming composition of
``operators/ingest.py``.

Loop per micro-batch (inside ``foreachBatch``):

0. (optional) declarative quality gate: an ``expectations`` report over
   the RAW wave (operators/expectations, same contract as the batch CDC
   loop's pre-write gate at cdc.py) — any violation QUARANTINES the
   whole wave (report appended to rejected/, nothing admitted, indexes
   untouched), mirroring the batch path's abort-before-write;
1. within-batch exact dedup (keep min doc_id per content hash) — a
   batch may carry its own duplicates;
2. classify survivors against the persisted history indexes
   (content-hash table + minhash band table) — 'exact_dup'/'near_dup'
   rejected, 'new' accepted;
3. write the wave's outputs in replay-safety order: first the
   idempotent derived artifacts — optional tar-shard emission
   (per-batch dirs, deterministic bytes) and the optional
   batch-id-versioned rollup fold (streaming/rollup_stream machinery —
   crash replays re-derive, never double-count) — then the corpus
   append, and LAST the index-table appends. The index append is the
   point of no replay (after it, a replayed wave classifies as dups of
   itself), so everything that must survive a mid-batch crash happens
   before it.

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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_etl_scripts_spark.operators import ingest as ig
from data_migration_etl_scripts_spark.streaming.rollup_stream import (
    fold_batch_into_rollup,
    read_rollup,
)

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


def read_ingest_rollup(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed rollup over every ACCEPTED document (None before
    the first admitting batch of a rollup-enabled ingest)."""
    return read_rollup(spark, os.path.join(state_dir, "rollup"))


def read_ingest_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """Every admitted document (union of the per-batch corpus dirs —
    per-batch overwrite is what makes a crash-replayed wave rewrite
    rather than duplicate itself)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(state_dir, "corpus"))
    )


def read_ingest_shards(spark: SparkSession, state_dir: str) -> DataFrame:
    """Members of every training shard emitted so far (one row per tar
    member across all admitted batches)."""
    from data_migration_etl_scripts_spark.sources.shards import read_tar_shards

    from pyspark.errors import AnalysisException

    try:
        return read_tar_shards(spark, os.path.join(state_dir, "shards", "batch-*"))
    except AnalysisException:  # no admitting batch has emitted shards yet
        # (real read failures — corrupt tars, permissions — surface as
        # execution-time errors, not AnalysisException, and still raise)
        return spark.createDataFrame(
            [], "shard_file string, key long, ext string, content binary, n_bytes long"
        )


def stream_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    schema: T.StructType | str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    expectations: Callable[[DataFrame], DataFrame] | None = None,
    rollup_spec: tuple[list[str], list[str]] | None = None,
    shard_spec: dict | None = None,
    await_termination: bool = True,
):
    """Drain ``source_dir`` (availableNow) through the dedup-admit loop.

    ``state_dir`` holds corpus/, hashes/, bands/, checkpoint/ (plus
    rejected/ when ``expectations`` is set and rollup/ when
    ``rollup_spec`` is set). Returns the StreamingQuery. Call
    repeatedly as new files land — the checkpoint skips files already
    processed.

    ``expectations`` maps the raw wave to an expectation report
    (operators/expectations.expectation_report); ANY violation
    quarantines the whole wave before indexes/corpus are touched —
    the streaming twin of the batch CDC pre-write gate.
    ``rollup_spec`` = (group_cols, measure_cols) over accepted docs;
    read back with :func:`read_ingest_rollup`.
    ``shard_spec`` (optional) emits each admitting batch's accepted
    docs as WebDataset-style tar shards under
    ``shards/batch-{id:06d}/`` — keys: ``members`` (ext -> column,
    required), ``n_shards``, ``max_items``/``max_bytes``, and
    optionally ``tokenizer_merges`` (a trained BPE merges list): when
    set, admitted docs gain ``tokens``/``n_tokens``/``ids_bin`` columns
    before export, so members can ship the int32 token ids directly. Each batch
    writes its OWN directory with deterministic bytes, so a crash
    replay rewrites identical files (idempotent, like the index
    appends); dataloaders read them via :func:`read_ingest_shards`.
    """
    corpus_dir = os.path.join(state_dir, "corpus")
    hashes_dir = os.path.join(state_dir, "hashes")
    bands_dir = os.path.join(state_dir, "bands")
    rejected_dir = os.path.join(state_dir, "rejected")
    rollup_dir = os.path.join(state_dir, "rollup")
    checkpoint = os.path.join(state_dir, "checkpoint")

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # 0. wave-level quality gate: violations quarantine the wave
        #    BEFORE any state (corpus, indexes, rollup) is extended
        if expectations is not None:
            report = expectations(batch_df).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            )
            # the report is check-cardinality-sized; collect is O(checks)
            rows = report.collect()
            if any(r["n_violations"] for r in rows):
                # audit trail (append; a crash replay re-appending the
                # same verdict is harmless — it's a log, not state).
                # Rebuilt from the collected rows: re-running `report`
                # would recompute the whole wave aggregation a 2nd time
                spark.createDataFrame(rows, report.schema).write.mode(
                    "append"
                ).parquet(rejected_dir)
                return
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
        # 3a. idempotent derived artifacts FIRST, while a crash replay
        #     can still recompute the same `accepted` set: once the
        #     hash index is extended (3c), a replay classifies this
        #     batch's docs as exact dups of themselves -> accepted is
        #     empty -> anything written only after 3c would be lost for
        #     this wave. Shards are per-batch dirs with deterministic
        #     bytes (rewrite == identical files); the rollup fold is
        #     batch-id-versioned (re-fold == same version, never
        #     double-counted).
        if shard_spec is not None and not accepted.rdd.isEmpty():
            from data_migration_etl_scripts_spark.sources.shards import (
                export_tar_shards,
            )

            to_ship = accepted
            merges = shard_spec.get("tokenizer_merges")
            if merges:
                # pre-trained tokenizer artifact (bpe.merge_table
                # parquet, loaded by the caller): admitted docs ship
                # with tokens + mmap-able int32 ids, so the stream's
                # output is training-ready without a second batch pass
                from data_migration_etl_scripts_spark.operators import bpe

                to_ship = bpe.encode_token_ids(
                    bpe.apply_bpe(accepted, id_col, text_col, merges),
                    "tokens",
                    bpe.build_vocab(merges),
                ).join(accepted, id_col)
            export_tar_shards(
                to_ship,
                os.path.join(state_dir, "shards", f"batch-{batch_id:06d}"),
                id_col,
                shard_spec["members"],
                **{k_: v for k_, v in shard_spec.items()
                   if k_ not in ("members", "tokenizer_merges")},
            )
        if rollup_spec is not None:
            group_cols, measure_cols = rollup_spec
            fold_batch_into_rollup(
                spark, accepted, batch_id, rollup_dir, group_cols, measure_cols
            )
        # 3b. admit to the corpus sink — per-batch dir with OVERWRITE,
        #     so a replayed wave rewrites the same directory instead of
        #     appending duplicate rows (a plain append here would
        #     double the whole wave if the crash landed between this
        #     write and the index extension below)
        accepted.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch-{batch_id:06d}")
        )
        # 3c. extend history indexes LAST — the point of no replay
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
