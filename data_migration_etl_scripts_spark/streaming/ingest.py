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
3. write the wave's outputs — shards, rollup fold, corpus, index
   tables — each into a per-batch directory with mode=overwrite and
   deterministic content.

Exactly-once: the streaming checkpoint dedups source files across
restarts, and EVERY state write is a per-batch-directory overwrite
whose content is a pure function of the wave + the OTHER batches'
state: when step 2 classifies a wave against history, the wave's own
``batch-{id}`` index directories are EXCLUDED from the history read.
A crash at any point therefore replays into byte-identical rewrites —
the replayed wave can never classify as a duplicate of itself (the
failure mode of an append-based index: once extended, a replay
computed ``accepted`` as empty and overwrote the corpus batch dir
with nothing, destroying the wave).

State grows with accepted docs (16 B + bands rows each), never with
corpus bytes; at 1000 executors the per-batch joins shuffle only
hash/band keys, with the (small) incoming batch as the broadcast side.
"""

from __future__ import annotations

import json
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


def _read_batch_dirs(
    spark: SparkSession, root: str, schema: str, exclude: str | None = None
) -> DataFrame:
    """Union of the per-batch parquet directories under ``root``,
    optionally excluding one batch's own directory (so a replayed wave
    classifies against the history WITHOUT itself — the property that
    makes every write idempotent under crash replay)."""
    try:
        dirs = sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("batch-") and d != exclude
            and os.path.isdir(os.path.join(root, d))
        )
    except FileNotFoundError:
        dirs = []
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def read_ingest_hashes(spark: SparkSession, state_dir: str) -> DataFrame:
    """Content-hash index over every admitted document."""
    return _read_batch_dirs(spark, os.path.join(state_dir, "hashes"), _EMPTY_HASHES)


def read_ingest_bands(spark: SparkSession, state_dir: str) -> DataFrame:
    """MinHash band index over every admitted document."""
    return _read_batch_dirs(spark, os.path.join(state_dir, "bands"), _EMPTY_BANDS)


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


def write_benchmark_band_index(
    bench: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
) -> str:
    """Persist the eval/benchmark set's MinHash band index once —
    the static side of streaming decontamination (``decon_spec``).
    Benchmarks are thousands of docs, so the index is broadcast-sized;
    it is rebuilt only when the benchmark suite changes.

    The signature parameters ``(k, bands)`` are persisted alongside
    the index (``_decon_params.json``): band keys hashed with
    different parameters NEVER collide, so a silent mismatch between
    the index and the ingest loop would let contamination pass
    undetected — :func:`stream_corpus_ingest` refuses to start on a
    mismatched or parameterless index instead."""
    ig.minhash_band_table(bench, id_col, text_col, k=k, bands=bands).write.mode(
        "overwrite"
    ).parquet(path)
    with open(os.path.join(path, "_decon_params.json"), "w") as f:
        json.dump({"k": k, "bands": bands}, f)
    return path


def _check_decon_params(bands_dir: str, k: int, bands: int) -> None:
    """Fail-fast guard for the decontamination gate (ADVICE r5): the
    ingest loop hashes the wave with ITS (k, bands); an index built
    with different parameters produces zero band collisions — i.e.
    contamination silently passes. Raise at stream START, not at the
    first (already too late) batch."""
    params_path = os.path.join(bands_dir, "_decon_params.json")
    try:
        with open(params_path) as f:
            params = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"benchmark band index at {bands_dir} carries no "
            "_decon_params.json — rebuild it with "
            "write_benchmark_band_index (a parameterless index cannot "
            "be checked against the ingest loop's k/bands and would "
            "silently miss contamination on mismatch)"
        ) from None
    if (params.get("k"), params.get("bands")) != (k, bands):
        raise ValueError(
            f"decontamination parameter mismatch: benchmark band index "
            f"at {bands_dir} was built with k={params.get('k')}, "
            f"bands={params.get('bands')} but the ingest loop uses "
            f"k={k}, bands={bands} — band keys from different "
            "parameters never collide, so this configuration would "
            "pass contamination through undetected"
        )


def read_ingest_contaminated(
    spark: SparkSession,
    state_dir: str,
    schema: T.StructType | str = "doc_id long, text string",
) -> DataFrame:
    """Audit trail of docs quarantined by the streaming
    decontamination gate (one per-batch directory each). Quarantine
    dirs hold the FULL ingest rows; ``schema`` is used only for the
    empty (nothing-quarantined-yet) case so both cases agree — pass
    the stream's schema when it differs from the default (ADVICE r5:
    the empty case previously returned a bare ``doc_id`` column)."""
    root = os.path.join(state_dir, "contaminated")
    try:
        dirs = sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("batch-") and os.path.isdir(os.path.join(root, d))
        )
    except FileNotFoundError:
        dirs = []
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*dirs)


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
    ann_spec: dict | None = None,
    decon_spec: dict | None = None,
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
    ``ann_spec`` (optional) maintains a persistent IVF index over the
    admitted docs' embedding column — keys: ``vec_col`` (required; the
    incoming schema must carry it), ``index_dir`` (default
    ``state_dir/ann_index``), ``n_centroids``. The FIRST admitting
    batch builds the frozen codebook; every later batch assigns its
    accepted vectors against it into a per-batch directory named by
    the streaming batch id, so crash replays rewrite rather than
    double-append (same discipline as the hash/band indexes). Query it
    with :func:`operators.similarity.search_ivf_index`.
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

    ``decon_spec`` (optional) adds streaming DECONTAMINATION: docs
    colliding (any shared LSH band, same k/bands as the dedup index)
    with a persisted benchmark band index are quarantined at admit
    time — written to ``contaminated/batch-{id}/`` (per-batch
    overwrite, replay-idempotent) and excluded from corpus, indexes,
    shards, and rollup. Keys: ``bands_dir`` (required — build it with
    :func:`write_benchmark_band_index`). The bench index is
    broadcast-sized (benchmarks are thousands of docs); the wave's
    signature pass is the one it already owes the near-dup classifier.
    """
    corpus_dir = os.path.join(state_dir, "corpus")
    hashes_dir = os.path.join(state_dir, "hashes")
    bands_dir = os.path.join(state_dir, "bands")
    rejected_dir = os.path.join(state_dir, "rejected")
    rollup_dir = os.path.join(state_dir, "rollup")
    checkpoint = os.path.join(state_dir, "checkpoint")
    if decon_spec is not None:
        # fail at stream START on a (k, bands)-mismatched benchmark
        # index — a mismatch yields zero collisions, i.e. silent
        # contamination pass-through (ADVICE r5)
        _check_decon_params(decon_spec["bands_dir"], k, bands)

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
        # 1b. decontamination gate: any survivor sharing an LSH band
        #     with the benchmark index is quarantined BEFORE the
        #     history classification and all state extension. The
        #     quarantine dir is a per-batch overwrite of deterministic
        #     content — a crash replay rewrites it bit-for-bit.
        if decon_spec is not None:
            me0 = f"batch-{batch_id:06d}"
            bench_bands = spark.read.parquet(decon_spec["bands_dir"]).select(
                F.col("band_id"), F.col("band_key")
            )
            wave_bands = ig.minhash_band_table(
                batch, id_col, text_col, k=k, bands=bands
            )
            contaminated_ids = (
                wave_bands.join(F.broadcast(bench_bands), ["band_id", "band_key"])
                .select(F.col("doc_id").alias(id_col))
                .distinct()
            )
            batch.join(contaminated_ids, id_col, "semi").write.mode(
                "overwrite"
            ).parquet(os.path.join(state_dir, "contaminated", me0))
            batch = batch.join(contaminated_ids, id_col, "anti")
        # 2. classify vs history indexes, EXCLUDING this batch's own
        #    per-batch index dirs: a crash-replayed wave therefore
        #    recomputes the IDENTICAL accepted set (it can never see
        #    itself as history), and every write below — all per-batch
        #    overwrites with deterministic content — rewrites the first
        #    attempt's bytes instead of destroying them
        me = f"batch-{batch_id:06d}"
        hist_h = _read_batch_dirs(spark, hashes_dir, _EMPTY_HASHES, exclude=me)
        hist_b = _read_batch_dirs(spark, bands_dir, _EMPTY_BANDS, exclude=me)
        verdicts = ig.dedup_incoming(
            batch, hist_h, hist_b, id_col, text_col, k=k, bands=bands
        )
        accepted_ids = verdicts.where(F.col("verdict") == "new").select("doc_id")
        accepted = batch.join(
            accepted_ids.withColumnRenamed("doc_id", id_col), id_col, "semi"
        )
        # materialize once — the same acceptance set feeds shards,
        # rollup, corpus, and both index writes
        accepted = accepted.localCheckpoint()
        if accepted.rdd.isEmpty():
            # wave fully duplicate: admit nothing, extend no state.
            # (Writing empty batch dirs would be harmless but noisy —
            # and skipping keeps "all-dup wave emits no shard dir".)
            return
        # 3a. derived artifacts: per-batch dirs, deterministic bytes
        if shard_spec is not None:
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
        if ann_spec is not None:
            from data_migration_etl_scripts_spark.operators.similarity import (
                append_ivf_index,
                build_ivf_index,
            )

            index_dir = ann_spec.get("index_dir") or os.path.join(
                state_dir, "ann_index"
            )
            vec_col = ann_spec["vec_col"]
            if not os.path.isdir(os.path.join(index_dir, "centroids")):
                # batch_name = the streaming batch id, so a replayed
                # first batch rewrites its own assigned dir (the append
                # path, taken on replay because centroids now exist,
                # uses the same name)
                build_ivf_index(
                    accepted, index_dir, id_col=id_col, vec_col=vec_col,
                    n_centroids=ann_spec.get("n_centroids", 8),
                    batch_name=me,
                )
            else:
                append_ivf_index(
                    accepted, index_dir, id_col=id_col, vec_col=vec_col,
                    batch_name=me,
                )
        # 3b. admit to the corpus sink — per-batch dir, overwrite
        accepted.write.mode("overwrite").parquet(os.path.join(corpus_dir, me))
        # 3c. extend history indexes — ALSO per-batch overwrite dirs;
        #     exclude-self in step 2 makes a replay after either (or a
        #     partial pair of) these writes recompute the identical
        #     accepted set and rewrite identical index rows
        ig.content_hash_table(accepted, id_col, text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(hashes_dir, me))
        ig.minhash_band_table(
            accepted, id_col, text_col, k=k, bands=bands
        ).write.mode("overwrite").parquet(os.path.join(bands_dir, me))

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
