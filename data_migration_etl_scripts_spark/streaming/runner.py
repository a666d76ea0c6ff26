"""Streaming micro-batch runner: the CDC loop as Structured Streaming.

``stream_pipeline`` reads a directory as a file stream (new files =
new batches — the file-arrival analog of `pk > watermark`), applies
the SAME transform callable an IncrementalPipeline uses (gates raise
inside foreachBatch, failing the query before the batch commits), and
appends to the catalog sink. The streaming checkpoint replaces the
EtlCDC watermark table, and every sink write is a per-batch-id
OVERWRITE directory, so a crash-replayed batch rewrites its own
output instead of appending a duplicate — exactly-once per batch,
strictly stronger than the reference's at-least-once contract
(SURVEY.md §2.1 S11).

``trigger_available_now`` drains everything currently in the source
then stops — the streaming equivalent of the reference's "loop until
extract() returns empty" (``Template_Tables/makes.py:117-127``).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_pipeline(
    spark: SparkSession,
    catalog,
    name: str,
    source_dir: str,
    schema: T.StructType | str,
    sink_table: str,
    transform: Callable[[DataFrame, datetime], DataFrame] = lambda df, ts: df,
    batch_ts: datetime | None = None,
    source_format: str = "parquet",
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    expectations: Callable[[DataFrame], DataFrame] | None = None,
    extra_sinks=(),
):
    """Run (or start) the streaming version of a pipeline.

    ``expectations`` mirrors IncrementalPipeline.expectations: the
    transformed batch is checked pre-append; a violation fails the
    query before the batch commits, so a fixed rerun resumes cleanly
    from the checkpoint.

    Returns the StreamingQuery (terminated already when
    ``await_termination`` with availableNow).
    """
    ts = batch_ts or datetime.now(timezone.utc)
    reader = spark.readStream.format(source_format).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)

    sink_path = os.path.join(catalog.scratch_dir, sink_table)
    checkpoint = os.path.join(catalog.scratch_dir, f"_checkpoints/{name}")

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df, ts)
        if expectations is not None:
            from data_migration_etl_scripts_spark.operators.expectations import (
                enforce,
            )

            enforce(expectations(out))  # fails the query pre-commit
        if extra_sinks:
            # dual-output loads (entity + crosswalk): materialize the
            # transformed batch once, derive every sink from it
            out = out.localCheckpoint()
        # per-BATCH overwrite directories, not appends: a crash between
        # any sink write and the checkpoint commit replays the batch,
        # and an append would duplicate the wave (or leave the entity
        # sink a wave ahead of its crosswalk). Per-batch dirs make the
        # replay a byte-identical rewrite — the same discipline as
        # cdc.py's idempotent mode and streaming/ingest.py; readers
        # (catalog.read) list sink directories recursively.
        sub = f"batch-{batch_id:06d}"
        out.write.mode("overwrite").parquet(os.path.join(sink_path, sub))
        for extra_table, fn in extra_sinks or ():
            fn(out).write.mode("overwrite").parquet(
                os.path.join(catalog.scratch_dir, extra_table, sub)
            )

    query = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def stream_incremental_pipeline(
    spark: SparkSession,
    catalog,
    pipeline,
    source_dir: str,
    schema: T.StructType | str,
    **kwargs,
):
    """Run ANY batch ``IncrementalPipeline`` spec as a file stream.

    The registry configs (DIMENSION_CONFIGS / ENTITY_CONFIGS /
    SYNC_CONFIGS / GATED_ENTITY_CONFIGS) build pipelines whose
    ``transform`` closes over the catalog for its lookups — streaming
    them requires NOTHING extra: the same transform runs inside
    foreachBatch, RI gates raise pre-commit (failing the query so a
    fixed rerun resumes from the checkpoint), expectations gate the
    batch, and extra sinks (dual-output crosswalks) append alongside
    the main sink. Batch and streaming are the same pipeline spec with
    a different extract: ``pk > watermark`` becomes file arrival.
    """
    return stream_pipeline(
        spark,
        catalog,
        pipeline.name,
        source_dir,
        schema,
        pipeline.sink_table,
        transform=pipeline.transform,
        expectations=pipeline.expectations,
        extra_sinks=pipeline.extra_sinks,
        **kwargs,
    )
