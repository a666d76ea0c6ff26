"""Streaming Count-Min heavy hitters: keep a mergeable CMS + a bounded
candidate set fresh from a file stream, exactly-once.

Each micro-batch builds its own depth x width sketch (O(batch) work,
map-side combined) and ADDS it to the persisted counters — the
defining CMS property: the folded sketch is bit-identical to the one
a single pass over all batches would build, so correctness reduces to
``operators/cms.py`` + the versioned-state discipline below.

Heavy hitters ride a CANDIDATE SET, the Cormode-Muthukrishnan
pattern: after each fold, candidates = (prior candidates ∪ the
batch's distinct keys) whose post-merge estimate >= phi * N (N = the
sketch's own total mass, sum(c)/depth — no side count kept). The set
is bounded by ~1/phi + CMS overestimation slack, NOT by the key
universe. Semantics are the standard streaming ones: a key whose
early mass arrived while it was below threshold re-enters the
candidate set the next time it APPEARS in a batch (its estimate only
grows); keys present in every batch — the regime heavy hitters live
in — are never missed, and the estimate itself is one-sided
(>= exact).

Exactly-once without a transaction log: sketch and candidates are
VERSIONED BY BATCH ID (``v=<batch_id>``), each batch folding the
newest version STRICTLY BELOW its own id and overwriting its own —
the same idempotent batch-directory pattern as rollup_stream.py, so
crash replays re-derive identical state instead of double-counting.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import cms as cm

_V_RE = re.compile(r"^v=(\d+)$")


def _versions(d: str) -> list[int]:
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(d, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def _latest(spark: SparkSession, d: str, below: int | None = None):
    vs = _versions(d)
    if below is not None:
        vs = [v for v in vs if v < below]
    if not vs:
        return None
    return spark.read.parquet(os.path.join(d, f"v={vs[-1]}"))


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed sketch (d, bucket, c), or None before batch 0."""
    return _latest(spark, os.path.join(state_dir, "sketch"))


def read_heavy_hitters(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed candidate set (key, est), or None."""
    return _latest(spark, os.path.join(state_dir, "candidates"))


def fold_batch_into_cms(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    phi: float = 0.01,
    keep_versions: int = 2,
) -> None:
    """Fold one batch's keys into the versioned sketch + candidates
    (idempotent under replay: always starts from the newest version
    below ``batch_id``)."""
    sketch_dir = os.path.join(state_dir, "sketch")
    cand_dir = os.path.join(state_dir, "candidates")
    keys = batch_df.select(F.col(key_col).alias("key")).where(
        F.col("key").isNotNull()
    )
    part = cm.cms_sketch(keys, "key", depth, width)
    prior = _latest(spark, sketch_dir, below=batch_id)
    merged = cm.cms_merge(prior, part) if prior is not None else part
    merged.write.mode("overwrite").parquet(
        os.path.join(sketch_dir, f"v={batch_id}")
    )
    merged = spark.read.parquet(os.path.join(sketch_dir, f"v={batch_id}"))

    # candidate maintenance: union prior candidates with this batch's
    # distinct keys, re-estimate against the merged sketch, keep >= phi*N.
    # N comes from the sketch itself (each key adds `depth` counter
    # increments, one per depth row).
    prior_cand = _latest(spark, cand_dir, below=batch_id)
    cand_keys = keys.distinct()
    if prior_cand is not None:
        cand_keys = cand_keys.unionByName(
            prior_cand.select("key")
        ).distinct()
    total = merged.agg(
        (F.sum("c") / F.lit(depth)).cast("long").alias("n")
    )
    est = cm.cms_estimate(cand_keys, merged, "key", depth, width)
    hitters = (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") >= F.lit(phi) * F.col("n"))
        .select("key", "est")
    )
    hitters.write.mode("overwrite").parquet(
        os.path.join(cand_dir, f"v={batch_id}")
    )
    for d in (sketch_dir, cand_dir):
        for v in _versions(d)[:-keep_versions]:
            shutil.rmtree(os.path.join(d, f"v={v}"), ignore_errors=True)


def stream_cms_heavy_hitters(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    schema: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    phi: float = 0.01,
    await_termination: bool = True,
):
    """Drain ``source_dir`` (availableNow), folding every file's keys
    into the sketch/candidate state. Call repeatedly as files land —
    the checkpoint skips processed files; the versioned fold makes
    crash replays no-ops."""
    checkpoint = os.path.join(state_dir, "checkpoint")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch_into_cms(
            spark, batch_df, batch_id, state_dir, key_col, depth, width, phi
        )

    query = (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
