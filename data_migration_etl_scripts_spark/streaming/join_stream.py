"""Streaming join-view maintenance: keep F ⋈ D fresh from a fact
file-stream against a slowly-changing dim snapshot, exactly-once.

The batch delta algebra lives in `operators/ivm.py`; the streaming
twist is WHAT must persist. Keeping fact history for (F_old ⋈ ΔD)
would make state O(all facts ever) — instead the state per version is

- ``view/``      the maintained join view,
- ``dim/``       the dim snapshot this version joined against,
- ``orphans/``   facts whose dim row has NOT arrived yet.

Per batch: ΔD = current dim snapshot minus the persisted one;
ΔV = (ΔF ⋈ dim_now) ∪ (orphans ⋈ ΔD); new orphans = old orphans that
still miss their dim ∪ ΔF rows that missed theirs. History facts are
NEVER re-read — late-arriving dims retry only against the orphan set,
which is bounded by the referential-integrity violation rate, not by
stream length. (Late DIMS are the supported direction; fact deletes
belong to the batch CDC path, `ivm.maintain_join_cdc`.)

Exactly-once without a transaction log: state is VERSIONED BY BATCH ID
(``v=<batch_id>``), each batch folds from the newest version STRICTLY
below its own id and (over)writes its own — the same idempotent
pattern as streaming/rollup_stream.py, so crash replays re-derive
identical output instead of double-joining.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_V_RE = re.compile(r"^v=(\d+)$")


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        m = _V_RE.match(d)
        if m and os.path.exists(os.path.join(state_dir, d, "view", "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_join_view(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed view, or None before the first batch."""
    vs = _versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}", "view"))


def fold_batch_into_join(
    spark: SparkSession,
    f_delta: DataFrame,
    batch_id: int,
    state_dir: str,
    dim_now: DataFrame,
    on: str,
    keep_versions: int = 2,
) -> None:
    """Fold one fact batch + the current dim snapshot into the
    versioned join state (idempotent under replay of ``batch_id``)."""
    prior_vs = [v for v in _versions(state_dir) if v < batch_id]
    vdir = os.path.join(state_dir, f"v={batch_id}")
    if prior_vs:
        base = os.path.join(state_dir, f"v={prior_vs[-1]}")
        view_prev = spark.read.parquet(os.path.join(base, "view"))
        dim_prev = spark.read.parquet(os.path.join(base, "dim"))
        orphans_prev = spark.read.parquet(os.path.join(base, "orphans"))
        d_delta = dim_now.join(F.broadcast(dim_prev.select(on)), on, "left_anti")
    else:
        view_prev = orphans_prev = None
        d_delta = dim_now
    new_view_rows = f_delta.join(F.broadcast(dim_now), on)
    matched_orphans = (
        orphans_prev.join(F.broadcast(d_delta), on)
        if orphans_prev is not None else None
    )
    parts = [new_view_rows] + (
        [matched_orphans] if matched_orphans is not None else []
    )
    dv = parts[0]
    for p in parts[1:]:
        dv = dv.unionByName(p)
    view_new = view_prev.unionByName(dv) if view_prev is not None else dv
    orphans_new = f_delta.join(F.broadcast(dim_now.select(on)), on, "left_anti")
    if orphans_prev is not None:
        orphans_new = orphans_new.unionByName(
            orphans_prev.join(F.broadcast(d_delta.select(on)), on, "left_anti")
        )
    # companions FIRST, the gating view write LAST: _versions() treats
    # view/_SUCCESS as the version's commit marker, so it must appear
    # only once dim/ and orphans/ exist — a crash mid-fold then leaves
    # an unlisted torn directory that the replay overwrites, never a
    # 'committed' version with missing companions
    dim_now.write.mode("overwrite").parquet(os.path.join(vdir, "dim"))
    orphans_new.write.mode("overwrite").parquet(os.path.join(vdir, "orphans"))
    view_new.write.mode("overwrite").parquet(os.path.join(vdir, "view"))
    for v in _versions(state_dir)[:-keep_versions]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def stream_join_maintenance(
    spark: SparkSession,
    fact_dir: str,
    dim_dir: str,
    state_dir: str,
    fact_schema: str,
    on: str,
    await_termination: bool = True,
):
    """Drain ``fact_dir`` (availableNow), folding each batch against
    the CURRENT dim snapshot in ``dim_dir``. Call repeatedly as fact
    files and dim rows land — the checkpoint skips processed fact
    files; dim growth between calls is picked up as ΔD and retried
    against the orphan set."""
    checkpoint = os.path.join(state_dir, "checkpoint")
    join_state = os.path.join(state_dir, "join")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        dim_now = spark.read.parquet(dim_dir)
        fold_batch_into_join(
            spark, batch_df, batch_id, join_state, dim_now, on
        )

    query = (
        spark.readStream.format("parquet")
        .schema(fact_schema)
        .load(fact_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
