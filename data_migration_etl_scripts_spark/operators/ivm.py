"""Incremental view maintenance for equi-joins (delta processing).

`operators/rollup.py` maintains AGGREGATE views by merging partials;
this module maintains JOIN views under insert-only deltas — the other
half of warehouse-style IVM. For V = F ⋈ D and per-batch inserts
(ΔF, ΔD), the delta algebra is

    ΔV = (ΔF ⋈ D_old) ∪ (F_old ⋈ ΔD) ∪ (ΔF ⋈ ΔD)
        = (ΔF ⋈ D_new) ∪ (F_old ⋈ ΔD)          [D_new = D_old ∪ ΔD]

so a batch touches history exactly once (F_old ⋈ ΔD), and only on the
delta's join keys. At 100 TB the right deployment shape is the second
form with ΔD broadcast (dims change slowly) — the history probe is a
broadcast join over the big fact, never a fact shuffle; the ΔF side
joins the full dim the same way the initial build did. Never
recompute F_new ⋈ D_new.

Reference parity: the reference ETL rebuilds its joined sync tables
from scratch each run (full SELECT + pandas merge per script); this
is the engine-native upgrade the CDC loop (cdc.py) composes with —
batch extraction already yields exactly the ΔF/ΔD inputs.

Correctness contract (pinned by the ivm_join_orders_customer board
query): after any number of batches, the maintained view hash-equals
the one-shot F ⋈ D oracle — the green hash IS the proof that the
delta algebra covers all four (old, new) quadrants exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    f_old: DataFrame | None,
    f_delta: DataFrame,
    d_old: DataFrame | None,
    d_delta: DataFrame,
    on: list[str] | str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """ΔV for one insert-only batch. ``f_old``/``d_old`` may be None
    (initial build). The dim sides broadcast by default — at scale ΔD
    and D are both dimension-sized; disable for fact-fact joins."""
    keys = [on] if isinstance(on, str) else list(on)
    bc = F.broadcast if broadcast_dim else (lambda df: df)
    d_new = d_delta if d_old is None else d_old.unionByName(d_delta)
    parts = [f_delta.join(bc(d_new), keys)]
    if f_old is not None:
        parts.append(f_old.join(bc(d_delta), keys))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def maintain_join(
    f_batches: list[DataFrame],
    d_batches: list[DataFrame],
    on: list[str] | str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fold batch lists through :func:`join_delta`, returning the
    maintained view V after all batches. Batch lists may differ in
    length (pad the shorter side with empty deltas). History unions
    stay lazy — Spark plans each ΔV against the accumulated lineage;
    a deployment would persist V and the side snapshots per batch
    (same pattern as cdc.py's staged writes)."""
    if not f_batches or not d_batches:
        raise ValueError(
            "maintain_join needs at least one batch on EACH side (the "
            "first batch seeds the schemas; pass an explicit .limit(0) "
            "frame for a side with no data)"
        )
    n = max(len(f_batches), len(d_batches))
    f_old: DataFrame | None = None
    d_old: DataFrame | None = None
    view: DataFrame | None = None
    for i in range(n):
        fd = f_batches[i] if i < len(f_batches) else f_batches[0].limit(0)
        dd = d_batches[i] if i < len(d_batches) else d_batches[0].limit(0)
        dv = join_delta(f_old, fd, d_old, dd, on, broadcast_dim)
        view = dv if view is None else view.unionByName(dv)
        f_old = fd if f_old is None else f_old.unionByName(fd)
        d_old = dd if d_old is None else d_old.unionByName(dd)
    assert view is not None
    return view


def maintain_join_cdc(
    batches: list[dict],
    on: list[str] | str,
    fact_key: str,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Full-CDC join maintenance: each batch is a dict with any of
    ``f_ins``/``d_ins`` (insert DataFrames) and ``f_del``/``d_del``
    (single-column key frames). Deletes apply BEFORE the batch's
    inserts (the CDC convention: a replace arrives as delete+insert).

    The maintained view and side snapshots are pruned by ANTI joins on
    the delete keys — at scale the delete keyset is batch-sized and
    broadcasts, so retraction costs one broadcast anti-join over V,
    never a rebuild. Dim deletes cascade: every view row carrying a
    deleted dim key retracts, exactly matching the one-shot join over
    the surviving sets (the oracle).

    A delete arriving before ANY insert on its side is a malformed
    feed (there is nothing the keys could retract) and raises
    ValueError rather than being silently dropped."""
    keys = [on] if isinstance(on, str) else list(on)
    f_old: DataFrame | None = None
    d_old: DataFrame | None = None
    view: DataFrame | None = None
    for b in batches:
        f_del, d_del = b.get("f_del"), b.get("d_del")
        if f_del is not None and f_old is None:
            raise ValueError(
                "maintain_join_cdc: f_del arrived before any f_ins — "
                "a delete cannot precede the first insert on its side"
            )
        if d_del is not None and d_old is None:
            raise ValueError(
                "maintain_join_cdc: d_del arrived before any d_ins — "
                "a delete cannot precede the first insert on its side"
            )
        if f_del is not None and f_old is not None:
            f_old = f_old.join(F.broadcast(f_del), fact_key, "left_anti")
            view = view.join(F.broadcast(f_del), fact_key, "left_anti") if view is not None else None
        if d_del is not None and d_old is not None:
            d_old = d_old.join(F.broadcast(d_del), dim_key, "left_anti")
            view = view.join(F.broadcast(d_del), dim_key, "left_anti") if view is not None else None
        fd = b.get("f_ins")
        dd = b.get("d_ins")
        if fd is None and f_old is not None:
            fd = f_old.limit(0)
        if dd is None and d_old is not None:
            dd = d_old.limit(0)
        if fd is None or dd is None:
            # schemas come from the seeds: without a prior batch there
            # is nothing to derive an empty delta from
            raise ValueError(
                "maintain_join_cdc: the FIRST batch must carry both "
                "f_ins and d_ins (seed frames; .limit(0) is fine) — "
                f"got keys {sorted(b)}"
            )
        dv = join_delta(f_old, fd, d_old, dd, keys, broadcast_dim)
        view = dv if view is None else view.unionByName(dv)
        f_old = fd if f_old is None else f_old.unionByName(fd)
        d_old = dd if d_old is None else d_old.unionByName(dd)
    assert view is not None
    return view
