"""Driver-side input-size evidence for two-path operators (r13).

The driver-resident small paths must decide whether to even PROBE for
the small regime. A probe that collects/aggregates the relation is
the work itself below the cap, but pure overhead prepended to the
distributed plan above it (VERDICT r12 item 5). Catalyst's
optimizedPlan-level ``sizeInBytes`` is useless for the decision —
join estimates multiply (a 27 MB two-table join at sf0.1 estimates
2.2 TB) — but the LEAF scan sizes are the honest "bytes this plan
must read" signal when the leaves ARE scans: parquet files report
real sizes, LocalRelations their actual byte size.

APPLICABILITY CAVEAT (measured): a localCheckpoint leaf (LogicalRDD)
inherits its ORIGIN plan's statistics — if the origin was a join, the
leaf carries the multiplied garbage (a ~27 MB sf0.1 pair plan
reported 717 GB). Gate only relations whose plans sit directly on
scans/local data (pagerank's query-path edge relations); operators
whose inputs routinely arrive checkpointed (dup_clusters) use the
observe-on-checkpoint count instead — see curation.dup_clusters.

``leaf_input_bytes`` is pure driver-side plan inspection: no job, no
py4j beyond one plan walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: treat any leaf at/above this as "unknown/huge" (Spark's
#: defaultSizeInBytes for stat-less leaves is Long.MaxValue)
_UNKNOWN_FLOOR = 1 << 60


def leaf_input_bytes(df: DataFrame) -> int:
    """Sum of the optimized plan's leaf-relation size estimates in
    bytes; -1 when the plan cannot be inspected (callers should treat
    -1 as "small" to preserve the probe-first behavior on exotic
    relations). A leaf with no statistics saturates the sum."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            size = int(leaves.apply(i).stats().sizeInBytes())
            if size >= _UNKNOWN_FLOOR:
                return _UNKNOWN_FLOOR
            total += size
        return total
    except Exception:
        return -1


def probe_allowed(df: DataFrame, env_var: str, default_bytes: int) -> bool:
    """True when the relation's leaf input is small enough that a
    driver-path probe (bounded collect / pair aggregate) is plausibly
    the work rather than wasted overhead. ``env_var`` overrides the
    byte ceiling (0 disables probing entirely)."""
    import os

    cap = int(os.environ.get(env_var, default_bytes))
    if cap <= 0:
        return False
    got = leaf_input_bytes(df)
    return got < 0 or got <= cap
