"""Session-scoped build-once stage memoization — a documented engine
surface (promoted in round 6 from an internal of the dedup family).

Several board queries consume the same expensive intermediate (minhash
signatures/pairs, IVF cell assignments, PQ codebooks/codes): rebuilding
it per query is pure duplicated work, and the multi-KB literal
expressions some operators generate also cost Catalyst a
data-independent re-analysis (~seconds) per plan. This module gives
pipeline authors the build-once/serve-many cost model safely:

- :func:`memo` — memoize ANY driver-side value (collected codebooks,
  centroid rows) under a semantic key.
- :func:`memo_stage` — memoize a DataFrame stage; the first call
  ``localCheckpoint()``s the built relation (eager: analysis and
  compute happen exactly once), later calls get the materialized leaf
  scan.
- :func:`cached_expr` — parse a generated SQL string to an unresolved
  Column once per session (ANTLR over a 512-4096-term literal tree is
  ~0.5-1 s per parse).

INVALIDATION CONTRACT (read before adding a call site):

1. Keys are AUTOMATICALLY namespaced by ``applicationId``; entries
   keyed by dead sessions are evicted on every access, so a long-lived
   process cycling SparkSessions cannot leak memory here and a new
   session can never read another session's relations.
2. The caller's key must include EVERY semantic input of the builder:
   the source token (e.g. the sf_dir path — two data directories must
   never share an entry), all algorithm parameters (k, bands,
   n_centroids, m_sub...), and the column names involved. The cache
   does not inspect the builder; an under-specified key serves stale
   results silently.
3. In-session memoization assumes the SOURCE DATA is immutable for the
   session (true for the parquet test dirs and for any lake layout
   with immutable files). For mutating sources, key on a version/
   snapshot id, or use the persisted-index pattern instead
   (operators/ingest.py artifacts) — which is also the deployment-
   scale analog of this module: at 100 TB the "first build" is an
   indexing job and the "memo hit" is a band/assignment index scan.
4. BENCH-ORDER DISCLOSURE: within one session the FIRST query of a
   family absorbs the build cost; per-query timings of family members
   are therefore order-dependent (the family TOTAL is what the memo
   optimizes). bench.py notes this next to its per-query JSON.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VALUES: dict[tuple, Any] = {}
_EXPRS: dict[tuple, Column] = {}


def _evict_dead(store: dict, app_id: str) -> None:
    dead = [k for k in store if k[0] != app_id]
    for k in dead:
        del store[k]


def memo(spark, key: tuple, builder: Callable[[], Any]) -> Any:
    """Build-once memoization of an arbitrary driver-side value under
    ``(applicationId,) + key``. Dead-session entries are evicted on
    access (ADVICE r5: the dicts must not grow unboundedly in
    long-lived multi-session processes)."""
    app_id = spark.sparkContext.applicationId
    _evict_dead(_VALUES, app_id)
    full_key = (app_id,) + key
    if full_key not in _VALUES:
        _VALUES[full_key] = builder()
    return _VALUES[full_key]


def memo_stage(spark, key: tuple, builder: Callable[[], DataFrame]) -> DataFrame:
    """Build-once memoization of an expensive DataFrame stage: the
    first call localCheckpoints the built relation, later calls with
    the same key get the materialized leaf scan."""
    return memo(spark, ("__stage__",) + key, lambda: builder().localCheckpoint())


def clear() -> None:
    """Drop every memoized value and parsed expression — bench repeat
    rounds call this between full-inventory passes so every round pays
    the family build costs exactly like a fresh session (honest
    medians; see bench.py --repeat)."""
    _VALUES.clear()
    _EXPRS.clear()


def cached_expr(spark, sql: str) -> Column:
    """Parse a generated SQL string once per session. Unresolved
    Columns are plan-independent, so reuse across plans is safe."""
    app_id = spark.sparkContext.applicationId
    _evict_dead(_EXPRS, app_id)
    key = (app_id, sql)
    col = _EXPRS.get(key)
    if col is None:
        col = F.expr(sql)
        _EXPRS[key] = col
    return col
