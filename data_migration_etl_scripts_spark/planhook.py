"""Pre-checkpoint plan capture for iterative operators.

``localCheckpoint`` truncates lineage to ``Scan ExistingRDD``, so a
post-hoc ``explain()`` of an iterative query (PageRank, Lloyd's
k-means, logistic GD) shows nothing about the per-iteration plan —
the part a scale audit actually needs. Operators that checkpoint
inside a loop call :func:`capture` on the DataFrame immediately
BEFORE checkpointing; when a tool (tools/plan_audit.py) has called
:func:`enable`, the formatted plan is recorded, otherwise the call is
a single falsy branch (zero cost on the hot path).

Only the FIRST capture per label is kept — iteration plans are
shape-identical by construction (same loop body), and one non-vacuous
plan per loop is what the audit needs.
"""

from __future__ import annotations

_ENABLED = False
_CAPTURES: dict[str, str] = {}


def enable() -> None:
    global _ENABLED
    _ENABLED = True
    _CAPTURES.clear()


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def capture(label: str, df) -> None:
    """Record ``df``'s formatted physical plan under ``label`` (first
    capture per label wins). No-op unless :func:`enable` was called."""
    if not _ENABLED or label in _CAPTURES:
        return
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    _CAPTURES[label] = jqe.explainString(mode)


def drain() -> dict[str, str]:
    """Captured {label: formatted_plan}, clearing the buffer."""
    out = dict(_CAPTURES)
    _CAPTURES.clear()
    return out
