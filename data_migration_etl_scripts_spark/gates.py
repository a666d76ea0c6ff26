"""Referential-integrity gates.

The reference follows nearly every FK-remap join with a null-count check
that raises and aborts the batch before anything is written (reference:
``utils/custom_err.py:1-6``; pattern at
``Main_Modules/Locations/locations.py:108-111``, ~25 sites).

Two implementations:

- ``require_no_nulls``: an explicit short-circuit action
  (``filter(isnull).limit(1)``) — cheap because it stops at the first
  offending row and Catalyst prunes all other columns.
- ``observed_gate``: attaches ``df.observe`` metrics so the check rides
  along with the *write* action — zero extra scans, the right shape for
  a 100 TB batch where a second scan is unaffordable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class IncrementalDependencyError(RuntimeError):
    """A batch references parent rows that have not been migrated yet.

    Mirrors the reference's abort-the-batch contract
    (``utils/custom_err.py:1-6``): the current micro-batch must not be
    written and the watermark must not advance.
    """


def require_no_nulls(df: DataFrame, *cols: str, context: str = "") -> DataFrame:
    """Abort if any of ``cols`` is null; otherwise return ``df`` unchanged.

    Short-circuits at the first offending row. Use for small/medium
    batches or tests; prefer ``observed_gate`` when the gate can be
    fused with the write.
    """
    predicate = None
    for c in cols:
        p = F.col(c).isNull()
        predicate = p if predicate is None else (predicate | p)
    offender = df.where(predicate).select(*cols).limit(1).collect()
    if offender:
        raise IncrementalDependencyError(
            f"unresolved FK in {context or 'batch'}: first offender {offender[0].asDict()}"
        )
    return df


@dataclass
class ObservedGate:
    """An observe()-based RI gate fused with a later action."""

    observation: Observation
    cols: tuple[str, ...]
    context: str = ""

    def check(self) -> None:
        """Call AFTER the action that consumed the observed DataFrame."""
        metrics = self.observation.get
        bad = {c: metrics[f"nulls_{c}"] for c in self.cols if metrics[f"nulls_{c}"]}
        if bad:
            raise IncrementalDependencyError(
                f"unresolved FK in {self.context or 'batch'}: null counts {bad}"
            )


_gate_counter = 0


def observed_gate(df: DataFrame, *cols: str, context: str = "") -> tuple[DataFrame, ObservedGate]:
    """Attach null-count metrics to ``df``; check them post-action.

    Note: with plain parquet sinks the write has already happened when
    the gate trips, so the caller must pair this with an idempotent /
    staged write (see cdc.run_incremental which writes to a staging
    path first). The reference has the same at-least-once semantics
    (SURVEY.md §3.1).
    """
    global _gate_counter
    _gate_counter += 1
    obs = Observation(f"ri_gate_{_gate_counter}")
    metrics = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), ObservedGate(obs, tuple(cols), context)
