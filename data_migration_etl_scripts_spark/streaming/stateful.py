"""Custom stateful streaming operators via applyInPandasWithState.

This is the escape hatch for stateful logic the built-in windowed/
session aggregates cannot express (per-key accumulators, custom
eviction, cross-batch dedup state). State is partitioned by key and
checkpointed by the engine, so it scales with keys-per-executor, and
survives restarts — the Arrow-batched Python kernel only ever sees one
key's rows at a time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, total double"


def running_user_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key lifetime event count + value sum, maintained across
    micro-batches (the streaming analog of a continuously-updated
    aggregate table)."""

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
