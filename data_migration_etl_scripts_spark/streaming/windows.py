"""Event-time windowed aggregation + sessionization for streams.

Batch analogs exist in queries.py (sessionization via lag windows);
these are the streaming-native forms: tumbling windows with a
watermark for late data, and ``session_window`` with a gap — state
bounded by the watermark, so they run indefinitely at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    group_extra: tuple[str, ...] = ("event_type",),
    agg_value: Column | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums with late-data watermark.

    ``agg_value`` must be aliased to ``total_value`` if provided.
    Works on both streaming and batch frames (batch ignores the
    watermark) — tests assert batch/stream result parity.
    """
    value = agg_value if agg_value is not None else F.sum("value").alias("total_value")
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *group_extra)
        .agg(F.count(F.lit(1)).alias("n_events"), value)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_extra,
            "n_events",
            "total_value",
        )
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state:
    duplicates arriving within the watermark window are dropped, state
    for keys older than the watermark is evicted — the streaming analog
    of the batch dropDuplicates, and the standard guard in front of an
    at-least-once upstream (e.g. replayed CDC batches)."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Session windows per key with a gap timeout — the streaming-native
    form of the batch lag-based sessionization."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("s"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
