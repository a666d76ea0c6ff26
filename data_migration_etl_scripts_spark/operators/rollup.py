"""Incremental aggregate maintenance: keep a rollup table fresh from
new batches WITHOUT rescanning history.

At 100 TB the history fact table is the thing you never want to touch
twice. The standard fix is a mergeable-partials rollup: persist
(group keys -> count, decimal sum, min, max) and fold each incremental
batch in with a group-cardinality-sized merge:

    rollup(history UNION batch) == merge(rollup(history), rollup(batch))

which holds because every partial is a commutative monoid (count/sum
add, min/max combine). Derived measures (avg) are computed at read
time from the partials — never stored, so they stay mergeable.

The driver-checked query proves the algebra end to end: it maintains
the rollup incrementally across a simulated watermark split and
hash-matches a straight one-shot aggregate over the full table.

Sums are DECIMAL so the merge is exact and order-independent — at
1000 executors (or any union order) double partial sums would make
runs disagree with each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type used for exact, order-independent measure sums
_SUM_TYPE = "decimal(28,4)"


def rollup_partials(
    df: DataFrame, group_cols: list[str], measure_cols: list[str]
) -> DataFrame:
    """One hash aggregate (map-side partials) -> mergeable rollup rows:
    ``n_rows`` plus (sum_/min_/max_) per measure column."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measure_cols:
        aggs += [
            F.sum(F.col(m).cast(_SUM_TYPE)).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_partials(
    a: DataFrame, b: DataFrame, group_cols: list[str], measure_cols: list[str]
) -> DataFrame:
    """Fold two partial rollups into one. Cost is O(rollup rows) — the
    history FACTS are never touched, only their (tiny) rollup."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measure_cols:
        aggs += [
            F.sum(f"sum_{m}").cast(_SUM_TYPE).alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    return a.unionByName(b).groupBy(*group_cols).agg(*aggs)


def rollup_read(
    rollup: DataFrame, measure_cols: list[str], avg_of: list[str] | None = None
) -> DataFrame:
    """Read-time view over the partials: doubles for sums plus derived
    averages (sum/n from the partials, so avg stays mergeable)."""
    out = rollup
    for m in measure_cols:
        out = out.withColumn(f"sum_{m}", F.col(f"sum_{m}").cast("double"))
    for m in avg_of or []:
        out = out.withColumn(
            f"avg_{m}",
            F.col(f"sum_{m}") / F.col("n_rows").cast("double"),
        )
    return out


def rollup_oracle_sql(
    table: str, group_exprs: dict[str, str], measure_cols: list[str],
    avg_of: list[str] | None = None,
) -> str:
    """DuckDB twin: the straight one-shot aggregate over the FULL table
    — what the incremental merge must equal."""
    keys = ", ".join(f"{expr} AS {name}" for name, expr in group_exprs.items())
    cols = [f"count(*) AS n_rows"]
    for m in measure_cols:
        cols += [
            f"CAST(CAST(sum(CAST({m} AS DECIMAL(28,4))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_{m}",
            f"min({m}) AS min_{m}",
            f"max({m}) AS max_{m}",
        ]
    for m in avg_of or []:
        cols += [
            f"CAST(CAST(sum(CAST({m} AS DECIMAL(28,4))) AS DECIMAL(28,4)) AS DOUBLE)"
            f" / CAST(count(*) AS DOUBLE) AS avg_{m}"
        ]
    return (
        f"SELECT {keys}, {', '.join(cols)} FROM {table} "
        f"GROUP BY {', '.join(group_exprs.values())}"
    )
