"""Table profiling: per-column stats in ONE pass over the data.

``profile_columns`` is the data-quality/gate companion — null counts,
exact distinct counts, min/max per column, emitted as one row per
column. The whole profile is a single aggregate job: Spark evaluates
all per-column aggregates together (multiple DISTINCT aggregates plan
through Expand), then a ``stack`` unpivots the single result row.

Scale note (documented, and why ``approx`` exists): N exact DISTINCT
aggregates Expand the input N-fold pre-shuffle. Fine for gate-sized
dimension tables; for 100 TB fact profiling pass ``approx=True`` —
``approx_count_distinct`` (HyperLogLog++) is mergeable, one row per
partition into the shuffle, no Expand. HLL results are engine-specific
so approx mode has no value-exact oracle (rows-only checks).

``approx_profile`` adds the per-group sketch family: HLL distinct +
t-digest quantiles (``percentile_approx``) — the mergeable-sketch
shapes that replace exact percentiles at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s). min/max are cast to string so heterogeneous column
    types fit one schema. NULLs are excluded from n_distinct (SQL
    semantics) and min/max."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            nd.alias(f"__d_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__d_{c}"),
            F.col(f"__nn_{c}"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
        ]
    n = len(cols)
    return row.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(n), *stack_args
        ).alias("column", "n_distinct", "__nn", "min_s", "max_s"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_s",
        "max_s",
    )


def profile_columns_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of exact :func:`profile_columns` (UNION ALL per
    column — the oracle need not be single-pass, only value-equal)."""
    parts = [
        f"""
        SELECT '{c}' AS column,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_s,
               CAST(max({c}) AS VARCHAR) AS max_s
        FROM {table}
        """
        for c in columns
    ]
    return " UNION ALL ".join(parts)


def approx_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group mergeable sketches: HLL distinct count of ``value_col``
    plus t-digest quantiles. One shuffle carrying one sketch per group
    per task — the 100 TB replacement for exact percentiles (exact
    stays available for test parity via ``percentile_acctbal``-style
    queries)."""
    qcols = [
        F.percentile_approx(value_col, q, accuracy).alias(
            f"p{str(q).replace('0.', '')}"
        )
        for q in quantiles
    ]
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct(value_col).alias("approx_distinct"),
            *qcols,
        )
        .orderBy(group_col)
    )


def skew_report(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top`` hottest key values with
    their share of all rows and the skew factor (count / mean count
    per key). This is the measurement you take BEFORE choosing
    salting, AQE skew-split, or bucketing for a key — a skew factor in
    the hundreds means one task does hundreds of tasks' work.

    Plan shape: one map-side-partial count per key, a single-row
    global summary broadcast back, and TakeOrderedAndProject for the
    top slice — no global sort, safe at any key cardinality.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        F.col("key").cast("string").alias("key"),
        "n",
        F.round(F.col("n") / F.col("total_rows"), 6).alias("row_share"),
        F.round(
            F.col("n") * F.col("n_keys") / F.col("total_rows"), 3
        ).alias("skew_factor"),
    )
    return enriched.orderBy(F.desc("n"), "key").limit(top)


def skew_report_sql(table: str, key_col: str, top: int = 10) -> str:
    """DuckDB twin of :func:`skew_report`."""
    return f"""
        WITH counts AS (
            SELECT CAST({key_col} AS VARCHAR) AS key, count(*) AS n
            FROM {table} GROUP BY CAST({key_col} AS VARCHAR)
        ),
        t AS (SELECT sum(n) AS total_rows, count(*) AS n_keys FROM counts)
        SELECT key, n,
               round(n / CAST(total_rows AS DOUBLE), 6) AS row_share,
               round(n * n_keys / CAST(total_rows AS DOUBLE), 3) AS skew_factor
        FROM counts, t
        ORDER BY n DESC, key LIMIT {top}
    """
