"""Temporal joins Spark's API lacks as primitives: AS-OF join and
binned RANGE join, both expressed as scalable compositions of
DataFrame ops (no UDF, no per-key loops).

- :func:`asof_join` — each left row picks the LATEST right row with
  ``right_ts <= left_ts`` per key (point-in-time correctness: "the
  price in effect at order time", "the last login before purchase").
  Implementation is the union-marker trick: union both sides tagged,
  one per-key window ordered by (ts, side, tiebreak) forward-fills the
  right columns with ``last(ignorenulls)``, then keep left rows. One
  shuffle on the key, window sorts stay partition-local — never a
  per-left-row subquery/scan, never a range cross-join.

- :func:`range_join_binned` — match left intervals [start, end) to
  right timestamps by exploding each interval over fixed-width time
  bins and equi-joining on (key, bin) before the exact filter. Catalyst
  turns an inequality-only join into a nested loop; the bin equi-key
  makes it a hash join whose fan-out is bounded by interval/bin_width.
  (Same plan AQE can then skew-split — boilerplate-hot keys included.)

Cross-engine oracle: DuckDB has native ``ASOF JOIN`` and handles the
inequality join directly — the oracles are the *naive* formulations,
the Spark plans are the scale-right ones, and the driver hash-compares
their results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + ``right_cols`` from the
    latest right row with ``right_ts <= left_ts`` (ties on equal ts
    include the right row). Unmatched left rows keep nulls.

    ``key`` may be one column name or a sequence (composite equi-key;
    left and right must share the names — rename the right frame
    first if they differ). ``direction`` follows pandas
    ``merge_asof`` vocabulary: ``"backward"`` (default) picks the
    LATEST right row with ``right_ts <= left_ts``; ``"forward"``
    picks the EARLIEST right row with ``right_ts >= left_ts``.

    ``tiebreak`` orders right rows sharing (key, ts) — pass the right
    table's id column for a deterministic winner (latest wins);
    required for oracle parity when such duplicates exist.

    Scale note: this is the union-marker form — one shuffle on the
    key, per-key window sorts, ZERO pair inflation. Never express
    as-of as an equi-join with the time inequality as a join filter:
    that materializes |L|x|R| pairs per key before the window prunes
    them, the classic hot-key wall at 100x data.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    # the key columns come from the right row itself; every left column
    # is null on this side (unionByName fills them)
    # a null right timestamp satisfies no inequality: it must not be
    # forward-filled into left rows (nulls sort first under asc order)
    r = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias(
            "__tb"
        ),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows (side 1) at equal ts, so
    # an exactly-simultaneous right row IS visible to the left row.
    # forward direction walks time descending: the last right row seen
    # at or after the left ts is the EARLIEST such row. Left rows with a
    # NULL timestamp must match nothing in either direction: asc defaults
    # to NULLS FIRST (fine for backward); the descending walk needs
    # desc_nulls_first, else the null left row sorts after every right
    # row and inherits the earliest one. The tiebreak stays ascending in
    # BOTH directions — "latest tiebreak wins" means the largest __tb
    # must be the last row the window sees among equal-ts rights.
    ts_order = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    tb_order = F.col("__tb").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side"), tb_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
) -> str:
    """DuckDB twin using native ASOF JOIN. Right rows are pre-deduped
    to one winner per (key, ts) via ``tiebreak`` (latest wins) so both
    engines agree when duplicate timestamps exist."""
    rsel = ", ".join(f"r.{c} AS asof_{c}" for c in right_cols)
    dedup = (
        f"""(SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY {key}, {right_ts} ORDER BY {tiebreak} DESC
                ) AS __rn FROM ({right_sql})
            ) WHERE __rn = 1)"""
        if tiebreak
        else f"({right_sql})"
    )
    return f"""
        SELECT l.*, {rsel}
        FROM ({left_sql}) l
        ASOF LEFT JOIN {dedup} r
          ON l.{key} = r.{key} AND l.{left_ts} >= r.{right_ts}
    """


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner join of left intervals [left_start, left_end) to right
    rows with ``left_start <= right_ts < left_end`` on the same key,
    via time-bin equi-keys (hash join) + exact post-filter. Fan-out
    per left row = interval / bin_seconds (+1); pick ``bin_seconds``
    near the typical interval length.
    """
    # bins come from SECOND-truncated epochs (cheap int math); the bin
    # range is inclusive of floor(end) — one possibly-superfluous bin
    # beats dropping sub-second matches — and the exact filter below
    # compares the full-precision timestamps, so bins only ever
    # over-approximate
    bs = F.lit(bin_seconds)
    ls = F.unix_timestamp(F.col(left_start))
    le = F.unix_timestamp(F.col(left_end))
    rt = F.unix_timestamp(F.col(right_ts))
    lbins = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(ls / bs), F.floor(le / bs))),
    )
    rbins = right.withColumn("__bin", F.floor(rt / bs))
    joined = lbins.join(rbins, [key, "__bin"])
    return joined.where(
        (F.col(right_ts) >= F.col(left_start)) & (F.col(right_ts) < F.col(left_end))
    ).drop("__bin")
