"""Snapshot diffing: compare two versions of a table (yesterday's load
vs today's, V1 source vs migrated V2, pre- vs post-refactor pipeline
output) and report exactly what changed.

This is the regression-validation companion to the CDC loop — the
reference's zTEST scoped re-runs imply "did the rerun change
anything?"; ``snapshot_diff`` answers it distributed:

    (pk..., change_type in {'added', 'removed', 'changed'})

Unchanged rows (the overwhelming majority in real diffs) are dropped
INSIDE the join output before anything else happens, so the result is
O(changes), not O(table).

Scale shape: each side is reduced map-side to (pk, row_hash) — one
narrow shuffle per side on the pk for the full-outer join, which AQE
can also skew-split. The row hash is md5 over null-sentineled,
'|'-joined compare columns (cast to string), so the compare cost is a
codegen'd projection, not a column-by-column join condition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel distinguishing NULL from the string 'NULL' in row hashes
_NULL = "\x00<null>\x00"


def _row_hash(cols: Sequence[str]) -> F.Column:
    return F.md5(
        F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows added/removed/changed between two snapshots, by primary key.

    ``compare_cols`` defaults to every shared non-pk column. Rows with
    equal hashes are discarded pre-output; duplicated pks are the
    caller's bug (diff semantics need a key).
    """
    pk = list(pk_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(pk)]
    cmp_cols = list(compare_cols)
    o = old.select(*pk, _row_hash(cmp_cols).alias("old_hash"))
    n = new.select(*pk, _row_hash(cmp_cols).alias("new_hash"))
    joined = o.join(n, pk, "full_outer")
    return joined.select(
        *pk,
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .alias("change_type"),
    ).where(F.col("change_type").isNotNull())


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    pk_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` (same sentinel + hash)."""
    pk = list(pk_cols)
    hash_expr = "md5(" + " || '|' || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(0) || '<null>' || chr(0))"
        for c in compare_cols
    ) + ")" if len(compare_cols) > 1 else (
        f"md5(COALESCE(CAST({compare_cols[0]} AS VARCHAR), chr(0) || '<null>' || chr(0)))"
    )
    pk_select = ", ".join(f"COALESCE(o.{c}, n.{c}) AS {c}" for c in pk)
    on = " AND ".join(f"o.{c} = n.{c}" for c in pk)
    return f"""
        WITH o AS (SELECT {', '.join(pk)}, {hash_expr} AS old_hash FROM ({old_sql})),
             n AS (SELECT {', '.join(pk)}, {hash_expr} AS new_hash FROM ({new_sql}))
        SELECT {pk_select},
               CASE WHEN o.old_hash IS NULL THEN 'added'
                    WHEN n.new_hash IS NULL THEN 'removed'
                    WHEN o.old_hash <> n.new_hash THEN 'changed'
               END AS change_type
        FROM o FULL OUTER JOIN n ON {on}
        WHERE CASE WHEN o.old_hash IS NULL THEN 'added'
                   WHEN n.new_hash IS NULL THEN 'removed'
                   WHEN o.old_hash <> n.new_hash THEN 'changed'
              END IS NOT NULL
    """


def fk_orphan_report(
    facts: DataFrame,
    fks: Sequence[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity report across ALL foreign keys in ONE scan
    of the fact table: for each (fk_col, dim_df, dim_key) triple,
    count rows whose non-null fk has no match in the dimension.

    The pre-load companion to the hard RI gates in ``gates.py``: gates
    abort a batch on the first violation; this reports the full damage
    so a migration can be triaged. Each dimension's key set is
    broadcast (dims are small by definition); the fact table is
    scanned once with k broadcast left-joins and one final single-row
    aggregate — no fact shuffle at all.

    Returns one row per fk: (fk_col, n_rows, n_null, n_orphans).
    """
    out = facts
    flags = []
    for i, (fk_col, dim, dim_key) in enumerate(fks):
        marker = f"__hit_{i}"
        keys = dim.select(F.col(dim_key).alias(fk_col)).distinct().withColumn(
            marker, F.lit(1)
        )
        out = out.join(F.broadcast(keys), fk_col, "left")
        flags.append((fk_col, marker))
    aggs = []
    for fk_col, marker in flags:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{marker}"),
            F.sum(F.col(fk_col).isNull().cast("long")).alias(f"__null_{marker}"),
            F.sum(
                (F.col(fk_col).isNotNull() & F.col(marker).isNull()).cast("long")
            ).alias(f"__orph_{marker}"),
        ]
    row = out.agg(*aggs)
    stack_args = []
    for fk_col, marker in flags:
        stack_args += [
            F.lit(fk_col),
            F.col(f"__n_{marker}"),
            F.col(f"__null_{marker}"),
            F.col(f"__orph_{marker}"),
        ]
    return row.select(
        F.stack(F.lit(len(flags)), *stack_args).alias(
            "fk_col", "n_rows", "n_null", "n_orphans"
        )
    )


def fk_orphan_report_sql(
    facts_table: str, fks: Sequence[tuple[str, str, str]]
) -> str:
    """DuckDB twin of :func:`fk_orphan_report`; ``fks`` is
    (fk_col, dim_table, dim_key) triples."""
    parts = [
        f"""
        SELECT '{fk}' AS fk_col,
               count(*) AS n_rows,
               CAST(count(*) - count({fk}) AS BIGINT) AS n_null,
               CAST(count(CASE WHEN {fk} IS NOT NULL AND d.k IS NULL
                                THEN 1 END) AS BIGINT) AS n_orphans
        FROM {facts_table} f
        LEFT JOIN (SELECT DISTINCT {dk} AS k FROM {dt}) d ON f.{fk} = d.k
        """
        for fk, dt, dk in fks
    ]
    return " UNION ALL ".join(parts)


# ------------------------------------------ distribution drift (r6)


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column over a FIXED [lo, hi) equi-width bucketing (fixed domain =
    comparable across runs; the tails clamp into the edge buckets).

    Output: one row per bucket (bucket, base_share, cur_share,
    psi_term) — psi_term = (cur - base) * ln(cur / base) with the
    standard 1e-6 floor on shares so empty buckets stay finite. The
    total PSI is the sum; per-bucket rows localize WHERE the
    distribution moved (>0.2 total = investigate, the classic rule).
    Two count aggregates (bucket cardinality each) joined on bucket —
    scan-bound at any snapshot size; shares divide exactly (IEEE) and
    psi terms round to 9 dp for cross-engine parity."""
    width = (hi - lo) / n_buckets

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = F.least(
            F.greatest(F.floor((F.col(col) - lo) / width), F.lit(0)),
            F.lit(n_buckets - 1),
        ).cast("long")
        counts = df.where(F.col(col).isNotNull()).groupBy(
            b.alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n"))
        total = counts.agg(F.sum("n").alias("tot"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bucket",
            F.greatest(
                F.col("n").cast("double") / F.col("tot").cast("double"),
                F.lit(1e-6),
            ).alias(name),
        )

    spark = base.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        spine.join(F.broadcast(bucketed(base, "base_share")), "bucket", "left")
        .join(F.broadcast(bucketed(current, "cur_share")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("base_share", F.lit(1e-6)).alias("base_share"),
            F.coalesce("cur_share", F.lit(1e-6)).alias("cur_share"),
        )
    )
    return joined.select(
        "bucket",
        F.round("base_share", 9).alias("base_share"),
        F.round("cur_share", 9).alias("cur_share"),
        F.round(
            (F.col("cur_share") - F.col("base_share"))
            * F.log(F.col("cur_share") / F.col("base_share")),
            9,
        ).alias("psi_term"),
    )


def psi_drift_sql(
    base_sql: str,
    current_sql: str,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`psi_drift` (same bucketing, floors,
    rounding)."""
    width = (hi - lo) / n_buckets

    def bucketed(src: str, name: str) -> str:
        return f"""
        SELECT bucket, greatest(CAST(n AS DOUBLE) /
                   (SELECT sum(n) FROM ({src}_counts)), 1e-6) AS {name}
        FROM ({src}_counts)
        """

    def counts(src: str) -> str:
        return f"""
        SELECT CAST(least(greatest(floor(({col} - {lo!r}) / {width!r}), 0),
                          {n_buckets - 1}) AS BIGINT) AS bucket,
               count(*) AS n
        FROM ({src}) WHERE {col} IS NOT NULL GROUP BY bucket
        """

    return f"""
    WITH base_counts AS ({counts(base_sql)}),
    cur_counts AS ({counts(current_sql)}),
    base_sh AS (SELECT bucket, greatest(CAST(n AS DOUBLE) /
                    (SELECT sum(n) FROM base_counts), 1e-6) AS base_share
                FROM base_counts),
    cur_sh AS (SELECT bucket, greatest(CAST(n AS DOUBLE) /
                   (SELECT sum(n) FROM cur_counts), 1e-6) AS cur_share
               FROM cur_counts),
    spine AS (SELECT unnest(generate_series(0, {n_buckets - 1})) AS bucket)
    SELECT s.bucket,
           round(coalesce(b.base_share, 1e-6), 9) AS base_share,
           round(coalesce(c.cur_share, 1e-6), 9) AS cur_share,
           round((coalesce(c.cur_share, 1e-6) - coalesce(b.base_share, 1e-6))
                 * ln(coalesce(c.cur_share, 1e-6) / coalesce(b.base_share, 1e-6)),
                 9) AS psi_term
    FROM spine s
    LEFT JOIN base_sh b ON s.bucket = b.bucket
    LEFT JOIN cur_sh c ON s.bucket = c.bucket
    """
