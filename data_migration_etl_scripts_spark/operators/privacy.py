"""Differential-privacy releases — Laplace-noised aggregates with
SEEDED deterministic noise, extending the privacy family beyond span
scrubbing (`text.scrub_pii`): the publishable-statistics side of a
data pipeline (release per-group counts/sums about a corpus or user
table without exposing any individual row's presence).

Mechanism: the classic Laplace release count + Lap(sensitivity/eps),
with the noise drawn DETERMINISTICALLY per (seed, group) through the
engine's cross-engine md5 idiom: u = md5-hex-prefix / 16^12 in
(0, 1), then the inverse CDF
noise = -(s/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|). Seeding makes
the release reproducible (re-running a pipeline must publish the
SAME numbers — republishing fresh noise on every run is itself a
privacy leak, the classic averaging attack) and lets the DuckDB twin
hash-match the released values exactly.

DP accounting note (honest scope): one release at parameter eps is
eps-DP for count queries (sensitivity 1). The epsilon LEDGER across
repeated releases is the caller's job — this operator implements the
mechanism, seeded so that re-running the same release does not
compose (same noise, no averaging).

Scale: one groupBy shuffle; the noise is a pure column expression on
the aggregated (small) result — codegen, no UDF, no collect."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX12 = float(16 ** 12)


def _uniform(key: F.Column) -> F.Column:
    """Deterministic u in (0, 1): md5 hex prefix as an integer over
    16^12 (the samplers' cross-engine idiom). The +0.5 offset keeps u
    strictly inside (0, 1) so ln(1 - 2|u - 0.5|) stays finite."""
    hx = F.substring(F.md5(key.cast("binary")), 1, 12)
    return (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / F.lit(_HEX12)


def laplace_noise(key: F.Column, scale: float) -> F.Column:
    """Seeded Laplace(scale) noise via the inverse CDF, rounded 9 dp
    (ln differs in the last ulp across engines)."""
    u = _uniform(key)
    centered = u - F.lit(0.5)
    mag = F.round(
        F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered)), 9
    )
    sign = F.when(centered >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return F.round(F.lit(-scale) * sign * mag, 6)


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    eps: float = 1.0,
    seed: str = "release-1",
) -> DataFrame:
    """eps-DP per-group counts: (group..., n_noised) with
    n_noised = count + Lap(1/eps), seeded per (seed, group key).
    Groups are keyed by their string concatenation with a unit
    separator (collision-free for values without \\x1f)."""
    key = F.concat_ws(
        "\x1f", F.lit(seed),
        *[F.col(c).cast("string") for c in group_cols],
    )
    agg = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    return agg.select(
        *group_cols,
        F.round(
            F.col("n") + laplace_noise(key, 1.0 / eps), 6
        ).alias("n_noised"),
    )


def dp_group_counts_sql(
    table: str,
    group_cols: list[str],
    eps: float = 1.0,
    seed: str = "release-1",
) -> str:
    """DuckDB twin of :func:`dp_group_counts` (same seeded uniform,
    inverse CDF, rounding; float constants in e-notation — the
    PageRank literal lesson)."""
    cols = ", ".join(group_cols)
    key = " || chr(31) || ".join(
        [f"'{seed}'"] + [f"CAST({c} AS VARCHAR)" for c in group_cols]
    )
    scale = f"{1.0 / eps:.17e}"
    u = (f"(CAST(('0x' || substr(md5({key}), 1, 12)) AS BIGINT) "
         f"+ CAST(0.5 AS DOUBLE)) / {_HEX12:.17e}")
    return f"""
        WITH agg AS (
            SELECT {cols}, count(*) AS n FROM {table} GROUP BY {cols}
        ),
        keyed AS (
            SELECT {cols}, n, {u} - CAST(0.5 AS DOUBLE) AS centered
            FROM agg
        )
        SELECT {cols},
               round(n + round(-{scale}
                     * (CASE WHEN centered >= 0 THEN 1.0 ELSE -1.0 END)
                     * round(ln(1.0 - 2.0 * abs(centered)), 9), 6), 6)
               AS n_noised
        FROM keyed
    """
