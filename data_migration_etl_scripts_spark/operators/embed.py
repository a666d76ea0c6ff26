"""Embedding-column transforms for training-data pipelines:
int8 quantization and random-projection dimensionality reduction.

Both are pure per-row column expressions (no shuffle, no UDF): at
100 TB they run map-side inside whole-stage codegen and pipeline into
whatever scan/filter precedes them. Quantization is the standard
storage/serving shrink (4x vs float32, 8x vs float64); the signed
random projection is the classic Achlioptas/JL construction used to
cheap-down ANN indexes before a finer re-rank.

Determinism: the projection's ±1 sign matrix is md5-derived per
(out_dim, in_dim) at plan-build time (Python), embedded as literals in
BOTH the Spark plan and the DuckDB oracle, so results are
bit-identical across engines. Quantization avoids engine-specific
``round`` tie-breaking by using ``floor(x + 0.5)`` explicitly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------- quantization


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    scale = max(|v_i|) / 127;  q_i = floor(v_i/scale + 0.5)  (so ties
    round half-up identically in every engine). Zero vectors quantize
    to all-zero with scale 0.

    Returns (vec_id, scale, n_dims, q_sum, n_saturated, q_csv) — the
    quantized vector serialized as a CSV string because downstream
    comparison harnesses can't hash array columns; ``from_csv``/
    ``split`` reverses it losslessly (ints only).
    """
    v0 = F.col(vec_col).cast("array<double>")
    # materialize scale before the per-element lambda: referencing the
    # array_max expression inside the transform would re-run the full
    # O(d) max pass once PER ELEMENT (no CSE inside lambdas — same trap
    # as the shingle builders / duplicate_spans)
    # the internal column must NOT be named like the rounded output
    # alias: lateral column alias resolution would bind the lambda's
    # reference to round(scale, 9) — zero for tiny scales — and ANSI
    # mode then throws DIVIDE_BY_ZERO (found by the hypothesis test)
    based = df.select(
        F.col(id_col).alias("vec_id"),
        v0.alias("v"),
        (F.array_max(F.transform(v0, F.abs)) / F.lit(127.0)).alias("qscale"),
    )
    v, scale = F.col("v"), F.col("qscale")
    q = F.when(scale > 0, F.transform(v, lambda x: F.floor(x / scale + 0.5).cast("int"))).otherwise(
        F.transform(v, lambda x: F.lit(0))
    )
    return based.select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        F.size(v).alias("n_dims"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.size(F.filter(q, lambda x: F.abs(x) == 127)).alias("n_saturated"),
        F.array_join(q, ",").alias("q_csv"),
    )


def quantize_int8_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of :func:`quantize_int8`."""
    return f"""
        SELECT {id_col} AS vec_id,
               round(scale, 9) AS scale,
               CAST(len(v) AS INT) AS n_dims,
               CAST(list_sum(q) AS BIGINT) AS q_sum,
               CAST(len(list_filter(q, x -> abs(x) = 127)) AS INT) AS n_saturated,
               array_to_string(q, ',') AS q_csv
        FROM (
            SELECT *,
                   CASE WHEN scale > 0
                        THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
                        ELSE list_transform(v, x -> 0) END AS q
            FROM (
                SELECT {id_col},
                       list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v,
                       list_max(list_transform({vec_col},
                                               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM {table}
            ) s
        ) q
    """


# -------------------------------------------------- random projection


def _rp_signs(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic ±1 sign matrix, md5-seeded per cell."""
    return [
        [
            1 if hashlib.md5(f"rp:{j}:{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "rp_",
) -> Column | DataFrame:
    """Signed random projection to ``out_dim`` scalar columns
    (rp_0..rp_{m-1}), each sum_i sign(j,i)*v_i — no 1/sqrt(m) scaling
    (a constant factor that washes out of cosine / relative distances).

    Scalar output columns (not an array) keep the result joinable,
    sortable, and hashable by any downstream harness. Left-fold
    ``F.aggregate`` matches the oracle's explicit left-to-right sum,
    so doubles are bit-identical.
    """
    signs = _rp_signs(out_dim, in_dim)
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col).alias("vec_id")]
    for j in range(out_dim):
        sj = F.array(*[F.lit(s) for s in signs[j]])
        cols.append(
            F.aggregate(
                F.zip_with(v, sj, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"{prefix}{j}")
        )
    return df.select(*cols)


def random_projection_sql(
    table: str,
    in_dim: int,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "rp_",
) -> str:
    """DuckDB twin of :func:`random_projection` (explicit left-to-right
    term sums — same fold order as Spark's ``aggregate``)."""
    signs = _rp_signs(out_dim, in_dim)
    terms = []
    for j in range(out_dim):
        expr = " + ".join(
            f"({'' if signs[j][i] == 1 else '-'}CAST({vec_col}[{i + 1}] AS DOUBLE))"
            for i in range(in_dim)
        )
        terms.append(f"(0.0 + {expr}) AS {prefix}{j}")
    return f"SELECT {id_col} AS vec_id, {', '.join(terms)} FROM {table}"
