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

from data_migration_etl_scripts_spark.operators.dedup import cached_expr

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


# -------------------------------------------- product quantization (r4)


def pq_seed_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: for each of ``m_sub`` subspaces, the
    codewords are the corresponding subvectors of the first
    ``n_codes`` vectors by id, L2-normalized per FULL vector first (PQ
    over normalized vectors makes the ADC sum approximate cosine).

    Returns ``codebooks[m][c] -> list[float]`` (driver-side — a
    codebook is m*n_codes*subdim floats, a few KB; the same
    watermark-scalar pattern as the IVF centroid collect). Seeding is
    oracle-portable: the DuckDB twin derives identical codewords.
    """
    rows = (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .where(F.size("v") > 0)
        # zero-norm vectors can't seed a codeword (and the SQL twins
        # seed from base_nz, nrm > 0 — parity requires the same filter)
        .where(
            F.expr(
                "aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"
            ) > 0
        )
        .orderBy("vid")
        .limit(n_codes)
        .collect()
    )
    if not rows:
        raise ValueError("pq_seed_codebooks: empty corpus")
    dim = len(rows[0]["v"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible into {m_sub} subvectors")
    sub = dim // m_sub
    # normalize driver-side: n_codes rows, no interpreted Spark lambdas
    normed = []
    for r in rows:
        v = [float(x) for x in r["v"]]
        nrm = sum(x * x for x in v) ** 0.5
        normed.append([x / nrm for x in v])
    return [
        [nv[m * sub : (m + 1) * sub] for nv in normed]
        for m in range(m_sub)
    ]


def _pq_books_sql(codebooks: list[list[list[float]]]) -> str:
    """Literal array<array<struct<vec,c2,code>>> SQL for a codebook set
    — DATA, not code: the HOF argmin below loops over it inside a
    constant-size generated method, where the expanded per-code
    multiply-add chains blew past Janino's 64 KB method limit and
    dropped the whole Project to interpreted eval (observed on both
    PQ queries; the fallback note this replaces)."""
    per_m = []
    for book in codebooks:
        structs = ", ".join(
            "named_struct('vec', array({vals}), 'c2', {c2:.17E}, 'code', {c})".format(
                vals=", ".join(f"{x:.17E}" for x in code),
                c2=sum(x * x for x in code) / 2.0,
                c=c,
            )
            for c, code in enumerate(book)
        )
        per_m.append(f"array({structs})")
    return "array(" + ", ".join(per_m) + ")"


def _pq_argmin_one_sql(
    book: list[list[float]], sv_expr: str, nrm_expr: str | None
) -> str:
    """Per-subspace argmin SQL with ONLY this subspace's book embedded,
    instead of the full array(named_struct(...)) literal tree of EVERY
    subspace inside every expression (guide §1.2 plan-build cost):

    Catalyst analysis of the 8 old expressions (~14k literal-tree
    nodes total, the whole codebook x 8) cost ~2.2 s at plan-build
    time (measured r12); this form is ~200 nodes per expression and
    analyzes in ~0.1 s total, with the book data as two plain nested
    double-array literals indexed by a sequence() transform. (An
    explicit multiply-add-chain variant was measured too: codegen'd
    per-row eval is faster, but the ~40 KB of generated code pays
    ~2 s of Janino compile per fresh plan — a net loss until corpora
    are orders of magnitude bigger than the bench SF.)

    Scoring is bit-identical: same zip_with/aggregate dot fold order,
    same (dot/nrm - c2) -> round-9 -> negate, same (negs, code)
    array_min low-code tie-break — the rule the SQL twin mirrors."""
    vecs = "array(" + ", ".join(
        "array(" + ", ".join(f"{x:.17E}" for x in code) + ")"
        for code in book
    ) + ")"
    c2s = "array(" + ", ".join(
        f"{sum(x * x for x in code) / 2.0:.17E}" for code in book
    ) + ")"
    div = f" / {nrm_expr}" if nrm_expr else ""
    return (
        f"array_min(transform(sequence(0, {len(book) - 1}), "
        f"c -> named_struct('negs', -round(aggregate(zip_with({sv_expr}, "
        f"element_at({vecs}, c + 1), (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        f"{div} - element_at({c2s}, c + 1), 9), 'code', c))).code"
    )


def _pq_argmin_sql(books_sql: str, m_expr: str, sv_expr: str,
                   nrm_expr: str | None) -> str:
    """argmin-code SQL over one subspace: transform the literal book
    for subspace ``m_expr`` into (negs, code) structs via a zip_with/
    aggregate dot fold (0.0-seeded left fold == the old explicit
    multiply-add chain bit-for-bit) and take array_min. Ties break to
    the lower code id, same struct ordering as before."""
    div = f" / {nrm_expr}" if nrm_expr else ""
    return (
        f"array_min(transform(element_at({books_sql}, {m_expr}), "
        f"b -> named_struct('negs', -round(aggregate(zip_with({sv_expr}, "
        "b.vec, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        f"{div} - b.c2, 9), 'code', b.code))).code"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) -> (id, codes array<int>): per subspace, the index of
    the nearest codeword by squared L2 over the NORMALIZED vector.

    Pure map-side literal expressions (the `_assign_cells` pattern):
    zero shuffles, zero UDFs. Scores round to 9 dp before the argmax
    and ties break to the LOWER code id, so any engine reproduces the
    same codes. m_sub codes of a 256-codeword book = m_sub bytes per
    vector vs 8*dim for the raw doubles.

    r7: the argmin runs as a transform/aggregate HOF over the literal
    codebook array, so the generated method stays constant-size at any
    n_codes (the expanded multiply-add form fell out of whole-stage
    codegen at Janino's 64 KB limit — observed, now gone).
    """
    sub = len(codebooks[0][0])
    dim = len(codebooks) * sub
    out = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
    # norm as an expanded element_at sum (codegen), materialized once;
    # ONE parsed SQL string (Column-op composition costs a py4j round
    # trip per operator at plan-build time)
    nsq = " + ".join(
        f"element_at(__v, {i + 1}) * element_at(__v, {i + 1})" for i in range(dim)
    )
    out = out.withColumn("__nrm", cached_expr(df.sparkSession, f"sqrt({nsq})"))
    # argmin ||nv_sub - c||^2 == argmax (dot(v_sub, c)/nrm - ||c||^2/2):
    # one division per (sub, code) instead of per element, and the
    # ||c||^2/2 term folds to a literal. Scores round to 9 dp before
    # the argmax; ties break to the LOWER code id (array_min over
    # (neg_score, code) structs) — the rule the SQL twin mirrors.
    # r7: HOF fold over the literal codebook array (subvectors
    # materialized in a projection BEFORE the lambdas — no CSE inside
    # lambdas) keeps the generated method constant-size; the expanded
    # multiply-add form fell out of whole-stage codegen at 64 KB.
    out = out.select(
        "*",
        *[
            F.expr(f"slice(__v, {m * sub + 1}, {sub})").alias(f"__s{m}")
            for m in range(len(codebooks))
        ],
    )
    code_cols = [
        cached_expr(
            df.sparkSession,
            _pq_argmin_one_sql(codebooks[m], f"__s{m}", "__nrm"),
        )
        for m in range(len(codebooks))
    ]
    return out.select(
        F.col(id_col),
        F.array(*code_cols).alias("codes"),
    )


def seeded_pq_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
    cache: str | None = None,
) -> tuple[list, DataFrame]:
    """The session-shared PQ index pair ``(codebooks, codes)`` for the
    DETERMINISTIC seeding: codebooks = first ``n_codes`` vectors'
    subvectors (driver-side list), codes = the encoded (vid, codes)
    relation with zero-norm rows dropped.

    With ``cache`` set (the source token, e.g. sf_dir) both halves are
    memoized per session via :mod:`stage_cache` — the PQ analog of the
    flat-IVF `_ivf_assignment` sharing: `embed_pq_codes` and
    `ann_topk_ivf_pq` consume the same build, so the family pays the
    codebook collect + encode pass + literal-expression analysis once
    per session instead of once per query. The memo key carries every
    seeding input (contract #2 in stage_cache.py); callers with CUSTOM
    or trained codebooks must not use this (their identity can't be
    keyed) — encode directly instead."""
    from data_migration_etl_scripts_spark.stage_cache import memo, memo_stage

    spark = df.sparkSession
    sumsq = f"aggregate(CAST({vec_col} AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"

    def build_books():
        return pq_seed_codebooks(df, id_col, vec_col, m_sub, n_codes)

    def build_codes():
        return pq_encode(
            df.where(F.expr(sumsq) > 0), books, id_col, vec_col
        ).withColumnRenamed(id_col, "vid")

    if cache is None:
        books = build_books()
        return books, build_codes()
    seed_key = (cache, id_col, vec_col, m_sub, n_codes)
    books = memo(spark, ("pqbooks",) + seed_key, build_books)
    codes = memo_stage(spark, ("pqcodes",) + seed_key, build_codes)
    return books, codes


def pq_decode_expr(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """codes -> reconstructed (normalized) vector, as a literal-lookup
    expression: concat of element_at(codebook_m, code_m + 1)."""
    parts = []
    for m, book in enumerate(codebooks):
        # one parsed nested-array literal per subspace (r12): F.lit on
        # a nested list recursively builds per-element Column lits (a
        # py4j round trip each); one compact SQL string parses in
        # microseconds with identical lookup semantics
        lut = F.expr("array(" + ", ".join(
            "array(" + ", ".join(f"{x:.17E}" for x in code) + ")"
            for code in book
        ) + ")")
        parts.append(F.element_at(lut, F.element_at(codes, m + 1) + 1))
    return F.concat(*parts)


def pq_reconstruction_error(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """(id, codes, err): per-vector squared L2 reconstruction error of
    the PQ codes against the normalized original — the measurable
    compression/accuracy trade. codes serialize as CSV for harness
    hashability; err rounds to 6 dp for cross-engine parity.

    Pass ``codes`` (a (vid, codes) relation, e.g. from
    :func:`seeded_pq_index`) to skip the internal encode pass and ride
    a session-shared stage instead."""
    # zero-norm vectors have no meaningful codes; the SQL twin's
    # base_nz drops them — same filter here for row-set parity
    sumsq = "aggregate(__v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"
    if codes is not None:
        coded = codes.withColumnRenamed("vid", id_col)
    else:
        coded = pq_encode(
            df.withColumn("__v", F.col(vec_col).cast("array<double>"))
            .where(F.expr(sumsq) > 0)
            .drop("__v"),
            codebooks, id_col, vec_col,
        )
    base = (
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .where(F.expr(sumsq) > 0)
        # materialize the norm ONCE: a transform lambda re-evaluating
        # the aggregate norm per element is O(dim^2) per row
        .withColumn("__nrm", F.expr(f"sqrt({sumsq})"))
        .withColumn("__nv", F.transform("__v", lambda x: x / F.col("__nrm")))
    )
    joined = base.join(coded, id_col)
    rec = pq_decode_expr(F.col("codes"), codebooks)
    err = F.round(
        F.aggregate(
            F.zip_with("__nv", rec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    )
    return joined.select(
        id_col,
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias(
            "codes_csv"
        ),
        err.alias("sq_err"),
    )


def pq_reconstruction_error_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
) -> str:
    """DuckDB twin of :func:`pq_reconstruction_error` (same seeding,
    dot-score code assignment, rounding, and tie-breaks)."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        base_nz AS (
            SELECT vid, v, nrm, list_transform(v, x -> x / nrm) AS nv
            FROM base WHERE nrm > 0
        ),
        codewords AS (
            SELECT g.m, s.code,
                   list_slice(s.nv, g.m * (len(s.nv) // {m_sub}) + 1,
                              (g.m + 1) * (len(s.nv) // {m_sub})) AS cw
            FROM (
                SELECT nv, row_number() OVER (ORDER BY vid) - 1 AS code
                FROM (SELECT vid, nv FROM base_nz ORDER BY vid LIMIT {n_codes})
            ) s, (SELECT unnest(range({m_sub})) AS m) g
        ),
        code_scores AS (
            SELECT b.vid, w.m, w.code, w.cw,
                   round(list_inner_product(
                             list_slice(b.v, w.m * (len(b.nv) // {m_sub}) + 1,
                                        (w.m + 1) * (len(b.nv) // {m_sub})),
                             w.cw) / b.nrm
                         - list_inner_product(w.cw, w.cw) / 2.0, 9) AS score
            FROM base_nz b CROSS JOIN codewords w
        ),
        coded_m AS (
            SELECT vid, m, code, cw FROM (
                SELECT vid, m, code, cw,
                       row_number() OVER (PARTITION BY vid, m
                                          ORDER BY score DESC, code ASC) AS rn
                FROM code_scores
            ) WHERE rn = 1
        ),
        recon AS (
            SELECT vid,
                   string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes_csv,
                   flatten(list(cw ORDER BY m)) AS rec
            FROM coded_m GROUP BY vid
        )
        SELECT b.vid AS {id_col}, r.codes_csv,
               round(list_sum(list_transform(list_zip(b.nv, r.rec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS sq_err
        FROM base_nz b JOIN recon r USING (vid)
    """


def train_pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
    n_iter: int = 5,
) -> list[list[list[float]]]:
    """Lloyd's k-means PER SUBSPACE over the L2-normalized vectors —
    the trained upgrade of :func:`pq_seed_codebooks` (same return
    shape, drop-in for :func:`pq_encode` / ``cosine_topk_ivf_pq``).

    Each round: (1) assign every (vector, subspace) row to its best
    codeword via the same rounded dot-score rule pq_encode uses — a
    map-side literal expression; (2) recompute codewords as per
    (subspace, code, dim) means — explode + groupBy with map-side
    partials, so the shuffle carries one partial per (m, code, dim)
    per task, never vectors (the hot-codeword collect_list OOM shape).
    Empty codewords keep their previous value (standard Lloyd's fix).
    Iterative by nature — rows-only territory, no SQL twin; pinned by
    the falling-reconstruction-error test instead.
    """
    from pyspark.sql import types as T  # noqa: F401

    books = pq_seed_codebooks(df, id_col, vec_col, m_sub, n_codes)
    sub = len(books[0][0])
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    nsq = " + ".join(
        f"element_at(__v, {i + 1}) * element_at(__v, {i + 1})"
        for i in range(m_sub * sub)
    )
    base = base.withColumn("__nrm", F.expr(f"sqrt({nsq})")).where(F.col("__nrm") > 0)
    # one row per (vector, subspace): sv = normalized subvector
    subarrays = ", ".join(
        "array(" + ", ".join(
            f"element_at(__v, {m * sub + i + 1}) / __nrm" for i in range(sub)
        ) + ")"
        for m in range(m_sub)
    )
    subrows = base.select(
        "vid",
        F.posexplode(F.expr(f"array({subarrays})")).alias("m", "sv"),
    ).localCheckpoint()

    def assign_expr(bks: list[list[list[float]]]):
        # r7: the per-subspace CASE collapses — m indexes the literal
        # book array directly, and the HOF fold keeps codegen small
        return F.expr(_pq_argmin_sql(_pq_books_sql(bks), "m + 1", "sv", None))

    for _ in range(n_iter):
        assigned = subrows.withColumn("code", assign_expr(books))
        means = (
            assigned.select("m", "code", F.posexplode("sv").alias("dim", "val"))
            .groupBy("m", "code", "dim")
            .agg(F.avg("val").alias("mu"))
            .collect()
        )
        new_books = [[list(code) for code in book] for book in books]
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["m"], r["code"]), {})[r["dim"]] = float(r["mu"])
        for (m, c), dims in got.items():
            for d, mu in dims.items():
                new_books[m][c][d] = mu
        books = new_books
    return books


# ------------------------------------------------- PCA whitening (r6)


def pca_whiten_model(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> tuple[list[float], list[list[float]]]:
    """Distributed PCA fit: (mean, W) where ``W`` is the
    (out_dim x in_dim) whitening projection diag(1/sqrt(lam+eps)) U^T
    over the top ``out_dim`` eigenvectors of the population covariance.

    Scale shape: each PARTITION reduces to one (count, sum, Gram) row
    inside an Arrow-batched mapInPandas pass (numpy outer products —
    the one place per-element SQL would be 100x slower), so the driver
    merges #partitions rows of ~in_dim^2 doubles, never data rows. At
    1000 executors over 100 TB that is a few MB of partials; the eigh
    on an in_dim x in_dim matrix is microseconds. Eigenvector sign is
    fixed (largest-|component| positive) so the model is reproducible
    run-to-run."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "n": [len(x)],
                "s": [x.sum(axis=0).tolist()],
                "g": [(x.T @ x).reshape(-1).tolist()],
            })

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.zeros(in_dim)
    g = np.zeros((in_dim, in_dim))
    for r in sorted(rows, key=lambda r: (r["n"], r["s"])):  # stable merge order
        s += np.array(r["s"])
        g += np.array(r["g"]).reshape(in_dim, in_dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    lam, u = np.linalg.eigh(cov)           # ascending
    lam, u = lam[::-1][:out_dim], u[:, ::-1][:, :out_dim]
    for j in range(out_dim):               # sign convention
        i = int(np.argmax(np.abs(u[:, j])))
        if u[i, j] < 0:
            u[:, j] = -u[:, j]
    w = (u / np.sqrt(np.maximum(lam, 0.0) + eps)).T  # (out_dim, in_dim)
    return mean.tolist(), w.tolist()


def pca_whiten_apply(
    df: DataFrame,
    mean: list[float],
    w: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "pc_",
    decimals: int = 6,
) -> DataFrame:
    """Map-side projection pc_j = W[j] . (v - mean), computed as
    W[j].v - (W[j].mean): the raw vector is folded against literal
    weight arrays via zip_with + aggregate (the random_projection
    pattern) and the constant bias W[j].mean — precomputed on the
    driver — is subtracted afterwards. Mathematically identical to
    centering first, but avoids materializing a centered copy of every
    vector per output column. Zero shuffles, zero UDFs. An explicit
    64-term sum per output would exceed Janino's method-size limit at
    out_dim 16 and silently fall back to interpreted eval; the HOF
    fold stays inside whole-stage codegen. Rounded for cross-run hash
    stability."""
    cols = [F.col(id_col).alias("vec_id")]
    bias = [sum(a * b for a, b in zip(wj, mean)) for wj in w]
    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    for j, wj in enumerate(w):
        warr = F.array(*[F.lit(float(x)) for x in wj])
        dot = F.aggregate(
            F.zip_with(F.col("_v"), warr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(
            F.round(dot - F.lit(float(bias[j])), decimals).alias(f"{prefix}{j}")
        )
    return vecs.select(*cols)


def pca_whiten(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> DataFrame:
    """Fit + apply in one call: the dim-reduction/decorrelation stage
    that runs before ANN indexing or clustering (whitened cosine ==
    Mahalanobis similarity). Two passes over the data: one bounded
    stats reduce, one map-side projection."""
    mean, w = pca_whiten_model(df, in_dim, out_dim, vec_col, eps)
    return pca_whiten_apply(df, mean, w, id_col, vec_col)
