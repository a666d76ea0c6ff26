"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors: the
  correctness baseline. Query side is broadcast (queries are few);
  the corpus is scanned once, scored JVM-side with
  ``zip_with``/``aggregate`` fold expressions, ranked per query with a
  window. No Python in the loop.
- :func:`cosine_topk_bucketed` — the scale path: both sides bucketed
  by sign-LSH (see dedup.sign_bucket); each query only scores its own
  bucket. Recall < 1 by design; the oracle applies identical
  bucketing so the check is exact.

Scale design: brute force is O(|corpus| x |queries|) — fine when the
query side is a broadcastable few thousand rows (it is a map-side-only
plan: no shuffle on the corpus besides the final per-query top-k,
which AQE keeps tiny because scores are filtered to k per partition by
the window). For corpus-x-corpus workloads use the bucketed variant
or the dedup LSH family. An IVF variant (k-means coarse quantizer) is
the natural next step; the bucket column plumbing here is exactly
what its cluster-id assignment would feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import planhook

from data_migration_etl_scripts_spark.operators.dedup import (
    _dot,
    _norm,
    cached_expr,
    sign_bucket,
)


def _scored(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str):
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    return c, q


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, corpus_id, cosine).

    Self-matches (same id) are excluded. Rank ties broken by corpus_id
    so results are total-ordered and oracle-comparable; cosine is
    rounded to 6 dp BEFORE ranking so float last-ulp differences
    between engines cannot flip the order.
    """
    c, q = _scored(corpus, queries, id_col, vec_col)
    cos = F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where((F.col("cn") > 0) & (F.col("qn") > 0) & (F.col("corpus_id") != F.col("query_id")))
        .select("query_id", "corpus_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def cosine_topk_bruteforce_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> str:
    """DuckDB twin. ``query_pred`` selects the query rows (e.g. 'vec_id < 10')."""
    return f"""
        WITH c AS (
            SELECT {id_col} AS corpus_id, CAST({vec_col} AS DOUBLE[]) AS cv,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS cn
            FROM {table}
        ),
        q AS (
            SELECT {id_col} AS query_id, CAST({vec_col} AS DOUBLE[]) AS qv,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS qn
            FROM {table} WHERE {query_pred}
        ),
        scored AS (
            SELECT query_id, corpus_id,
                   round(list_inner_product(cv, qv) / (cn * qn), 6) AS cosine
            FROM c, q
            WHERE cn > 0 AND qn > 0 AND corpus_id <> query_id
        )
        SELECT query_id, rank, corpus_id, cosine FROM (
            SELECT query_id, corpus_id, cosine,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_bits: int = 6,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: only score (query, corpus) pairs sharing a
    sign-LSH bucket. Equi-join on bucket replaces the cross join —
    the shape that survives a corpus 1000x bigger.

    ``n_tables > 1`` is the standard multi-table OR construction: each
    table hashes a DISJOINT range of ``bucket_bits`` dimensions
    (table t uses dims [t*bits, (t+1)*bits)), a pair is a candidate if
    it collides in ANY table, and duplicate candidates collapse in a
    (query, corpus) group-by before ranking. Single-table sign-LSH
    collision probability decays as (1 - theta/pi)^bits — near-chance
    recall on weakly-correlated embeddings (measured: 0.04 at bits=6
    on the synthetic corpus); OR-ing tables trades candidate volume
    for recall (see the tuning table in SCALE.md). Requires
    n_tables * bucket_bits <= vector dim; out-of-range dims hash to a
    0 bit (degrades, never errors).
    """
    c, q = _scored(corpus, queries, id_col, vec_col)

    def tbuckets(col):
        # table id folded into the join key: one equi-join serves all
        # tables; 2^bits * n_tables distinct keys
        return F.array(*[
            F.lit(t * (1 << bucket_bits))
            + sign_bucket(col, bucket_bits, offset=t * bucket_bits)
            for t in range(n_tables)
        ])

    c = c.withColumn("tbucket", F.explode(tbuckets(F.col("cv"))))
    q = q.withColumn("tbucket", F.explode(tbuckets(F.col("qv"))))
    cos = F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6)
    scored = (
        c.join(F.broadcast(q), "tbucket")
        .where((F.col("cn") > 0) & (F.col("qn") > 0) & (F.col("corpus_id") != F.col("query_id")))
        # a pair colliding in several tables appears once per table;
        # max() of an identical cosine dedups without a second pass
        .groupBy("query_id", "corpus_id")
        .agg(F.max(cos).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def cosine_topk_bucketed_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_bits: int = 6,
    n_tables: int = 1,
) -> str:
    def bucket(t: int) -> str:
        # v[i] out of range yields NULL in DuckDB -> CASE falls to 0,
        # matching Spark's null-safe F.get
        bits = " + ".join(
            f"CASE WHEN v[{t * bucket_bits + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(bucket_bits)
        )
        return f"{t * (1 << bucket_bits)} + {bits}"

    tb_list = ", ".join(bucket(t) for t in range(n_tables))
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        c AS (SELECT id AS corpus_id, v AS cv, nrm AS cn, u.tbucket
              FROM base, UNNEST([{tb_list}]) AS u(tbucket)),
        q AS (SELECT id AS query_id, v, nrm AS qn, u.tbucket
              FROM (SELECT * FROM base WHERE id IN (SELECT {id_col} FROM {table} WHERE {query_pred})),
                   UNNEST([{tb_list}]) AS u(tbucket)),
        scored AS (
            SELECT query_id, corpus_id,
                   max(round(list_inner_product(cv, q.v) / (cn * qn), 6)) AS cosine
            FROM c JOIN q USING (tbucket)
            WHERE cn > 0 AND qn > 0 AND corpus_id <> query_id
            GROUP BY query_id, corpus_id
        )
        SELECT query_id, rank, corpus_id, cosine FROM (
            SELECT query_id, corpus_id, cosine,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _dot_sql(col: str, vec: list[float], offset: int = 0, scale: str | None = None) -> str:
    """SQL text for sum_i col[offset+i] * vec_i (optionally divided by
    ``scale``), as explicit element_at multiply-adds.

    Two deliberate choices, both measured:
    - explicit sums, NOT aggregate/zip_with folds — higher-order
      functions are tree-interpreted per element (no whole-stage
      codegen), ~10x slower per assignment pass;
    - ONE generated SQL string parsed by F.expr, NOT thousands of
      Column operators — every Column op is a py4j round trip, and a
      codebook's worth of them cost ~30s of pure DRIVER time per plan
      build (measured on the two-level IVF query).
    %.17E literals round-trip IEEE doubles exactly and parse as DOUBLE
    (decimal-looking literals would parse as DECIMAL)."""
    terms = [
        f"element_at({col}, {offset + i + 1}) * {x:.17E}"
        for i, x in enumerate(vec)
        if x != 0.0
    ]
    body = " + ".join(terms) if terms else "CAST(0.0 AS DOUBLE)"
    return f"(({body}) / {scale})" if scale else f"({body})"


def _dot_lit(col_name: str, vec: list[float], offset: int = 0) -> Column:
    """Column form of :func:`_dot_sql` (``col_name`` must be a plain
    column name — the expression is built as one parsed SQL string)."""
    return F.expr(_dot_sql(col_name, vec, offset))


# parse-once cache shared with the embed operators (see
# dedup.cached_expr): the corpus and query assignments of one search,
# plus every query in the flat-IVF family, share the exact same
# generated tree — only the n_probe slice differs, applied OUTSIDE
# the cached expression.
_cached_expr = cached_expr


def _probe_expr(spark, cent_rows: list[tuple], n_probe: int) -> Column:
    """array<struct<neg, centroid_id>> of the ``n_probe`` nearest
    centroids for the current row's (v, nrm) — ONE parsed expression,
    map-side codegen, zero shuffles. Ordering matches the join+window
    form exactly: cosine rounded to 6 dp descending (negated for the
    ascending struct sort), centroid id ascending on ties."""
    structs = ", ".join(
        "named_struct('neg', -round({dot} / (nrm * {cn:.17E}), 6), "
        "'centroid_id', {cid}L)".format(
            dot=_dot_sql("v", cv), cn=float(cn), cid=int(cid)
        )
        for cid, cv, cn in cent_rows
    )
    ranked = _cached_expr(spark, f"array_sort(array({structs}))")
    return F.slice(ranked, 1, n_probe)


#: above this many centroid*dim literals the assignment expression gets
#: unwieldy; fall back to the broadcast-join + window form
_EXPR_ASSIGN_MAX_LITS = 65536


def _assign_cells(
    base: DataFrame, cent, id_alias: str, n_probe: int = 1
) -> DataFrame:
    """Nearest-centroid assignment: argmax cosine over the codebook.

    Codebooks are bounded (O(100-1K) rows) by construction, so the
    centroids COLLECT to the driver (a watermark-sized scalar read) and
    assignment compiles to a literal-array expression evaluated
    map-side — the corpus never shuffles. (The previous join + window
    form shuffled corpus x n_centroids rows to rank per vid.) Above
    ``_EXPR_ASSIGN_MAX_LITS`` centroid*dim literals it falls back to
    the broadcast-join + per-vid window.

    ``n_probe > 1`` keeps the n nearest cells per vector (multi-probe
    query-side assignment — one output row per (vector, probed cell)).
    Cosine rounded to 6 dp before the argmax so engine last-ulp
    differences cannot flip a cell assignment (same rule as ranking).
    Accepts a centroid DataFrame or pre-collected Rows.
    """
    rows = cent.collect() if isinstance(cent, DataFrame) else list(cent)
    if not rows:
        return base.select(
            id_alias, "v", "nrm", F.lit(None).cast("long").alias("centroid_id")
        ).limit(0)
    n_lits = len(rows) * len(rows[0]["cv"])
    if n_lits > _EXPR_ASSIGN_MAX_LITS:
        cent_df = base.sparkSession.createDataFrame(rows)
        cos = F.round(
            _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.col("__cos").desc(), F.col("centroid_id").asc()
        )
        return (
            base.crossJoin(F.broadcast(cent_df))
            .withColumn("__cos", cos)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n_probe)
            .select(id_alias, "v", "nrm", "centroid_id")
        )
    probe = _probe_expr(
        base.sparkSession,
        [(r["centroid_id"], r["cv"], r["cn"]) for r in rows],
        n_probe,
    )
    return base.select(
        id_alias,
        "v",
        "nrm",
        F.explode(probe["centroid_id"]).alias("centroid_id"),
    )


#: session-scoped cache of materialized corpus-side IVF assignments,
#: keyed by (applicationId, caller token, codebook params). The literal
#: codebook expressions from :func:`_assign_cells` cost Catalyst a
#: DATA-INDEPENDENT re-analysis (~seconds for multi-KB trees) on every
#: action; localCheckpoint turns the assigned corpus into a leaf scan
#: so that price is paid once per session, not once per query. Entries
#: from dead sessions are keyed out by applicationId.
_ASSIGN_CACHE: dict[tuple, tuple] = {}


def _assign_cache_get(spark, key: tuple):
    """Lookup with dead-session eviction (stage_cache contract #1):
    entries keyed by applicationIds other than the live session's are
    dropped on every access, so long-lived multi-session processes
    can't accumulate them."""
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _ASSIGN_CACHE if k[0] != app_id]:
        del _ASSIGN_CACHE[k]
    return _ASSIGN_CACHE.get(key)


def _ivf_assignment(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    centroids: DataFrame | None,
    cache: str | None,
):
    """Corpus-side IVF stage shared by the flat-IVF family: returns
    ``(assigned, qsource, cent_rows)`` where ``assigned`` carries
    (vid, v, nrm, centroid_id) and ``qsource`` is the (vid, v, nrm)
    relation the query side should join against.

    With ``cache`` set (an opaque caller token, e.g. the sf_dir) and
    the DEFAULT deterministic codebook, the assignment is
    localCheckpointed and memoized per session: the first caller pays
    the codebook-expression analysis + one corpus pass, every later
    caller (same token/params) gets a leaf scan — kills the
    literal-tree analysis constant that dominated the flat-IVF family
    at small SF. Custom ``centroids`` skip the cache (their identity
    can't be keyed)."""
    spark = corpus.sparkSession
    key = None
    if cache is not None and centroids is None:
        key = (
            spark.sparkContext.applicationId,
            "ivf1",
            cache,
            id_col,
            vec_col,
            n_centroids,
        )
        hit = _assign_cache_get(spark, key)
        if hit is not None:
            return hit
    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    if key is not None:
        # ONE source pass: the seed scan and the assignment pass below
        # both read the materialized (vid, v, nrm) instead of decoding
        # the vector column from the source twice
        base = base.localCheckpoint()
    cent = centroids if centroids is not None else (
        base.orderBy("vid")
        .limit(n_centroids)
        .select(
            F.col("vid").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    # collect the (bounded) codebook ONCE for both assignment passes —
    # _assign_cells would otherwise run the seed job twice
    cent_rows = cent.collect()
    assigned = _assign_cells(base, cent_rows, "vid")
    if key is None:
        # uncached: query side must NOT derive from `assigned` (that
        # would re-evaluate the corpus assignment expression under the
        # join) — hand back the raw base
        return assigned, base, cent_rows
    assigned = assigned.localCheckpoint()  # eager: analyzed + run ONCE
    # single-probe assignment is 1 row per vid, so the checkpointed
    # relation doubles as the (vid, v, nrm) query source — a leaf scan
    out = (assigned, assigned.select("vid", "v", "nrm"), cent_rows)
    _ASSIGN_CACHE[key] = out
    return out


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    centroids: DataFrame | None = None,
    n_probe: int = 1,
    cache: str | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` cells (default centroids = first n vectors by id —
    deterministic and oracle-portable; pass ``centroids`` from
    :func:`train_kmeans_centroids` for a trained codebook — same plan
    shape, better recall), then each query scores only its ``n_probe``
    nearest cells (1 = classic single-probe; higher trades latency for
    recall — see the tuning table in SCALE.md).

    Scale shape: assignment is a broadcast-centroids map-side pass over
    the corpus (no shuffle), search is an equi-join on cell id whose
    probe side carries n_probe rows per query — the same plan that
    serves a billion-vector corpus. ``cache`` (see
    :func:`_ivf_assignment`) shares the materialized corpus assignment
    across the probe/recall query family within a session.
    """
    assigned, qsource, cent_rows = _ivf_assignment(
        corpus, id_col, vec_col, n_centroids, centroids, cache
    )
    qids = queries.select(F.col(id_col).alias("vid"))
    qbase = qsource.join(F.broadcast(qids), "vid")
    q = _assign_cells(qbase, cent_rows, "vid", n_probe=n_probe).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "centroid_id",
    )
    cos = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    scored = (
        assigned.join(F.broadcast(q), "centroid_id")
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("corpus_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def cosine_topk_ivf_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 1,
) -> str:
    return f"""
        WITH base AS (
            SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        base_nz AS (SELECT * FROM base WHERE nrm > 0),
        cent AS (
            SELECT vid AS centroid_id, v AS cv, nrm AS cn
            FROM base_nz ORDER BY vid LIMIT {n_centroids}
        ),
        assigned AS (
            SELECT vid, v, nrm, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vid AS query_id, v AS qv, nrm AS qn, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
                WHERE b.vid IN (SELECT {id_col} FROM {table} WHERE {query_pred})
            ) WHERE rn <= {n_probe}
        ),
        scored AS (
            SELECT q.query_id, a.vid AS corpus_id,
                   round(list_inner_product(a.v, q.qv) / (a.nrm * q.qn), 6) AS cosine
            FROM assigned a JOIN q USING (centroid_id)
            WHERE a.vid <> q.query_id
        )
        SELECT query_id, rank, corpus_id, cosine FROM (
            SELECT query_id, corpus_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _sub_probe_expr(spark, by_cell: dict, n_probe: int) -> Column:
    """CASE over the coarse cell -> that cell's FULL ranked sub-cell
    list — built as ONE parsed SQL string (thousands of Column ops
    would cost ~1 py4j round trip each at plan-build time), cached per
    session (the ~4K-literal CASE costs ~1 s to parse, and corpus and
    query sides share the identical tree — only the slice length
    differs, applied OUTSIDE the cache)."""
    branches = []
    for cell, rows in sorted(by_cell.items()):
        structs = ", ".join(
            "named_struct('neg', -round({dot} / (nrm * {sn:.17E}), 6), "
            "'sub_id', {sid}L)".format(
                dot=_dot_sql("v", sv), sn=float(sn), sid=int(sid)
            )
            for sid, sv, sn in rows
        )
        branches.append(
            f"WHEN centroid_id = {cell}L THEN array_sort(array({structs}))"
        )
    case = _cached_expr(spark, "CASE " + " ".join(branches) + " END")
    return F.explode(F.slice(case, 1, n_probe)["sub_id"]).alias("sub_id")


def _ivf2_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_coarse: int,
    n_sub: int,
    cache: str | None,
):
    """Two-level IVF index build shared by :func:`cosine_topk_ivf2`
    and :func:`ivf2_cell_assignment`: returns ``(sub_assigned,
    qsource, coarse_rows, by_cell)`` where ``sub_assigned`` carries
    (vid, v, nrm, centroid_id, sub_id). ``sub_assigned`` is None for
    an empty / all-zero-norm corpus. With ``cache`` set, both levels
    are localCheckpointed and memoized per session (coarse level
    shared with the flat-IVF family via :func:`_ivf_assignment`)."""
    spark = corpus.sparkSession
    key = None
    if cache is not None:
        key = (
            spark.sparkContext.applicationId,
            "ivf2",
            cache,
            id_col,
            vec_col,
            n_coarse,
            n_sub,
        )
        hit = _assign_cache_get(spark, key)
        if hit is not None:
            return hit
    assigned, qsource, coarse_rows = _ivf_assignment(
        corpus, id_col, vec_col, n_coarse, None, cache
    )
    if key is None:
        # uncached: the sub-seed collect AND the sub assignment both
        # consume `assigned` — materialize it once
        assigned = assigned.localCheckpoint()
        qsource = assigned.select("vid", "v", "nrm")
    # deterministic sub-seeds: first n_sub vids of each coarse cell
    # (index-build phase — the one per-cell window in the pipeline)
    wsub = Window.partitionBy("centroid_id").orderBy("vid")
    sub_rows = (
        assigned.withColumn("__rn", F.row_number().over(wsub))
        .where(F.col("__rn") <= n_sub)
        .select(
            "centroid_id",
            F.col("vid").alias("sub_id"),
            F.col("v").alias("sv"),
            F.col("nrm").alias("sn"),
        )
        .collect()
    )
    by_cell: dict[int, list[tuple]] = {}
    for r in sub_rows:
        by_cell.setdefault(int(r["centroid_id"]), []).append(
            (r["sub_id"], r["sv"], r["sn"])
        )
    if not by_cell:
        return None, qsource, coarse_rows, by_cell
    sub_assigned = assigned.select(
        "vid", "v", "nrm", "centroid_id",
        _sub_probe_expr(spark, by_cell, 1),
    )
    if key is not None:
        # materialize the full (vid, coarse, sub) corpus index ONCE
        # per session — later calls get a leaf scan instead of two
        # literal-tree analyses + two corpus passes
        sub_assigned = sub_assigned.localCheckpoint()
        out = (sub_assigned, qsource, coarse_rows, by_cell)
        _ASSIGN_CACHE[key] = out
        return out
    return sub_assigned, qsource, coarse_rows, by_cell


def ivf_cell_assignment(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    cache: str | None = None,
) -> DataFrame:
    """The flat-IVF INDEX BUILD surfaced as a relation: every corpus
    vector with its assigned coarse cell (id_col, centroid_id). This
    is the stage a deployment materializes ONCE and serves every
    search from (see :func:`build_ivf_index` for the on-disk form);
    with ``cache`` set the assignment is also what the
    ``cosine_topk_ivf`` family reuses in-session — so benchmarks
    measure build and search as the separate costs they are at scale."""
    assigned, _, _ = _ivf_assignment(
        corpus, id_col, vec_col, n_centroids, None, cache
    )
    return assigned.select(F.col("vid").alias(id_col), "centroid_id")


def ivf_cell_assignment_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> str:
    """DuckDB twin of :func:`ivf_cell_assignment` (identical seeding,
    rounding, and tie-breaks)."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        base_nz AS (SELECT * FROM base WHERE nrm > 0),
        cent AS (
            SELECT vid AS centroid_id, v AS cv, nrm AS cn
            FROM base_nz ORDER BY vid LIMIT {n_centroids}
        )
        SELECT vid AS {id_col}, centroid_id FROM (
            SELECT b.vid, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY b.vid
                       ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                c.centroid_id ASC) AS rn
            FROM base_nz b CROSS JOIN cent c
        ) WHERE rn = 1
    """


def ivf2_cell_assignment(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_coarse: int = 8,
    n_sub: int = 8,
    cache: str | None = None,
) -> DataFrame:
    """The two-level IVF INDEX BUILD surfaced as a relation: every
    corpus vector with its (coarse, sub) composite cell. Same role as
    :func:`ivf_cell_assignment` for the IMI-style index."""
    sub_assigned, _, _, _ = _ivf2_index(
        corpus, id_col, vec_col, n_coarse, n_sub, cache
    )
    if sub_assigned is None:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, centroid_id long, sub_id long"
        )
    return sub_assigned.select(
        F.col("vid").alias(id_col), "centroid_id", "sub_id"
    )


def ivf2_cell_assignment_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_coarse: int = 8,
    n_sub: int = 8,
) -> str:
    """DuckDB twin of :func:`ivf2_cell_assignment`."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        base_nz AS (SELECT * FROM base WHERE nrm > 0),
        cent AS (
            SELECT vid AS centroid_id, v AS cv, nrm AS cn
            FROM base_nz ORDER BY vid LIMIT {n_coarse}
        ),
        assigned AS (
            SELECT vid, v, nrm, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        subs AS (
            SELECT centroid_id, vid AS sub_id, v AS sv, nrm AS sn FROM (
                SELECT centroid_id, vid, v, nrm,
                       row_number() OVER (PARTITION BY centroid_id ORDER BY vid) AS rn
                FROM assigned
            ) WHERE rn <= {n_sub}
        )
        SELECT vid AS {id_col}, centroid_id, sub_id FROM (
            SELECT a.vid, a.centroid_id, s.sub_id,
                   row_number() OVER (
                       PARTITION BY a.vid
                       ORDER BY round(list_inner_product(a.v, s.sv) / (a.nrm * s.sn), 6) DESC,
                                s.sub_id ASC) AS rn
            FROM assigned a JOIN subs s USING (centroid_id)
        ) WHERE rn = 1
    """


def cosine_topk_ivf2(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_coarse: int = 8,
    n_sub: int = 8,
    n_probe_coarse: int = 4,
    n_probe_sub: int = 4,
    cache: str | None = None,
) -> DataFrame:
    """TWO-LEVEL IVF (IMI-style): a coarse codebook splits the corpus
    into ``n_coarse`` cells; INSIDE each coarse cell a sub-codebook
    splits again into ``n_sub`` sub-cells — ``n_coarse * n_sub``
    effective cells from two small codebooks. Queries probe
    ``n_probe_coarse`` coarse cells, then ``n_probe_sub`` sub-cells in
    each, so the scanned fraction is ~(p1*p2)/(k1*k2) with the
    granularity of a k1*k2-cell flat index — but no stage ever handles
    a codebook bigger than max(k1, k2).

    That bound is the 100 TB story: a flat million-cell codebook can't
    broadcast or compile into an assignment expression; two levels of
    ~1K keep every assignment a map-side pass and the search an
    equi-join on the composite (coarse, sub) key. Seeding is
    deterministic (first k1 corpus vids; first k2 vids per coarse
    cell), so the whole index is oracle-portable —
    :func:`cosine_topk_ivf2_sql` hash-matches it.

    ``cache`` memoizes BOTH levels per session (see
    :func:`_ivf_assignment`): the coarse assignment is shared with the
    flat-IVF family, and the (vid, coarse, sub) corpus index is
    localCheckpointed so later calls skip the two big literal-tree
    analyses and both corpus passes.
    """
    spark = corpus.sparkSession
    sub_assigned, qsource, coarse_rows, by_cell = _ivf2_index(
        corpus, id_col, vec_col, n_coarse, n_sub, cache
    )
    if sub_assigned is None:
        # empty (or all-zero-norm) corpus: degrade like
        # cosine_topk_ivf instead of emitting an unparseable
        # zero-branch CASE
        return spark.createDataFrame(
            [], "query_id long, rank int, corpus_id long, cosine double"
        )

    qids = queries.select(F.col(id_col).alias("vid"))
    qbase = qsource.join(F.broadcast(qids), "vid")
    q_coarse = _assign_cells(qbase, coarse_rows, "vid", n_probe=n_probe_coarse)
    # query-side sub-probe: broadcast the (bounded) sub-codebook as a
    # 64-row relation and rank per (query, coarse cell) — the corpus
    # side keeps the compiled CASE (zero-shuffle over billions of
    # rows, materialized once per session under `cache`), but on the
    # tiny query side a join dodges the CASE tree's per-action
    # Catalyst analysis (~1-2 s, data-independent). Cosine parity with
    # the CASE form is exact: the zip_with/aggregate fold sums in the
    # same left-to-right order as the compiled element_at chain.
    from data_migration_etl_scripts_spark.localdata import local_df

    sub_cb = local_df(
        spark,
        [
            (int(cell), int(sid), [float(x) for x in sv], float(sn))
            for cell, rows in sorted(by_cell.items())
            for sid, sv, sn in rows
        ],
        "centroid_id long, sub_id long, sv array<double>, sn double",
    )
    wq = Window.partitionBy("vid", "centroid_id").orderBy(
        F.col("__cos").desc(), F.col("sub_id").asc()
    )
    q_sub = (
        q_coarse.join(F.broadcast(sub_cb), "centroid_id")
        .withColumn(
            "__cos",
            F.round(
                _dot(F.col("v"), F.col("sv")) / (F.col("nrm") * F.col("sn")), 6
            ),
        )
        .withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= n_probe_sub)
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "centroid_id",
            "sub_id",
        )
    )
    cos = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    scored = (
        sub_assigned.join(
            F.broadcast(q_sub.select("query_id", "qv", "qn", "centroid_id", "sub_id")),
            ["centroid_id", "sub_id"],
        )
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("corpus_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def cosine_topk_ivf2_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_coarse: int = 8,
    n_sub: int = 8,
    n_probe_coarse: int = 4,
    n_probe_sub: int = 4,
) -> str:
    """DuckDB twin of :func:`cosine_topk_ivf2` (identical seeding,
    rounding, and tie-breaks)."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v,
                   sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) AS nrm
            FROM {table}
        ),
        base_nz AS (SELECT * FROM base WHERE nrm > 0),
        cent AS (
            SELECT vid AS centroid_id, v AS cv, nrm AS cn
            FROM base_nz ORDER BY vid LIMIT {n_coarse}
        ),
        assigned AS (
            SELECT vid, v, nrm, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        subs AS (
            SELECT centroid_id, vid AS sub_id, v AS sv, nrm AS sn FROM (
                SELECT centroid_id, vid, v, nrm,
                       row_number() OVER (PARTITION BY centroid_id ORDER BY vid) AS rn
                FROM assigned
            ) WHERE rn <= {n_sub}
        ),
        sub_assigned AS (
            SELECT vid, v, nrm, centroid_id, sub_id FROM (
                SELECT a.vid, a.v, a.nrm, a.centroid_id, s.sub_id,
                       row_number() OVER (
                           PARTITION BY a.vid
                           ORDER BY round(list_inner_product(a.v, s.sv) / (a.nrm * s.sn), 6) DESC,
                                    s.sub_id ASC) AS rn
                FROM assigned a JOIN subs s USING (centroid_id)
            ) WHERE rn = 1
        ),
        q_coarse AS (
            SELECT vid AS query_id, v AS qv, qn, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm AS qn, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
                WHERE b.vid IN (SELECT {id_col} FROM {table} WHERE {query_pred})
            ) WHERE rn <= {n_probe_coarse}
        ),
        q_sub AS (
            SELECT query_id, qv, qn, centroid_id, sub_id FROM (
                SELECT q.query_id, q.qv, q.qn, q.centroid_id, s.sub_id,
                       row_number() OVER (
                           PARTITION BY q.query_id, q.centroid_id
                           ORDER BY round(list_inner_product(q.qv, s.sv) / (q.qn * s.sn), 6) DESC,
                                    s.sub_id ASC) AS rn
                FROM q_coarse q JOIN subs s USING (centroid_id)
            ) WHERE rn <= {n_probe_sub}
        ),
        scored AS (
            SELECT q.query_id, a.vid AS corpus_id,
                   round(list_inner_product(a.v, q.qv) / (a.nrm * q.qn), 6) AS cosine
            FROM sub_assigned a JOIN q_sub q USING (centroid_id, sub_id)
            WHERE a.vid <> q.query_id
        )
        SELECT query_id, rank, corpus_id, cosine FROM (
            SELECT query_id, corpus_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def train_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """Lloyd's k-means codebook for the IVF index, as pure DataFrame ops.

    Each round = nearest-centroid assignment (broadcast centroids,
    map-side) + per-cell mean (one groupBy with ``F.aggregate`` /
    ``zip_with`` element-wise sums — partial aggregation applies, the
    shuffle carries one partial vector per cell per task, not the
    data). Deterministic init: first ``n_centroids`` vectors by id, the
    same seeding ``cosine_topk_ivf`` uses, so swapping the trained
    codebook in changes recall, never the plan shape.

    Empty cells keep their previous centroid (standard Lloyd's fix).
    Returns (centroid_id, cv, cn) ready for ``_assign_cells``.
    """
    import math

    from pyspark.sql import Row

    from data_migration_etl_scripts_spark.localdata import local_df

    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    base = base.localCheckpoint()
    # r12: the codebook lives on the DRIVER between rounds (the Lloyd's
    # pattern train_logreg / the pagerank small path use) — each round
    # is ONE Spark job: the literal-expression assignment pass fused
    # with the per-(cell, dim) mean aggregate and a codebook-sized
    # collect. The former per-round codebook localCheckpoint, the
    # second groupBy (array re-assembly) and the separate collect
    # inside _assign_cells are gone; the round's distributed plan is
    # unchanged where it matters (explode -> map-side partial avg — a
    # collect_list of vectors would OOM a hot cell at scale).
    cent_rows: list = (
        base.orderBy("vid")
        .limit(n_centroids)
        .select(
            # the seed vid IS the cell id — no global-window renumbering
            F.col("vid").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        .collect()
    )
    for _ in range(n_iter):
        assigned = _assign_cells(base, cent_rows, "vid")
        means_plan = (
            assigned.select("centroid_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
        )
        planhook.capture("kmeans_iteration", means_plan)
        got: dict[int, dict[int, float]] = {}
        for r in means_plan.collect():
            got.setdefault(r["centroid_id"], {})[r["dim"]] = r["m"]
        # driver-side replica of the old update plan, op for op:
        # coalesce(cv_new, cv), cn = sqrt(left-fold of x*x) — the same
        # sequential IEEE adds the aggregate() HOF performs — then the
        # cn > 0 filter. Values are bit-identical to the Spark form.
        nxt = []
        for row in cent_rows:
            dims = got.get(row["centroid_id"])
            cv = (
                [dims[d] for d in range(len(row["cv"]))]
                if dims is not None else list(row["cv"])
            )
            acc = 0.0
            for x in cv:
                acc = acc + x * x
            cn = math.sqrt(acc)
            if cn > 0:
                nxt.append(Row(
                    centroid_id=row["centroid_id"], cv=cv, cn=cn
                ))
        cent_rows = nxt
    id_type = base.schema["vid"].dataType.simpleString()
    return local_df(
        corpus.sparkSession,
        [(r["centroid_id"], r["cv"], r["cn"]) for r in cent_rows],
        f"centroid_id {id_type}, cv array<double>, cn double",
    )


def kmeans_cost(corpus: DataFrame, centroids: DataFrame,
                id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Mean (1 - cosine-to-assigned-centroid) — the convergence metric."""
    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    assigned = _assign_cells(base, centroids, "vid")
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    joined = assigned.join(F.broadcast(centroids), "centroid_id")
    return float(
        joined.agg(F.avg(F.lit(1.0) - cos).alias("c")).collect()[0]["c"]
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "corpus_id",
    k: int = 5,
) -> DataFrame:
    """Measure an ANN method against exact top-k: per-query hit count
    and recall@k, one row per query in ``exact``.

    Accepts the (query_id, rank, corpus_id, ...) shape the topk
    operators emit. The semi join keys on (query, id), so the cost is
    O(k · queries) regardless of corpus size — evaluating recall never
    touches the corpus again. Queries the approx method missed
    entirely still appear (recall 0), which is exactly the failure you
    want visible.
    """
    a = approx.select(F.col(query_col).alias("q"), F.col(id_col).alias("i"))
    e = exact.select(F.col(query_col).alias("q"), F.col(id_col).alias("i"))
    hits = e.join(a, ["q", "i"], "semi").groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    per_query = (
        e.select("q").distinct().join(hits, "q", "left").select(
            F.col("q").alias(query_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / F.lit(float(k))).alias("recall_at_k"),
        )
    )
    return per_query


def recall_at_k_sql(approx_sql: str, exact_sql: str, k: int = 5) -> str:
    """DuckDB twin of :func:`recall_at_k` over two topk subqueries."""
    return f"""
        WITH a AS (SELECT query_id AS q, corpus_id AS i FROM ({approx_sql})),
             e AS (SELECT query_id AS q, corpus_id AS i FROM ({exact_sql})),
             hits AS (
                SELECT e.q, count(*) AS n_hits FROM e
                WHERE EXISTS (SELECT 1 FROM a WHERE a.q = e.q AND a.i = e.i)
                GROUP BY e.q
             )
        SELECT eq.q AS query_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) / {float(k)} AS recall_at_k
        FROM (SELECT DISTINCT q FROM e) eq LEFT JOIN hits h ON eq.q = h.q
    """


def cosine_topk_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    m_sub: int = 4,
    n_codes: int = 16,
    rerank: int = 32,
    codebooks: list | None = None,
    cache: str | None = None,
) -> DataFrame:
    """IVF + PQ with asymmetric-distance (ADC) candidate scoring and an
    EXACT re-rank — the classic billion-scale layout (IVFADC):

    1. corpus -> coarse cells (map-side literal argmax, zero shuffles);
    2. corpus -> PQ codes over the L2-normalized vectors (map-side;
       ``m_sub`` small ints instead of ``dim`` doubles — the candidate
       scan reads codes, never raw vectors);
    3. each query probes ``n_probe`` cells and carries per-subspace
       lookup tables (lut[m][c] = dot of its normalized subvector with
       codeword c, rounded to 9 dp) — ADC estimate = sum of m_sub
       table lookups per candidate, pure codegen;
    4. top-``rerank`` candidates per query by ADC re-join the RAW
       vectors for exact cosine — full vectors are touched for only
       O(rerank * queries) rows.

    At 100 TB the scan reads (vid, cell, codes): with m_sub=8 over a
    1024-dim float corpus that is ~1000x fewer bytes than raw vectors,
    and recall is recovered by the exact re-rank. Deterministic
    seeding (coarse cells = first n_centroids vids; codewords = first
    n_codes vids' subvectors) keeps every stage SQL-expressible —
    :func:`cosine_topk_ivf_pq_sql` hash-matches this plan.
    """
    from data_migration_etl_scripts_spark.operators.embed import (
        pq_encode,
        pq_seed_codebooks,
    )

    spark = corpus.sparkSession
    key = None
    if cache is not None and codebooks is None:
        key = (
            spark.sparkContext.applicationId,
            "ivfpq",
            cache,
            id_col,
            vec_col,
            n_centroids,
            m_sub,
            n_codes,
        )
    hit = _assign_cache_get(spark, key) if key is not None else None
    if hit is not None:
        coded, base, coarse_rows, books = hit
    else:
        assigned, base, coarse_rows = _ivf_assignment(
            corpus, id_col, vec_col, n_centroids, None, cache
        )
        if cache is None:
            # uncached: codebook seeding, encoding, and the re-rank all
            # consume the base relation — materialize it once (with
            # `cache` set, _ivf_assignment already returned a leaf)
            base = base.localCheckpoint()
        if key is not None:
            # seeded codebooks + (vid, codes) ride the session-shared
            # PQ index (embed.seeded_pq_index) — the same build
            # `embed_pq_codes` consumes, so the family pays the
            # codebook collect + encode pass once per session
            from data_migration_etl_scripts_spark.operators.embed import (
                seeded_pq_index,
            )

            books, codes = seeded_pq_index(
                base.select(F.col("vid").alias(id_col), F.col("v").alias(vec_col)),
                id_col=id_col, vec_col=vec_col, m_sub=m_sub, n_codes=n_codes,
                cache=cache,
            )
        else:
            books = codebooks if codebooks is not None else pq_seed_codebooks(
                base.select(F.col("vid").alias(id_col), F.col("v").alias(vec_col)),
                id_col=id_col, vec_col=vec_col, m_sub=m_sub, n_codes=n_codes,
            )
            codes = pq_encode(
                base.select(F.col("vid").alias(id_col), F.col("v").alias(vec_col)),
                books, id_col=id_col, vec_col=vec_col,
            ).withColumnRenamed(id_col, "vid")
        coded = assigned.select("vid", "centroid_id").join(codes, "vid")
        if key is not None:
            # the (vid, cell, codes) candidate relation is the PQ
            # index a deployment serves from — materialize once per
            # session, later calls scan 8 small ints per vector
            coded = coded.localCheckpoint()
            _ASSIGN_CACHE[key] = (coded, base, coarse_rows, books)

    qids = queries.select(F.col(id_col).alias("vid"))
    qbase = base.join(F.broadcast(qids), "vid")
    q_probe = _assign_cells(qbase, coarse_rows, "vid", n_probe=n_probe)
    sub = len(books[0][0])

    # LUT build runs over queries*n_probe rows (a few dozen), so the
    # explicit-sum form's codegen advantage is irrelevant — and its
    # m_sub*n_codes*sub expanded terms blew past Janino's 64 KB method
    # limit (observed), dumping the whole query-side Project to
    # interpreted eval with an ERROR in every log. The HOF fold over a
    # literal codeword array keeps the generated method constant-size;
    # the left fold (0.0 seed) is bit-identical to the explicit chain.
    # Subvectors materialize BEFORE the lambdas (no CSE inside them).
    def _book_lit(book: list[list[float]]) -> str:
        return "array(" + ", ".join(
            "array(" + ", ".join(f"{x:.17E}" for x in code) + ")"
            for code in book
        ) + ")"

    q_probe = q_probe.select(
        "*",
        *[
            F.expr(f"slice(v, {m * sub + 1}, {sub})").alias(f"__qs{m}")
            for m in range(m_sub)
        ],
    )
    luts = [
        _cached_expr(
            spark,
            f"transform({_book_lit(book)}, c -> "
            f"round(aggregate(zip_with(__qs{m}, c, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x) / nrm, 9))",
        ).alias(f"lut{m}")
        for m, book in enumerate(books)
    ]
    q = q_probe.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "centroid_id",
        *luts,
    )
    est = F.round(
        sum(
            F.element_at(F.col(f"lut{m}"), F.element_at("codes", m + 1) + 1)
            for m in range(m_sub)
        ),
        6,
    )
    cand = (
        coded.join(
            F.broadcast(q.select("query_id", "centroid_id", *[f"lut{m}" for m in range(m_sub)])),
            "centroid_id",
        )
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", "vid", est.alias("est"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("est").desc(), F.col("vid").asc()
    )
    shortlist = (
        cand.withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") <= rerank)
        .select("query_id", "vid")
    )
    # exact re-rank: raw vectors touched only for the shortlist
    qvec = q.select("query_id", "qv", "qn").dropDuplicates(["query_id"])
    exact = (
        shortlist.join(base, "vid")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            F.col("vid").alias("corpus_id"),
            F.round(
                _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def cosine_topk_ivf_pq_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    m_sub: int = 4,
    n_codes: int = 16,
    rerank: int = 32,
) -> str:
    """DuckDB twin of :func:`cosine_topk_ivf_pq` (identical seeding,
    score formulation, rounding, and tie-breaks at every stage).
    Structured as cross joins + window argmins — DuckDB rejects
    subqueries inside lambda expressions."""
    sub_expr = f"(len(nv) // {m_sub})"
    lut_pivot = ", ".join(
        f"max(CASE WHEN m = {m} THEN lut END) AS lut{m}" for m in range(m_sub)
    )
    code_pivot = ", ".join(
        f"max(CASE WHEN m = {m} THEN code END) AS code{m}" for m in range(m_sub)
    )
    est = " + ".join(f"q.lut{m}[c.code{m} + 1]" for m in range(m_sub))
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
        cent AS (
            SELECT vid AS centroid_id, v AS cv, nrm AS cn
            FROM base_nz ORDER BY vid LIMIT {n_centroids}
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
        assigned AS (
            SELECT vid, centroid_id FROM (
                SELECT b.vid, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        code_scores AS (
            SELECT b.vid, w.m, w.code,
                   round(list_inner_product(
                             list_slice(b.v, w.m * {sub_expr.replace('nv','b.nv')} + 1,
                                        (w.m + 1) * {sub_expr.replace('nv','b.nv')}),
                             w.cw) / b.nrm
                         - list_inner_product(w.cw, w.cw) / 2.0, 9) AS score
            FROM base_nz b CROSS JOIN codewords w
        ),
        coded_m AS (
            SELECT vid, m, code FROM (
                SELECT vid, m, code,
                       row_number() OVER (PARTITION BY vid, m
                                          ORDER BY score DESC, code ASC) AS rn
                FROM code_scores
            ) WHERE rn = 1
        ),
        coded AS (
            SELECT cm.vid, a.centroid_id, {code_pivot}
            FROM coded_m cm JOIN assigned a USING (vid)
            GROUP BY cm.vid, a.centroid_id
        ),
        q_probe AS (
            SELECT vid AS query_id, v AS qv, nrm AS qn, centroid_id FROM (
                SELECT b.vid, b.v, b.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY b.vid
                           ORDER BY round(list_inner_product(b.v, c.cv) / (b.nrm * c.cn), 6) DESC,
                                    c.centroid_id ASC) AS rn
                FROM base_nz b CROSS JOIN cent c
                WHERE b.vid IN (SELECT {id_col} FROM {table} WHERE {query_pred})
            ) WHERE rn <= {n_probe}
        ),
        q_lut_rows AS (
            SELECT q.query_id, w.m,
                   list(round(list_inner_product(
                            list_slice(q.qv, w.m * (len(q.qv) // {m_sub}) + 1,
                                       (w.m + 1) * (len(q.qv) // {m_sub})),
                            w.cw) / q.qn, 9) ORDER BY w.code) AS lut
            FROM (SELECT DISTINCT query_id, qv, qn FROM q_probe) q
            CROSS JOIN codewords w
            GROUP BY q.query_id, w.m
        ),
        q_luts AS (
            SELECT query_id, {lut_pivot} FROM q_lut_rows GROUP BY query_id
        ),
        cand AS (
            SELECT p.query_id, c.vid, round({est}, 6) AS est
            FROM coded c
            JOIN q_probe p USING (centroid_id)
            JOIN q_luts q ON q.query_id = p.query_id
            WHERE c.vid <> p.query_id
        ),
        shortlist AS (
            SELECT query_id, vid FROM (
                SELECT query_id, vid,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY est DESC, vid ASC) AS rn
                FROM cand
            ) WHERE rn <= {rerank}
        ),
        qvec AS (SELECT DISTINCT query_id, qv, qn FROM q_probe),
        exact AS (
            SELECT s.query_id, b.vid AS corpus_id,
                   round(list_inner_product(b.v, v2.qv) / (b.nrm * v2.qn), 6) AS cosine
            FROM shortlist s JOIN base_nz b USING (vid)
            JOIN qvec v2 USING (query_id)
        )
        SELECT query_id, rank, corpus_id, cosine FROM (
            SELECT query_id, corpus_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, corpus_id ASC) AS rank
            FROM exact
        ) WHERE rank <= {k}
    """




def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    max_cosine: float = 0.98,
) -> DataFrame:
    """Hard-negative mining for embedding/contrastive training: for
    each query, the top-k MOST similar corpus vectors whose cosine
    stays BELOW ``max_cosine`` — close enough to be hard, excluded
    above the threshold where "negative" would actually be a
    near-duplicate positive (the classic false-negative poisoning).

    Plan: the IVF candidate scan (probe n_probe of n_centroids cells,
    map-side assignment, equi-join on cell) scores candidates; the
    near-dup ceiling filters BEFORE ranking, so the per-query window
    ranks only eligible negatives. Same rounding/tie-break discipline
    as every ANN operator — hash-matches its DuckDB twin.
    """
    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    cent_rows = (
        base.orderBy("vid")
        .limit(n_centroids)
        .select(
            F.col("vid").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        .collect()
    )
    assigned = _assign_cells(base, cent_rows, "vid")
    qids = queries.select(F.col(id_col).alias("vid"))
    qbase = base.join(F.broadcast(qids), "vid")
    q = _assign_cells(qbase, cent_rows, "vid", n_probe=n_probe).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "centroid_id",
    )
    cos = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    scored = (
        assigned.join(F.broadcast(q), "centroid_id")
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("corpus_id"), cos.alias("cosine"))
        .where(F.col("cosine") < F.lit(float(max_cosine)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )


def mine_hard_negatives_sql(
    table: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    max_cosine: float = 0.98,
) -> str:
    """DuckDB twin of :func:`mine_hard_negatives`."""
    inner = cosine_topk_ivf_sql(
        table, query_pred, id_col, vec_col,
        k=k, n_centroids=n_centroids, n_probe=n_probe,
    )
    # splice the ceiling into the scored CTE (same structure, one
    # extra predicate before ranking)
    marker = "WHERE a.vid <> q.query_id"
    assert marker in inner
    return inner.replace(
        marker,
        marker + f"\n              AND round(list_inner_product(a.v, q.qv)"
                 f" / (a.nrm * q.qn), 6) < {max_cosine!r}",
    )


# ----------------------------------- persistent incremental IVF index


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    centroids: DataFrame | None = None,
    batch_name: str = "batch-000000",
) -> None:
    """Materialize an IVF index on disk: ``centroids/`` (the frozen
    codebook) plus ``assigned/<batch_name>/`` holding
    (vid, centroid_id, v, nrm) — search never re-reads or re-embeds
    the source table. The codebook is FROZEN at build time so later
    appends assign against the same cells (retrain = rebuild, the
    standard IVF contract)."""
    import os

    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    cent = centroids if centroids is not None else (
        base.orderBy("vid")
        .limit(n_centroids)
        .select(
            F.col("vid").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    cent_rows = cent.collect()
    spark = corpus.sparkSession
    spark.createDataFrame(cent_rows).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    _assign_cells(base, cent_rows, "vid").write.mode("overwrite").parquet(
        os.path.join(path, "assigned", batch_name)
    )


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_name: str | None = None,
) -> None:
    """Assign NEW vectors against the frozen codebook and append them
    as the next ``assigned/batch-NNNNNN/`` directory — the same
    idempotent per-batch-dir discipline as the dedup history indexes;
    existing index data is never re-read or re-assigned.

    ``batch_name`` pins the directory name (e.g. a streaming batch id)
    so a crash-replayed caller REWRITES its own directory instead of
    minting a new one — required for exactly-once maintenance from
    foreachBatch; the default max+1 numbering serves one-shot batch
    appends."""
    import glob
    import os

    spark = new_vectors.sparkSession
    cent_rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    base = new_vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    if batch_name is None:
        batches = glob.glob(os.path.join(path, "assigned", "batch-*"))
        nxt = max(int(os.path.basename(b).split("-")[1]) for b in batches) + 1
        batch_name = f"batch-{nxt:06d}"
    _assign_cells(base, cent_rows, "vid").write.mode("overwrite").parquet(
        os.path.join(path, "assigned", batch_name)
    )


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """Top-k search over a materialized index: queries assign against
    the frozen codebook (map-side), candidates come from the persisted
    (vid, cell, v, nrm) batches via one equi-join on cell — identical
    results to :func:`cosine_topk_ivf` over the union of all indexed
    batches with the same codebook (pinned by test)."""
    import os

    cent_rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    assigned = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "assigned")
    )
    qbase = queries.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)
    q = _assign_cells(qbase, cent_rows, "vid", n_probe=n_probe).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "centroid_id",
    )
    cos = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    scored = (
        assigned.join(F.broadcast(q), "centroid_id")
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("corpus_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cosine")
    )
