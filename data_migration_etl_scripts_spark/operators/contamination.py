"""Benchmark decontamination + repetition-based quality filtering for
training-corpus curation.

Two operators every LLM-data pipeline needs that the dedup family does
not cover:

- :func:`decontaminate` — flag training documents that share n-gram
  shingles with a benchmark/eval set (the standard "n-gram overlap"
  decontamination from the GPT-3/PaLM data cards: a training doc is
  contaminated when any length-``n`` token window also appears in an
  eval document).
- :func:`repetition_stats` — Gopher-style repetition metrics
  (duplicate-line fraction, most-common-token fraction, most-common-
  2-gram fraction) used to drop degenerate/boilerplate documents.

Scale design (100 TB corpus, 1000 executors):
- The eval set is small by construction (benchmarks are thousands of
  docs, not billions), so its distinct shingle set is broadcast and
  the contamination check is a map-side broadcast LEFT SEMI style
  join — the 100 TB side is never shuffled.
- ``repetition_stats`` uses explode -> groupBy(doc_id, gram) ->
  max-per-doc. Both aggregations partially aggregate map-side and
  shuffle on (doc_id, gram) / (doc_id) — no skew risk because the key
  space is per-document, and no per-row O(k^2) array self-scans.

All hashing/tokenization comes from ``textprep`` so the DuckDB oracle
fragments stay in lockstep with the Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import textprep as tp

# ------------------------------------------------------ decontamination


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-doc contamination stats against a benchmark set.

    Returns (doc_id, n_shingles, n_hits, contaminated) where ``n_hits``
    counts the doc's DISTINCT n-gram shingles that also occur anywhere
    in ``bench``; ``contaminated`` is true when any hit exists. Docs
    too short to form a shingle report 0/0/false.

    Plan shape: bench distinct-shingle set (small — benchmarks are
    thousands of docs) is broadcast; the corpus side explodes its
    shingles and LEFT-joins the broadcast set, so the 100 TB side is
    map-side only until the final per-doc count, which shuffles one
    (doc_id, partial-count) row per task.
    """
    bench_text = bench_text_col or text_col
    bench_shingles = (
        bench.select(
            F.explode(
                tp.word_shingles(tp.tokens(bench_text), n=n, distinct=True)
            ).alias("shingle")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_shingles = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            tp.word_shingles(tp.tokens(text_col), n=n, distinct=True)
        ).alias("shingle"),
    )
    return (
        doc_shingles.join(F.broadcast(bench_shingles), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def containment_pairs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """ASYMMETRIC contamination: (bench_id, doc_id) pairs where the
    benchmark item's shingle set is >= ``threshold`` CONTAINED in the
    doc — containment = |S_bench ∩ S_doc| / |S_bench|. Catches a
    benchmark quoted inside a much larger document, which symmetric
    Jaccard dilutes to ~0 (the standard eval-leak miss).

    Plan shape: bench shingles (bench-sized, broadcast) carry their
    item's set size; the corpus explodes its distinct shingles once and
    the broadcast join is map-side — the only shuffle groups the
    matched (bench_id, doc_id) pairs, bounded by shared-shingle
    volume, never |bench| x |corpus|."""
    bench_sh = (
        bench.select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode(
                tp.word_shingles(tp.tokens(text_col), n=n, distinct=True)
            ).alias("shingle"),
        )
        .distinct()
    )
    bench_sizes = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_n")
    )
    bench_sh = bench_sh.join(bench_sizes, "bench_id")
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            tp.word_shingles(tp.tokens(text_col), n=n, distinct=True)
        ).alias("shingle"),
    ).distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("bench_id", "doc_id", "bench_n")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .select(
            "bench_id", "doc_id", "n_inter",
            F.round(F.col("n_inter") / F.col("bench_n"), 6)
            .alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def containment_pairs_sql(
    docs_table: str,
    bench_sql: str,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`containment_pairs`. ``bench_sql`` must
    produce (bench_id, {text_col}) rows."""
    sh = tp.word_shingles_sql(tp.tokens_sql(text_col), n=n)
    return f"""
    WITH bench_sh AS (
        SELECT DISTINCT bench_id, shingle
        FROM (SELECT bench_id, unnest({sh}) AS shingle FROM ({bench_sql}))
    ),
    bench_sizes AS (
        SELECT bench_id, count(*) AS bench_n FROM bench_sh GROUP BY bench_id
    ),
    doc_sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id, unnest({sh}) AS shingle FROM {docs_table})
    )
    SELECT b.bench_id, d.doc_id, count(*) AS n_inter,
           round(count(*) / CAST(s.bench_n AS DOUBLE), 6) AS containment
    FROM doc_sh d
    JOIN bench_sh b ON d.shingle = b.shingle
    JOIN bench_sizes s ON s.bench_id = b.bench_id
    GROUP BY b.bench_id, d.doc_id, s.bench_n
    HAVING round(count(*) / CAST(s.bench_n AS DOUBLE), 6) >= {threshold}
    """


def decontaminate_sql(
    docs_table: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    """DuckDB twin of :func:`decontaminate`. ``bench_sql`` is a SELECT
    producing the benchmark rows with a ``{text_col}`` column."""
    doc_sh = tp.word_shingles_sql(tp.tokens_sql(text_col), n=n, distinct=True)
    return f"""
        WITH bench_shingles AS (
            SELECT DISTINCT unnest({doc_sh}) AS shingle
            FROM ({bench_sql})
        ),
        doc_shingles AS (
            SELECT {id_col} AS doc_id, s.shingle
            FROM {docs_table}
            LEFT JOIN LATERAL (
                SELECT unnest(COALESCE(NULLIF({doc_sh}, []), [NULL])) AS shingle
            ) s ON true
        )
        SELECT d.doc_id,
               count(d.shingle) AS n_shingles,
               CAST(count(b.shingle) AS BIGINT) AS n_hits,
               count(b.shingle) > 0 AS contaminated
        FROM doc_shingles d
        LEFT JOIN bench_shingles b ON d.shingle = b.shingle
        GROUP BY d.doc_id
    """


# -------------------------------------------------- repetition filters


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_frac: float = 0.20,
    max_bigram_frac: float = 0.30,
    max_dup_line_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition metrics + keep/drop flag per document.

    Returns (doc_id, n_tokens, top_token_frac, top_bigram_frac,
    dup_line_frac, keep). Fractions are 0 for empty docs so the flag
    never NULLs out.

    - ``top_token_frac``  — occurrences of the most frequent token /
      total tokens ("most common word" rule).
    - ``top_bigram_frac`` — tokens covered by the most frequent 2-gram
      (2 * count / n_tokens), capped at 1.0 for the n_tokens==1 edge.
    - ``dup_line_frac``   — 1 - distinct_lines/lines over newline-split
      raw text (duplicate-paragraph rule; 0 for single-line docs).

    Plan: one explode of non-distinct token/2-gram streams ->
    groupBy(doc_id, gram) -> max count per doc. Two shuffles, both
    partially aggregated map-side, keyed per-document (no global skew).
    dup_line_frac is a pure per-row array expression (no shuffle).
    """
    toks = tp.tokens(text_col)
    grams = F.concat(
        F.transform(toks, lambda t: F.struct(F.lit(1).alias("w"), t.alias("g"))),
        F.transform(
            tp.word_shingles(toks, n=2, distinct=False),
            lambda t: F.struct(F.lit(2).alias("w"), t.alias("g")),
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    ).select("doc_id", F.col("gram.w").alias("w"), F.col("gram.g").alias("g"))
    tops = (
        exploded.groupBy("doc_id", "w", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "w")
        .agg(F.max("c").alias("top_c"))
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("w") == 1, F.col("top_c"))).alias("top_tok_c"),
            F.max(F.when(F.col("w") == 2, F.col("top_c"))).alias("top_big_c"),
        )
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_distinct_lines"),
    )
    out = (
        base.join(tops, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("top_tok_c") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_token_frac"),
            F.round(
                F.when(
                    F.col("n_tokens") > 1,
                    F.least(
                        F.lit(2) * F.col("top_big_c") / F.col("n_tokens"),
                        F.lit(1.0),
                    ),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.when(
                    F.col("n_lines") > 0,
                    F.lit(1.0) - F.col("n_distinct_lines") / F.col("n_lines"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("top_token_frac") <= max_token_frac)
        & (F.col("top_bigram_frac") <= max_bigram_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac),
    )


def repetition_stats_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_frac: float = 0.20,
    max_bigram_frac: float = 0.30,
    max_dup_line_frac: float = 0.30,
) -> str:
    """DuckDB twin of :func:`repetition_stats`."""
    toks = tp.tokens_sql(text_col)
    bigr = tp.word_shingles_sql(toks, n=2, distinct=False)
    return f"""
        WITH grams AS (
            SELECT {id_col} AS doc_id, u.w, u.g
            FROM {table},
            LATERAL (
                SELECT 1 AS w, unnest({toks}) AS g
                UNION ALL
                SELECT 2 AS w, unnest({bigr}) AS g
            ) u
        ),
        tops AS (
            SELECT doc_id,
                   max(c) FILTER (w = 1) AS top_tok_c,
                   max(c) FILTER (w = 2) AS top_big_c
            FROM (
                SELECT doc_id, w, g, count(*) AS c
                FROM grams GROUP BY doc_id, w, g
            ) counted
            GROUP BY doc_id
        ),
        base AS (
            SELECT {id_col} AS doc_id,
                   CAST(len({toks}) AS BIGINT) AS n_tokens,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct_lines
            FROM (
                SELECT *,
                       list_filter(list_transform(string_split({text_col}, chr(10)),
                                                  s -> trim(s)),
                                   s -> s <> '') AS lines
                FROM {table}
            ) t
        ),
        metrics AS (
            SELECT b.doc_id, b.n_tokens,
                   round(CASE WHEN b.n_tokens > 0
                              THEN t.top_tok_c / CAST(b.n_tokens AS DOUBLE)
                              ELSE 0.0 END, 6) AS top_token_frac,
                   round(CASE WHEN b.n_tokens > 1
                              THEN least(2 * t.top_big_c / CAST(b.n_tokens AS DOUBLE), 1.0)
                              ELSE 0.0 END, 6) AS top_bigram_frac,
                   round(CASE WHEN b.n_lines > 0
                              THEN 1.0 - b.n_distinct_lines / CAST(b.n_lines AS DOUBLE)
                              ELSE 0.0 END, 6) AS dup_line_frac
            FROM base b LEFT JOIN tops t ON b.doc_id = t.doc_id
        )
        SELECT *,
               top_token_frac <= {max_token_frac}
               AND top_bigram_frac <= {max_bigram_frac}
               AND dup_line_frac <= {max_dup_line_frac} AS keep
        FROM metrics
    """


# ------------------------------------------- corpus-statistics scoring


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
) -> DataFrame:
    """Unigram-LM document scoring against corpus-global statistics —
    the cheap stand-in for perplexity filtering (KenLM-style) in data
    curation: low average token log-prob = gibberish / OOV-heavy docs.

    Two passes over the corpus, which is inherent (pass 1 builds the
    model, pass 2 scores): token counts -> top-``vocab_size`` vocab
    (TakeOrderedAndProject, never a global sort) with probabilities;
    then per-token LEFT join against the BROADCAST vocab, OOV floored
    at 0.5/total. Per-token log-probs are rounded to 9 dp then summed
    as DECIMAL so the per-doc average is order-independent (1000
    executors must agree with each other, not just with the oracle).

    Returns (doc_id, n_tokens, oov_frac, avg_logprob); empty docs
    report (0, 0.0, 0.0).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tp.tokens(text_col)).alias("t"),
    )
    counts = tok.where(F.col("t").isNotNull()).groupBy("t").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.agg(F.sum("c").cast("long").alias("total"))
    vocab = counts.orderBy(F.desc("c"), "t").limit(vocab_size)
    lp = F.round(
        F.log(
            F.coalesce(
                F.col("c") / F.col("total"),
                F.lit(0.5) / F.col("total"),
            )
        ),
        9,
    )
    scored = (
        tok.crossJoin(F.broadcast(totals))
        .join(F.broadcast(vocab), "t", "left")
        .select(
            "doc_id",
            F.col("t").isNotNull().cast("int").alias("is_tok"),
            (F.col("t").isNotNull() & F.col("c").isNull()).cast("int").alias("is_oov"),
            F.when(F.col("t").isNotNull(), lp)
            .otherwise(F.lit(0.0))
            .cast("decimal(20,10)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("is_tok").cast("long").alias("n_tokens"),
        F.round(
            F.when(
                F.sum("is_tok") > 0, F.sum("is_oov") / F.sum("is_tok")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("oov_frac"),
        F.round(
            F.when(
                F.sum("is_tok") > 0,
                F.sum("lp").cast("double") / F.sum("is_tok"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_logprob"),
    )


def unigram_logprob_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
) -> str:
    """DuckDB twin of :func:`unigram_logprob` (same rounding + DECIMAL
    summation so doubles agree bit-for-bit)."""
    toks = tp.tokens_sql(text_col)
    return f"""
        WITH tok AS (
            SELECT {id_col} AS doc_id, u.t
            FROM {table}
            LEFT JOIN LATERAL (
                SELECT unnest(COALESCE(NULLIF({toks}, []), [NULL])) AS t
            ) u ON true
        ),
        counts AS (
            SELECT t, count(*) AS c FROM tok WHERE t IS NOT NULL GROUP BY t
        ),
        totals AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
        vocab AS (
            SELECT t, c FROM counts ORDER BY c DESC, t LIMIT {vocab_size}
        ),
        scored AS (
            SELECT tok.doc_id,
                   CAST(tok.t IS NOT NULL AS INT) AS is_tok,
                   CAST(tok.t IS NOT NULL AND v.c IS NULL AS INT) AS is_oov,
                   CAST(CASE WHEN tok.t IS NOT NULL THEN
                       round(ln(COALESCE(v.c / CAST(total AS DOUBLE),
                                         0.5 / CAST(total AS DOUBLE))), 9)
                   ELSE 0.0 END AS DECIMAL(20,10)) AS lp
            FROM tok CROSS JOIN totals LEFT JOIN vocab v ON tok.t = v.t
        )
        SELECT doc_id,
               CAST(sum(is_tok) AS BIGINT) AS n_tokens,
               round(CASE WHEN sum(is_tok) > 0
                          THEN sum(is_oov) / CAST(sum(is_tok) AS DOUBLE)
                          ELSE 0.0 END, 6) AS oov_frac,
               round(CASE WHEN sum(is_tok) > 0
                          THEN CAST(sum(lp) AS DOUBLE) / sum(is_tok)
                          ELSE 0.0 END, 6) AS avg_logprob
        FROM scored GROUP BY doc_id
    """


def decontaminate_fuzzy(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-duplicate benchmark contamination via MinHash band collision.

    Exact n-gram overlap (:func:`decontaminate`) misses paraphrased or
    lightly-edited eval leaks; a document that is a NEAR-copy of any
    benchmark item still collides with it in at least one LSH band
    with high probability. Returns (doc_id, n_bench_hits, contaminated)
    for EVERY corpus doc, where ``n_bench_hits`` counts distinct bench
    docs sharing any band.

    Plan shape: the bench band table (benchmarks are thousands of
    docs) broadcasts; the corpus pays exactly one signature pass
    (explode -> codegen min aggregates, one row per doc into the
    shuffle — the ``minhash_band_table`` shape) and a broadcast
    equi-join on (band_id, band_key). Never all-pairs, corpus text
    read once.
    """
    from data_migration_etl_scripts_spark.operators import ingest as ig

    bench_bands = ig.minhash_band_table(
        bench, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n
    ).select(F.col("doc_id").alias("bench_id"), "band_id", "band_key")
    corpus_bands = ig.minhash_band_table(
        docs, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n
    )
    hits = (
        corpus_bands.join(F.broadcast(bench_bands), ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(F.count_distinct("bench_id").alias("n_bench_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .na.fill({"n_bench_hits": 0})
        .select(
            "doc_id",
            F.col("n_bench_hits").cast("long").alias("n_bench_hits"),
            (F.col("n_bench_hits") > 0).alias("contaminated"),
        )
    )


def decontaminate_fuzzy_sql(
    docs_table: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> str:
    """DuckDB twin of :func:`decontaminate_fuzzy` (same signatures,
    band keys, and hit counting as the ingest oracle helpers)."""
    from data_migration_etl_scripts_spark.operators.ingest import (
        _bands_from_sigs,
        _sigs_cte,
    )

    return f"""
        WITH bench_sigs AS ({_sigs_cte(bench_sql, id_col, text_col, k, shingle_n)}),
        bench_bands AS (
            SELECT doc_id AS bench_id, band_id, band_key
            FROM ({_bands_from_sigs("bench_sigs", k, bands)})
        ),
        corpus_sigs AS (
            {_sigs_cte(f"SELECT * FROM {docs_table}", id_col, text_col, k, shingle_n)}
        ),
        corpus_bands AS ({_bands_from_sigs("corpus_sigs", k, bands)}),
        hits AS (
            SELECT c.doc_id, count(DISTINCT b.bench_id) AS n_bench_hits
            FROM corpus_bands c
            JOIN bench_bands b USING (band_id, band_key)
            GROUP BY c.doc_id
        )
        SELECT d.{id_col} AS doc_id,
               CAST(coalesce(h.n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
               coalesce(h.n_bench_hits, 0) > 0 AS contaminated
        FROM {docs_table} d LEFT JOIN hits h ON d.{id_col} = h.doc_id
    """


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
    bigram_size: int = 16384,
    lam: float = 0.7,
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Interpolated bigram-LM scoring (the CCNet-style upgrade over
    :func:`unigram_logprob`): per transition (w1, w2),

        lp = log(lam * P(w2|w1) + (1 - lam) * P1(w2))

    with P(w2|w1) = c(w1,w2)/c(w1) from the top-``bigram_size`` bigram
    table (0 when the bigram or w1 is out of table — the unigram
    interpolation floor absorbs it) and P1 the floored unigram.
    Catches fluent-word-salad that fools a unigram model (every token
    common, no two of them ever adjacent in real text).

    ``model_df`` (optional) separates TRAIN from EVAL: the count
    tables build from ``model_df`` while ``df`` is scored — the
    held-out perplexity shape every LM-quality gate runs (default:
    self-scoring, the CCNet in-domain form).

    Plan: transitions come from zip_with over shifted slices (the
    no-CSE-safe shingle pattern); both model tables are
    TakeOrderedAndProject tops, broadcast; per-transition log-probs
    round to 9 dp then DECIMAL-sum, so 1000-executor merge order
    cannot drift the average. Returns (doc_id, n_transitions,
    hit_frac, avg_logprob); docs with < 2 tokens report (0, 0.0, 0.0).
    """
    toks = tp.tokens(text_col)

    def lattice(src: DataFrame):
        base = src.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        n = F.size("t")
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice("t", 1, n - 1),
                F.expr("slice(t, 2, size(t) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        trans = base.select(
            "doc_id", F.explode_outer(pairs).alias("p")
        ).select(
            "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        return base, trans

    _base, trans = lattice(df)
    m_base, m_trans = lattice(model_df if model_df is not None else df)
    tok = m_base.select("doc_id", F.explode("t").alias("w"))
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(F.sum("c").cast("long").alias("total"))
    vocab = counts.orderBy(F.desc("c"), "w").limit(vocab_size)
    bigrams = (
        m_trans.where(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .join(F.broadcast(vocab.select(F.col("w").alias("w1"))), "w1")
        .join(F.broadcast(vocab.select(F.col("w").alias("w2"))), "w2")
        .orderBy(F.desc("cb"), "w1", "w2")
        .limit(bigram_size)
    )
    p2 = F.coalesce(
        F.col("cb") / F.col("c1"), F.lit(0.0)
    )
    p1 = F.coalesce(
        F.col("c2") / F.col("total"), F.lit(0.5) / F.col("total")
    )
    lp = F.round(F.log(F.lit(float(lam)) * p2 + F.lit(1.0 - lam) * p1), 9)
    scored = (
        trans.crossJoin(F.broadcast(totals))
        .join(
            F.broadcast(vocab.select(F.col("w").alias("w1"), F.col("c").alias("c1"))),
            "w1", "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("w").alias("w2"), F.col("c").alias("c2"))),
            "w2", "left",
        )
        .join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .select(
            "doc_id",
            F.col("w1").isNotNull().cast("int").alias("is_tr"),
            (F.col("w1").isNotNull() & F.col("cb").isNotNull()).cast("int").alias("is_hit"),
            F.when(F.col("w1").isNotNull(), lp)
            .otherwise(F.lit(0.0))
            .cast("decimal(20,10)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("is_tr").cast("long").alias("n_transitions"),
        F.round(
            F.when(F.sum("is_tr") > 0, F.sum("is_hit") / F.sum("is_tr"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("hit_frac"),
        F.round(
            F.when(
                F.sum("is_tr") > 0, F.sum("lp").cast("double") / F.sum("is_tr")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_logprob"),
    )


def bigram_logprob_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
    bigram_size: int = 16384,
    lam: float = 0.7,
    model_table: str | None = None,
) -> str:
    """DuckDB twin of :func:`bigram_logprob` (same tops, interpolation,
    rounding, and DECIMAL summation). ``model_table`` mirrors
    ``model_df``: counts build there, ``table`` is scored."""
    toks = tp.tokens_sql(text_col)
    trans_body = """
            SELECT doc_id, u.p.w1 AS w1, u.p.w2 AS w2
            FROM {src}
            LEFT JOIN LATERAL (
                SELECT unnest(COALESCE(NULLIF(
                    CASE WHEN len(t) >= 2 THEN
                        list_transform(
                            list_zip(list_slice(t, 1, len(t) - 1),
                                     list_slice(t, 2, len(t))),
                            z -> struct_pack(w1 := z[1], w2 := z[2]))
                    ELSE [] END, []), [NULL])) AS p
            ) u ON true
    """
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
        ),
        base_m AS (
            SELECT {id_col} AS doc_id, {toks} AS t
            FROM {model_table or table}
        ),
        trans AS ({trans_body.format(src="base")}),
        trans_m AS ({trans_body.format(src="base_m")}),
        tok AS (SELECT doc_id, unnest(t) AS w FROM base_m),
        counts AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        totals AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
        vocab AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {vocab_size}),
        bigrams AS (
            SELECT tr.w1, tr.w2, count(*) AS cb
            FROM trans_m tr
            JOIN vocab v1 ON tr.w1 = v1.w
            JOIN vocab v2 ON tr.w2 = v2.w
            GROUP BY tr.w1, tr.w2
            ORDER BY cb DESC, tr.w1, tr.w2 LIMIT {bigram_size}
        ),
        scored AS (
            SELECT tr.doc_id,
                   CAST(tr.w1 IS NOT NULL AS INT) AS is_tr,
                   CAST(tr.w1 IS NOT NULL AND b.cb IS NOT NULL AS INT) AS is_hit,
                   CAST(CASE WHEN tr.w1 IS NOT NULL THEN
                       round(ln({lam!r} * COALESCE(b.cb / CAST(v1.c AS DOUBLE), 0.0)
                              + {1.0 - lam!r} * COALESCE(v2.c / CAST(total AS DOUBLE),
                                                         0.5 / CAST(total AS DOUBLE))), 9)
                   ELSE 0.0 END AS DECIMAL(20,10)) AS lp
            FROM trans tr
            CROSS JOIN totals
            LEFT JOIN vocab v1 ON tr.w1 = v1.w
            LEFT JOIN vocab v2 ON tr.w2 = v2.w
            LEFT JOIN bigrams b ON tr.w1 = b.w1 AND tr.w2 = b.w2
        )
        SELECT doc_id,
               CAST(sum(is_tr) AS BIGINT) AS n_transitions,
               round(CASE WHEN sum(is_tr) > 0
                          THEN sum(is_hit) / CAST(sum(is_tr) AS DOUBLE)
                          ELSE 0.0 END, 6) AS hit_frac,
               round(CASE WHEN sum(is_tr) > 0
                          THEN CAST(sum(lp) AS DOUBLE) / sum(is_tr)
                          ELSE 0.0 END, 6) AS avg_logprob
        FROM scored GROUP BY doc_id
    """
