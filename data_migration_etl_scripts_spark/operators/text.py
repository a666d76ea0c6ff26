"""Text-analysis operators for document pipelines.

All pure Column expressions over the canonical tokenization
(textprep.tokens), each with a DuckDB oracle twin:

- :func:`token_stats`    — token count, char count, avg token length,
                           type-token ratio (whitespace+alnum
                           tokenizer; a BPE-ish subword count is
                           approximated as ceil(chars/4), the common
                           budgeting rule of thumb).
- :func:`language_id`    — n-gram/stopword-vote heuristic with a
                           deterministic tie-break. (Real pipelines
                           plug a model here; the operator contract —
                           one label + score per doc, computed
                           distributed — is what the engine provides.)
- :func:`quality_score`  — length/stopword/repetition heuristics in
                           [0,1] (Gopher-rules-style shape).
- :func:`fingerprint`    — md5 content fingerprint of canonical text
                           plus a positional rolling-window fingerprint
                           (min-of-window-hashes, winnowing-style).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import textprep as tp

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein")
STOPWORDS_ES = ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con")
STOPWORDS_FR = ("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que")

_LANGS = (("en", STOPWORDS_EN), ("de", STOPWORDS_DE), ("es", STOPWORDS_ES), ("fr", STOPWORDS_FR))


def _sql_in(values: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in values)


# ------------------------------------------------------------- stats


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = tp.tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_raw"),
        F.size(F.array_distinct(t)).alias("n_types"),
        F.when(
            n_tokens > 0,
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / n_tokens,
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
        F.ceil(n_chars / 4).cast("long").alias("approx_bpe_tokens"),
    )


def token_stats_sql(table: str, id_col: str, text_col: str) -> str:
    t = tp.tokens_sql(text_col)
    return f"""
        SELECT {id_col} AS doc_id,
               len(t) AS n_tokens,
               length({text_col}) AS n_chars_raw,
               len(list_distinct(t)) AS n_types,
               CASE WHEN len(t) > 0
                    THEN list_sum(list_transform(t, x -> length(x))) / len(t)
                    ELSE 0.0 END AS avg_token_len,
               CAST(ceil(length({text_col}) / 4) AS BIGINT) AS approx_bpe_tokens
        FROM (SELECT {id_col}, {text_col}, {t} AS t FROM {table})
    """


# ---------------------------------------------------------- language


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language guess: (doc_id, lang_guess, lang_hits).

    Votes = stopword-list hits per language; winner = most hits,
    ties broken by fixed language order (en, de, es, fr); zero hits
    everywhere -> 'und' (undetermined, BCP-47 style).
    """
    t = tp.tokens(text_col)

    # one-param lambda via factory: a defaulted second param would
    # receive pyspark's array index, not the closed-over stopword list
    def in_set(sw: tuple[str, ...]):
        return lambda x: x.isin(*sw)

    hits = {lang: F.size(F.filter(t, in_set(sw))) for lang, sw in _LANGS}
    out = df.select(F.col(id_col).alias("doc_id"), *[h.alias(f"h_{l}") for l, h in hits.items()])
    # fold from the last language up, so earlier languages win ties
    win = F.lit("und")
    win_h = F.lit(0)
    for lang, _ in _LANGS[::-1]:
        c = F.col(f"h_{lang}") > win_h
        win = F.when(c, F.lit(lang)).otherwise(win)
        win_h = F.when(c, F.col(f"h_{lang}")).otherwise(win_h)
    return out.select("doc_id", win.alias("lang_guess"), win_h.cast("int").alias("lang_hits"))


def language_id_sql(table: str, id_col: str, text_col: str) -> str:
    t = tp.tokens_sql(text_col)
    hit_cols = ", ".join(
        f"len(list_filter(t, x -> x IN ({_sql_in(sw)}))) AS h_{lang}" for lang, sw in _LANGS
    )
    # same fold, reversed order so earlier languages win ties
    win = "'und'"
    win_h = "0"
    for lang, _ in _LANGS[::-1]:
        win = f"CASE WHEN h_{lang} > {win_h} THEN '{lang}' ELSE {win} END"
        win_h = f"CASE WHEN h_{lang} > {win_h} THEN h_{lang} ELSE {win_h} END"
    return f"""
        SELECT doc_id, {win} AS lang_guess, CAST({win_h} AS INT) AS lang_hits
        FROM (
            SELECT {id_col} AS doc_id, {hit_cols}
            FROM (SELECT {id_col}, {t} AS t FROM {table})
        )
    """


# ----------------------------------------------------------- quality


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic doc quality in [0,1]: (doc_id, quality).

    quality = 0.4 * length_ok + 0.3 * (1 - repetition) + 0.3 * stopword_ok
      - length_ok: 1 if 50 <= n_tokens <= 100000 else n_tokens/50
      - repetition: 1 - distinct/total tokens (high = boilerplate)
      - stopword_ok: 1 if stopword fraction in [0.01, 0.6]
    The exact constants are pipeline policy, not magic — the operator
    contract is "deterministic scalar quality per doc, computed
    distributed, no UDF".
    """
    t = tp.tokens(text_col)
    n = F.size(t)
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(t)) / n).otherwise(F.lit(0.0))
    sw = STOPWORDS_EN
    sw_frac = F.when(n > 0, F.size(F.filter(t, lambda x: x.isin(*sw))) / n).otherwise(F.lit(0.0))
    length_ok = F.when(n >= 50, F.lit(1.0)).otherwise(n / F.lit(50.0))
    sw_ok = F.when((sw_frac >= 0.01) & (sw_frac <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    # no rounding: identical-order IEEE ops give bit-identical doubles
    # in both engines, while round(x, 4) can disagree on half-cases
    quality = 0.4 * length_ok + 0.3 * distinct_ratio + 0.3 * sw_ok
    return df.select(F.col(id_col).alias("doc_id"), quality.alias("quality"))


def quality_score_sql(table: str, id_col: str, text_col: str) -> str:
    t = tp.tokens_sql(text_col)
    return f"""
        SELECT doc_id,
               0.4 * (CASE WHEN n >= 50 THEN 1.0 ELSE n / 50.0 END)
                   + 0.3 * (CASE WHEN n > 0 THEN len(list_distinct(t)) / CAST(n AS DOUBLE) ELSE 0.0 END)
                   + 0.3 * (CASE WHEN sw_frac >= 0.01 AND sw_frac <= 0.6 THEN 1.0 ELSE 0.0 END)
                   AS quality
        FROM (
            SELECT doc_id, t, n,
                   CASE WHEN n > 0
                        THEN len(list_filter(t, x -> x IN ({_sql_in(STOPWORDS_EN)}))) / CAST(n AS DOUBLE)
                        ELSE 0.0 END AS sw_frac
            FROM (SELECT {id_col} AS doc_id, {t} AS t, len({t}) AS n FROM {table})
        )
    """


# ------------------------------------------------------- fingerprints


def fingerprint(df: DataFrame, id_col: str, text_col: str, window: int = 5) -> DataFrame:
    """(doc_id, content_md5, winnow_fp): whole-content hash plus a
    winnowing-style fingerprint = min over token-window hashes — robust
    to local edits, cheap to compare.

    The token array is materialized behind a repartition barrier:
    window building does ``window`` element_at reads per position, and
    without the barrier Catalyst inlines the whole tokenize expression
    into each read (observed ~60x slowdown at 5k docs).
    """
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, df.rdd.getNumPartitions())
    toks = df.select(
        F.col(id_col).alias("doc_id"), tp.tokens(text_col).alias("t")
    ).repartition(n_part)
    t = F.col("t")
    canon = F.concat_ws(" ", t)
    wins = tp.word_shingles(t, n=window, distinct=False)
    win_hashes = F.transform(wins, lambda s: F.md5(s))
    winnow = F.when(F.size(wins) > 0, F.array_min(win_hashes)).otherwise(F.md5(canon))
    return toks.select(
        "doc_id",
        F.md5(canon).alias("content_md5"),
        winnow.alias("winnow_fp"),
    )


def fingerprint_sql(table: str, id_col: str, text_col: str, window: int = 5) -> str:
    t = tp.tokens_sql(text_col)
    wins = tp.word_shingles_sql(t, n=window, distinct=False)
    return f"""
        SELECT {id_col} AS doc_id,
               md5(array_to_string(t, ' ')) AS content_md5,
               CASE WHEN len(w) > 0
                    THEN list_min(list_transform(w, s -> md5(s)))
                    ELSE md5(array_to_string(t, ' ')) END AS winnow_fp
        FROM (SELECT {id_col}, {t} AS t, {wins} AS w FROM {table})
    """


# -------------------------------------------------------------- tf-idf


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Top-k terms per doc by smoothed TF-IDF:
    score = tf * ln((N + 1) / (df + 1)).

    One explode feeds both the per-(doc, term) tf agg and the per-term
    df agg; N is a 1-row broadcast. Scores are rounded to 6 dp BEFORE
    ranking: JVM log() and libm log() disagree in the last ulp on ~9%
    of inputs (measured), and an unrounded order-by would let that flip
    ranks between engines.
    """
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tp.tokens(text_col)).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = toks.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf", "df", "tfidf")
    )


def tfidf_topk_sql(table: str, id_col: str, text_col: str, k: int = 5) -> str:
    t = tp.tokens_sql(text_col)
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id, unnest({t}) AS tok FROM {table}
        ),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
        scored AS (
            SELECT doc_id, tok, tf, df,
                   round(tf * ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
            FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        )
        SELECT doc_id, rank, tok, tf, df, tfidf FROM (
            SELECT doc_id, tok, tf, df, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, tok ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval (Okapi, Lucene idf) — query-relevance ranking
    for retrieval-based data selection (mine the corpus for documents
    relevant to a target distribution, the importance-resampling
    front end). Returns the top-``k`` docs by
    score = sum_t idf(t) * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)),
    idf = ln((N - df + 0.5)/(df + 0.5) + 1).

    Plan: ONE explode feeds doc lengths and the query-term-filtered
    tf table (the isin filter prunes before any shuffle); N/avgdl are
    a 1-row broadcast; top-k is TakeOrderedAndProject. Determinism:
    per-term contributions round to 9 dp (JVM vs libm ln last-ulp)
    and DECIMAL-sum; the final score rounds to 6 dp BEFORE ranking
    with (score desc, doc_id) tie-break."""
    terms = sorted(set(tp.tokens_list(query)))
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tp.tokens(text_col)).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    tf_norm = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_norm, 9).cast("decimal(20,10)").alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("c").cast("double"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def bm25_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same filter-early tf table,
    rounding, DECIMAL summation, and tie-break). Float constants are
    precomputed and emitted in e-notation — DuckDB parses bare
    decimals as exact DECIMALs, which diverges from Spark's doubles
    (the PageRank lesson, operators/graph.py)."""
    terms = sorted(set(tp.tokens_list(query)))
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    t = tp.tokens_sql(text_col)
    k1p1, k1e, one_mb, be = (
        f"{k1 + 1.0:.17e}", f"{k1:.17e}", f"{1.0 - b:.17e}", f"{b:.17e}"
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id, unnest({t}) AS tok FROM {table}
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs,
                         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                  FROM dl),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
               WHERE tok IN ({terms_sql}) GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        scored AS (
            SELECT tf.doc_id,
                   CAST(round(
                       round(ln((n_docs - df + 0.5)
                                / (df + CAST(0.5 AS DOUBLE)) + 1.0), 9)
                       * (tf * {k1p1}
                          / (tf + {k1e} * ({one_mb}
                                           + {be} * dl.dl / avgdl))), 9)
                   AS DECIMAL(20,10)) AS c
            FROM tf JOIN dfreq USING (tok)
                    JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
        )
        SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Per-doc DEFLATE compressibility — the entropy/repetition
    signal web-corpus pipelines ship alongside the token heuristics
    (a doc that compresses far below ~natural-language entropy is
    boilerplate/repetition; far above is noise/binary junk). Returns
    (doc_id, n_bytes, n_compressed, bits_per_byte) with
    bits_per_byte = 8 * compressed/raw over the UTF-8 bytes, rounded
    6 dp; empty/null docs report (0, 0, 0.0).

    zlib at a FIXED level is deterministic within an environment, so
    the selfcheck range assert recomputes every row exactly
    driver-side (a full oracle, not a SQL one). Map-side Arrow-batched
    Pandas UDF — zero shuffles."""
    import pandas as pd  # noqa: F401 — worker-side

    @F.pandas_udf("struct<n_bytes: long, n_compressed: long, "
                  "bits_per_byte: double>")
    def kernel(texts):
        import zlib

        import pandas as pd2

        rows = []
        for t in texts:
            if t is None or t == "":
                rows.append((0, 0, 0.0))
                continue
            raw = t.encode("utf-8")
            comp = len(zlib.compress(raw, level))
            rows.append((len(raw), comp, round(8.0 * comp / len(raw), 6)))
        return pd2.DataFrame(
            rows, columns=["n_bytes", "n_compressed", "bits_per_byte"]
        )

    return df.select(
        F.col(id_col).alias("doc_id"), kernel(F.col(text_col)).alias("c")
    ).select(
        "doc_id", F.col("c.n_bytes").alias("n_bytes"),
        F.col("c.n_compressed").alias("n_compressed"),
        F.col("c.bits_per_byte").alias("bits_per_byte"),
    )


#: PII patterns chosen to behave identically under Java regex (Spark)
#: and RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mask emails/URLs/phone-like spans with typed placeholders —
    the pre-training privacy scrub pass. Pure column regexps (JVM-side,
    whole-stage codegen); order matters: URLs first so their
    digit-runs are not half-eaten by the phone pattern."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_URL, "<URL>"),
            PII_EMAIL, "<EMAIL>",
        ),
        PII_PHONE, "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("text_scrubbed"),
        (F.length(text_col) - F.length(scrubbed)).alias("n_chars_removed"),
    )


def scrub_pii_expr_sql(text_col: str) -> str:
    """The DuckDB scrub expression alone (for composing into larger
    oracles); RE2 'g' flag = replace-all, matching Spark's default."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({text_col}, "
        f"'{PII_URL}', '<URL>', 'g'), "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g')"
    )


def scrub_pii_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`scrub_pii`."""
    s = scrub_pii_expr_sql(text_col)
    return (
        f"SELECT {id_col} AS doc_id, {s} AS text_scrubbed, "
        f"length({text_col}) - length({s}) AS n_chars_removed FROM {table}"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    preprocessing step for embedding models / context-window loaders.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final partial chunk is kept
    (so every token lands in >= 1 chunk). Pure per-row array exprs
    (sequence -> slice -> join) — map-side only, no shuffle, one output
    row per chunk via posexplode.

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    # materialize the token array before the per-chunk lambda (no CSE
    # inside lambdas: a tokenizer expression referenced there would
    # re-run once per chunk — same trap fixed in duplicate_spans)
    based = df.select(
        F.col(id_col).alias("doc_id"), tp.tokens(text_col).alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride); 0 for empty docs
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    exploded = based.select(
        "doc_id",
        F.posexplode(F.when(n_chunks > 0, chunks)).alias("chunk_id", "ctoks"),
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size("ctoks").alias("n_chunk_tokens"),
        F.array_join("ctoks", " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    stride = chunk_tokens - overlap
    toks = tp.tokens_sql(text_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
        ),
        sized AS (
            SELECT doc_id, t,
                   CASE WHEN len(t) <= 0 THEN 0
                        ELSE 1 + CAST(ceil(greatest(len(t) - {chunk_tokens}, 0)
                                           / {stride}.0) AS INT) END AS n_chunks
            FROM base
        )
        SELECT doc_id,
               CAST(g.i AS INT) AS chunk_id,
               CAST(len(list_slice(t, g.i * {stride} + 1,
                                   g.i * {stride} + {chunk_tokens})) AS INT)
                   AS n_chunk_tokens,
               array_to_string(list_slice(t, g.i * {stride} + 1,
                                          g.i * {stride} + {chunk_tokens}), ' ')
                   AS chunk_text
        FROM sized, LATERAL (
            SELECT unnest(CASE WHEN n_chunks > 0
                               THEN list_transform(generate_series(0, n_chunks - 1), x -> x)
                               ELSE [] END) AS i
        ) g
    """


# ------------------------------------------------------- URL dedup

#: query params that never identify content (tracking/session noise)
_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|sessionid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for web-corpus dedup, as pure column
    expressions (whole-stage codegen; no UDF):

    - scheme and host lowercased; ``www.`` and default ports stripped
    - fragment dropped; trailing-slash path normalized ('' -> '/')
    - tracking params (utm_*, fbclid, gclid, ...) removed; remaining
      query params SORTED so param order never splits a dup group

    Non-URLs (no ``scheme://``) canonicalize to NULL. Patterns stay in
    the Java-regex/RE2 common subset so the DuckDB twin is exact.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(
        F.when(query == "", base).otherwise(F.concat(base, F.lit("?"), query))
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (same regexes, same order)."""
    u = f"trim({url_expr})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host0 = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    host = f"regexp_replace(regexp_replace({host0}, '^www\\.', ''), ':(80|443)$', '')"
    path0 = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path = f"CASE WHEN regexp_replace({path0}, '/+$', '') = '' THEN '/' ELSE regexp_replace({path0}, '/+$', '') END"
    rawq = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({rawq}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}')))"
    )
    query = f"array_to_string({params}, '&')"
    base = f"concat({scheme}, '://', {host}, {path})"
    return (
        f"CASE WHEN {scheme} = '' THEN NULL "
        f"WHEN {query} = '' THEN {base} "
        f"ELSE concat({base}, '?', {query}) END"
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Keep one document per canonical URL (min id wins — skew-safe
    min(struct) aggregate, no per-URL window): returns
    (canonical_url, n_dups, keep_id). One shuffle on the canonical
    key; hot URLs partially aggregate map-side."""
    canon = df.select(
        F.col(id_col).alias("kid"), canonical_url(F.col(url_col)).alias("canonical_url")
    ).where(F.col("canonical_url").isNotNull())
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_dups"),
        F.min("kid").alias("keep_id"),
    )


def url_dedup_sql(inner_sql: str, id_col: str, url_expr: str) -> str:
    """DuckDB twin of :func:`url_dedup` over ``inner_sql``."""
    canon = canonical_url_sql(url_expr)
    return f"""
        SELECT canonical_url, count(*) AS n_dups, min({id_col}) AS keep_id
        FROM (SELECT {id_col}, {canon} AS canonical_url FROM ({inner_sql}))
        WHERE canonical_url IS NOT NULL
        GROUP BY canonical_url
    """


# ------------------------------------------- exact substring duplication

def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 20,
) -> DataFrame:
    """Exact substring-duplication detection — the distributed stand-in
    for suffix-array dedup: every ``window_tokens``-token sliding
    window is hashed; windows whose hash occurs more than once ANYWHERE
    in the corpus (other docs or elsewhere in the same doc) are
    flagged, and flagged positions merge into maximal spans
    (gaps-and-islands per doc). Returns
    (doc_id, span_start, span_end, n_windows): token positions over
    the canonical tokenization, end exclusive.

    Scale shape: window hashing is per-row array work (map-side,
    O(n·w) per doc like the chunker); the only shuffles are the
    window-hash count (map-side partials, keys are content hashes — no
    hot key unless the corpus repeats one string massively) and the
    per-doc islands window. Downstream removal is a span-slice per doc
    — no second corpus-wide pass.
    """
    w = window_tokens
    # materialize the token array BEFORE the per-window lambda: Catalyst
    # has no CSE inside lambdas, so referencing tp.tokens(text) there
    # would re-run the regex tokenizer once PER WINDOW (measured ~10x
    # on this operator; same trap documented for the shingle builders)
    based = df.select(
        F.col(id_col).alias("doc_id"), tp.tokens(text_col).alias("toks")
    )
    n = F.size(F.col("toks"))
    hashes = F.transform(
        F.sequence(F.lit(0), n - w),
        lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i + 1, w), " ")),
    )
    wins = based.select(
        "doc_id",
        F.posexplode(F.when(n >= w, hashes)).alias("pos", "whash"),
    )
    # r12 (guide §2.4): the dup-hash aggregate and the semi join both
    # consume `wins`, and the semi's probe side gets no exchange (the
    # dup set broadcasts), so nothing forces plan reuse — the corpus
    # was re-tokenized and re-hashed once per branch (two scans in the
    # before-plan). Materialize the window relation once; the
    # skew-safe shape (map-side partial count, dup-bounded broadcast)
    # is unchanged.
    wins = wins.localCheckpoint(eager=True)
    dup_hashes = (
        wins.groupBy("whash").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("whash")
    )
    flagged = wins.join(dup_hashes, "whash", "semi").select("doc_id", "pos")
    from pyspark.sql import Window as W

    lag = F.lag("pos").over(W.partitionBy("doc_id").orderBy("pos"))
    islands = flagged.withColumn(
        "new_island", F.when(lag.isNull() | (F.col("pos") > lag + 1), 1).otherwise(0)
    ).withColumn(
        "island",
        F.sum("new_island").over(
            W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + w).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_windows")


def duplicate_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 20,
) -> str:
    """DuckDB twin of :func:`duplicate_spans`."""
    toks = tp.tokens_sql(text_col)
    w = window_tokens
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
        ),
        wins AS (
            SELECT doc_id, g.i AS pos,
                   md5(array_to_string(list_slice(t, g.i + 1, g.i + {w}), ' ')) AS whash
            FROM base, LATERAL (
                SELECT unnest(CASE WHEN len(t) >= {w}
                                   THEN list_transform(generate_series(0, len(t) - {w}), x -> x)
                                   ELSE [] END) AS i
            ) g
        ),
        dup AS (SELECT whash FROM wins GROUP BY whash HAVING count(*) > 1),
        flagged AS (
            SELECT doc_id, pos FROM wins WHERE whash IN (SELECT whash FROM dup)
        ),
        islands AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NULL OR pos > prev + 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM (
                SELECT doc_id, pos,
                       lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM flagged
            )
        )
        SELECT doc_id, min(pos) AS span_start, max(pos) + {w} AS span_end,
               count(*) AS n_windows
        FROM islands GROUP BY doc_id, island
    """


_POS_ENC = 1 << 20  # token positions per doc bounded by 2^20 for owner encoding


def remove_duplicate_runs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 20,
    policy: str = "window",
) -> DataFrame:
    """Corpus-wide exact-substring dedup with keep-first-occurrence:
    tokens inside a duplicated >=w-token run are REMOVED everywhere
    except the run's first occurrence (min (doc_id, pos) over the
    occurrences of its first duplicated window — encoded as
    doc_id*2^20+pos, so token positions are bounded at ~1M per doc).

    ``policy="window"`` (default): ownership is decided per WINDOW, so
    an occurrence that owns one duplicated window but sits inside
    another duplicated run can still lose tokens to that run's owner
    (divergence quantified at ~6% of removed tokens on adversarial
    dup-heavy corpora, 0 when runs don't overlap —
    tests/test_remove_runs_property.py).

    ``policy="exact"``: owner-protected keep-first — a token is removed
    iff covered by at least one non-owner (flagged) window AND by no
    first-occurrence (owner) window, so first occurrences keep ALL
    their tokens. Costs one extra explode of the owner windows (the
    coverage volume roughly doubles, still O(duplicated volume * w));
    both policies share a single coverage aggregation, so the plan
    shape is identical.

    Granularity note (r5): at TOKEN granularity, window-coverage
    removal is PROVABLY IDENTICAL to true substring-granularity
    keep-first (the suffix-automaton / deduplicate-text-datasets
    semantics) — every duplicated substring of length >= w covers its
    tokens with duplicated w-windows at matching offsets, and every
    duplicated w-window is itself such a substring
    (tests/test_remove_runs_property.py::
    test_window_policy_equals_suffix_granularity, brute-force suffix
    oracle). Mid-window match boundaries only exist below token
    granularity; the engine tokenizes first. The sole divergence axis
    between the two policies is ownership protection, pinned at ~6%
    of removed tokens on adversarial corpora by the same suite.

    Returns (doc_id, text_clean, n_tokens_kept, n_tokens_removed) for
    EVERY input doc. Shuffle volume: window hashes (map-side partials),
    the flagged-window explode (O(duplicated volume * w)), and one
    per-doc reassembly — the clean-corpus rewrite never goes through
    the driver.

    The owner encoding requires an INTEGRAL ``id_col`` and token
    positions < 2^20 (~1M tokens/doc); both are enforced — a string id
    raises up front with a clear message instead of an ANSI cast error,
    and an over-long document fails the job loudly rather than silently
    mis-ordering ownership (positions bleeding into the doc-id field).
    """
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise ValueError(
            f"remove_duplicate_runs requires an integral {id_col!r} column for "
            f"owner encoding (doc_id*2^20+pos); got {id_type.simpleString()}. "
            "Map string ids to a surrogate BIGINT first."
        )
    w = window_tokens
    # `based` (the tokenize) is recomputed by three branches (the wins
    # checkpoint, all_toks, totals). A LAZY localCheckpoint of it was
    # tried in r13 and REVERTED on measurement (guide §1 re-measure):
    # bench median 1.88 -> 2.39 s — writing + re-reading the token
    # array blocks costs more than re-running the map-side regex
    # tokenize (CPU fell ~25% but wall rose; contrast ngram_jaccard,
    # where the same trick wins because it dedups a sort+window pass,
    # not a cheap map-side one).
    based = df.select(
        F.col(id_col).alias("doc_id"), tp.tokens(text_col).alias("toks")
    )
    n = F.size(F.col("toks"))
    hashes = F.transform(
        F.sequence(F.lit(0), n - w),
        lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i + 1, w), " ")),
    )
    wins = based.select(
        "doc_id", F.posexplode(F.when(n >= w, hashes)).alias("pos", "whash")
    ).withColumn(
        "pos",
        F.when(F.col("pos") < F.lit(_POS_ENC), F.col("pos")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("remove_duplicate_runs: document "),
                    F.col("doc_id").cast("string"),
                    F.lit(f" exceeds {_POS_ENC} tokens; owner encoding would overflow"),
                )
            )
        ),
    )
    # r12 (guide §2.4): same double-scan fix as duplicate_spans — the
    # owner aggregate and the matched join both read `wins`, and the
    # broadcast join gives the probe side no exchange to reuse, so the
    # corpus tokenize+hash ran once per branch. One materialization.
    wins = wins.localCheckpoint(eager=True)
    owners = (
        wins.groupBy("whash")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.col("doc_id") * _POS_ENC + F.col("pos")).alias("owner_enc"),
        )
        .where(F.col("c") > 1)
        .select("whash", "owner_enc")
    )
    if policy not in ("window", "exact"):
        raise ValueError(f"policy must be 'window' or 'exact', got {policy!r}")
    matched = wins.join(owners, "whash")
    own = (
        F.col("doc_id") * _POS_ENC + F.col("pos") == F.col("owner_enc")
    ).alias("own")
    if policy == "window":
        # flagged coverage only; distinct-by-groupBy keeps one shuffle
        cov = matched.where(~own).select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + w - 1)).alias("tpos"),
        )
        removable = cov.groupBy("doc_id", "tpos").agg(F.lit(1)).select(
            "doc_id", "tpos"
        )
    else:
        # exact: positions covered by some flagged window and NO owner
        # window — same single aggregation, owner coverage folded in as
        # a max(own) flag instead of a second join
        cov = matched.select(
            "doc_id",
            own,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + w - 1)).alias("tpos"),
        )
        removable = (
            cov.groupBy("doc_id", "tpos")
            .agg(F.max("own").alias("owned"))
            .where(~F.col("owned"))
            .select("doc_id", "tpos")
        )
    all_toks = based.select(
        "doc_id", F.posexplode_outer("toks").alias("tpos", "tok")
    )
    kept = all_toks.where(F.col("tok").isNotNull()).join(
        removable, ["doc_id", "tpos"], "anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    totals = based.select("doc_id", n.alias("n_toks"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
            (F.col("n_toks") - F.coalesce("n_tokens_kept", F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def remove_duplicate_runs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 20,
    policy: str = "window",
) -> str:
    """DuckDB twin of :func:`remove_duplicate_runs` (both policies)."""
    toks = tp.tokens_sql(text_col)
    w = window_tokens
    if policy == "exact":
        removable = f"""
            SELECT doc_id, tpos FROM (
                SELECT m.doc_id, g.tpos,
                       max(CASE WHEN m.doc_id * {_POS_ENC} + m.pos = m.owner_enc
                                THEN 1 ELSE 0 END) AS owned
                FROM (
                    SELECT w.doc_id, w.pos, o.owner_enc
                    FROM wins w JOIN owners o ON w.whash = o.whash
                ) m, LATERAL (
                    SELECT unnest(list_transform(
                        generate_series(m.pos, m.pos + {w} - 1), x -> x)) AS tpos
                ) g
                GROUP BY m.doc_id, g.tpos
            ) WHERE owned = 0"""
    else:
        removable = f"""
            SELECT DISTINCT doc_id, g.tpos FROM flagged, LATERAL (
                SELECT unnest(list_transform(generate_series(pos, pos + {w} - 1), x -> x)) AS tpos
            ) g"""
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
        ),
        wins AS (
            SELECT doc_id, g.i AS pos,
                   md5(array_to_string(list_slice(t, g.i + 1, g.i + {w}), ' ')) AS whash
            FROM base, LATERAL (
                SELECT unnest(CASE WHEN len(t) >= {w}
                                   THEN list_transform(generate_series(0, len(t) - {w}), x -> x)
                                   ELSE [] END) AS i
            ) g
        ),
        owners AS (
            SELECT whash, min(doc_id * {_POS_ENC} + pos) AS owner_enc
            FROM wins GROUP BY whash HAVING count(*) > 1
        ),
        flagged AS (
            SELECT w.doc_id, w.pos FROM wins w JOIN owners o ON w.whash = o.whash
            WHERE w.doc_id * {_POS_ENC} + w.pos <> o.owner_enc
        ),
        removable AS ({removable}
        ),
        all_toks AS (
            SELECT doc_id, g.i - 1 AS tpos, t[g.i] AS tok
            FROM base, LATERAL (
                SELECT unnest(CASE WHEN len(t) > 0
                                   THEN list_transform(generate_series(1, len(t)), x -> x)
                                   ELSE [] END) AS i
            ) g
        ),
        kept AS (
            SELECT a.doc_id, a.tpos, a.tok FROM all_toks a
            WHERE NOT EXISTS (
                SELECT 1 FROM removable r
                WHERE r.doc_id = a.doc_id AND r.tpos = a.tpos
            )
        ),
        rebuilt AS (
            SELECT doc_id,
                   array_to_string(list_transform(
                       list_sort(list(struct_pack(tpos := tpos, tok := tok))),
                       s -> s.tok), ' ') AS text_clean,
                   count(*) AS n_tokens_kept
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id,
               coalesce(r.text_clean, '') AS text_clean,
               CAST(coalesce(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
               CAST(len(b.t) - coalesce(r.n_tokens_kept, 0) AS BIGINT)
                   AS n_tokens_removed
        FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
    """


def quality_zscore_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-SOURCE quality calibration: the raw quality score z-scored
    within its source domain — a fixed global threshold over-prunes
    whole domains whose style scores low (code, forums) and
    under-prunes high-scoring boilerplate farms; normalizing per
    source makes one keep-threshold mean the same thing everywhere.

    Plan: one map-side scoring pass, one stratum-cardinality aggregate
    (avg + stddev_samp per source, broadcast back), z computed
    map-side. Degenerate strata (single doc / zero variance) get
    z = 0. Rounded to 6 dp for cross-engine parity.
    """
    scored = quality_score(df, id_col, text_col).join(
        df.select(
            F.col(id_col).alias("doc_id"), F.col(source_col).alias("__src")
        ),
        "doc_id",
    )
    # DECIMAL partials for the stratum moments: double avg/stddev merge
    # partials in partition order, so a z within an ulp of its rounding
    # boundary could flip between runs/engines. Sum round(q,9) and its
    # square as decimals (exact, order-independent), derive mu/sd in
    # fixed-order double math.
    qd = F.round(F.col("quality"), 9).cast("decimal(20,10)")
    stats = scored.groupBy("__src").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(qd).alias("__s"),
        F.sum(qd * qd).alias("__ss"),
    ).select(
        "__src",
        "__n",
        (F.col("__s").cast("double") / F.col("__n")).alias("__mu"),
        F.when(
            F.col("__n") > 1,
            (
                F.col("__ss").cast("double")
                - F.col("__s").cast("double") * F.col("__s").cast("double")
                / F.col("__n")
            )
            / (F.col("__n") - 1),
        ).alias("__var"),
    )
    return (
        scored.join(F.broadcast(stats), "__src")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("__src").alias(source_col),
            "quality",
            F.when(
                F.col("__var").isNull() | (F.col("__var") <= 0), F.lit(0.0)
            )
            .otherwise(
                F.round(
                    (F.col("quality") - F.col("__mu")) / F.sqrt(F.col("__var")), 6
                )
            )
            .alias("quality_z"),
        )
    )


def quality_zscore_by_source_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`quality_zscore_by_source`."""
    inner = quality_score_sql(table, id_col, text_col)
    return f"""
        WITH scored AS (
            SELECT q.doc_id, d.{source_col} AS src, q.quality
            FROM ({inner}) q JOIN {table} d ON q.doc_id = d.{id_col}
        ),
        stats AS (
            SELECT src, count(*) AS n,
                   sum(CAST(round(quality, 9) AS DECIMAL(20,10))) AS s,
                   sum(CAST(round(quality, 9) AS DECIMAL(20,10))
                       * CAST(round(quality, 9) AS DECIMAL(20,10))) AS ss
            FROM scored GROUP BY src
        ),
        moments AS (
            SELECT src, n,
                   CAST(s AS DOUBLE) / n AS mu,
                   CASE WHEN n > 1 THEN
                       (CAST(ss AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)
                   END AS var
            FROM stats
        )
        SELECT s.doc_id AS {id_col}, s.src AS {source_col}, s.quality,
               CASE WHEN t.var IS NULL OR t.var <= 0 THEN 0.0
                    ELSE round((s.quality - t.mu) / sqrt(t.var), 6)
               END AS quality_z
        FROM scored s JOIN moments t USING (src)
    """


# ------------------------------------------- consistent pseudonyms (r6)

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _pseudo_tag(m: Column) -> Column:
    """Deterministic per-VALUE placeholder: <EMAIL_nnn> keyed by an
    md5-derived bucket of the matched string, so the same address maps
    to the same tag in every document — linkage survives scrubbing."""
    bucket = (
        F.conv(F.substring(F.md5(m), 1, 4), 16, 10).cast("long") % 1000
    ).cast("string")
    return F.concat(F.lit("<EMAIL_"), bucket, F.lit(">"))


def pseudonymize_emails(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text, n_matches): every email replaced by a CONSISTENT
    hashed placeholder (same value -> same tag across the corpus),
    unlike scrub_pii's uniform mask. Split the text on the pattern,
    tag each extracted match, and re-interleave — all higher-order
    column expressions, zero UDFs, zero shuffles; the cross-document
    consistency needs no state because the tag is a pure function of
    the matched value."""
    parts = F.split(F.col(text_col), _EMAIL_RE, -1)
    matches = F.regexp_extract_all(F.col(text_col), F.lit(_EMAIL_RE), 0)
    tags_padded = F.concat(
        F.transform(matches, _pseudo_tag), F.array(F.lit(""))
    )
    rebuilt = F.array_join(
        F.zip_with(parts, tags_padded,
                   lambda p, t: F.concat(p, F.coalesce(t, F.lit("")))),
        "",
    )
    return df.select(
        F.col(id_col),
        rebuilt.alias("text"),
        F.size(matches).alias("n_matches"),
    )


def pseudonymize_emails_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`pseudonymize_emails` (same pattern, same
    md5-bucket tag formula)."""
    tag = (
        "'<EMAIL_' || CAST(CAST(('0x' || substr(md5(m), 1, 4)) AS BIGINT) "
        "% 1000 AS VARCHAR) || '>'"
    )
    return f"""
    SELECT {id_col},
           array_to_string(
               list_transform(
                   list_zip(
                       string_split_regex({text_col}, '{_EMAIL_RE}'),
                       list_concat(
                           list_transform(
                               regexp_extract_all({text_col}, '{_EMAIL_RE}'),
                               m -> {tag}),
                           [''])),
                   z -> z[1] || coalesce(z[2], '')),
               '') AS text,
           length(regexp_extract_all({text_col}, '{_EMAIL_RE}')) AS n_matches
    FROM {table}
    """
