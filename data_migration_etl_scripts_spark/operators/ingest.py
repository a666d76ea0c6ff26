"""Incremental corpus ingest: dedup an incoming batch AGAINST HISTORY
without ever re-scanning the historical corpus text.

The batch-vs-history shape is what a continuously-fed training-data
pipeline actually runs (the all-pairs operators in ``dedup.py`` are the
backfill/bootstrap path). History is represented by two slim persisted
index tables, both tiny relative to the corpus text:

- content-hash table  (doc_id, content_hash)        — 16 B/doc
- minhash band table  (doc_id, band_id, band_key)   — bands rows/doc

Ingest then is: hash the new batch, band the new batch, two equi-joins
against the index tables, verdict per new doc. At 100 TB of history
the joins shuffle only (hash | band_key) keys — the new batch side is
typically broadcast by AQE since a batch is small; the history text is
never touched. After accepting a batch, append its rows to both index
tables (the same operators build them) — state grows with docs, not
with bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import textprep as tp
from data_migration_etl_scripts_spark.operators.dedup import (
    MINHASH_BASE_DIGITS,
    MINHASH_P,
    _perm_coeffs,
)


def content_hash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, content_hash) over canonicalized text — the exact-dup
    index artifact (same canonicalization as ``exact_dup_groups``)."""
    canon = F.concat_ws(" ", tp.tokens(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"), F.md5(canon).alias("content_hash")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band_id, band_key) — the LSH index artifact.

    Same signature construction as ``minhash_lsh_pairs`` (explode +
    codegen'd min aggregates, one row per doc into the shuffle); docs
    with no shingles produce no rows, so they can never band-collide.
    """
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tp.word_shingles(tp.tokens(text_col), n=shingle_n)).alias("s"),
    )
    h = tp.md5_long(F.col("s"), digits=MINHASH_BASE_DIGITS)
    mins = []
    for j in range(k):
        a, b = _perm_coeffs(j)
        mins.append(F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{j}"))
    sigs = exploded.groupBy("doc_id").agg(*mins)
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"m{b * r + j}").cast("string") for j in range(r)]
                )
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band_id", "band_key")
    )


def dedup_incoming(
    new_docs: DataFrame,
    history_hashes: DataFrame,
    history_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Classify each incoming doc against the history indexes.

    Returns (doc_id, is_exact_dup, n_near_hist, verdict) where verdict
    is 'exact_dup' (content hash already in history), else 'near_dup'
    (shares an LSH band with >=1 history doc), else 'new'. ``n_near_hist``
    counts DISTINCT history docs sharing any band.

    Join shapes: equi-joins on content_hash and (band_id, band_key);
    the history side never re-derives anything, and the incoming batch
    (small) is the natural broadcast side under AQE.
    """
    new_hashes = content_hash_table(new_docs, id_col, text_col)
    exact = (
        new_hashes.join(
            history_hashes.select("content_hash").distinct().withColumn(
                "h_exact", F.lit(1)
            ),
            "content_hash",
            "left",
        )
        .select("doc_id", (F.col("h_exact") == 1).alias("is_exact_dup"))
        .na.fill({"is_exact_dup": False})
    )
    new_bands = minhash_band_table(
        new_docs, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n
    )
    near = (
        new_bands.join(
            history_bands.select(
                F.col("doc_id").alias("hist_id"), "band_id", "band_key"
            ),
            ["band_id", "band_key"],
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("hist_id").alias("n_near_hist"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .na.fill({"n_near_hist": 0})
        .select(
            "doc_id",
            "is_exact_dup",
            F.col("n_near_hist").cast("long").alias("n_near_hist"),
            F.when(F.col("is_exact_dup"), F.lit("exact_dup"))
            .when(F.col("n_near_hist") > 0, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


# ------------------------------------------------------------- oracles


def _sigs_cte(src_sql: str, id_col: str, text_col: str, k: int, shingle_n: int) -> str:
    shingles = tp.word_shingles_sql(tp.tokens_sql(text_col), n=shingle_n)
    base_hash = tp.md5_long_sql("s", digits=MINHASH_BASE_DIGITS)
    sig_elems = ", ".join(
        "list_min(list_transform(hs, h -> ({a} * h + {b}) % {p}))".format(
            a=_perm_coeffs(j)[0], b=_perm_coeffs(j)[1], p=MINHASH_P
        )
        for j in range(k)
    )
    return f"""
        SELECT doc_id, [{sig_elems}] AS sig
        FROM (SELECT {id_col} AS doc_id, list_transform(sh, s -> {base_hash}) AS hs
              FROM (SELECT {id_col}, {shingles} AS sh FROM ({src_sql}) src) sh_t
              WHERE len(sh) > 0)
    """


def _bands_from_sigs(sigs_cte_name: str, k: int, bands: int) -> str:
    r = k // bands
    return " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, md5({key}) AS band_key FROM {t}".format(
            b=b,
            t=sigs_cte_name,
            key=" || '|' || ".join(
                f"CAST(sig[{b * r + j + 1}] AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )


def dedup_incoming_sql(
    new_sql: str,
    hist_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> str:
    """DuckDB twin of :func:`dedup_incoming` with the history indexes
    derived inline from ``hist_sql`` (the engine reads them
    precomputed; deriving them inline is equivalent by construction of
    :func:`content_hash_table` / :func:`minhash_band_table`)."""
    canon = f"array_to_string({tp.tokens_sql(text_col)}, ' ')"
    return f"""
        WITH new_hashes AS (
            SELECT {id_col} AS doc_id, md5({canon}) AS content_hash
            FROM ({new_sql}) n
        ),
        hist_hashes AS (
            SELECT DISTINCT md5({canon}) AS content_hash FROM ({hist_sql}) h
        ),
        new_sigs AS ({_sigs_cte(new_sql, id_col, text_col, k, shingle_n)}),
        hist_sigs AS ({_sigs_cte(hist_sql, id_col, text_col, k, shingle_n)}),
        new_bands AS ({_bands_from_sigs('new_sigs', k, bands)}),
        hist_bands AS ({_bands_from_sigs('hist_sigs', k, bands)}),
        near AS (
            SELECT nb.doc_id, count(DISTINCT hb.doc_id) AS n_near_hist
            FROM new_bands nb
            JOIN hist_bands hb
              ON nb.band_id = hb.band_id AND nb.band_key = hb.band_key
            GROUP BY nb.doc_id
        ),
        exact AS (
            SELECT nh.doc_id,
                   hh.content_hash IS NOT NULL AS is_exact_dup
            FROM new_hashes nh LEFT JOIN hist_hashes hh USING (content_hash)
        )
        SELECT e.doc_id,
               e.is_exact_dup,
               CAST(COALESCE(n.n_near_hist, 0) AS BIGINT) AS n_near_hist,
               CASE WHEN e.is_exact_dup THEN 'exact_dup'
                    WHEN COALESCE(n.n_near_hist, 0) > 0 THEN 'near_dup'
                    ELSE 'new' END AS verdict
        FROM exact e LEFT JOIN near n USING (doc_id)
    """
