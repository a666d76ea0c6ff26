"""Corpus-curation operator semantics: connected-components dup
clustering, deterministic sampling, sequence packing, PII scrub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import curation as cu
from data_migration_etl_scripts_spark.operators import text as tx


def test_dup_clusters_components(spark):
    # chain 1-2-3, pair 10-11, isolated-by-absence 99 (no edges -> no row)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in cu.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter 11)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in cu.dup_clusters(pairs).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 12


def test_deterministic_sample_is_stable_and_sized(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in cu.deterministic_sample(df, "k", 0.25).collect())
    b = sorted(
        r.k for r in cu.deterministic_sample(df.repartition(13), "k", 0.25).collect()
    )
    assert a == b  # partitioning-independent
    assert 0.20 < len(a) / 5000 < 0.30  # ~fraction
    # monotone: a smaller fraction selects a subset
    c = {r.k for r in cu.deterministic_sample(df, "k", 0.10).collect()}
    assert c <= set(a)


def test_pack_sequences_bins_and_offsets(spark):
    # one shard (n_shards=1): docs of 600 tokens into capacity 1000
    df = spark.createDataFrame(
        [(i, 600) for i in range(4)], "doc_id long, n long"
    )
    rows = {r.doc_id: r for r in
            cu.pack_sequences(df, "doc_id", "n", capacity=1000, n_shards=1).collect()}
    # starts at 0, 600, 1200, 1800 -> bins 0, 0, 1, 1
    assert [rows[i].pack_bin for i in range(4)] == [0, 0, 1, 1]
    assert [rows[i].bin_offset for i in range(4)] == [0, 600, 200, 800]


def test_scrub_pii_masks_typed_spans(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or visit https://x.io/p?q=1 now"),
            (2, "call +966 50 123 4567 today"),
            (3, "clean text stays clean"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tx.scrub_pii(df, "doc_id", "text").collect()}
    assert "<EMAIL>" in got[1].text_scrubbed and "<URL>" in got[1].text_scrubbed
    assert "@" not in got[1].text_scrubbed
    assert got[2].text_scrubbed == "call <PHONE> today"
    assert got[3].text_scrubbed == "clean text stays clean"
    assert got[3].n_chars_removed == 0


def test_semantic_dedup_labels_every_doc_and_keeps_one_per_cluster(spark):
    # two near-identical vectors (same cluster), one opposite-signed
    # (different LSH bucket), one zero vector (no pair; still labeled)
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [1.0, 2.0, 3.001]),  # cosine ~1 with vec 1
        (3, [-1.0, -2.0, -3.0]),  # different sign bucket
        (4, [0.0, 0.0, 0.0]),  # zero norm: never in a pair
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in cu.semantic_dedup(
            df, "vec_id", "embedding", threshold=0.95, bucket_bits=3
        ).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)  # deduped into cluster 1
    assert got[3] == (3, True)  # own cluster
    assert got[4] == (4, True)  # zero vector survives, labeled singleton
    assert len(got) == 4  # every input doc labeled


def test_mix_by_temperature_flattens_distribution_and_is_stable(spark):
    # 4000 'en' vs 250 'fr': alpha=0.5 should keep fr at a higher
    # fraction than en (sqrt weighting flattens the mixture)
    df = spark.range(0, 4250).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 4000, F.lit("en")).otherwise(F.lit("fr")).alias("lang"),
    )
    out = cu.mix_by_temperature(df, "k", "lang", target_rows=1000)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    f_en = counts["en"] / 4000
    f_fr = counts["fr"] / 250
    assert f_fr > 2 * f_en  # tail domain upweighted
    assert 700 < counts["en"] + counts["fr"] < 1300  # ~target overall
    # partitioning-independent row selection
    again = cu.mix_by_temperature(df.repartition(17), "k", "lang", target_rows=1000)
    assert sorted(r.k for r in out.collect()) == sorted(r.k for r in again.collect())


def test_mix_by_temperature_small_stratum_keeps_all(spark):
    # a stratum whose fair share exceeds its size is kept wholesale
    df = spark.range(0, 1010).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, F.lit("big")).otherwise(F.lit("tiny")).alias("lang"),
    )
    out = cu.mix_by_temperature(df, "k", "lang", target_rows=900)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["tiny"] == 10  # frac >= 1 -> 'G' cutoff keeps every row


def test_duplicate_spans_flags_shared_run_and_merges_islands(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight {shared} nine ten"),
        (3, "completely unrelated text with no duplicate content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in tx.duplicate_spans(df, window_tokens=4).collect()
    }
    # doc 1: shared tokens at positions 3..10 -> windows 3..7 (5 windows),
    # span [3, 11); doc 2: positions 2..9 -> windows 2..6, span [2, 10)
    assert spans[1] == (3, 11, 5)
    assert spans[2] == (2, 10, 5)
    assert 3 not in spans  # clean doc emits nothing


def test_duplicate_spans_catches_within_doc_repetition(spark):
    run = "red orange yellow green blue"
    df = spark.createDataFrame(
        [(1, f"{run} filler words here {run}")], "doc_id long, text string"
    )
    got = tx.duplicate_spans(df, window_tokens=5).collect()
    # both occurrences of the 5-token run are windows with the same hash
    assert {(r.span_start, r.span_end) for r in got} == {(0, 5), (8, 13)}


def test_mix_by_temperature_null_stratum_is_sampled_not_dropped(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 200, F.lit("en")).otherwise(F.lit(None)).alias("lang"),
    )
    out = cu.mix_by_temperature(df, "k", "lang", target_rows=400)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # target >= population: every row kept, including the NULL stratum
    assert counts.get("en") == 200
    assert counts.get(None) == 200


def test_remove_duplicate_runs_keeps_first_occurrence(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two {shared} three"),
        (2, f"four five {shared} six seven"),
        (3, "totally different words without any repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.remove_duplicate_runs(df, window_tokens=4).collect()}
    # doc 1 owns every duplicated window (min doc_id): untouched
    assert got[1].text_clean == f"one two {shared} three"
    assert got[1].n_tokens_removed == 0
    # doc 2 loses exactly the shared run
    assert got[2].text_clean == "four five six seven"
    assert got[2].n_tokens_removed == 8
    # clean doc untouched, short-docs-safe
    assert got[3].n_tokens_removed == 0
    assert len(got) == 3


def test_remove_duplicate_runs_within_doc(spark):
    run = "red orange yellow green blue"
    df = spark.createDataFrame(
        [(7, f"{run} some filler words {run}")], "doc_id long, text string"
    )
    r = tx.remove_duplicate_runs(df, window_tokens=5).collect()[0]
    assert r.text_clean == f"{run} some filler words"
    assert r.n_tokens_removed == 5


def test_keep_best_per_cluster_picks_quality_then_min_id(spark):
    labeled = spark.createDataFrame(
        [
            (1, 1, 0.5), (2, 1, 0.9), (3, 1, 0.9),   # cluster 1: tie at 0.9
            (4, 4, 0.1),                             # singleton keeps itself
        ],
        "doc_id long, cluster_id long, quality double",
    )
    got = {r.doc_id: r.keep for r in cu.keep_best_per_cluster(labeled).collect()}
    assert got == {1: False, 2: True, 3: False, 4: True}


def test_remove_duplicate_runs_rejects_string_ids(spark):
    import pytest

    df = spark.createDataFrame([("a", "some text here")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral"):
        tx.remove_duplicate_runs(df)


def test_cutoff_hex_overflow_keeps_all(spark):
    # frac within 2^-25 of 1.0 rounds the 6-hex-digit cutoff up to 16^6
    # (7 hex chars); the guard must emit the keep-all 'G' cutoff instead
    # of lpad-truncating it to '100000' (~1/16 keep rate)
    fracs = [1.0 - 2.0**-26, 1.0 - 2.0**-30, 1.0, 0.5, 0.0]
    df = spark.createDataFrame([(f,) for f in fracs], "frac double")
    got = {
        r.frac: r.cut
        for r in df.select("frac", cu._cutoff_hex(F.col("frac")).alias("cut")).collect()
    }
    assert got[1.0 - 2.0**-26] == "G"
    assert got[1.0 - 2.0**-30] == "G"
    assert got[1.0] == "G"
    assert got[0.5] == "800000"
    assert got[0.0] == "000000"


def test_mix_by_temperature_sql_twin_keeps_null_strata(spark, tmp_path):
    # oracle-parity pin for the NULL-stratum sentinel: the DuckDB twin
    # must keep NULL-strata rows (IS NOT DISTINCT FROM join), matching
    # the Spark operator — a plain equi-join would silently drop them
    import duckdb

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 200, F.lit("en")).otherwise(F.lit(None)).alias("lang"),
    )
    pq = str(tmp_path / "mix_null.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    spark_keys = sorted(
        r.k for r in cu.mix_by_temperature(df, "k", "lang", target_rows=300).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW corpus AS SELECT * FROM '{pq}/*.parquet'")
    sql = cu.mix_by_temperature_sql("corpus", "k", "lang", target_rows=300)
    oracle_keys = sorted(r[0] for r in con.sql(sql).fetchall())
    assert spark_keys == oracle_keys
    # and NULL-strata rows actually survive in both
    null_kept = con.sql(
        f"SELECT count(*) FROM ({sql}) WHERE lang IS NULL"
    ).fetchone()[0]
    assert null_kept > 0


def test_filter_by_quantile_above_and_below_partition_the_corpus(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") / 100.0).alias("score")
    )
    above = cu.filter_by_quantile(df, "score", q=0.75, keep="above")
    below = cu.filter_by_quantile(df, "score", q=0.75, keep="below")
    a = sorted(r.doc_id for r in above.collect())
    b = sorted(r.doc_id for r in below.collect())
    # exact percentile of 0..99/100 at q=0.75 interpolates to 0.7425;
    # >= keeps 75..99 plus nothing below, < keeps the complement
    assert a == list(range(75, 100))
    assert b == list(range(0, 75))
    assert set(a) | set(b) == set(range(100)) and not set(a) & set(b)
    # threshold helper column must not leak into the output
    assert above.columns == ["doc_id", "score"]
    with pytest.raises(ValueError, match="keep"):
        cu.filter_by_quantile(df, "score", keep="sideways")


def test_chunk_token_stream_invariants(spark):
    # docs with varying sizes; capacity 10 forces straddling boundaries
    rows = [(i, [f"t{i}_{j}" for j in range(3 + (i * 7) % 12)]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    out = cu.chunk_token_stream(df, "doc_id", "toks", capacity=10, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    stream_total = sum(len(t) for _, t in rows)
    assert sum(r.n_tokens for r in out) == stream_total  # no token lost or duped
    for shard, seqs in by_shard.items():
        seqs.sort(key=lambda r: r.seq)
        assert [r.seq for r in seqs] == list(range(len(seqs)))  # dense seq ids
        assert all(r.n_tokens == 10 for r in seqs[:-1])  # full except the tail
        assert 0 < seqs[-1].n_tokens <= 10
        # reassembled stream == docs of this shard concatenated in id order
        rebuilt = [t for r in seqs for t in r.seq_tokens]
        expected = [t for i, toks in sorted(rows) if i % 4 == shard for t in toks]
        assert rebuilt == expected


def test_chunk_token_stream_skips_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b"]), (4, []), (8, ["c"])], "doc_id long, toks array<string>"
    )
    out = cu.chunk_token_stream(df, "doc_id", "toks", capacity=2, n_shards=4).collect()
    assert sum(r.n_tokens for r in out) == 3


def test_cluster_balanced_sampling_caps_every_cluster(spark):
    """Every cluster's kept count respects the budget, the md5 rule is
    deterministic across repartitionings, and a full-budget cluster
    keeps everything."""
    from data_migration_etl_scripts_spark.operators import curation as cu

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = cu.sample_cluster_balanced(emb, n_clusters=8, budget_per_cluster=20)
    counts = {r.cluster_id: r.n for r in
              out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # md5 thresholding is statistical: fraction*size in EXPECTATION;
    # bound by a generous margin above the budget
    assert counts and all(n <= 40 for n in counts.values()), counts
    # deterministic under a different partitioning
    again = cu.sample_cluster_balanced(
        emb.repartition(7), n_clusters=8, budget_per_cluster=20
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # a budget >= corpus keeps every vector
    total = emb.count()
    full = cu.sample_cluster_balanced(emb, n_clusters=8, budget_per_cluster=10**6)
    assert full.count() == total


def test_bm25_ranking_properties(spark):
    """BM25 (operators/text.py): more matching terms rank higher;
    with equal tf, shorter docs rank higher (length normalization);
    docs without any query term never appear; k caps the output."""
    from data_migration_etl_scripts_spark.operators import text as tx

    pad = " ".join(f"filler{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, "model training data quality drives everything"),
            (2, "model training only here"),
            (3, "model training only here " + pad),  # same tf, longer
            (4, "completely unrelated tokens about gardens and rivers"),
            (5, "data quality"),
        ],
        "doc_id long, text string",
    )
    rows = tx.bm25_topk(docs, "doc_id", "text",
                        "model training data quality", k=3).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == 3 and 4 not in ids
    assert ids[0] == 1  # all four terms
    scores = {r.doc_id: r.score for r in tx.bm25_topk(
        docs, "doc_id", "text", "model training data quality", k=10
    ).collect()}
    assert 4 not in scores
    assert scores[2] > scores[3]  # length normalization


def test_compression_signal_discriminates(spark):
    """compression_ratio (operators/text.py): repetitive text
    compresses far below natural language, which sits far below
    random noise; values match a driver-side zlib recompute."""
    import random
    import zlib

    from data_migration_etl_scripts_spark.operators import text as tx

    rng = random.Random(5)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(180)
    )
    natural = (
        "the training corpus needs careful curation because quality "
        "filters and deduplication shape what the model learns "
    ) * 12
    repetitive = "same line again " * 90
    docs = spark.createDataFrame(
        [(1, repetitive), (2, natural), (3, noise), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tx.compression_ratio(
        docs, "doc_id", "text").collect()}
    assert rows[1].bits_per_byte < rows[2].bits_per_byte < rows[3].bits_per_byte
    for d, txt in ((1, repetitive), (2, natural), (3, noise)):
        raw = txt.encode()
        comp = len(zlib.compress(raw, 6))
        assert rows[d].n_bytes == len(raw)
        assert rows[d].n_compressed == comp
        assert rows[d].bits_per_byte == round(8.0 * comp / len(raw), 6)
    assert (rows[4].n_bytes, rows[4].bits_per_byte) == (0, 0.0)


def test_dup_clusters_null_endpoints_fall_back(spark):
    """Null pair endpoints: the union-find driver path must defer to
    the distributed propagation loop (whose equi-joins never match a
    null key) instead of indexing None/NaN as a node — default path
    equals the forced-distributed answer."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, None), (4, 5)], "doc_a long, doc_b long"
    )
    from collections import Counter

    got = Counter(map(tuple, cu.dup_clusters(pairs).collect()))
    forced = Counter(
        map(tuple, cu.dup_clusters(pairs, driver_edges_max=0).collect())
    )
    assert got == forced
