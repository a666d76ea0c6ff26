"""Corpus-curation operator semantics: connected-components dup
clustering, deterministic sampling, sequence packing, PII scrub."""

from __future__ import annotations

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
