"""Incremental ingest dedup: batch vs history-index classification."""

from __future__ import annotations

from data_migration_etl_scripts_spark.operators import ingest as ig

_BASE = (
    "the quick brown fox jumps over the lazy dog near the old river bank "
    "while morning light spreads across the quiet valley and birds begin "
    "their early songs"
)
HIST = [
    (1, _BASE),
    (2, "spark pipelines shuffle data between executors when aggregations need keys"),
    (3, "totally unrelated historical content about gardening and soil quality"),
]


def _cls(spark, new_rows):
    hist = spark.createDataFrame(HIST, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    out = ig.dedup_incoming(
        new,
        ig.content_hash_table(hist, "doc_id", "text"),
        ig.minhash_band_table(hist, "doc_id", "text"),
    )
    return {r.doc_id: r for r in out.collect()}


def test_exact_dup_detected_despite_formatting(spark):
    # same canonical tokens, different case/punctuation -> exact dup
    out = _cls(spark, [(100, _BASE.upper().replace(" DOG ", " DOG, "))])
    assert out[100].verdict == "exact_dup" and out[100].is_exact_dup


def test_near_dup_shares_band_not_hash(spark):
    # one word changed: content hash differs, bands still collide
    out = _cls(spark, [(101, _BASE.replace("dog", "cat"))])
    assert out[101].verdict == "near_dup"
    assert not out[101].is_exact_dup and out[101].n_near_hist >= 1


def test_fresh_doc_passes(spark):
    out = _cls(spark, [(102, "completely novel text with entirely distinct "
                             "vocabulary and no historical overlap at all")])
    assert out[102].verdict == "new"
    assert out[102].n_near_hist == 0 and not out[102].is_exact_dup


def test_empty_doc_is_new_never_collides(spark):
    # no shingles -> no band rows -> cannot near-dup; hash of "" vs
    # history hashes only matches another empty doc
    out = _cls(spark, [(103, "")])
    assert out[103].verdict == "new" and out[103].n_near_hist == 0


def test_band_table_schema_and_rowcount(spark):
    hist = spark.createDataFrame(HIST, "doc_id long, text string")
    bt = ig.minhash_band_table(hist, "doc_id", "text", k=12, bands=4)
    assert bt.columns == ["doc_id", "band_id", "band_key"]
    # 4 bands per doc with shingles
    assert bt.count() == 3 * 4


def test_ingest_joins_are_equi_joins(spark):
    hist = spark.createDataFrame(HIST, "doc_id long, text string")
    new = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    out = ig.dedup_incoming(
        new,
        ig.content_hash_table(hist, "doc_id", "text"),
        ig.minhash_band_table(hist, "doc_id", "text"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
