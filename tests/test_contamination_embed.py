"""Decontamination, repetition filters, quantization, random projection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import contamination as ct
from data_migration_etl_scripts_spark.operators import embed as em


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words about spark shuffles and joins"),
        (3, "short"),
        (4, "the quick brown fox jumps over something else entirely here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap_only(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(100, "we say the quick brown fox jumps over and over")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in ct.decontaminate(docs, bench, n=5).collect()
    }
    # doc 1 and 4 share the 5-gram "the quick brown fox jumps"
    assert out[1].contaminated and out[1].n_hits >= 1
    assert out[4].contaminated
    assert not out[2].contaminated and out[2].n_hits == 0
    # doc 3 has < 5 tokens: no shingles, not contaminated
    assert out[3].n_shingles == 0 and not out[3].contaminated
    assert set(out) == {1, 2, 3, 4}  # every doc reported


def test_repetition_stats_flags_degenerate_docs(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "a perfectly normal sentence with mostly unique words inside"),
        (3, "line one\nline one\nline one\nline two"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ct.repetition_stats(df).collect()}
    assert out[1].top_token_frac == 1.0 and out[1].top_bigram_frac == 1.0
    assert not out[1].keep
    assert out[2].keep and out[2].top_token_frac < 0.2
    assert math.isclose(out[3].dup_line_frac, 0.5) and not out[3].keep
    assert out[4].n_tokens == 0 and out[4].keep  # empty: fracs 0, kept


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5, 127.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in em.quantize_int8(df).collect()}
    assert out[0].n_dims == 4 and out[0].n_saturated == 1
    scale = out[0].scale
    q = [int(x) for x in out[0].q_csv.split(",")]
    for orig, qi in zip([1.0, -2.0, 0.5, 127.0], q):
        assert abs(qi * scale - orig) <= scale / 2 + 1e-9
        assert -127 <= qi <= 127
    assert out[1].scale == 0.0 and out[1].q_csv == "0,0,0,0"


def test_random_projection_preserves_relative_distance(spark):
    # three vectors: a ~ b (near), c far; JL ±1 projection should keep
    # ||a-b|| << ||a-c|| with overwhelming margin at 64 -> 16 dims
    import random

    rnd = random.Random(7)
    a = [rnd.gauss(0, 1) for _ in range(64)]
    b = [x + rnd.gauss(0, 0.01) for x in a]
    c = [rnd.gauss(0, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: [r[f"rp_{j}"] for j in range(16)]
           for r in em.random_projection(df, in_dim=64, out_dim=16).collect()}

    def d2(x, y):
        return sum((p - q) ** 2 for p, q in zip(x, y))

    assert d2(out[0], out[1]) < 0.1 * d2(out[0], out[2])


def test_random_projection_is_linear(spark):
    # projection(2v) == 2*projection(v) exactly (pure signed sums)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [2.0, 4.0, 6.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: [r[f"rp_{j}"] for j in range(4)]
           for r in em.random_projection(df, in_dim=4, out_dim=4).collect()}
    assert out[1] == [2 * x for x in out[0]]


def test_decontaminate_plan_broadcasts_bench(spark):
    docs = _docs(spark)
    bench = docs.where("doc_id = 1")
    plan = (
        ct.decontaminate(docs, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_respects_per_stratum_fractions(spark):
    from data_migration_etl_scripts_spark.operators import curation as cu

    df = spark.range(4000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
    )
    out = cu.stratified_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.05}, default_fraction=0.0
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts.get("en", 0) / 2000 - 0.5) < 0.06
    assert abs(counts.get("de", 0) / 2000 - 0.05) < 0.03
    # deterministic: same rows on re-run and under different partitioning
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in cu.stratified_sample(
            df.repartition(13), "doc_id", "lang", {"en": 0.5, "de": 0.05}
        ).collect()
    }
    assert ids1 == ids2


def test_unigram_logprob_ranks_common_above_gibberish(spark):
    from data_migration_etl_scripts_spark.operators import contamination as ct2

    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zxqv wvmpk qqzzk jjxwv pppqq zzzzw aaaqx"))  # OOV soup
    rows.append((101, ""))  # empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ct2.unigram_logprob(df, vocab_size=10).collect()}
    assert out[0].avg_logprob > out[100].avg_logprob
    assert out[100].oov_frac > 0.5
    assert out[101].n_tokens == 0 and out[101].avg_logprob == 0.0
    # common-doc tokens all in vocab -> zero OOV
    assert out[0].oov_frac == 0.0
