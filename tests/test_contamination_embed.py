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


def test_remove_duplicate_paragraphs_keeps_first_occurrence(spark):
    from data_migration_etl_scripts_spark.operators import dedup as dd2

    rows = [
        (1, "alpha\nbeta\nalpha"),     # in-doc dup: second 'alpha' dropped
        (2, "beta\ngamma"),            # 'beta' seen in doc 1 -> dropped
        (3, ""),                       # empty doc
        (4, "delta"),                  # untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           dd2.remove_duplicate_paragraphs(df, "doc_id", "text").collect()}
    assert out[1].text_clean == "alpha\nbeta" and out[1].n_dropped == 1
    assert out[2].text_clean == "gamma" and out[2].n_dropped == 1
    assert out[3].text_clean == "" and out[3].n_paras == 0
    assert out[4].text_clean == "delta" and out[4].n_dropped == 0


def test_remove_duplicate_paragraphs_winner_is_aggregate_not_window(spark):
    from data_migration_etl_scripts_spark.operators import dedup as dd2

    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = (
        dd2.remove_duplicate_paragraphs(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # skew guard: no window over the paragraph hash anywhere in the plan
    assert "Window" not in plan


def test_chunk_documents_windows_and_overlap(spark):
    from data_migration_etl_scripts_spark.operators import text as tx2

    words = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, words), (2, "only three words"), (3, "")],
        "doc_id long, text string",
    )
    out = tx2.chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 20 tokens, stride 6 -> chunks at 0,6,12 -> 1+ceil(12/6)=3
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert len(c1) == 3
    assert c1[0].chunk_text.split()[:2] == ["w0", "w1"]
    assert c1[1].chunk_text.split()[0] == "w6"  # overlap of 2: starts at 6
    assert c1[2].n_chunk_tokens == 8  # 12..19
    # every token appears in at least one chunk
    covered = set()
    for r in c1:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(20)}
    # short doc: single partial chunk; empty doc: no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 3
    assert 3 not in by_doc


def test_select_to_token_budget_takes_best_first(spark):
    from data_migration_etl_scripts_spark.operators import curation as cu2

    rows = [(i, float(i), 40) for i in range(20)]  # higher id = better
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tok int")
    out = cu2.select_to_token_budget(
        df, "doc_id", "score", "n_tok", budget_per_shard=100, n_shards=1
    ).collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [18, 19]  # 40 + 40 fits; the third-best would hit 120
    assert max(r.cum_tokens for r in out) <= 100


def test_snapshot_diff_classifies_all_change_types(spark):
    from data_migration_etl_scripts_spark.operators import diffing as dfo

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "pk long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0), (5, "e", 50.0)],
        "pk long, s string, v double",
    )
    out = {r.pk: r.change_type for r in
           dfo.snapshot_diff(old, new, ["pk"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 NULL->value changed, 4 removed, 5 added
    assert out == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_null_vs_literal_null_string_differ(spark):
    from data_migration_etl_scripts_spark.operators import diffing as dfo

    old = spark.createDataFrame([(1, None)], "pk long, s string")
    new = spark.createDataFrame([(1, "<null>")], "pk long, s string")
    out = dfo.snapshot_diff(old, new, ["pk"]).collect()
    assert [r.change_type for r in out] == ["changed"]  # sentinel works


def test_fk_orphan_report_counts_and_single_scan(spark):
    from data_migration_etl_scripts_spark.operators import diffing as dfo

    facts = spark.createDataFrame(
        [(1, 10, 100), (2, 11, None), (3, 99, 101), (4, None, 999)],
        "pk long, fk_a long, fk_b long",
    )
    dim_a = spark.createDataFrame([(10,), (11,)], "k long")
    dim_b = spark.createDataFrame([(100,), (101,)], "k long")
    out = {r.fk_col: r for r in dfo.fk_orphan_report(
        facts, [("fk_a", dim_a, "k"), ("fk_b", dim_b, "k")]
    ).collect()}
    assert out["fk_a"].n_rows == 4 and out["fk_a"].n_null == 1
    assert out["fk_a"].n_orphans == 1  # 99
    assert out["fk_b"].n_null == 1 and out["fk_b"].n_orphans == 1  # 999
    plan = dfo.fk_orphan_report(
        facts, [("fk_a", dim_a, "k"), ("fk_b", dim_b, "k")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # dims broadcast, fact never shuffles


def test_fuzzy_decontamination_catches_paraphrased_leak(spark):
    """A lightly-edited copy of a bench doc escapes exact 8-gram
    decontamination windows less reliably than it escapes minhash
    bands: the fuzzy pass must flag a one-word-edit near-copy AND the
    verbatim copy, and leave an unrelated doc clean."""
    from data_migration_etl_scripts_spark.operators import contamination as ctm

    bench_text = (
        "the quick brown fox jumps over the lazy dog near the old river "
        "bank while morning light spreads across the quiet valley and "
        "birds begin their early songs"
    )
    docs = spark.createDataFrame(
        [
            (1, bench_text),                               # verbatim leak
            (2, bench_text.replace("dog", "cat")),         # paraphrased leak
            (3, "completely unrelated subject matter about tidal "
                "harbors and the engineering of breakwaters with "
                "nothing shared against the benchmark at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {r.doc_id: r.contaminated
           for r in ctm.decontaminate_fuzzy(docs, bench).collect()}
    assert got == {1: True, 2: True, 3: False}


def test_bigram_lm_penalizes_word_salad(spark):
    """The property bigrams add over unigrams: a SHUFFLE of a fluent
    corpus' tokens keeps every unigram identical but destroys the
    adjacencies — the bigram model must score the shuffled doc lower
    while the unigram model cannot tell them apart."""
    import random

    from data_migration_etl_scripts_spark.operators import contamination as ctm

    fluent = ("the quick brown fox jumps over the lazy dog and the old "
              "river bank holds the morning light across the quiet valley")
    words = fluent.split()
    rng = random.Random(3)
    salad = words[:]
    while " ".join(salad) == fluent:
        rng.shuffle(salad)
    # a small corpus of fluent docs teaches the bigram table
    rows = [(i, fluent) for i in range(8)] + [(100, " ".join(salad))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    bi = {r.doc_id: r.avg_logprob
          for r in ctm.bigram_logprob(df, vocab_size=64, bigram_size=256).collect()}
    uni = {r.doc_id: r.avg_logprob
           for r in ctm.unigram_logprob(df, vocab_size=64).collect()}
    assert bi[100] < bi[0] - 0.3, (bi[100], bi[0])   # salad clearly worse
    assert abs(uni[100] - uni[0]) < 1e-6             # unigrams blind to it


def test_bigram_heldout_model_separation(spark):
    """model_df separates train from eval: transitions the model never
    saw fall to the unigram floor (hit_frac 0), while self-scoring the
    train half sees its own bigrams (hit_frac 1). The eval docs must
    not leak into the model tables."""
    from data_migration_etl_scripts_spark.operators import contamination as ctm

    train_text = "alpha beta gamma delta alpha beta gamma delta"
    eval_text = "delta gamma beta alpha delta gamma beta alpha"  # reversed adjacencies
    train = spark.createDataFrame(
        [(i, train_text) for i in range(4)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100, eval_text), (101, train_text)], "doc_id long, text string"
    )
    scored = {r.doc_id: r for r in ctm.bigram_logprob(
        ev, model_df=train, vocab_size=16, bigram_size=64).collect()}
    # the train-like doc hits every transition; the reversed doc none
    assert scored[101].hit_frac == 1.0
    assert scored[100].hit_frac == 0.0
    assert scored[100].avg_logprob < scored[101].avg_logprob - 1.0
    # self-scoring (no model_df) would have admitted the reversed doc's
    # bigrams into the model — hit_frac must then be positive
    selfd = {r.doc_id: r for r in ctm.bigram_logprob(
        ev, vocab_size=16, bigram_size=64).collect()}
    assert selfd[100].hit_frac > 0.0


def test_containment_catches_embedded_benchmark(spark):
    from data_migration_etl_scripts_spark.operators import contamination as ctm

    snippet = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"word{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, filler + " " + snippet + " " + filler),  # quotes the bench
            (2, filler),                                  # clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, snippet)], "bench_id long, text string"
    )
    got = ctm.containment_pairs(docs, bench, n=5, threshold=0.9).collect()
    assert [(r.bench_id, r.doc_id) for r in got] == [(100, 1)]
    assert got[0].containment == 1.0  # every bench shingle present
    # symmetric Jaccard over the same pair would be ~6/400 — the miss
    # containment exists to catch
    assert got[0].n_inter / (2 * 200) < 0.05
