"""BPE tokenizer (operators/bpe.py): golden merges on the classic
corpus, parity with a naive full-recount reference trainer, greedy
apply reconstruction, and the distributed train/apply round trip."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import bpe


def test_train_golden_sennrich_corpus():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe_from_counts(counts, 5)
    # (t,</w>) beats (e,s) on the lexicographic tie at freq 9, then the
    # suffix builds right-to-left; (o,w) beats (l,o) on the tie at 7
    assert merges == [
        ("t", "</w>"),
        ("s", "t</w>"),
        ("e", "st</w>"),
        ("o", "w"),
        ("l", "ow"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lowest", ranks) == ("low", "est</w>")
    # unseen characters stay as singletons, EOW survives
    assert bpe.encode_word("zq", ranks) == ("z", "q", "</w>")


def _naive_train(counts, num_merges):
    # independent reference: full pair recount every round
    vocab = {tuple(w) + ("</w>",): n for w, n in counts}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for word, n in vocab.items():
            for pair in zip(word, word[1:]):
                pc[pair] += n
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {bpe._merge_word(w, best): n for w, n in vocab.items()}
    return merges


def test_incremental_trainer_matches_naive_recount_reference():
    rng = random.Random(7)
    alphabet = "abcdef"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 40)
        for _ in range(120)
    }
    counts = sorted(words.items())
    assert bpe.train_bpe_from_counts(counts, 40) == _naive_train(counts, 40)


def test_apply_bpe_reconstructs_text_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "the lowest new low"), (2, "newest widest LOWER"), (3, None)],
        schema="doc_id long, text string",
    )
    merges = bpe.train_bpe_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 5
    )
    out = {r.doc_id: r for r in bpe.apply_bpe(df, "doc_id", "text", merges).collect()}
    for doc_id, text in [(1, "the lowest new low"), (2, "newest widest lower")]:
        rebuilt = "".join(out[doc_id].tokens).replace("</w>", " ").strip()
        assert rebuilt == text.lower().strip()
        assert out[doc_id].n_tokens == len(out[doc_id].tokens)
    assert out[3].tokens == [] and out[3].n_tokens == 0


def test_distributed_train_matches_local_counts(spark):
    rows = [(i, "low lower newest widest newest") for i in range(50)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    merges = bpe.train_bpe(df, "text", num_merges=6, max_words=100)
    local = bpe.train_bpe_from_counts(
        [("low", 50), ("lower", 50), ("newest", 100), ("widest", 50)], 6
    )
    assert merges == local
    table = bpe.merge_table(spark, merges)
    assert [tuple(r) for r in table.orderBy("rank").collect()] == [
        (i, a, b) for i, (a, b) in enumerate(merges)
    ]


def test_unicode_space_words_match_between_train_and_apply(spark):
    #   is NOT a word separator for Java's ASCII \s+ (training);
    # apply must segment identically or merges never fire on these words
    text = "foo bar foo bar foo bar baz"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    counts = {r.word: r.n for r in bpe.word_counts(df, "text").collect()}
    assert counts == {"foo bar": 3, "baz": 1}
    merges = bpe.train_bpe(df, "text", num_merges=20, max_words=10)
    out = bpe.apply_bpe(df, "doc_id", "text", merges).collect()[0]
    # trained to convergence on this corpus: the whole glued word is one token
    assert "foo bar</w>" in out.tokens


def test_token_ids_roundtrip_through_int32_binary(spark):
    merges = bpe.train_bpe_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 5
    )
    vocab = bpe.build_vocab(merges)
    assert vocab["</w>"] == 0 and len(set(vocab.values())) == len(vocab)
    df = spark.createDataFrame(
        [(1, "low lowest"), (2, "z\u00e9bra")], "doc_id long, text string"
    )
    toks = bpe.apply_bpe(df, "doc_id", "text", merges)
    out = {r.doc_id: r for r in bpe.encode_token_ids(toks, "tokens", vocab).collect()}
    for doc_id in (1, 2):
        r = out[doc_id]
        assert len(r.ids) == len(r.tokens) and len(r.ids_bin) == 4 * len(r.ids)
        back = bpe.decode_token_ids(bytes(r.ids_bin), vocab)
        expected = [t if t in vocab else "<unk>" for t in r.tokens]
        assert back == expected
    # known tokens round-trip exactly; the accented char is outside the
    # printable-ASCII base vocab
    assert "<unk>" in bpe.decode_token_ids(bytes(out[2].ids_bin), vocab)
    assert "<unk>" not in bpe.decode_token_ids(bytes(out[1].ids_bin), vocab)


def test_fused_matches_chain(spark):
    """apply_bpe_encode (one Arrow boundary) must reproduce the
    chained apply_bpe -> encode_token_ids output exactly — columns,
    values, packed bytes — including None and empty texts."""
    from data_migration_etl_scripts_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, None), (3, ""),
         (4, "the the the lowered LOWERED text")],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(docs, "text", num_merges=20, max_words=100)
    vocab = bpe.build_vocab(merges)
    chained = bpe.encode_token_ids(
        bpe.apply_bpe(docs, "doc_id", "text", merges), "tokens", vocab
    )
    fused = bpe.apply_bpe_encode(docs, "doc_id", "text", merges, vocab)
    assert chained.columns == fused.columns
    a = {r["doc_id"]: r for r in chained.collect()}
    b = {r["doc_id"]: r for r in fused.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["tokens"] == b[k]["tokens"], k
        assert a[k]["n_tokens"] == b[k]["n_tokens"], k
        assert a[k]["ids"] == b[k]["ids"], k
        assert bytes(a[k]["ids_bin"]) == bytes(b[k]["ids_bin"]), k
