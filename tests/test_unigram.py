"""Unigram-LM tokenizer (operators/unigram.py): forward-backward
parity with brute-force segmentation enumeration, EM monotone
likelihood, seed/prune behavior, Viterbi determinism + reconstruction,
the distributed E-step vs the driver E-step, and the Spark apply
kernel.

Reference parity note: tokenizer training is LLM-data-pipeline
addendum surface (SURVEY.md), the SentencePiece-family counterpart to
tests/test_bpe.py."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import unigram as ug

TOY = [("abab", 10), ("abc", 5), ("cab", 3), ("banana", 2)]


def _brute(word: str, logp: dict[str, float]):
    """Enumerate all segmentations: (loglik, expected counts)."""
    total = 0.0
    exp: dict[str, float] = {}

    def rec(rest, acc_lp, pieces):
        nonlocal total
        if not rest:
            pr = math.exp(acc_lp)
            total += pr
            for p in pieces:
                exp[p] = exp.get(p, 0.0) + pr
            return
        for k in range(1, len(rest) + 1):
            p = rest[:k]
            if p in logp:
                rec(rest[k:], acc_lp + logp[p], pieces + [p])

    rec(word, 0.0, [])
    return math.log(total), {p: c / total for p, c in exp.items()}


def test_forward_backward_matches_bruteforce():
    logp = ug._normalize({"a": 4, "b": 2, "ab": 3, "ba": 1, "aba": 2})
    for word in ("abab", "aab", "bbaa", "a"):
        ll_b, exp_b = _brute(word, logp)
        ll, exp = ug.forward_backward(word, logp, 8)
        assert abs(ll - ll_b) < 1e-12
        assert set(exp) == set(exp_b)
        assert all(abs(exp[p] - exp_b[p]) < 1e-12 for p in exp_b)


def test_unsegmentable_word_raises():
    logp = ug._normalize({"a": 1, "ab": 1})
    with pytest.raises(ValueError, match="not segmentable"):
        ug.forward_backward("abc", logp, 8)
    with pytest.raises(ValueError, match="not segmentable"):
        ug.viterbi_encode("abc", logp, 8)


def test_em_monotone_likelihood():
    lp = ug._normalize(ug.seed_pieces(TOY, max_piece_len=4, max_seed=50))
    last = None
    for _ in range(6):
        ll, expd = ug.em_round(TOY, lp, 4)
        for p in lp:
            if len(p) == 1:
                expd[p] = expd.get(p, 0.0) + 1e-6
        lp = ug._normalize(expd)
        assert last is None or ll >= last - 1e-9
        last = ll


def test_seed_contains_all_chars_and_topk():
    seed = ug.seed_pieces(TOY, max_piece_len=4, max_seed=5)
    for w, _n in TOY:
        for c in ug.WB + w:
            assert c in seed
    assert sum(1 for p in seed if len(p) > 1) <= 5


def test_train_learns_repeated_pieces_and_prunes():
    vocab = ug.train_unigram_from_counts(
        TOY, vocab_size=20, max_piece_len=4, max_seed=50
    )
    assert len(vocab) <= 20
    assert "ab" in vocab or ug.WB + "ab" in vocab
    # single chars always survive pruning
    for w, _n in TOY:
        for c in w:
            assert c in vocab
    # tiny budget still terminates and keeps chars segmentable
    small = ug.train_unigram_from_counts(
        TOY, vocab_size=5, max_piece_len=4, max_seed=50
    )
    for w, _n in TOY:
        ug.viterbi_encode(ug.WB + w, small, 4)


def test_viterbi_deterministic_and_reconstructs():
    vocab = ug.train_unigram_from_counts(
        TOY, vocab_size=24, max_piece_len=4, max_seed=50
    )
    for w, _n in TOY:
        a = ug.viterbi_encode(ug.WB + w, vocab, 4)
        b = ug.viterbi_encode(ug.WB + w, vocab, 4)
        assert a == b
        assert ug.decode_pieces(a) == w


def test_viterbi_prefers_max_likelihood():
    # 'ab' twice (2 * lp(ab)) must beat four singles when cheaper
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.4)}
    assert ug.viterbi_encode("abab", logp, 8) == ["ab", "ab"]


def test_distributed_estep_matches_driver(spark):
    lp = ug._normalize(ug.seed_pieces(TOY, max_piece_len=4, max_seed=50))
    words = spark.createDataFrame(TOY, "word string, n long")
    got = {
        r["piece"]: r["expected"]
        for r in ug.em_expected_counts(words, lp, 4).collect()
    }
    _ll, want = ug.em_round(TOY, lp, 4)
    assert set(got) == set(want)
    assert all(abs(got[p] - want[p]) < 1e-9 for p in want)


def test_spark_apply_matches_driver_viterbi(spark):
    vocab = ug.train_unigram_from_counts(
        TOY, vocab_size=24, max_piece_len=4, max_seed=50
    )
    docs = spark.createDataFrame(
        [(1, "abab abc"), (2, "banana  CAB"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.pieces
            for r in ug.apply_unigram(docs, vocab, "text", max_piece_len=4)
            .collect()}
    want1 = (ug.viterbi_encode(ug.WB + "abab", vocab, 4)
             + ug.viterbi_encode(ug.WB + "abc", vocab, 4))
    want2 = (ug.viterbi_encode(ug.WB + "banana", vocab, 4)
             + ug.viterbi_encode(ug.WB + "cab", vocab, 4))
    assert rows[1] == want1
    assert rows[2] == want2
    assert rows[3] == []


def test_vocab_ids_and_binary_packing(spark):
    from data_migration_etl_scripts_spark.operators import bpe

    vocab_lp = ug.train_unigram_from_counts(
        TOY, vocab_size=24, max_piece_len=4, max_seed=50
    )
    vocab = ug.build_vocab(vocab_lp)
    # stable: ids ordered by probability desc then piece
    ranked = sorted(vocab_lp, key=lambda p: (-vocab_lp[p], p))
    assert [vocab[p] for p in ranked] == list(range(len(ranked)))
    docs = spark.createDataFrame([(1, "abab cab")], "doc_id long, text string")
    toks = ug.apply_unigram(docs, vocab_lp, "text", max_piece_len=4)
    packed = bpe.encode_token_ids(toks, "pieces", vocab).collect()[0]
    assert packed.ids == [vocab[p] for p in packed.pieces]
    back = bpe.decode_token_ids(bytes(packed.ids_bin),
                                vocab)
    assert back == list(packed.pieces)
    assert ug.decode_pieces(back) == "abab cab"
