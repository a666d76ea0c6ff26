"""Unigram-LM tokenizer (the SentencePiece family) — the second
mainstream subword-tokenizer algorithm next to BPE (`operators/
bpe.py`), giving the engine both tokenizer families a training-data
pipeline standardizes on: BPE = bottom-up greedy merges; unigram =
top-down probabilistic vocabulary with EM + pruning, segmenting by
maximum likelihood (the algorithm behind T5/ALBERT/XLNet
tokenizers).

Algorithm (public SentencePiece formulation):
- SEED: substring counts (length <= max_piece_len) over the word-
  frequency table, weighted by word count; top ``max_seed`` pieces by
  count, plus every single character (so any word stays segmentable).
- EM: alternate (E) forward-backward over each word's segmentation
  lattice — alpha/beta log-sums give each piece's expected count
  under the current probabilities — and (M) re-normalize counts into
  probabilities. Each round provably does not decrease corpus
  log-likelihood (pinned in tests).
- PRUNE: drop the lowest-expected-count pieces (never single chars)
  in rounds until ``vocab_size`` remains, re-running EM after each
  cut (the standard simplification of SentencePiece's exact
  loss-delta ranking; documented, deterministic).
- ENCODE: Viterbi max-likelihood segmentation (ties broken toward
  the LONGER first piece, then lexicographically — deterministic).

Scale split (same discipline as BPE): the only corpus-sized stage is
ONE distributed word-count; training runs on its bounded Zipf head
(top ``max_words`` by count), O(vocab * rounds), independent of
corpus size. The E-step is embarrassingly parallel over words —
:func:`em_expected_counts` distributes it over the word-count
DataFrame with broadcast probabilities (mapInPandas -> one piece-sum
shuffle) for vocabularies trained beyond the driver bound; the
bounded-head path used by the board query is the same math driver-
side. Apply is map-side only: broadcast vocab probs + per-worker word
cache, zero shuffles.

Words carry the SentencePiece word-boundary marker: a word w
tokenizes as pieces of "▁" + w, so decode is concatenation with
the marker mapping back to a space."""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WB = "▁"  # SentencePiece word-boundary marker (LOWER ONE EIGHTH BLOCK)

_NEG_INF = float("-inf")


# ------------------------------------------------------------ lattice


def _piece_lattice(word: str, logp: dict[str, float], max_len: int):
    """Yield (start, end, piece, logp) for every vocab piece spanning
    word[start:end]."""
    n = len(word)
    for i in range(n):
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is not None:
                yield i, j, piece, lp


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """(log-likelihood of the word, expected piece counts). Standard
    lattice forward-backward: alpha[i] sums all segmentations of
    word[:i], beta[i] of word[i:]; a piece spanning (i, j) carries
    posterior exp(alpha[i] + logp + beta[j] - loglik)."""
    n = len(word)
    edges = list(_piece_lattice(word, logp, max_len))
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i, j, _piece, lp in sorted(edges):
        if alpha[i] != _NEG_INF:
            alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    loglik = alpha[n]
    if loglik == _NEG_INF:
        raise ValueError(f"word {word!r} not segmentable with this vocab")
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i, j, _piece, lp in sorted(edges, key=lambda e: -e[0]):
        if beta[j] != _NEG_INF:
            beta[i] = _logsumexp2(beta[i], lp + beta[j])
    counts: dict[str, float] = {}
    for i, j, piece, lp in edges:
        if alpha[i] == _NEG_INF or beta[j] == _NEG_INF:
            continue
        post = math.exp(alpha[i] + lp + beta[j] - loglik)
        counts[piece] = counts.get(piece, 0.0) + post
    return loglik, counts


def viterbi_encode(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Max-likelihood segmentation; deterministic tie-break toward the
    longer (then lexicographically smaller) last piece at each
    position."""
    n = len(word)
    best = [(_NEG_INF, 0, "")] * (n + 1)
    best[0] = (0.0, 0, "")
    for i in range(n):
        score_i = best[i][0]
        if score_i == _NEG_INF:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (score_i + lp, j - i, piece)
            cur = best[j]
            if (cand[0], cand[1], _neg_str(cand[2])) > (
                cur[0], cur[1], _neg_str(cur[2])
            ):
                best[j] = cand
    if best[n][0] == _NEG_INF:
        raise ValueError(f"word {word!r} not segmentable with this vocab")
    out = []
    pos = n
    while pos > 0:
        _s, length, piece = best[pos]
        out.append(piece)
        pos -= length
    return out[::-1]


def _neg_str(s: str):
    """Key making LEXICOGRAPHICALLY SMALLER strings compare larger."""
    return tuple(-ord(c) for c in s)


# ------------------------------------------------------------ training


def seed_pieces(
    word_counts: list[tuple[str, int]],
    max_piece_len: int = 8,
    max_seed: int = 20000,
) -> dict[str, float]:
    """Substring counts over the word table -> seed piece counts:
    top ``max_seed`` multi-char substrings by weighted count, plus
    every single character."""
    subs: Counter = Counter()
    chars: Counter = Counter()
    for word, n in word_counts:
        w = WB + word
        L = len(w)
        for i in range(L):
            chars[w[i]] += n
            for j in range(i + 2, min(L, i + max_piece_len) + 1):
                subs[w[i:j]] += n
    top = dict(
        sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_seed]
    )
    for c, n in chars.items():
        top[c] = top.get(c, 0) + n
    return {p: float(c) for p, c in top.items()}


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def em_round(
    word_counts: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[float, dict[str, float]]:
    """(corpus log-likelihood, expected counts) — one driver-side
    E-step over the bounded word table. Same math as the distributed
    :func:`em_expected_counts`."""
    total_ll = 0.0
    expected: dict[str, float] = {}
    for word, n in word_counts:
        ll, counts = forward_backward(WB + word, logp, max_piece_len)
        total_ll += n * ll
        for p, c in counts.items():
            expected[p] = expected.get(p, 0.0) + n * c
    return total_ll, expected


def em_expected_counts(
    words: DataFrame,
    logp: dict[str, float],
    max_piece_len: int,
) -> DataFrame:
    """Distributed E-step: (word, n) rows -> (piece, expected) rows.
    Probabilities ride as a broadcast dict inside an Arrow-batched
    mapInPandas kernel; the only shuffle is the piece-sum aggregation.
    Used when the vocabulary must be trained beyond the driver's
    bounded Zipf head — the board path trains on the head with
    :func:`em_round` (identical math, pinned against each other in
    tests)."""
    spark = words.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = b_logp.value
        for pdf in batches:
            acc: dict[str, float] = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                _ll, counts = forward_backward(WB + word, lp, max_piece_len)
                for p, c in counts.items():
                    acc[p] = acc.get(p, 0.0) + int(n) * c
            yield pd.DataFrame(
                {"piece": list(acc), "expected": list(acc.values())}
            )

    partials = words.mapInPandas(kernel, schema="piece string, expected double")
    return partials.groupBy("piece").agg(
        F.sum("expected").alias("expected")
    )


def train_unigram_from_counts(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 512,
    max_piece_len: int = 8,
    max_seed: int = 20000,
    em_rounds: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Seed -> (EM x em_rounds -> prune ``prune_frac``) until
    ``vocab_size`` pieces remain -> final EM. Returns piece -> log
    probability. Single chars are never pruned."""
    counts = seed_pieces(word_counts, max_piece_len, max_seed)
    logp = _normalize(counts)
    while True:
        for _ in range(em_rounds):
            _ll, expected = em_round(word_counts, logp, max_piece_len)
            # chars must survive even with zero expected count
            for p in logp:
                if len(p) == 1:
                    expected[p] = expected.get(p, 0.0) + 1e-6
            logp = _normalize(expected)
        multi = [p for p in logp if len(p) > 1]
        n_chars = sum(1 for p in logp if len(p) == 1)
        if len(multi) + n_chars <= vocab_size or not multi:
            break
        keep_n = max(
            vocab_size - n_chars, int(len(multi) * (1.0 - prune_frac))
        )
        if keep_n >= len(multi):
            keep_n = len(multi) - 1
        ranked = sorted(
            multi, key=lambda p: (-math.exp(logp[p]), p)
        )[:max(0, keep_n)]
        kept = {p: math.exp(logp[p]) for p in ranked}
        kept.update({p: math.exp(logp[p]) for p in logp if len(p) == 1})
        logp = _normalize(kept)
    _ll, expected = em_round(word_counts, logp, max_piece_len)
    for p in logp:
        if len(p) == 1:
            expected[p] = expected.get(p, 0.0) + 1e-6
    return _normalize(expected)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 200_000,
    max_piece_len: int = 8,
    **kw,
) -> dict[str, float]:
    """Corpus DataFrame -> unigram vocab. ONE distributed word count
    (reusing the BPE stage); training runs on the bounded Zipf head —
    top ``max_words`` by (count desc, word) via TakeOrderedAndProject,
    never the corpus."""
    from data_migration_etl_scripts_spark.operators.bpe import word_counts

    head = (
        word_counts(df, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_unigram_from_counts(
        [(r["word"], r["n"]) for r in head],
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        **kw,
    )


# -------------------------------------------------------------- apply


def apply_unigram(
    df: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-tokenize a text column: broadcast vocab, per-worker
    word cache (Zipf: the same words dominate every batch), map-side
    only — zero shuffles."""
    spark = df.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        import re

        # ASCII \s to MATCH TRAINING: word_counts splits with Spark's
        # Java regex \s+ (ASCII-only by default); Python str.split()
        # would also split on Unicode spaces (burned-in gotcha)
        ws = re.compile(r"\s+", re.ASCII)
        lp = b_logp.value
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out = []
            for w in ws.split(text.lower().strip()):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = viterbi_encode(WB + w, lp, max_piece_len)
                    if len(cache) < 1 << 16:
                        cache[w] = hit
                out.extend(hit)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, tokenize(F.col(text_col)))


def decode_pieces(pieces: list[str]) -> str:
    """Concatenate pieces; word-boundary markers map back to spaces."""
    return "".join(pieces).replace(WB, " ").strip()


def build_vocab(logp: dict[str, float]) -> dict[str, int]:
    """Piece -> id table: pieces in (probability desc, piece) order —
    stable (same trained probs => same ids on any machine). Feed the
    result straight to `bpe.encode_token_ids`, which is generic over
    any array<string> token column: the int32-LE ``ids_bin`` handoff
    is shared between both tokenizer families."""
    ranked = sorted(logp, key=lambda p: (-logp[p], p))
    return {p: i for i, p in enumerate(ranked)}
