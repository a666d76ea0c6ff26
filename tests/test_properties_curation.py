"""Property tests (hypothesis) for chunking, quantization, and
budget selection — invariants that must hold for ANY input, not just
the fixture rows."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_migration_etl_scripts_spark.operators import curation as cu
from data_migration_etl_scripts_spark.operators import embed as em
from data_migration_etl_scripts_spark.operators import text as tx

_WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=40
)


@settings(max_examples=8, deadline=None)
@given(words=_WORDS, chunk=st.integers(4, 12), overlap=st.integers(0, 3))
def test_chunks_cover_every_token_in_order(spark, words, chunk, overlap):
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        tx.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    stride = chunk - overlap
    if not words:
        assert rows == []
        return
    # invariants: full coverage, correct window starts, bounded size
    assert rows[0].chunk_text.split()[0] == words[0]
    covered = set()
    for r in rows:
        toks = r.chunk_text.split()
        assert 1 <= len(toks) <= chunk
        start = r.chunk_id * stride
        assert toks == words[start : start + chunk]
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(len(words)))


@settings(max_examples=8, deadline=None)
@given(
    vec=st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_int8_bounds_and_error(spark, vec):
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    r = em.quantize_int8(df).collect()[0]
    q = [int(x) for x in r.q_csv.split(",")]
    assert len(q) == len(vec)
    mx = max(abs(v) for v in vec)
    if mx == 0:
        assert all(x == 0 for x in q)
        return
    assert all(-127 <= x <= 127 for x in q)
    # reconstruction error bounded by half a quantization step
    # (scale reported rounded to 9 dp -> allow that slack too)
    for orig, qi in zip(vec, q):
        assert abs(qi * r.scale - orig) <= r.scale / 2 + 1e-6 * max(1.0, mx)


@settings(max_examples=6, deadline=None)
@given(
    toks=st.lists(st.integers(1, 50), min_size=1, max_size=30),
    budget=st.integers(10, 300),
)
def test_budget_selection_never_exceeds_and_is_greedy(spark, toks, budget):
    rows = [(i, float(len(toks) - i), t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tok int")
    out = sorted(
        cu.select_to_token_budget(
            df, "doc_id", "score", "n_tok", budget_per_shard=budget, n_shards=1
        ).collect(),
        key=lambda r: -r.score,
    )
    assert all(r.cum_tokens <= budget for r in out)
    # greedy prefix property: kept docs are exactly the best-score
    # prefix whose running sum fits
    cum = 0
    expect = []
    for i, t in enumerate(toks):  # score order == doc order here
        cum += t
        if cum > budget:
            break
        expect.append(i)
    assert [r.doc_id for r in out] == expect
