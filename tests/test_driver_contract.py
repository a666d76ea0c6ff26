"""Driver-contract guards: invariants the correctness harness relies
on, enforced for EVERY registered query so future additions can't
regress them.

Round-1 lesson: the driver's pandas canonicalizer crashes on
array-typed result columns ('unhashable type: list'), which turned
two correct queries into red rows. Schema analysis alone (no
execution) is enough to catch that class forever.
"""

from __future__ import annotations

import re

from data_migration_etl_scripts_spark import queries as q

SF = "/root/testdata/sf0.001"

_NONSCALAR = re.compile(r"^(array|map|struct)")


def test_every_oracle_has_a_query():
    names = set(q.all_queries())
    oracle_names = set(q.all_oracles())
    assert oracle_names <= names, oracle_names - names


def test_rows_only_queries_are_the_documented_exceptions():
    # iterative codebook, media kernels, engine-specific sketches —
    # anything else missing an oracle is an accidental coverage gap.
    # As of round 6 EVERY entry here carries a range-assert partial
    # oracle in tools/selfcheck.py (RANGE_CHECKS): none is a bare
    # rows-only check anymore.
    allowed = {
        "ann_topk_ivf_trained",
        "multimodal_real_decode",
        "sketch_profile_events",
        # BPE's iterative greedy merge has no SQL form; both entries'
        # correctness is pinned by tests/test_bpe.py + the shard tests
        # + the selfcheck reconstruction/bracket range asserts
        "bpe_tokenize_corpus",
        "corpus_to_training_shards",
        # pixel/FFT kernels have no SQL twin; pinned by codec
        # round-trips + exact driver-side recomputes in selfcheck
        "video_frame_extract",
        "audio_mel_features",
        "image_neardup_pairs",
        "audio_resample_16k",
        "audio_neardup_pairs",
        "video_neardup_pairs",
        # unigram EM (lattice forward-backward) has no SQL form;
        # pinned by brute-force parity tests + the selfcheck
        # reconstruction/bracket range asserts
        "unigram_tokenize_corpus",
        # DEFLATE has no SQL twin; selfcheck recomputes every row
        # exactly driver-side with the same zlib level
        "compression_signal",
        # eigendecomposition has no SQL form; selfcheck asserts the
        # whitening identity-covariance property, exact linearity in
        # the input, and subspace alignment vs an independent numpy PCA
        "embed_pca_whiten",
        # FFT/DCT/delta stack: selfcheck recomputes every payload's
        # fingerprint driver-side (same pattern as audio_mel_features)
        "audio_mfcc_stack",
    }
    from tools.selfcheck import RANGE_CHECKS

    assert allowed <= set(RANGE_CHECKS), "oracle-less query without range assert"
    missing = set(q.all_queries()) - set(q.all_oracles())
    assert missing == allowed, missing ^ allowed


def test_no_query_returns_nonscalar_columns(spark):
    # plan analysis only — no execution, so this stays fast at 80+ queries
    bad = {}
    for name, fn in q.all_queries().items():
        df = fn(spark, SF)
        nonscalar = [
            (c, t) for c, t in df.dtypes if _NONSCALAR.match(t)
        ]
        if nonscalar:
            bad[name] = nonscalar
    assert not bad, f"driver canonicalizer cannot hash these: {bad}"


def test_query_output_columns_are_unique_and_named(spark):
    for name, fn in q.all_queries().items():
        cols = fn(spark, SF).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
        for c in cols:
            assert not c.startswith("__"), f"{name}: internal column {c} leaked"
