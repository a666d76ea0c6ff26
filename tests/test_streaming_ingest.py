"""Streaming corpus ingest: dedup-admit loop across micro-batches,
restarts, and within-batch duplicates."""

from __future__ import annotations

import os

from data_migration_etl_scripts_spark.streaming.ingest import stream_corpus_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog near the old river bank "
    "while morning light spreads across the quiet valley and birds begin "
    "their early songs"
)
OTHER = (
    "spark structured streaming drains available files then stops which "
    "gives the batch semantics every incremental pipeline wants for "
    "reproducible runs and simple testing stories"
)


def _write_wave(spark, src, name, rows):
    # the file-stream source lists flat files, so land one parquet FILE
    # (not a directory) into the watched dir
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))


def _corpus_ids(spark, state):
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_corpus

    path = os.path.join(state, "corpus")
    if not os.path.isdir(path):
        return set()
    return {r.doc_id for r in read_ingest_corpus(spark, state).select("doc_id").collect()}


def test_streaming_ingest_admits_and_rejects_across_waves(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)

    # wave 1: two distinct docs + an in-batch exact duplicate of doc 1
    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER), (3, BASE)])
    stream_corpus_ingest(spark, src, state)
    assert _corpus_ids(spark, state) == {1, 2}  # 3 deduped within batch

    # wave 2: exact dup of history (4), near dup (5), fresh (6)
    _write_wave(spark, src, "w2", [
        (4, BASE),
        (5, BASE.replace("dog", "cat")),
        (6, "entirely novel vocabulary with no overlap against anything "
            "previously admitted into the corpus at all honestly"),
    ])
    stream_corpus_ingest(spark, src, state)
    assert _corpus_ids(spark, state) == {1, 2, 6}

    # index tables grew only by accepted docs
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_hashes

    hashes = read_ingest_hashes(spark, state)
    assert {r.doc_id for r in hashes.collect()} == {1, 2, 6}


def test_streaming_ingest_restart_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER)])
    stream_corpus_ingest(spark, src, state)
    before = _corpus_ids(spark, state)
    # re-run with the same checkpoint and no new files: nothing replays
    stream_corpus_ingest(spark, src, state)
    assert _corpus_ids(spark, state) == before == {1, 2}
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_corpus

    assert read_ingest_corpus(spark, state).count() == 2  # no duplicate rows either


def test_streaming_ingest_replay_after_index_write_preserves_wave(spark, tmp_path):
    """Crash-replay regression (advisor, round 3): a wave replayed AFTER
    its index write must NOT classify as a duplicate of itself and
    overwrite its own corpus/rollup dirs with nothing. We simulate the
    worst replay — checkpoint lost entirely after a fully-committed wave
    — and require every artifact to survive byte-for-byte in content."""
    import shutil

    from data_migration_etl_scripts_spark.streaming.ingest import (
        read_ingest_hashes,
        read_ingest_rollup,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    schema = "doc_id long, text string, lang string, n_tokens long"
    _rows = [(1, BASE, "en", 30), (2, OTHER, "en", 25)]
    df = spark.createDataFrame(_rows, schema)
    import glob
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out")
        df.coalesce(1).write.parquet(out)
        shutil.copy(glob.glob(os.path.join(out, "part-*.parquet"))[0],
                    os.path.join(src, "w1.parquet"))

    spec = (["lang"], ["n_tokens"])
    stream_corpus_ingest(spark, src, state, schema=schema, rollup_spec=spec)
    assert _corpus_ids(spark, state) == {1, 2}

    # lose the checkpoint: the source re-lists w1.parquet and the wave
    # replays as batch 0 with the index tables ALREADY extended
    shutil.rmtree(os.path.join(state, "checkpoint"))
    stream_corpus_ingest(spark, src, state, schema=schema, rollup_spec=spec)

    # the wave survived: corpus, index, and rollup all intact
    assert _corpus_ids(spark, state) == {1, 2}
    assert {r.doc_id for r in read_ingest_hashes(spark, state).collect()} == {1, 2}
    r = {x.lang: (x.n_rows, int(x.sum_n_tokens))
         for x in read_ingest_rollup(spark, state).collect()}
    assert r == {"en": (2, 55)}


def test_streaming_ingest_quality_gate_quarantines_bad_wave(spark, tmp_path):
    from data_migration_etl_scripts_spark.operators import expectations as ex

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)

    def gate(df):
        return ex.expectation_report(
            df, row_checks={"text_not_null": ex.not_null("text")}
        )

    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER)])
    stream_corpus_ingest(spark, src, state, expectations=gate)
    assert _corpus_ids(spark, state) == {1, 2}

    # wave 2 carries a NULL text: the WHOLE wave must be quarantined
    # before the corpus or either index is extended
    _write_wave(spark, src, "w2", [
        (3, None),
        (4, "perfectly fine document that still must not land because "
            "its wave failed the declared expectations gate"),
    ])
    stream_corpus_ingest(spark, src, state, expectations=gate)
    assert _corpus_ids(spark, state) == {1, 2}  # nothing admitted
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_hashes

    hashes = read_ingest_hashes(spark, state)
    assert {r.doc_id for r in hashes.collect()} == {1, 2}  # index untouched
    rejected = spark.read.parquet(os.path.join(state, "rejected"))
    bad = {r.check_name: r.n_violations for r in rejected.collect()}
    assert bad["text_not_null"] == 1

    # wave 3 is clean again: the gate lets it through, history intact
    _write_wave(spark, src, "w3", [
        (5, "fresh subject matter entirely about tidal harbors and the "
            "engineering of breakwaters with nothing shared before")
    ])
    stream_corpus_ingest(spark, src, state, expectations=gate)
    assert _corpus_ids(spark, state) == {1, 2, 5}


def test_streaming_ingest_maintains_incremental_rollup(spark, tmp_path):
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_rollup

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    schema = "doc_id long, text string, lang string, n_tokens long"
    spec = (["lang"], ["n_tokens"])

    def wave(name, rows):
        import glob
        import shutil
        import tempfile

        df = spark.createDataFrame(rows, schema)
        with tempfile.TemporaryDirectory() as td:
            out = os.path.join(td, "out")
            df.coalesce(1).write.parquet(out)
            part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
            shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    wave("w1", [(1, BASE, "en", 30), (2, OTHER, "en", 25)])
    stream_corpus_ingest(spark, src, state, schema=schema, rollup_spec=spec)
    r1 = {r.lang: (r.n_rows, int(r.sum_n_tokens)) for r in
          read_ingest_rollup(spark, state).collect()}
    assert r1 == {"en": (2, 55)}

    # wave 2: a history dup (must NOT count) + a fresh fr doc (must)
    wave("w2", [(3, BASE, "en", 30),
                (4, "nouveau document distinct sans chevauchement reel "
                    "avec le corpus existant pour le test", "fr", 14)])
    stream_corpus_ingest(spark, src, state, schema=schema, rollup_spec=spec)
    r2 = {r.lang: (r.n_rows, int(r.sum_n_tokens)) for r in
          read_ingest_rollup(spark, state).collect()}
    assert r2 == {"en": (2, 55), "fr": (1, 14)}


def test_streaming_ingest_emits_training_shards_for_accepted_docs(spark, tmp_path):
    import glob

    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_shards

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    spec = {"members": {"txt": "text"}, "n_shards": 2}

    # nothing emitted yet: the reader degrades to an empty frame
    assert read_ingest_shards(spark, state).count() == 0

    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER), (3, BASE)])
    stream_corpus_ingest(spark, src, state, shard_spec=spec)
    # wave 2 is entirely duplicate: admits nothing, emits no shard dir
    _write_wave(spark, src, "w2", [(4, BASE), (5, OTHER)])
    stream_corpus_ingest(spark, src, state, shard_spec=spec)
    # wave 3 admits one fresh doc
    _write_wave(spark, src, "w3", [(6, "completely fresh vocabulary that "
                                       "matches no earlier admitted text")])
    stream_corpus_ingest(spark, src, state, shard_spec=spec)

    batch_dirs = sorted(glob.glob(os.path.join(state, "shards", "batch-*")))
    assert len(batch_dirs) == 2  # the all-duplicate wave emitted nothing
    members = {r.key: r.content.decode() for r in read_ingest_shards(spark, state).collect()}
    assert set(members) == _corpus_ids(spark, state) == {1, 2, 6}
    assert members[1] == BASE and members[2] == OTHER
    # every emitted batch carries its manifest artifact
    for d in batch_dirs:
        assert os.path.isdir(os.path.join(d, "_manifest"))


def test_streaming_ingest_ships_tokenized_shards_with_pretrained_merges(spark, tmp_path):
    import struct

    from data_migration_etl_scripts_spark.operators import bpe
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_shards

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    # tokenizer trained offline on a seed corpus (the artifact a real
    # deployment loads from bpe.merge_table parquet)
    seed = spark.createDataFrame([(0, BASE), (1, OTHER)], "doc_id long, text string")
    merges = bpe.train_bpe(seed, "text", num_merges=40, max_words=200)
    spec = {"members": {"txt": "text", "bin": "ids_bin"}, "n_shards": 2,
            "tokenizer_merges": merges}

    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER)])
    stream_corpus_ingest(spark, src, state, shard_spec=spec)
    back = read_ingest_shards(spark, state).collect()
    texts = {r.key: r.content.decode() for r in back if r.ext == "txt"}
    bins = {r.key: bytes(r.content) for r in back if r.ext == "bin"}
    assert set(texts) == set(bins) == {1, 2}
    vocab = bpe.build_vocab(merges)
    for k, blob in bins.items():
        ids = struct.unpack(f"<{len(blob) // 4}i", blob)
        # ids decode back to tokens that reconstruct the document
        toks = bpe.decode_token_ids(blob, vocab)
        assert "<unk>" not in toks  # seed corpus covers these docs' chars
        assert "".join(toks).replace("</w>", " ").strip() == texts[k].lower()
        assert len(ids) > 0


def test_streaming_ingest_maintains_ann_index(spark, tmp_path):
    """ann_spec: admitted docs' embeddings land in a persistent IVF
    index (frozen codebook from the first wave, per-batch appends);
    searching the index finds neighbors across BOTH waves, rejected
    duplicates never enter it, and a checkpoint-loss replay leaves the
    index identical."""
    import shutil

    from data_migration_etl_scripts_spark.operators.similarity import (
        search_ivf_index,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    schema = "doc_id long, text string, embedding array<double>"

    def vec(seed):
        return [float((seed * 31 + i * 7) % 13 - 6) for i in range(8)]

    def wave(name, rows):
        import glob
        import tempfile

        df = spark.createDataFrame(rows, schema)
        with tempfile.TemporaryDirectory() as td:
            out = os.path.join(td, "out")
            df.coalesce(1).write.parquet(out)
            shutil.copy(glob.glob(os.path.join(out, "part-*.parquet"))[0],
                        os.path.join(src, f"{name}.parquet"))

    spec = {"vec_col": "embedding", "n_centroids": 2}
    wave("w1", [(1, BASE, vec(1)), (2, OTHER, vec(2))])
    stream_corpus_ingest(spark, src, state, schema=schema, ann_spec=spec)
    # wave 2: one exact dup (must NOT enter the index) + one fresh doc
    wave("w2", [(3, BASE, vec(3)),
                (4, "entirely new material about harbor engineering and "
                    "tide walls with no overlap at all", vec(4))])
    stream_corpus_ingest(spark, src, state, schema=schema, ann_spec=spec)

    index_dir = os.path.join(state, "ann_index")
    q = spark.createDataFrame([(1, vec(1))], "vec_id long, embedding array<double>")
    got = search_ivf_index(spark, index_dir, q, k=3, n_probe=2).collect()
    ids = {r.corpus_id for r in got}
    assert 3 not in ids          # rejected duplicate never indexed
    assert ids <= {2, 4} and ids  # neighbors span both admitted waves

    before = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(index_dir, "assigned"))
        .select("vid", "centroid_id").collect()
    )
    # lose the checkpoint: both waves replay; index must not grow
    shutil.rmtree(os.path.join(state, "checkpoint"))
    stream_corpus_ingest(spark, src, state, schema=schema, ann_spec=spec)
    after = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(index_dir, "assigned"))
        .select("vid", "centroid_id").collect()
    )
    assert after == before


def test_streaming_ingest_decontaminates_benchmark_leaks(spark, tmp_path):
    """Streaming decontamination: a doc colliding with the persisted
    benchmark band index is quarantined at admit time — absent from
    corpus AND history indexes, present in the contaminated/ audit
    trail — and the whole gate is replay-idempotent after checkpoint
    loss."""
    import shutil

    from data_migration_etl_scripts_spark.streaming.ingest import (
        read_ingest_contaminated,
        read_ingest_hashes,
        write_benchmark_band_index,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    bench_dir = str(tmp_path / "bench_bands")
    os.makedirs(src)

    # benchmark suite: one eval doc; BASE is "leaked" into the corpus
    bench = spark.createDataFrame([(9001, BASE)], "doc_id long, text string")
    write_benchmark_band_index(bench, bench_dir)

    spec = {"bands_dir": bench_dir}
    # wave 1: a leaked bench doc (1) + a clean doc (2)
    _write_wave(spark, src, "w1", [(1, BASE), (2, OTHER)])
    stream_corpus_ingest(spark, src, state, decon_spec=spec)
    assert _corpus_ids(spark, state) == {2}  # leak never admitted
    assert {r.doc_id for r in read_ingest_contaminated(spark, state).collect()} == {1}
    # the leak is absent from the HISTORY INDEXES too (not just corpus)
    assert {r.doc_id for r in read_ingest_hashes(spark, state).collect()} == {2}

    # wave 2: a NEAR-dup of the bench doc (one word changed -> still
    # shares bands) is also quarantined; a fresh doc is admitted
    _write_wave(spark, src, "w2", [
        (3, BASE.replace("dog", "cat")),
        (4, "completely different sentence about warehouse robots "
            "stacking crates beside the loading dock every evening "
            "after the last truck departs with its weekly freight"),
    ])
    stream_corpus_ingest(spark, src, state, decon_spec=spec)
    assert _corpus_ids(spark, state) == {2, 4}
    assert {r.doc_id for r in read_ingest_contaminated(spark, state).collect()} == {1, 3}

    # checkpoint loss: the source re-lists BOTH files into one replay
    # batch. State converges: corpus/indexes stay exactly {2, 4}, no
    # leak slips through, and the audit trail still names exactly
    # {1, 3} (it is a log like rejected/ — a catastrophic re-batching
    # replay may re-append an id under a new batch id, never lose one)
    shutil.rmtree(os.path.join(state, "checkpoint"))
    stream_corpus_ingest(spark, src, state, decon_spec=spec)
    assert _corpus_ids(spark, state) == {2, 4}
    assert {r.doc_id for r in read_ingest_contaminated(spark, state).collect()} == {1, 3}
    from data_migration_etl_scripts_spark.streaming.ingest import read_ingest_hashes

    # and the history indexes never absorbed a contaminated doc
    assert {r.doc_id for r in read_ingest_hashes(spark, state).collect()} == {2, 4}


def test_decon_gate_rejects_mismatched_index_params(spark, tmp_path):
    """A benchmark band index built with different (k, bands) than the
    ingest loop would produce ZERO band collisions — contamination
    passing silently. The stream must refuse to START (ADVICE r5)."""
    import pytest

    from data_migration_etl_scripts_spark.streaming.ingest import (
        write_benchmark_band_index,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    bench_dir = str(tmp_path / "bench_bands")
    os.makedirs(src)
    bench = spark.createDataFrame([(9001, BASE)], "doc_id long, text string")
    write_benchmark_band_index(bench, bench_dir, k=8, bands=2)  # != loop default
    _write_wave(spark, src, "w1", [(1, BASE)])
    with pytest.raises(ValueError, match="parameter mismatch"):
        stream_corpus_ingest(
            spark, src, state, decon_spec={"bands_dir": bench_dir}
        )
    # nothing was admitted or quarantined: the stream never started
    assert not os.path.isdir(os.path.join(state, "corpus"))

    # a parameterless index (e.g. hand-built) is rejected too
    import json as _json

    os.remove(os.path.join(bench_dir, "_decon_params.json"))
    with pytest.raises(ValueError, match="_decon_params.json"):
        stream_corpus_ingest(
            spark, src, state, decon_spec={"bands_dir": bench_dir}
        )

    # matching params start fine and still quarantine the leak
    with open(os.path.join(bench_dir, "_decon_params.json"), "w") as f:
        _json.dump({"k": 8, "bands": 2}, f)
    stream_corpus_ingest(
        spark, src, state, decon_spec={"bands_dir": bench_dir}, k=8, bands=2
    )
    assert _corpus_ids(spark, state) == set()


def test_read_ingest_contaminated_empty_schema_matches(spark, tmp_path):
    """Empty-case schema agrees with the quarantine rows' schema
    (ADVICE r5: it used to be a bare doc_id column)."""
    from data_migration_etl_scripts_spark.streaming.ingest import (
        read_ingest_contaminated,
    )

    empty = read_ingest_contaminated(spark, str(tmp_path / "nostate"))
    assert empty.columns == ["doc_id", "text"]
    custom = read_ingest_contaminated(
        spark, str(tmp_path / "nostate"), schema="doc_id long, text string, lang string"
    )
    assert custom.columns == ["doc_id", "text", "lang"]
