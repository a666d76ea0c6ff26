"""WARC container (sources/warc.py): framing round trips (plain and
per-record-gzip), header parsing incl. folded continuations, HTTP
envelope splitting, framing-error handling, the Spark read_warc
fan-out, and binaryFile-source integration.

Reference parity note: the reference ETL repo reads CSV/JSONL/ORC
files; WARC is the LLM-data-pipeline addendum's crawl-ingestion
source (SURVEY.md web-corpus front end)."""

from __future__ import annotations

import gzip

import pytest

from data_migration_etl_scripts_spark.sources import warc as wc


def _one_response(html=b"<html><p>hi</p></html>", uri="http://x.example/"):
    return {
        "warc_type": "response",
        "uri": uri,
        "content_type": "application/http;msgtype=response",
        "payload": (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html),
    }


def test_roundtrip_plain_and_gzip():
    records = [
        {"warc_type": "warcinfo",
         "content_type": "application/warc-fields",
         "payload": b"software: t\r\n"},
        _one_response(),
    ]
    for gz in (False, True):
        blob = wc.warc_write(records, per_record_gzip=gz)
        got = list(wc.warc_records(blob))
        assert [r["warc_type"] for r in got] == ["warcinfo", "response"]
        assert got[1]["uri"] == "http://x.example/"
        assert got[1]["payload"] == records[1]["payload"]
        assert got[0]["record_id"].startswith("<urn:uuid:")


def test_writer_deterministic():
    records = [_one_response()]
    assert wc.warc_write(records) == wc.warc_write(records)
    assert (wc.warc_write(records, per_record_gzip=True)
            == wc.warc_write(records, per_record_gzip=True))


def test_gzip_members_are_per_record():
    records = [_one_response(uri=f"http://x/{i}") for i in range(3)]
    blob = wc.warc_write(records, per_record_gzip=True)
    members = list(wc._split_gzip_members(blob))
    assert len(members) == 3
    # each member is itself a full WARC record
    for m, rec in zip(members, records):
        (got,) = wc._parse_plain(m)
        assert got["uri"] == rec["uri"]


def test_header_continuation_folding():
    blob = (b"WARC/1.0\r\n"
            b"WARC-Type: metadata\r\n"
            b"X-Long: first part\r\n"
            b"  folded tail\r\n"
            b"Content-Length: 2\r\n"
            b"\r\nok\r\n\r\n")
    (rec,) = wc.warc_records(blob)
    assert rec["headers"]["X-Long"] == "first part folded tail"
    assert rec["payload"] == b"ok"


def test_framing_errors_loud():
    with pytest.raises(ValueError, match="version"):
        list(wc.warc_records(b"HELO/1.0\r\nContent-Length: 0\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(wc.warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    with pytest.raises(ValueError, match="shorter"):
        list(wc.warc_records(
            b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"))
    ok = wc.warc_write([_one_response()])
    with pytest.raises(ValueError):
        list(wc.warc_records(ok[: len(ok) // 2]))


def test_http_split():
    st, headers, body = wc.http_response_payload(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone")
    assert (st, body) == (404, b"gone")
    assert headers["content-type"] == "text/plain"
    with pytest.raises(ValueError, match="separator"):
        wc.http_response_payload(b"HTTP/1.1 200 OK\r\nno-body")
    with pytest.raises(ValueError, match="status"):
        wc.http_response_payload(b"not-http\r\n\r\nx")


def test_read_warc_spark_rows(spark):
    rows, pages = wc.synthetic_warc_blobs(2, 3)
    df = spark.createDataFrame(rows, "path string, content binary")
    got = wc.read_warc(df).collect()
    assert len(got) == 14  # 2 files x (warcinfo + 3x(request+response))
    resp = [r for r in got if r.warc_type == "response"]
    assert len(resp) == 6
    assert all(r.http_status == 200 for r in resp)
    for r in resp:
        assert bytes(r.payload).decode() == pages[r.uri]
    reqs = [r for r in got if r.warc_type == "request"]
    assert all(r.http_status is None for r in reqs)


def test_warc_to_corpus_ingest_end_to_end(spark, tmp_path):
    """Crawl -> corpus: WARC blobs -> warc_docs -> the streaming
    dedup-admit loop. A re-crawl of the same pages (different WARC
    file, same HTML) must be rejected as duplicate history."""
    import glob
    import shutil

    from data_migration_etl_scripts_spark.streaming.ingest import (
        read_ingest_corpus,
        stream_corpus_ingest,
    )

    src = tmp_path / "src"
    state = str(tmp_path / "state")
    src.mkdir()

    def land_docs(name, blobs):
        df = spark.createDataFrame(blobs, "path string, content binary")
        docs = wc.warc_docs(df).select("doc_id", "text")
        staged = tmp_path / f"stage_{name}"
        docs.coalesce(1).write.parquet(str(staged))
        part = glob.glob(str(staged / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{name}.parquet")

    rows, pages = wc.synthetic_warc_blobs(2, 3)
    land_docs("crawl1", rows)
    stream_corpus_ingest(spark, str(src), state)
    admitted = read_ingest_corpus(spark, state).collect()
    assert len(admitted) == 6  # every page is a distinct doc

    # re-crawl: same pages in a fresh WARC file -> all exact dups
    land_docs("crawl2", rows)
    stream_corpus_ingest(spark, str(src), state)
    assert len(read_ingest_corpus(spark, state).collect()) == 6


def test_read_warc_binaryfile_source(spark, tmp_path):
    rows, pages = wc.synthetic_warc_blobs(2, 2)
    for path, blob in rows:
        p = tmp_path / path.split("/")[-1]
        p.write_bytes(bytes(blob))
    df = spark.read.format("binaryFile").load(str(tmp_path))
    got = wc.read_warc(df).where("warc_type = 'response'").collect()
    assert len(got) == 4
    assert {bytes(r.payload).decode() for r in got} == set(pages.values())
