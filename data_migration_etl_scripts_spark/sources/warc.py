"""WARC container (ISO 28500 — the CommonCrawl archive format):
record writer + parser + Spark reader, completing the web-corpus
front end. A crawl pipeline is WARC -> HTTP envelope -> HTML ->
text (`operators/html.py`) -> filters/dedup — everything after the
first arrow already exists; this module supplies the first.

WARC is a pure structural text format (version line, RFC-822-style
named headers, Content-Length-framed block, CRLF CRLF separator,
optionally one gzip MEMBER per record — the form CommonCrawl ships):
zero tabulated spec data, so like RIFF and FLAC it is EXACT under
the codec policy. Both plain and per-record-gzip streams parse; the
writer emits either. HTTP response blocks split into (status,
headers, body) with Content-Type charset handling left to the
caller (payloads stay bytes).

Spark surface: :func:`read_warc` fans WARC blobs out to one row per
record inside Arrow-batched ``mapInPandas`` — the same per-file
kernel shape as the media codecs; at 100 TB the blobs arrive from
``spark.read.format("binaryFile")`` over the crawl bucket and every
downstream transform (HTML extract, blocklist, dedup) is map-side
column work."""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

CRLF = b"\r\n"


def _record_id(seed: str) -> str:
    """Deterministic urn:uuid record id (md5-derived — stable fixture
    ids; a live crawler would use uuid4)."""
    h = hashlib.md5(seed.encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def warc_write(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Records -> WARC/1.0 bytes. Each record dict:
    ``warc_type`` (warcinfo/request/response/...), ``uri`` (optional),
    ``date`` (ISO-8601), ``content_type``, ``payload`` bytes, and
    optionally ``record_id`` (defaults to a deterministic urn:uuid of
    type+uri+index). ``per_record_gzip`` emits one gzip member per
    record — the CommonCrawl packaging."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID",
             rec.get("record_id")
             or _record_id(f"{rec['warc_type']}|{rec.get('uri', '')}|{i}")),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
            ("Content-Type", rec.get("content_type",
                                     "application/octet-stream")),
        ]
        if rec.get("uri"):
            headers.append(("WARC-Target-URI", rec["uri"]))
        block = bytearray(b"WARC/1.0" + CRLF)
        for k, v in headers:
            block += f"{k}: {v}".encode() + CRLF
        block += CRLF + payload + CRLF + CRLF
        if per_record_gzip:
            out += gzip.compress(bytes(block), mtime=0)
        else:
            out += block
    return bytes(out)


def _split_gzip_members(b: bytes) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one member at
    a time (the WARC-record-per-member layout)."""
    pos = 0
    while pos < len(b):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(b[pos:])
        yield chunk + d.flush()
        consumed = len(b) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: stuck gzip member")
        pos += consumed


def warc_records(b: bytes) -> Iterator[dict]:
    """WARC bytes (plain or per-record-gzip) -> record dicts:
    ``headers`` (dict, original names case-preserved), ``warc_type``,
    ``uri``, ``record_id``, ``date``, ``content_type``, ``payload``.
    Loud on framing errors (bad version line, missing Content-Length,
    short block)."""
    if b[:2] == b"\x1f\x8b":
        for member in _split_gzip_members(b):
            yield from _parse_plain(member)
    else:
        yield from _parse_plain(b)


def _parse_plain(b: bytes) -> Iterator[dict]:
    pos = 0
    n = len(b)
    while pos < n:
        # tolerate inter-record CRLFs
        while pos < n and b[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        eol = b.find(CRLF, pos)
        if eol < 0:
            raise ValueError("WARC: truncated version line")
        version = b[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = b.find(CRLF, pos)
            if eol < 0:
                raise ValueError("WARC: truncated header block")
            line = b[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t") and headers:
                headers[last] += " " + line.strip().decode("utf-8", "replace")
                continue
            name, _sep, value = line.partition(b":")
            last = name.decode("utf-8", "replace").strip()
            headers[last] = value.decode("utf-8", "replace").strip()
        lower = {k.lower(): v for k, v in headers.items()}
        if "content-length" not in lower:
            raise ValueError("WARC: record missing Content-Length")
        length = int(lower["content-length"])
        payload = b[pos:pos + length]
        if len(payload) != length:
            raise ValueError("WARC: block shorter than Content-Length")
        pos += length
        yield {
            "headers": headers,
            "warc_type": lower.get("warc-type", ""),
            "uri": lower.get("warc-target-uri", ""),
            "record_id": lower.get("warc-record-id", ""),
            "date": lower.get("warc-date", ""),
            "content_type": lower.get("content-type", ""),
            "payload": payload,
        }


def http_response_payload(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response block of a WARC response record -> (status,
    headers lower-cased, body bytes)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP: no header/body separator")
    head = block[:sep].decode("iso-8859-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"HTTP: bad status line {lines[0]!r}")
    status = int(parts[1])
    headers = {}
    for line in lines[1:]:
        name, _s, value = line.partition(":")
        headers[name.strip().lower()] = value.strip()
    return status, headers, block[sep + 4:]


WARC_ROW_SCHEMA = (
    "warc_path string, record_id string, warc_type string, uri string, "
    "warc_date string, content_type string, http_status int, "
    "payload binary"
)


def read_warc(df: DataFrame, path_col: str = "path",
              content_col: str = "content") -> DataFrame:
    """(path, WARC blob) rows -> one row per WARC record. Response
    records carry their HTTP envelope split off (http_status set,
    payload = body); other record types pass their block through with
    http_status NULL. Pair with ``spark.read.format('binaryFile')``
    over a crawl bucket."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("warc_path", "record_id", "warc_type",
                                   "uri", "warc_date", "content_type",
                                   "http_status", "payload")}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    continue
                for rec in warc_records(bytes(content)):
                    status, body = None, rec["payload"]
                    if rec["warc_type"] == "response" and body[:5] == b"HTTP/":
                        status, _h, body = http_response_payload(body)
                    out["warc_path"].append(path)
                    out["record_id"].append(rec["record_id"])
                    out["warc_type"].append(rec["warc_type"])
                    out["uri"].append(rec["uri"])
                    out["warc_date"].append(rec["date"])
                    out["content_type"].append(rec["content_type"])
                    out["http_status"].append(status)
                    out["payload"].append(body)
            yield pd.DataFrame(out)

    return df.select(path_col, content_col).mapInPandas(
        kernel, schema=WARC_ROW_SCHEMA
    )


def warc_docs(df: DataFrame, min_chars: int = 1) -> DataFrame:
    """WARC blobs -> corpus-ready documents: records ->
    200/HTML responses -> text extraction (`operators/html.py`) ->
    (doc_id, url, text, n_chars, link_density) with ``doc_id`` =
    xxhash64 of the URL (deterministic, collision-safe at crawl
    scale). The output schema slots straight into the text pipeline —
    dedup, quality filters, and `streaming/ingest.stream_corpus_ingest`
    (crawl -> corpus end to end; see tests/test_warc.py)."""
    from pyspark.sql import functions as F

    from data_migration_etl_scripts_spark.operators import html as hx

    recs = read_warc(df)
    pages = recs.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").contains("http")
    ).select("uri", F.col("payload").cast("string").alias("html"))
    out = hx.extract_text(pages, "uri", "html")
    return out.where(F.col("n_chars") >= min_chars).select(
        F.xxhash64("uri").alias("doc_id"),
        F.col("uri").alias("url"),
        F.col("text_clean").alias("text"),
        "n_chars",
        "link_density",
    )


def synthetic_warc_blobs(n_files: int = 2, pages_per_file: int = 3):
    """Deterministic (path, warc_bytes, expected) fixture shared by
    the board query and its oracle: each file holds a warcinfo record
    plus request+response pairs; response payloads are HTML pages
    built from a fixed template. Odd files are per-record-gzip (the
    CommonCrawl packaging), even files plain. Returns
    (rows, page_htmls) where page_htmls maps uri -> html string."""
    pages = {}
    rows = []
    for f in range(n_files):
        records = [{
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: engine-fixture/1.0\r\n",
        }]
        for p in range(pages_per_file):
            uri = f"http://site{f}.example/page{p}"
            html = (
                f"<html><head><title>Doc {f}.{p}</title>"
                f"<style>body{{color:red}}</style></head>"
                f"<body><h1>Heading {f}-{p}</h1>"
                f"<p>Paragraph one of page {p} on site {f}. "
                f"It has enough words to pass a length gate.</p>"
                f"<script>var x = {p};</script>"
                f"<p>Second paragraph with a <a href='/l{p}'>link "
                f"l{p}</a> inside.</p>"
                f"<!-- hidden comment {f}.{p} --></body></html>"
            )
            pages[uri] = html
            records.append({
                "warc_type": "request",
                "uri": uri,
                "content_type": "application/http;msgtype=request",
                "payload": (f"GET /page{p} HTTP/1.1\r\n"
                            f"Host: site{f}.example\r\n\r\n").encode(),
            })
            records.append({
                "warc_type": "response",
                "uri": uri,
                "content_type": "application/http;msgtype=response",
                "payload": (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html; charset=utf-8\r\n"
                            b"\r\n" + html.encode()),
            })
        blob = warc_write(records, per_record_gzip=bool(f % 2))
        rows.append((f"fixture/{f:04d}.warc" + (".gz" if f % 2 else ""),
                     bytearray(blob)))
    return rows, pages
