"""WARC (ISO 28500) record parsing — the web-corpus ingest step.

Common-Crawl-scale pipelines start from WARC: gzip members (one per
record) of ``WARC/1.x`` header blocks + content. Both layers are
stdlib: :mod:`gzip` decompresses multi-member streams, the header
grammar is named-field/CRLF. This module turns a binary WARC payload
column into one row per response record — (url, date, content-type,
http status, body bytes) — the 1→N ``mapInPandas`` contract the media
codecs already use, feeding straight into the HTML extraction
operators (:mod:`grafink_spark.llm.html`).

Scale shape: WARC files are processed as OPAQUE BINARY UNITS (a real
deployment reads them with ``binaryFile`` or a custom datasource and
keeps one file per task) — record splitting, gzip inflation, and HTTP
header stripping all happen executor-side inside one Arrow batch; only
the extracted text/metadata rows ever shuffle. Malformed records raise
ValueError (quarantine contract), and ``iter_warc_records`` skips
non-response records the way corpus pipelines do (request/metadata
records carry no training text).
"""

from __future__ import annotations

import gzip
import io
import re
import struct  # noqa: F401  (parity with sibling codec modules)
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_warc(records: list[dict], compress: bool = True) -> bytes:
    """Fixture/test encoder: records → WARC bytes. Each record dict:
    ``{"url", "date", "rtype" (default 'response'), "http_status"
    (default 200), "content_type" (default 'text/html'), "body"}``.
    ``compress=True`` writes one gzip member PER RECORD (the
    Common-Crawl convention that makes records independently
    seekable)."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
        rtype = r.get("rtype", "response")
        if rtype == "response":
            if r.get("chunked"):
                # RFC 9112 §7.1 chunked framing, split in two chunks so
                # the reassembly path is actually exercised
                half = max(1, len(body) // 2)
                chunks = [c for c in (body[:half], body[half:]) if c]
                framed = (
                    b"".join(
                        b"%x\r\n%s\r\n" % (len(c), c) for c in chunks
                    )
                    + b"0\r\n\r\n"
                )
                http = (
                    f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
                    f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
                    "Transfer-Encoding: chunked\r\n\r\n"
                ).encode()
                body = framed
            else:
                http = (
                    f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
                    f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
            content = http + body
            ctype = "application/http; msgtype=response"
        else:
            content = body
            ctype = r.get("content_type", "application/warc-fields")
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r.get('url', '')}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(content)}\r\n\r\n"
        ).encode()
        rec = hdr + content + b"\r\n\r\n"
        out += gzip.compress(rec) if compress else rec
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if b":" not in line:
            raise ValueError("malformed WARC header line")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin1").lower()] = v.strip().decode("latin1")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Reassemble an HTTP/1.1 ``Transfer-Encoding: chunked`` body
    (RFC 9112 §7.1): hex size line (chunk extensions after ``;``
    ignored) → chunk data → CRLF, terminated by a zero-size chunk
    (trailer fields, if any, are ignored). Any framing defect raises
    ValueError — the quarantine contract; a malformed chunk size in
    untrusted crawl bytes must never escape as a different exception
    or an infinite loop."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("truncated chunk-size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"malformed chunk size {size_tok!r}") from e
        if size < 0:
            raise ValueError("negative chunk size")
        pos = nl + 2
        if size == 0:
            return bytes(out)
        hi = pos + size
        if hi + 2 > len(body):
            raise ValueError("chunk data beyond end of body")
        if body[hi : hi + 2] != b"\r\n":
            raise ValueError("missing CRLF after chunk data")
        out += body[pos:hi]
        pos = hi + 2


def _decode_body(body: bytes, content_type: str) -> str:
    """Decode a response body: the declared ``charset=`` parameter
    first (case-insensitive, quotes tolerated), then UTF-8, then
    latin-1 — which is total (every byte sequence decodes), so the
    decode NEVER raises. Real crawls mix charsets freely; a wrong
    or unknown label must degrade to lossless-per-byte text, not
    kill the task."""
    m = re.search(r"charset=[\"']?([\w.:-]+)", content_type, re.I)
    for enc in ([m.group(1)] if m else []) + ["utf-8"]:
        try:
            return body.decode(enc)
        except (LookupError, UnicodeDecodeError, ValueError):
            continue
    return body.decode("latin1")


def iter_warc_records(payload: bytes) -> Iterator[dict]:
    """Yield response records from a WARC payload (gzip multi-member
    or plain): ``{"url", "date", "status", "content_type", "body"}``.
    Non-response records (warcinfo/request/metadata) are skipped; a
    structurally broken record raises ValueError."""
    if payload is None or len(payload) < 4:
        raise ValueError("not a WARC payload")
    if payload[:2] == b"\x1f\x8b":
        import zlib

        try:
            with gzip.GzipFile(fileobj=io.BytesIO(payload)) as gz:
                data = gz.read()
        except (OSError, EOFError, zlib.error) as e:
            # zlib.error is NOT an OSError — without it a corrupt
            # deflate body escapes the ValueError quarantine contract
            raise ValueError(f"malformed WARC gzip stream: {e}") from e
    else:
        data = payload
    pos = 0
    while pos < len(data):
        # tolerate inter-record CRLF padding
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError("WARC record does not start with version line")
        ver_end = data.find(b"\r\n", pos)
        hdr_end = data.find(b"\r\n\r\n", pos)
        if ver_end < 0 or hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(data[ver_end + 2 : hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        if length < 0:
            # a negative length would move pos BACKWARD and re-parse
            # the same header forever — the one non-progress case in
            # this loop, so it must be a hard quarantine error
            raise ValueError(f"negative WARC Content-Length {length}")
        content_lo = hdr_end + 4
        content_hi = content_lo + length
        if content_hi > len(data):
            raise ValueError("WARC content beyond end of payload")
        if headers.get("warc-type") == "response":
            content = data[content_lo:content_hi]
            http_end = content.find(b"\r\n\r\n")
            if http_end < 0 or not content.startswith(b"HTTP/"):
                raise ValueError("WARC response record missing HTTP headers")
            status_line = content.split(b"\r\n", 1)[0].split(b" ")
            try:
                status = int(status_line[1])
            except (IndexError, ValueError) as e:
                raise ValueError("malformed HTTP status line") from e
            first_crlf = content.find(b"\r\n")
            http_headers = _parse_headers(content[first_crlf + 2 : http_end])
            body = content[http_end + 4 :]
            if "chunked" in http_headers.get("transfer-encoding", "").lower():
                body = _dechunk(body)
            yield {
                "url": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "status": status,
                "content_type": http_headers.get("content-type", ""),
                "body": body,
            }
        pos = content_hi


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_warc_records(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    html_only: bool = True,
    quarantined=None,
) -> DataFrame:
    """1→N record extraction over binary WARC payloads: one row per
    response record with its decoded HTML (declared charset → UTF-8 →
    latin-1 fallback, so the decode is total) and transfer metadata.
    Chunked transfer-encoding bodies are reassembled by the record
    parser before they get here. ``html_only`` keeps text/html 200s
    (content-type compared case-insensitively) — the corpus-prep
    default. Narrow Arrow map; WARC bytes never leave the executor.

    The QUARANTINE happens HERE, per payload: ``iter_warc_records``
    raises ValueError on hostile framing (bad chunk sizes, negative
    Content-Length, malformed headers — its documented contract), and
    one poisoned crawl file must cost its own rows, not the task and,
    after retries, the whole job. A framing error also voids the
    payload's already-parsed records — a misparsed boundary can
    attribute one record's bytes to the next — so the offending
    payload contributes zero rows; every healthy payload in the batch
    is unaffected.

    Quarantines are OBSERVABLE (r9 advisor: a silently dropped crawl
    file is indistinguishable from an empty one): every quarantined
    payload increments a Spark accumulator and logs its doc_id to the
    executor's stderr. Pass ``quarantined`` (an
    ``sparkContext.accumulator(0)``) to read the count after an
    action; left None, one is still created so the executor-side log
    line always fires."""
    import sys

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("_p"))
    if quarantined is None:
        quarantined = df.sparkSession.sparkContext.accumulator(0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["_p"]):
                if payload is None:
                    continue
                # resolved OUTSIDE the try: a null/NaN doc_id is a
                # schema violation that must fail loudly, not be
                # misclassified as hostile WARC framing
                did = int(doc_id)
                try:
                    # the try covers ONLY the parser (the generator is
                    # fully drained here): row assembly below runs
                    # outside it, so a future bug there fails loudly
                    # instead of masquerading as hostile framing
                    recs = list(iter_warc_records(bytes(payload)))
                except ValueError as e:
                    # quarantined: this payload yields no rows
                    quarantined.add(1)
                    print(
                        f"WARC quarantine: doc_id={did}: {e}",
                        file=sys.stderr,
                    )
                    continue
                for idx, rec in enumerate(recs):
                    # header KEYS are lowered by the parser; VALUES
                    # are not — real crawls carry 'Text/HTML' etc.
                    if html_only and (
                        rec["status"] != 200
                        or not rec["content_type"]
                        .lower()
                        .startswith("text/html")
                    ):
                        continue
                    rows.append(
                        {
                            "doc_id": did,
                            "record_idx": idx,
                            "url": rec["url"],
                            "warc_date": rec["date"],
                            "http_status": rec["status"],
                            "content_type": rec["content_type"],
                            "html": _decode_body(
                                rec["body"], rec["content_type"]
                            ),
                            "n_bytes": len(rec["body"]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA]
            )

    return src.mapInPandas(run, WARC_RECORD_SCHEMA)
