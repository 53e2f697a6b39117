"""WARC record parsing + the WARC -> HTML extraction funnel."""

import gzip

import pytest

from grafink_spark.llm import warc


def _recs():
    return [
        {"url": "http://a/1", "body": "<html><title>One</title><p>hi</p></html>"},
        {"url": "http://a/2", "rtype": "request", "body": "GET / HTTP/1.1"},
        {"url": "http://a/3", "body": b"\x89PNG", "content_type": "image/png"},
        {"url": "http://a/4", "body": "<p>gone</p>", "http_status": 404},
        {"url": "http://a/5", "body": "<body>ok</body>"},
    ]


def test_iter_warc_records_both_framings():
    """Gzip-member-per-record (the Common-Crawl convention) and plain
    concatenated records parse identically: requests skipped, response
    metadata + body bytes exact."""
    for compress in (True, False):
        out = list(warc.iter_warc_records(warc.make_warc(_recs(), compress)))
        assert [r["url"] for r in out] == [
            "http://a/1", "http://a/3", "http://a/4", "http://a/5",
        ]
        assert [r["status"] for r in out] == [200, 200, 404, 200]
        assert out[1]["content_type"] == "image/png"
        assert out[3]["body"] == b"<body>ok</body>"


def test_iter_warc_records_malformed_raises_value_error():
    w = warc.make_warc(_recs())
    bad_cases = (
        b"",
        b"garbage not warc",
        w[:40],  # truncated gzip member
        gzip.compress(b"WARC/1.0\r\nContent-Length: 999\r\n\r\nxx"),
        gzip.compress(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"),
        gzip.compress(b"NOPE/1.0\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n"),
    )
    for bad in bad_cases:
        with pytest.raises(ValueError):
            list(warc.iter_warc_records(bad))


def test_extract_warc_records_spark_funnel(spark):
    """Binary WARC payloads -> 1->N response rows -> HTML signals:
    html_only keeps text/html 200s; record_idx counts RESPONSE
    records; the html column feeds html_text_signals with passthrough
    columns."""
    from grafink_spark.llm.html import html_text_signals

    payloads = [(i, warc.make_warc(_recs())) for i in (1, 2)] + [(9, None)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = warc.extract_warc_records(df).collect()
    # per doc: responses 0(html 200), 1(png), 2(404), 3(html 200);
    # html_only keeps 0 and 3
    got = sorted((r.doc_id, r.record_idx, r.url) for r in rows)
    assert got == [
        (1, 0, "http://a/1"), (1, 3, "http://a/5"),
        (2, 0, "http://a/1"), (2, 3, "http://a/5"),
    ]
    sig = html_text_signals(
        warc.extract_warc_records(df), keep=["record_idx", "url"]
    ).collect()
    by = {(r.doc_id, r.record_idx): r for r in sig}
    assert by[(1, 0)].title == "One"
    assert by[(1, 0)].text == "One hi"
    assert by[(1, 3)].text == "ok"


def test_extract_warc_records_keep_all(spark):
    """html_only=False surfaces every response record (the
    datasheet/accounting path)."""
    df = spark.createDataFrame(
        [(1, warc.make_warc(_recs()))], "doc_id long, payload binary"
    )
    rows = warc.extract_warc_records(df, html_only=False).collect()
    assert sorted(r.record_idx for r in rows) == [0, 1, 2, 3]
    assert {r.http_status for r in rows} == {200, 404}


def test_extract_warc_records_quarantines_hostile_payload(spark):
    """ONE hostile payload (bad chunk framing) in a batch must cost
    its own rows only — not the task (and after retries the job): the
    round-7 advisor flagged that iter_warc_records' ValueError
    escaped the DataFrame funnel unwrapped. The hostile payload leads
    with a HEALTHY record so the test also proves partial rows from a
    poisoned payload are voided (a misparsed boundary can attribute
    one record's bytes to the next), while healthy payloads keep all
    their rows."""
    good_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: 11\r\n\r\n<p>fine</p>"
    )
    good_rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ok/first\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(good_http)
        + good_http
        + b"\r\n\r\n"
    )
    bad_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nzz\r\nhi\r\n0\r\n\r\n"
    )
    bad_rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/chunks\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(bad_http)
        + bad_http
        + b"\r\n\r\n"
    )
    hostile = good_rec + bad_rec  # healthy record FIRST, then poison
    with pytest.raises(ValueError):  # parser contract unchanged
        list(warc.iter_warc_records(hostile))
    df = spark.createDataFrame(
        [(1, warc.make_warc(_recs())), (2, hostile), (3, good_rec)],
        "doc_id long, payload binary",
    )
    acc = spark.sparkContext.accumulator(0)
    rows = warc.extract_warc_records(df, quarantined=acc).collect()
    got = sorted((r.doc_id, r.url) for r in rows)
    assert got == [
        (1, "http://a/1"),
        (1, "http://a/5"),
        (3, "http://ok/first"),
    ]
    # quarantines are observable (r9 advisor): exactly the one hostile
    # payload incremented the drop counter
    assert acc.value == 1


def test_negative_content_length_raises_not_hangs():
    """A negative Content-Length must quarantine (ValueError), never
    move the cursor backward and re-parse the same header forever."""
    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"Content-Length: -54\r\n\r\npayload\r\n\r\n"
    )
    with pytest.raises(ValueError, match="negative WARC Content-Length"):
        list(warc.iter_warc_records(rec))
    # and inside a gzip member, same contract
    with pytest.raises(ValueError):
        list(warc.iter_warc_records(gzip.compress(rec)))


def test_chunked_transfer_encoding_roundtrip():
    """Transfer-Encoding: chunked bodies reassemble to the original
    bytes through both framings; non-chunked siblings are untouched."""
    body = "<html><p>" + "chunk " * 40 + "</p></html>"
    recs = [
        {"url": "http://a/c", "body": body, "chunked": True},
        {"url": "http://a/p", "body": "<p>plain</p>"},
    ]
    for compress in (True, False):
        out = list(warc.iter_warc_records(warc.make_warc(recs, compress)))
        assert out[0]["body"] == body.encode()
        assert out[1]["body"] == b"<p>plain</p>"


def test_malformed_chunk_framing_quarantines():
    """Bad hex size, negative size, truncated chunk, missing CRLF —
    every framing defect is a ValueError, not a hang or IndexError."""
    def resp(chunk_body: bytes) -> bytes:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunk_body
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://x\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(http)
            + http
            + b"\r\n\r\n"
        )

    bad = (
        b"zz\r\nhi\r\n0\r\n\r\n",      # non-hex size
        b"-5\r\nhi\r\n0\r\n\r\n",      # negative size
        b"ff\r\nhi\r\n0\r\n\r\n",      # size beyond end
        b"2\r\nhi",                     # missing CRLF + terminator
        b"2\r\nhiXX0\r\n\r\n",          # wrong chunk-data terminator
        b"2\r\nhi\r\n",                 # no zero chunk
    )
    for cb in bad:
        with pytest.raises(ValueError):
            list(warc.iter_warc_records(resp(cb)))
    ok = list(warc.iter_warc_records(resp(b"2;ext=1\r\nhi\r\n0\r\n\r\n")))
    assert ok[0]["body"] == b"hi"  # chunk extensions are ignored


def test_charset_fallback_decode(spark):
    """Declared charset wins; undeclared valid UTF-8 decodes as UTF-8;
    an unknown charset label falls back without raising; Text/HTML
    passes the html_only filter case-insensitively."""
    recs = [
        {"url": "http://a/u", "body": "<p>héllo — utf</p>".encode()},
        {
            "url": "http://a/l",
            "body": "<p>caf\xe9</p>".encode("cp1252"),
            "content_type": 'text/html; charset="cp1252"',
        },
        {
            "url": "http://a/x",
            "body": b"<p>\xff raw</p>",
            "content_type": "Text/HTML; charset=not-a-codec",
        },
    ]
    df = spark.createDataFrame(
        [(1, warc.make_warc(recs))], "doc_id long, payload binary"
    )
    rows = {r.url: r for r in warc.extract_warc_records(df).collect()}
    assert rows["http://a/u"].html == "<p>héllo — utf</p>"
    assert rows["http://a/l"].html == "<p>café</p>"
    # \xff alone is invalid UTF-8 → latin-1 fallback, lossless per byte
    assert rows["http://a/x"].html == "<p>\xff raw</p>"
    assert len(rows) == 3  # Text/HTML survived the case-insensitive gate


def test_warc_fuzz_quarantine_contract():
    """Mutation fuzz (flips/truncations/splices over both framings):
    the parser surfaces only ValueError — never zlib.error/IndexError/
    struct.error — so one corrupt crawl file can't kill a Spark task."""
    import random

    rnd = random.Random(99)
    recs = [
        {"url": "http://a/1", "body": "<html><p>hi</p></html>"},
        {"url": "http://a/2", "rtype": "request", "body": "GET /"},
        {"url": "http://a/3", "body": b"\x89PNG", "content_type": "image/png"},
        {"url": "http://a/4", "body": "<p>chunked body</p>", "chunked": True},
    ]
    for compress in (True, False):
        payload = warc.make_warc(recs, compress)
        for _ in range(600):
            b = bytearray(payload)
            for _ in range(rnd.randrange(1, 6)):
                op = rnd.random()
                if op < 0.5 and len(b) > 1:
                    b[rnd.randrange(len(b))] = rnd.randrange(256)
                elif op < 0.8 and len(b) > 4:
                    b = b[: rnd.randrange(1, len(b))]
                else:
                    at = rnd.randrange(len(b))
                    b[at:at] = bytes(
                        rnd.randrange(256) for _ in range(rnd.randrange(8))
                    )
            try:
                list(warc.iter_warc_records(bytes(b)))
            except ValueError:
                pass
