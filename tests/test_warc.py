"""WARC source: serializer/parser round-trip, quarantine resync, gzip
members, distributed read, and the docs bridge."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.sources import warc


def _resp(i: int, body: bytes = None, **kw) -> bytes:
    return warc.make_warc_response(
        uri=f"https://example.com/doc/{i}",
        body=body if body is not None else f"<html>page {i}</html>".encode(),
        **kw,
    )


def test_roundtrip_single_record():
    rec = _resp(1)
    rows = list(warc.parse_warc_bytes(rec, file="f"))
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "https://example.com/doc/1"
    assert r["http_status"] == 200
    assert r["http_content_type"].startswith("text/html")
    assert r["payload"] == b"<html>page 1</html>"
    assert r["n_bytes"] == len(r["payload"])
    assert r["error"] is None


def test_multi_record_offsets_and_warcinfo():
    stream = warc.make_warcinfo("f.warc") + _resp(1) + _resp(2) + _resp(3)
    rows = list(warc.parse_warc_bytes(stream))
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response", "response", "response"]
    # offsets strictly increasing and aligned to record starts
    offs = [r["record_offset"] for r in rows]
    assert offs == sorted(offs) and offs[0] == 0
    assert [r["target_uri"] for r in rows[1:]] == [
        f"https://example.com/doc/{i}" for i in (1, 2, 3)
    ]


def test_gzip_multi_member_stream():
    members = [gzip.compress(m, mtime=0) for m in (_resp(1), _resp(2))]
    rows = list(warc.parse_warc_bytes(b"".join(members)))
    assert [r["target_uri"] for r in rows] == [
        "https://example.com/doc/1", "https://example.com/doc/2"
    ]
    assert all(r["error"] is None for r in rows)


def test_quarantine_resync_bad_magic():
    junk = b"NOT-A-WARC-RECORD some garbage bytes"
    stream = _resp(1) + junk + CRLF_JOIN(_resp(2))
    rows = list(warc.parse_warc_bytes(stream))
    kinds = [(r["warc_type"], r["error"]) for r in rows]
    assert kinds[0] == ("response", None)
    assert kinds[1][1] == "no WARC/1.x magic"
    assert rows[1]["payload"].startswith(b"NOT-A-WARC-RECORD")
    # parser resynchronized: record 2 parses clean
    assert kinds[2] == ("response", None)
    assert rows[2]["target_uri"] == "https://example.com/doc/2"


def CRLF_JOIN(rec: bytes) -> bytes:
    # junk is quarantined up to the \r\nWARC/1. boundary; give record 2 its
    # leading CRLF so the boundary exists
    return b"\r\n" + rec


def test_quarantine_missing_content_length():
    rec = warc.make_warc_record(
        {"WARC-Type": "response", "WARC-Target-URI": "https://x/1"}, b"body"
    )
    # strip the Content-Length line the serializer appended
    broken = b"\r\n".join(
        ln for ln in rec.split(b"\r\n") if not ln.startswith(b"Content-Length")
    )
    rows = list(warc.parse_warc_bytes(broken + b"\r\n" + _resp(2)))
    assert rows[0]["error"] == "missing/invalid Content-Length"
    assert rows[1]["target_uri"] == "https://example.com/doc/2"
    assert rows[1]["error"] is None


def test_truncated_tail_is_quarantined_not_lost():
    rec = _resp(1)
    rows = list(warc.parse_warc_bytes(rec[: len(rec) - 30]))
    assert len(rows) == 1
    assert rows[0]["error"] == "truncated record"
    assert rows[0]["warc_type"] == "response"  # headers survived


def test_unterminated_header_block():
    rows = list(warc.parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n"))
    assert rows[0]["error"] == "unterminated header block"


def test_non_http_payload_passthrough():
    rec = warc.make_warc_record(
        {
            "WARC-Type": "resource",
            "WARC-Target-URI": "https://x/r",
            "Content-Type": "application/octet-stream",
        },
        b"\x00\x01binary",
    )
    rows = list(warc.parse_warc_bytes(rec))
    assert rows[0]["warc_type"] == "resource"
    assert rows[0]["http_status"] is None
    assert rows[0]["payload"] == b"\x00\x01binary"


def test_read_warc_distributed_and_docs_bridge(spark, tmp_path):
    f1 = tmp_path / "a.warc"
    f2 = tmp_path / "b.warc.gz"
    warc.write_warc_file(
        str(f1), [warc.make_warcinfo("a.warc"), _resp(1), _resp(2, status=404)]
    )
    warc.write_warc_file(
        str(f2),
        [warc.make_warc_response(
            uri=f"https://WWW.Example.COM:443/doc/{i}?utm_source=x",
            body=f"<html>page {i}</html>".encode(),
            gzip_member=True,
        ) for i in (3, 4)],
    )
    df = warc.read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = {r["target_uri"]: r.asDict() for r in df.collect() if r["warc_type"] == "response"}
    assert len(rows) == 4
    assert rows["https://example.com/doc/2"]["http_status"] == 404
    docs = warc.warc_to_docs(df).orderBy("doc_id").collect()
    # 404 filtered out; gzip-file URIs canonicalized (host lowercased, www +
    # default port + tracking param stripped)
    assert [d["doc_id"] for d in docs] == [
        "https://example.com/doc/1",
        "https://example.com/doc/3",
        "https://example.com/doc/4",
    ]
    assert docs[1]["text"] == "<html>page 3</html>"


def test_warc_roundtrip_operator_matches_direct_compute(spark):
    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("<html><body>doc "), F.col("id").cast("string"),
                 F.lit("</body></html>")).alias("body"),
    )
    out = {r["target_uri"]: r.asDict() for r in warc.warc_roundtrip(df).collect()}
    assert len(out) == 40 + 4          # + a 301 record per doc_id % 11 == 0
    for i in range(40):
        body = f"<html><body>doc {i}</body></html>".encode()
        r = out[f"https://example.com/doc/{i}"]
        assert r["http_status"] == (404 if i % 7 == 0 else 200)
        assert r["n_bytes"] == len(body)
        assert r["payload_md5"] == hashlib.md5(body).hexdigest()
        if i % 11 == 0:
            rr = out[f"https://example.com/doc/r/{i}"]
            assert rr["http_status"] == 301 and rr["n_bytes"] == 0
            assert rr["payload_md5"] == hashlib.md5(
                f"/moved/{i}".encode()).hexdigest()


def test_warc_roundtrip_partitioning_invariant(spark):
    df = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("body"),
    )
    a = sorted(map(tuple, warc.warc_roundtrip(df.coalesce(1)).collect()))
    b = sorted(map(tuple, warc.warc_roundtrip(df.repartition(7)).collect()))
    assert a == b


def test_charset_detection_and_split_decode(spark):
    euro_1252 = "price: 100€ café".encode("cp1252")
    cases = [
        # (uri, body_bytes, content_type, expected_text_contains)
        ("https://x/h", euro_1252, "text/html; charset=windows-1252", "café"),
        ("https://x/m",
         b'<html><head><meta charset="ISO-8859-1"></head>caf\xe9</html>',
         "text/html", "caf\xe9"),
        ("https://x/q",
         b"<meta http-equiv=Content-Type content=\"text/html; charset=iso-8859-1\">caf\xe9",
         "text/html", "caf\xe9"),
        # undeclared utf-16 without a BOM is undetectable: must not crash,
        # decodes leniently as utf-8 (ASCII survives interleaved with NULs)
        ("https://x/b", "bom café".encode("utf-16-le"), None, "b\x00o\x00m"),
        ("https://x/u", "plain café".encode("utf-8"), "text/html", "café"),
        ("https://x/bad", b"broken \xff\xfe\x41 declared",
         "text/html; charset=not-a-codec", "declared"),
    ]
    rows = []
    for uri, body, ctype, _ in cases:
        rec = warc.make_warc_response(uri=uri, body=body)
        parsed = list(warc.parse_warc_bytes(rec))[0]
        if ctype is None:
            parsed["http_content_type"] = None
        else:
            parsed["http_content_type"] = ctype
        rows.append(parsed)
    df = spark.createDataFrame(rows, warc.WARC_RECORDS)
    # BOM case has no BOM prefix from encode('utf-16-le'); prepend one
    docs = warc.warc_to_docs(df, charset=None)
    got = {r["url"]: r["text"] for r in docs.collect()}
    for uri, _, _, want in cases:
        assert want in got[uri], (uri, got[uri])


def test_charset_bom_utf16(spark):
    import codecs

    body = codecs.BOM_UTF16_LE + "café utf16".encode("utf-16-le")
    rec = warc.make_warc_response(uri="https://x/b16", body=body)
    parsed = list(warc.parse_warc_bytes(rec))[0]
    parsed["http_content_type"] = "text/html"   # no charset param
    df = spark.createDataFrame([parsed], warc.WARC_RECORDS)
    text = warc.warc_to_docs(df, charset=None).head()["text"]
    assert "café utf16" in text


def test_fixed_charset_stays_jvm_side(spark):
    """charset='utf-8' (the default) must not introduce a Python stage."""
    df = spark.createDataFrame(
        [list(warc.parse_warc_bytes(warc.make_warc_response(
            uri="https://x/1", body=b"abc")))[0]],
        warc.WARC_RECORDS,
    )
    plan = warc.warc_to_docs(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_redirect_location_parse_and_edges(spark):
    recs = [
        warc.make_warc_redirect("https://a.com/old", "https://WWW.A.com/new?utm_source=x"),
        warc.make_warc_redirect("https://a.com/r1", "/moved/here", status=302),
        _resp(5),
    ]
    rows = list(warc.parse_warc_bytes(b"".join(recs)))
    assert rows[0]["http_status"] == 301
    assert rows[0]["http_location"] == "https://WWW.A.com/new?utm_source=x"
    assert rows[2]["http_location"] is None
    df = spark.createDataFrame(rows, warc.WARC_RECORDS)
    edges = {(r["src"], r["dst"]) for r in warc.redirect_edges(df).collect()}
    # absolute target canonicalized; relative target resolved against src
    assert edges == {
        ("https://a.com/old", "https://a.com/new"),
        ("https://a.com/r1", "https://a.com/moved/here"),
    }


def test_truncated_gzip_member_quarantines_not_crashes():
    full = [gzip.compress(_resp(i), mtime=0) for i in (1, 2, 3)]
    stream = b"".join(full[:2]) + full[2][: len(full[2]) // 2]
    rows = list(warc.parse_warc_bytes(stream, file="t.warc.gz"))
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    # the two complete members parse; the truncated member lands whole in
    # quarantine (never-drop), nothing raises
    assert [r["target_uri"] for r in ok] == [
        "https://example.com/doc/1", "https://example.com/doc/2"
    ]
    assert len(bad) == 1 and bad[0]["error"] == "undecodable gzip member"
    assert bad[0]["payload"][:2] == b"\x1f\x8b"


def test_nonutf8_literal_charset_never_raises(spark):
    rec = warc.make_warc_response(
        uri="https://x/j", body=b"ok \x81\x40 then invalid \xff\xff bytes"
    )
    df = spark.createDataFrame(list(warc.parse_warc_bytes(rec)), warc.WARC_RECORDS)
    # shift_jis: \x81\x40 decodes, \xff\xff is malformed -> replaced, not a crash
    text = warc.warc_to_docs(df, charset="shift_jis").head()["text"]
    assert "ok" in text and "then invalid" in text


def test_bare_lf_http_head_parses():
    """Servers emitting LF-only header lines still parse (status, headers,
    body) instead of producing status=NULL rows that the downstream
    status==200 filter would silently drop (ADVICE r3)."""
    head = (b"HTTP/1.1 200 OK\n"
            b"Content-Type: text/html; charset=utf-8\n"
            b"Location: /elsewhere\n\n")
    body = b"<html>lf only</html>"
    status, ctype, loc, got = warc._parse_http(head + body)
    assert status == 200
    assert ctype.startswith("text/html")
    assert loc == "/elsewhere"
    assert got == body
    # mixed CRLF head with one bare-LF line inside also parses per-line
    mixed = (b"HTTP/1.1 301 Moved\r\n"
             b"Location: https://x/\n"
             b"Content-Type: text/plain\r\n\r\nB")
    status2, ctype2, loc2, got2 = warc._parse_http(mixed)
    assert (status2, ctype2, loc2, got2) == (301, "text/plain", "https://x/", b"B")


def test_decode_payloads_null_charset_not_dropped(spark):
    """A NULL charset routes into the utf-8 branch (never-drop contract):
    both branch predicates are null-excluding without the coalesce guard
    (ADVICE r3)."""
    df = spark.createDataFrame(
        [("a", None, bytearray("café".encode())),
         ("b", "utf-8", bytearray(b"plain")),
         ("c", "cp1252", bytearray("café".encode("cp1252")))],
        "id string, charset string, payload binary",
    )
    got = {r["id"]: r["text"]
           for r in warc.decode_payloads(df).collect()}
    assert got == {"a": "café", "b": "plain", "c": "café"}


def test_bare_lf_head_with_crlf_in_body_not_truncated():
    """The EARLIEST head terminator wins: an LF-only head whose body
    contains CRLFCRLF (most real HTML) must not have its body prefix
    eaten as headers (code-review r4 finding)."""
    block = (b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
             b"first part of body\r\n\r\nsecond part")
    status, ctype, loc, body = warc._parse_http(block)
    assert (status, ctype, loc) == (200, "text/html", None)
    assert body == b"first part of body\r\n\r\nsecond part"
