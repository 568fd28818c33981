"""WARC crawl-archive source — the canonical web-scale input format.

A production crawl (Common Crawl ships ~64k ``.warc.gz`` files per monthly
snapshot) arrives as WARC (ISO 28500): concatenated records, each a
``WARC/1.0`` header block + ``Content-Length`` payload, usually one gzip
member per record so readers can resume mid-file. The reference engine
ingests already-extracted files (packages/cli/src/commands/extract.ts:16-24
walks a directory of PDFs/images); a 10^12-document pipeline starts one step
earlier, at the crawl archive itself — this module is that step.

Spark-first shape: **the file is the parallel axis.** WARC is not
line-splittable (records are length-prefixed binary), so we read whole files
with the ``binaryFile`` source and parse each file inside one Arrow-batched
``mapInPandas`` task — exactly how crawl processing is deployed (tens of
thousands of ~1 GB members, one task each; no intra-file split is needed
when the file count is 1000× the executor count). Parsing is sequential
per file, vectorized across files; nothing about a record ever shuffles
until the caller projects it.

Resilience contract mirrors ``sources/ingest.py``: never-drop-never-die.
A malformed header block, bad ``Content-Length``, or truncated tail emits a
quarantine row (``error`` set, raw bytes preserved in ``payload``) and the
parser resynchronizes at the next ``\\r\\nWARC/1.`` boundary — one corrupt
record cannot sink a 1 GB file, and nothing is silently dropped.

The serializer half (``make_warc_response`` / ``write_warc_file``) exists so
tests and the oracle gate can synthesize archives deterministically — and so
the round-trip invariant parser(serializer(x)) == x is checkable row-by-row
against a DuckDB mirror that computes the expected fields directly.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CRLF = b"\r\n"
_BOUNDARY = b"\r\nWARC/1."

WARC_RECORDS = StructType([
    StructField("file", StringType()),
    StructField("record_offset", LongType()),      # byte offset in the decompressed stream
    StructField("warc_type", StringType()),        # response | request | warcinfo | ...
    StructField("record_id", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),     # WARC-level Content-Type
    StructField("http_status", IntegerType()),     # response records only
    StructField("http_content_type", StringType()),
    StructField("http_location", StringType()),    # redirect target (3xx)
    StructField("payload", BinaryType()),          # HTTP body for responses, raw block otherwise
    StructField("n_bytes", LongType()),            # len(payload)
    StructField("error", StringType()),            # null = clean; else quarantine reason
])


# ---------------------------------------------------------------------------
# serializer (deterministic synthesis for tests / the oracle round-trip)
# ---------------------------------------------------------------------------

def make_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """HTTP/1.1 response bytes (the payload of a WARC ``response`` record)."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def make_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """One WARC/1.0 record: header block + Content-Length payload + 2 CRLF."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(block)}".encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def make_warc_response(
    uri: str,
    body: bytes,
    date: str = "2024-01-01T00:00:00Z",
    status: int = 200,
    record_id: str | None = None,
    gzip_member: bool = False,
) -> bytes:
    """A ``response`` record wrapping an HTTP response around ``body``.
    ``gzip_member=True`` compresses the record as its own gzip member (the
    Common Crawl layout — members concatenate into a valid ``.warc.gz``)."""
    rid = record_id or "<urn:md5:%s>" % hashlib.md5(uri.encode()).hexdigest()
    rec = make_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": rid,
            "WARC-Date": date,
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        make_http_response(body, status=status,
                           reason="OK" if status == 200 else "Not Found"),
    )
    # mtime=0 + fixed filename keep the member bytes deterministic
    return gzip.compress(rec, mtime=0) if gzip_member else rec


def make_warc_redirect(
    uri: str,
    location: str,
    status: int = 301,
    date: str = "2024-01-01T00:00:00Z",
    gzip_member: bool = False,
) -> bytes:
    """A 3xx ``response`` record with a Location header and empty body —
    the redirect shape a crawler must follow to keep its frontier live."""
    body = b""
    head = (
        f"HTTP/1.1 {status} Moved Permanently\r\n"
        f"Location: {location}\r\n"
        f"Content-Length: 0\r\n\r\n"
    ).encode("ascii")
    rec = make_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:md5:%s>" % hashlib.md5(uri.encode()).hexdigest(),
            "WARC-Date": date,
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        head + body,
    )
    return gzip.compress(rec, mtime=0) if gzip_member else rec


def redirect_edges(records: DataFrame) -> DataFrame:
    """``(src, dst)`` canonical redirect edges from clean 3xx responses —
    Location resolves against the record's own URI (it may be relative,
    RFC 9110 §10.2.2). A crawler unions ``dst`` into its frontier and a
    dedup pass treats src→dst as an alias edge."""
    from pyspark.sql import functions as F

    from doc_agent_spark.functions import urls

    return (
        records.filter(
            F.col("error").isNull()
            & (F.col("warc_type") == "response")
            & F.col("http_status").isin(301, 302, 303, 307, 308)
            & F.col("http_location").isNotNull()
        )
        .select(
            urls.url_canonicalize(F.col("target_uri")).alias("src"),
            urls.url_canonicalize(
                urls.resolve_url(F.col("target_uri"), F.col("http_location"))
            ).alias("dst"),
        )
        .filter(F.col("dst").rlike("^https?://"))
    )


def make_warcinfo(filename: str = "crawl.warc") -> bytes:
    block = b"software: doc_agent_spark\r\nformat: WARC File Format 1.0\r\n"
    return make_warc_record(
        {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": "<urn:info:%s>" % filename,
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
        block,
    )


def write_warc_file(path: str, records: Iterable[bytes]) -> None:
    """Driver-side test writer: concatenate pre-serialized records/members."""
    with open(path, "wb") as f:
        for rec in records:
            f.write(rec)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _maybe_decompress(data: bytes) -> bytes:
    """Transparent multi-member gzip: ``gzip.decompress`` concatenates all
    members, which is exactly the .warc.gz-as-member-stream layout."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def _decompress_members_prefix(data: bytes) -> tuple[bytes, bytes]:
    """(decoded_prefix, undecodable_tail): decompress gzip members one at a
    time until one fails — the salvage path for a truncated .warc.gz."""
    import zlib

    out = []
    pos = 0
    while pos < len(data) and data[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:           # truncated final member: keep it in the tail
            break
        out.append(chunk)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out), data[pos:]


def _quarantine(file: str, offset: int, raw: bytes, why: str) -> dict:
    return {
        "file": file, "record_offset": offset, "warc_type": None,
        "record_id": None, "target_uri": None, "warc_date": None,
        "content_type": None, "http_status": None, "http_content_type": None,
        "http_location": None, "payload": raw, "n_bytes": len(raw),
        "error": why,
    }


def _parse_http(
    block: bytes,
) -> tuple[int | None, str | None, str | None, bytes]:
    """(status, content_type, location, body) from HTTP response bytes;
    whole block becomes the body if the head is unparseable (tolerant,
    never raises). Real crawls contain servers emitting bare-LF header
    lines; those heads parse too (fall back to ``\\n\\n`` when no CRLF
    separator exists) rather than yielding http_status=NULL rows that the
    status==200 filters downstream would silently drop."""
    if not block.startswith(b"HTTP/"):
        return None, None, None, block
    # the EARLIEST terminator wins: a bare-LF head followed by a body that
    # happens to contain CRLFCRLF (most real HTML) must not have its body
    # prefix parsed as headers and dropped
    crlf_sep = block.find(b"\r\n\r\n")
    lf_sep = block.find(b"\n\n")
    if crlf_sep < 0 and lf_sep < 0:
        return None, None, None, block
    if crlf_sep >= 0 and (lf_sep < 0 or crlf_sep < lf_sep):
        head, body = block[:crlf_sep], block[crlf_sep + 4:]
    else:
        head, body = block[:lf_sep], block[lf_sep + 2:]
    lines = [ln.rstrip(b"\r") for ln in head.replace(CRLF, b"\n").split(b"\n")]
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, None, block
    ctype = None
    location = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        key = k.strip().lower()
        if key == b"content-type" and ctype is None:
            ctype = v.strip().decode("latin-1")
        elif key == b"location" and location is None:
            location = v.strip().decode("latin-1")
    return status, ctype, location, body


def parse_warc_bytes(data: bytes, file: str = "") -> Iterator[dict]:
    """Sequential record iterator over one (decompressed) WARC stream.

    Resync-on-error: any structural failure quarantines the bytes up to the
    next ``\\r\\nWARC/1.`` boundary and parsing continues there. A gzip
    stream truncated mid-member (a routine partial download at crawl
    scale) quarantines the undecodable remainder instead of raising —
    ``gzip.decompress`` fails atomically, so we fall back to member-wise
    decompression and keep every member that decodes."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except Exception:
            data, bad_tail = _decompress_members_prefix(data)
            if bad_tail:
                yield _quarantine(file, len(data), bad_tail,
                                  "undecodable gzip member")
    n = len(data)
    pos = 0
    while pos < n:
        # skip inter-record CRLF padding
        while data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        start = pos
        if not data.startswith(b"WARC/1.", pos):
            nxt = data.find(_BOUNDARY, pos)
            end = n if nxt < 0 else nxt + 2
            yield _quarantine(file, start, data[start:end], "no WARC/1.x magic")
            pos = end
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield _quarantine(file, start, data[start:], "unterminated header block")
            break
        headers: dict[str, str] = {}
        for ln in data[pos:hdr_end].split(CRLF)[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        body_start = hdr_end + 4
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            nxt = data.find(_BOUNDARY, body_start)
            end = n if nxt < 0 else nxt + 2
            yield _quarantine(file, start, data[start:end],
                              "missing/invalid Content-Length")
            pos = end
            continue
        block = data[body_start:body_start + clen]
        truncated = len(block) < clen
        wtype = headers.get("warc-type")
        ctype = headers.get("content-type")
        status: int | None = None
        http_ctype: str | None = None
        location: str | None = None
        payload = block
        if (
            wtype == "response"
            and ctype is not None
            and ctype.lower().startswith("application/http")
        ):
            status, http_ctype, location, payload = _parse_http(block)
        yield {
            "file": file,
            "record_offset": start,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype,
            "http_status": status,
            "http_content_type": http_ctype,
            "http_location": location,
            "payload": payload,
            "n_bytes": len(payload),
            "error": "truncated record" if truncated else None,
        }
        pos = body_start + clen


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan → per-file sequential parse
    inside Arrow-batched ``mapInPandas``. Plain ``.warc`` and multi-member
    ``.warc.gz`` both parse; one task per file (the crawl-processing deploy
    shape — scale the file count, not the file size)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    cols = [f.name for f in WARC_RECORDS.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one yield per FILE, not per Arrow batch: binaryFile can pack
        # several archives into one batch, and holding every file's raw
        # bytes + decompressed stream + parsed rows simultaneously
        # multiplies the documented one-file-in-memory peak
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = list(parse_warc_bytes(bytes(content), file=path_))
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, WARC_RECORDS)


def detect_charset(http_content_type, payload):
    """Charset column for an HTTP response: the Content-Type header param,
    else an HTML ``<meta charset=…>`` / ``http-equiv`` declaration in the
    first KiB (read through a latin-1 decode — every byte maps, so the
    sniff itself cannot fail), else a UTF-16 BOM, else utf-8. Pure column
    algebra — the sniff runs JVM-side for every record; only the non-UTF-8
    minority ever pays a Python decode (see ``decode_payloads``)."""
    from pyspark.sql import functions as F

    header = F.lower(F.regexp_extract(
        F.coalesce(http_content_type, F.lit("")),
        r"charset=\"?([A-Za-z0-9_\-]+)", 1,
    ))
    head = F.lower(F.decode(F.substring(payload, 1, 1024), "ISO-8859-1"))
    meta = F.regexp_extract(
        head, r"""<meta[^>]*charset=["']?([a-z0-9_\-]+)""", 1
    )
    bom = F.substring(payload, 1, 2)
    return (
        F.when(header != "", header)
        .when(meta != "", meta)
        .when(bom == F.lit(b"\xff\xfe"), F.lit("utf-16-le"))
        .when(bom == F.lit(b"\xfe\xff"), F.lit("utf-16-be"))
        .otherwise(F.lit("utf-8"))
    )


def decode_payloads(df: DataFrame, charset_col: str = "charset",
                    payload_col: str = "payload") -> DataFrame:
    """Add ``text`` = payload decoded per its detected charset, split-path:
    the UTF-8 majority decodes JVM-side (``F.decode``, malformed bytes →
    U+FFFD), only the minority slice pays an Arrow round-trip where Python
    codecs handle the long tail (unknown/invalid declared charsets fall
    back to utf-8, always errors='replace' — never-die)."""
    from pyspark.sql import functions as F

    # make_valid_utf8 is the lenient binary→string decode (malformed bytes
    # → U+FFFD); Spark 4's decode(_, 'UTF-8') raises MALFORMED_CHARACTER_
    # CODING instead, which a crawl with mis-declared charsets WILL hit.
    # A NULL charset must land in exactly one branch (both == and != are
    # null-excluding, which would silently drop the row): treat it as the
    # utf-8 default, matching detect_charset's otherwise() arm.
    is_utf8 = F.coalesce(F.col(charset_col) == "utf-8", F.lit(True))
    utf8 = df.filter(is_utf8).withColumn(
        "text", F.expr(f"make_valid_utf8({payload_col})")
    )
    rest = df.filter(~is_utf8)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("text", StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import codecs

        for pdf in batches:
            texts = []
            for cs, pl in zip(pdf[charset_col], pdf[payload_col]):
                raw = bytes(pl) if pl is not None else b""
                try:
                    codecs.lookup(str(cs))
                    texts.append(raw.decode(str(cs), errors="replace"))
                except LookupError:
                    texts.append(raw.decode("utf-8", errors="replace"))
            pdf = pdf.copy()
            pdf["text"] = texts
            yield pdf

    return utf8.unionByName(rest.mapInPandas(gen, out_schema))


def warc_to_docs(records: DataFrame, charset: str | None = "utf-8") -> DataFrame:
    """Clean ``response`` records → ``(doc_id, url, text)`` document rows
    (doc_id = canonical target URI, the crawl-native key). ``charset=None``
    sniffs per record (header → meta tag → BOM) and decodes the non-UTF-8
    minority through Python codecs; a literal charset decodes JVM-side."""
    from pyspark.sql import functions as F

    from doc_agent_spark.functions import urls

    ok = records.filter(
        F.col("error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    )
    if charset is not None:
        if charset.lower().replace("-", "").replace("_", "") == "utf8":
            decoded = ok.withColumn("text", F.expr("make_valid_utf8(payload)"))
        else:
            # non-UTF-8 literal goes through the same lenient Python-codec
            # path as sniffed charsets — Spark 4's decode raises on
            # malformed bytes, the exact never-die failure this module
            # exists to avoid
            decoded = decode_payloads(ok.withColumn("charset", F.lit(charset)))
    else:
        decoded = decode_payloads(
            ok.withColumn(
                "charset",
                detect_charset(F.col("http_content_type"), F.col("payload")),
            )
        )
    return decoded.select(
        urls.url_canonicalize(F.col("target_uri")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        "text",
    )


# ---------------------------------------------------------------------------
# engine-internal round-trip (the oracle-gate shape: no filesystem)
# ---------------------------------------------------------------------------

def warc_roundtrip(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "body",
    uri_prefix: str = "https://example.com/doc/",
) -> DataFrame:
    """serializer ∘ parser identity, checkable row-by-row: each input row is
    serialized as a WARC response record (every 3rd row as its own gzip
    member, every 7th row downgraded to 404, every 11th row ALSO emitting a
    301 redirect record whose Location round-trips through the digest), the
    rows of each Arrow batch concatenate into one in-memory archive fronted
    by a ``warcinfo`` record, and the REAL parser reads the archive back.
    Emitted fields are pure per-record functions of the input row, so the
    result is deterministic under any partitioning while multi-record +
    mixed-member parsing is genuinely exercised. Output: (doc_id,
    target_uri, http_status, n_bytes, payload_md5 — for redirects the md5
    of the Location value)."""
    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("target_uri", StringType()),
        StructField("http_status", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
    ])
    src = df.select(id_col, body_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            members = [make_warcinfo()]
            for i, (did, body) in enumerate(zip(pdf[id_col], pdf[body_col])):
                did = int(did)
                members.append(make_warc_response(
                    uri=f"{uri_prefix}{did}",
                    body=str(body).encode("utf-8"),
                    status=404 if did % 7 == 0 else 200,
                    gzip_member=did % 3 == 0,
                ))
                if did % 11 == 0:
                    members.append(make_warc_redirect(
                        uri=f"{uri_prefix}r/{did}", location=f"/moved/{did}",
                    ))
            # members → one archive; gzip members must survive concatenation
            # next to plain records, so decompress member-wise here (a pure
            # .warc.gz would decompress transparently in parse_warc_bytes)
            stream = b"".join(_maybe_decompress(m) for m in members)
            rows = []
            for rec in parse_warc_bytes(stream, file="<mem>"):
                if rec["warc_type"] != "response" or rec["error"] is not None:
                    continue
                digest_src = (
                    (rec["http_location"] or "").encode("utf-8")
                    if rec["http_status"] in (301, 302, 303, 307, 308)
                    else rec["payload"]
                )
                rows.append({
                    "doc_id": int(rec["target_uri"].rsplit("/", 1)[1]),
                    "target_uri": rec["target_uri"],
                    "http_status": rec["http_status"],
                    "n_bytes": rec["n_bytes"],
                    "payload_md5": hashlib.md5(digest_src).hexdigest(),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return src.mapInPandas(gen, out_schema)
