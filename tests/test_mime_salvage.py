"""MIME dispatch goldens (mime.test.ts) + JSON salvage parse goldens
(ollama.test.ts parse paths, gemini.ts fence strip) — spec and Spark
expressions both."""

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions.mime import filename_of, mime_of
from doc_agent_spark.functions.salvage import salvage_from_json, strip_fences
from doc_agent_spark import spec

MIME_CASES = [
    ("/path/to/file.pdf", "application/pdf"),
    ("file.PDF", "application/pdf"),
    ("/path/to/image.png", "image/png"),
    ("IMAGE.PNG", "image/png"),
    ("photo.jpg", "image/jpeg"),
    ("photo.jpeg", "image/jpeg"),
    ("PHOTO.JPG", "image/jpeg"),
    ("animation.gif", "image/gif"),
    ("image.webp", "image/webp"),
    ("file.txt", "application/pdf"),
    ("file.doc", "application/pdf"),
    ("file", "application/pdf"),
    ("/path/to/my.file.name.pdf", "application/pdf"),
    ("image.backup.png", "image/png"),
]


@pytest.mark.parametrize("path,expected", MIME_CASES)
def test_spec_mime(path, expected):
    assert spec.mime_type(path) == expected


def test_spark_mime_matches(spark):
    df = spark.createDataFrame([(p,) for p, _ in MIME_CASES], "path string")
    got = [r.m for r in df.select(mime_of(F.col("path")).alias("m")).collect()]
    assert got == [e for _, e in MIME_CASES]


def test_filename_projection(spark):
    cases = [("/a/b/invoice.pdf", "invoice.pdf"), ("plain.png", "plain.png"), ("/ends/slash/", "unknown")]
    df = spark.createDataFrame([(p,) for p, _ in cases], "path string")
    got = [r.f for r in df.select(filename_of(F.col("path")).alias("f")).collect()]
    assert got == [e for _, e in cases]
    assert spec.filename_of("/a/b/c.pdf") == "c.pdf"
    assert spec.filename_of("x/") == "unknown"


def test_spec_salvage():
    assert spec.salvage_parse('{"a": 1}') == {"a": 1}
    assert spec.salvage_parse('junk before {"a": 1} junk after') == {"a": 1}
    assert spec.salvage_parse('  {"a": 1}  ') == {"a": 1}
    with pytest.raises(spec.ZodParseError):
        spec.salvage_parse("no json here")
    assert spec.strip_fences('```json\n{"a":1}\n```') == '{"a":1}\n'


def test_spark_salvage(spark):
    rows = [
        ("c1", '{"vendor": "A", "amount": 5.5}'),
        ("c2", 'Sure! Here is the JSON: {"vendor": "B", "amount": 1.0} hope that helps'),
        ("c3", "completely unparseable"),
        ("c4", '```json\n{"vendor": "C", "amount": 2}\n```'),
    ]
    df = spark.createDataFrame(rows, "case_id string, resp string")
    out = {
        r.case_id: r.parsed
        for r in df.select(
            "case_id",
            salvage_from_json(strip_fences(F.col("resp")), "vendor string, amount double").alias("parsed"),
        ).collect()
    }
    assert out["c1"].vendor == "A" and out["c1"].amount == 5.5
    assert out["c2"].vendor == "B" and out["c2"].amount == 1.0
    assert out["c3"] is None  # parse failure → metric row downstream
    assert out["c4"].vendor == "C" and out["c4"].amount == 2.0
