"""Unicode normalization (textfns.normalize_text): NFC composition,
space/zero-width/control handling, idempotence, ASCII fast path, and the
plan boundary (one Arrow stage, cleanup stays JVM-side)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from doc_agent_spark.functions import textfns


def _norm(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", textfns.normalize_text(F.col("t")).alias("n")).collect()
    return [r.n for r in sorted(rows, key=lambda r: r.i)]


def test_nfc_composes_decomposed_accents(spark):
    decomposed = "Café au lait"
    composed = "Café au lait"
    out = _norm(spark, [decomposed, composed])
    assert out[0] == out[1] == composed
    assert unicodedata.is_normalized("NFC", out[0])


def test_space_zero_width_and_controls(spark):
    dirty = "a b​c\x0b\x1fd  \te \r\nf \n g"
    assert _norm(spark, [dirty]) == ["a bcd e\nf\ng"]


def test_idempotent_and_ascii_identity(spark):
    texts = ["plain ascii text", "Café　x", ""]
    once = _norm(spark, texts)
    twice = _norm(spark, once)
    assert once == twice
    assert once[0] == "plain ascii text"  # ASCII fast path: unchanged
    assert once[1] == "Café x"


def test_none_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "i long, t string")
    assert df.select(textfns.normalize_text(F.col("t")).alias("n")).collect()[0].n is None


def test_only_nfc_is_python(spark):
    """The cleanup chain must compile to JVM regexp_replace around exactly
    one Arrow Python eval (the NFC UDF)."""
    df = spark.range(5).select(F.col("id").cast("string").alias("t"))
    plan = (
        df.select(textfns.normalize_text(F.col("t")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # never row-at-a-time
