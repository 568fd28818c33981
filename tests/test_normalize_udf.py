"""The Arrow-batched normalize UDF must equal the pure spec on raw JSON
fixtures (norm_cases, FIXTURES.md §2) — including Zod failure semantics
(→ parse_failure flag, not exception)."""

import json

from doc_agent_spark import spec
from doc_agent_spark.operators.normalize import normalize_json

CASES = [
    # (case_id, raw_json) — mirrors schemas.test.ts + salvage paths
    ("valid", '{"type":"receipt","vendor":"Coffee Shop","amount":15.99,"date":"2024-01-15","items":[{"description":"Latte","total":5.99}]}'),
    ("aliases", '{"store_name":"X","total":"7.00","items":[{"name":"A","price":5.0,"total":10.0},{"item":"B","amount":3}]}'),
    ("qty", '{"items":[{"description":"I","qty":3,"unit_price":"2.50"}]}'),
    ("nulls", '{"type":"invoice","vendor":null,"amount":null,"date":null,"items":null}'),
    ("negative", '{"type":"receipt","amount":-50.0}'),
    ("bad_type", '{"type":"invalid_type","vendor":"P"}'),
    ("date_mdy", '{"date":"04/15/24"}'),
    ("date_bad", '{"date":"not a date"}'),
    ("coerce_fail", '{"amount":"abc"}'),
    ("salvage", 'noise {"type":"receipt","amount":1.5} tail'),
    ("fences", '```json\n{"type":"invoice","amount":2}\n```'),
    ("no_json", "nothing here"),
    ("unknown_item", '{"items":[{"total":5.0}]}'),
    ("empty_desc", '{"items":[{"description":"","name":"N","total":1}]}'),
    ("zero_qty", '{"items":[{"description":"x","quantity":0,"qty":5}]}'),
    ("null_qty_js_zero", '{"items":[{"description":"x","quantity":null}]}'),
]


def spec_expect(raw):
    try:
        parsed = spec.salvage_parse(spec.strip_fences(raw))
        norm = spec.normalize_docdata(parsed)
        return {**norm, "parse_failure": False}
    except spec.ZodParseError:
        return {"type": None, "vendor": None, "amount": None, "date": None,
                "date_raw": None, "items": None, "raw_text": None,
                "parse_failure": True}


def test_normalize_udf_equals_spec(spark):
    df = spark.createDataFrame(CASES, "case_id string, raw_json string")
    got = {r.case_id: r.asDict(recursive=True) for r in normalize_json(df).collect()}
    assert len(got) == len(CASES)
    for case_id, raw in CASES:
        exp = spec_expect(raw)
        g = got[case_id]
        for k in ("type", "vendor", "amount", "date", "date_raw", "raw_text", "parse_failure"):
            assert g[k] == exp[k], f"{case_id}.{k}: {g[k]!r} != {exp[k]!r}"
        exp_items = exp["items"]
        got_items = g["items"]
        if exp_items is None:
            assert got_items is None, case_id
        else:
            assert got_items is not None and len(got_items) == len(exp_items), case_id
            for gi, ei in zip(got_items, exp_items):
                assert gi == ei, f"{case_id}: {gi} != {ei}"


def test_specific_goldens(spark):
    df = spark.createDataFrame(CASES, "case_id string, raw_json string")
    got = {r.case_id: r for r in normalize_json(df).collect()}
    assert got["aliases"].vendor == "X"
    assert got["aliases"].amount == 7.0
    assert got["aliases"].items[0].total == 10.0  # total wins over price
    assert got["aliases"].items[1].description == "B"
    assert got["aliases"].items[1].total == 3.0
    assert got["qty"].items[0].quantity == 3.0
    assert got["qty"].items[0].unit_price == 2.5
    assert got["bad_type"].type == "other"
    assert got["date_mdy"].date == "2024-04-15"
    assert got["date_mdy"].date_raw == "04/15/24"
    assert got["date_bad"].date is None
    assert got["coerce_fail"].parse_failure is True
    assert got["salvage"].amount == 1.5 and got["salvage"].parse_failure is False
    assert got["fences"].type == "invoice"
    assert got["no_json"].parse_failure is True
    assert got["unknown_item"].items[0].description == "Unknown item"
    assert got["empty_desc"].items[0].description == "N"
    assert got["zero_qty"].items[0].quantity == 0.0
    assert got["null_qty_js_zero"].items[0].quantity == 0.0


def test_json_roundtrip_sanity():
    # the fixtures themselves are valid JSON where expected
    for cid, raw in CASES:
        if cid in ("salvage", "fences", "no_json"):
            continue
        json.loads(raw)
