"""Ported golden fixtures from the reference's normalization tests
(packages/extract/src/__tests__/schemas.test.ts — all cases), run against
the pure spec. The Spark UDF is checked for equality with the spec in
test_normalize_udf.py, so these goldens pin the whole chain.
"""

import pytest

from doc_agent_spark.spec import (
    ZodParseError,
    normalize_docdata,
    normalize_line_item,
)


# --- LineItemSchema (schemas.test.ts:5-110) ---

def test_valid_line_item():
    r = normalize_line_item(
        {"description": "Coffee", "quantity": 2, "unitPrice": 3.5, "total": 7.0}
    )
    assert r == {"description": "Coffee", "quantity": 2.0, "unit_price": 3.5, "total": 7.0}


def test_coerce_string_numbers():
    r = normalize_line_item(
        {"description": "Item", "quantity": "2", "unitPrice": "3.50", "total": "7.00"}
    )
    assert (r["quantity"], r["unit_price"], r["total"]) == (2.0, 3.5, 7.0)


def test_price_normalized_to_total():
    r = normalize_line_item({"price": 9.99, "name": "Item"})
    assert r["total"] == 9.99


def test_total_wins_over_price():
    r = normalize_line_item({"description": "Item", "total": 10.0, "price": 5.0})
    assert r["total"] == 10.0


def test_missing_optional_fields():
    r = normalize_line_item({"description": "Simple item"})
    assert r == {"description": "Simple item", "quantity": None, "unit_price": None, "total": None}


def test_name_to_description():
    assert normalize_line_item({"name": "Product Name", "price": 5.99})["description"] == "Product Name"


def test_item_to_description():
    r = normalize_line_item({"item": "Line Item", "amount": 10.0})
    assert r["description"] == "Line Item"
    assert r["total"] == 10.0


def test_default_description():
    assert normalize_line_item({"total": 5.0})["description"] == "Unknown item"


def test_qty_to_quantity():
    assert normalize_line_item({"description": "Item", "qty": 3})["quantity"] == 3.0


def test_empty_description_falsy_skipped():
    # F2 uses || (falsy skip): '' falls through to name
    assert normalize_line_item({"description": "", "name": "N"})["description"] == "N"


def test_zero_quantity_survives_nullish():
    # F3 uses ?? (nullish): 0 survives
    assert normalize_line_item({"description": "x", "quantity": 0, "qty": 5})["quantity"] == 0.0


def test_null_quantity_is_js_zero():
    # JS Number(null) === 0 via z.coerce (no .nullish() on safeNumber)
    assert normalize_line_item({"description": "x", "quantity": None})["quantity"] == 0.0


# --- DocumentDataSchema (schemas.test.ts:112-176) ---

def test_valid_document_data():
    r = normalize_docdata({
        "type": "receipt", "vendor": "Coffee Shop", "amount": 15.99,
        "date": "2024-01-15", "items": [{"description": "Latte", "total": 5.99}],
    })
    assert (r["type"], r["vendor"], r["amount"]) == ("receipt", "Coffee Shop", 15.99)
    assert r["date"] == "2024-01-15"
    assert r["date_raw"] == "2024-01-15"


def test_default_type_other_when_missing():
    assert normalize_docdata({"vendor": "Some Place"})["type"] == "other"


def test_catch_invalid_type():
    assert normalize_docdata({"type": "invalid_type", "vendor": "Place"})["type"] == "other"


def test_null_to_undefined():
    r = normalize_docdata({"type": "invoice", "vendor": None, "amount": None,
                           "date": None, "items": None})
    assert r["vendor"] is None and r["amount"] is None
    assert r["date"] is None and r["items"] is None


def test_coerce_string_amount():
    assert normalize_docdata({"type": "receipt", "amount": "99.99"})["amount"] == 99.99


def test_negative_amount_preserved():
    assert normalize_docdata({"type": "receipt", "amount": -50.0})["amount"] == -50.0


def test_all_valid_types():
    for t in ("invoice", "receipt", "bank_statement", "other"):
        assert normalize_docdata({"type": t})["type"] == t


# --- alias chains (schemas.ts:91-92) ---

def test_vendor_alias_chain():
    assert normalize_docdata({"store_name": "X"})["vendor"] == "X"
    assert normalize_docdata({"merchant": "M"})["vendor"] == "M"
    assert normalize_docdata({"business_name": "B"})["vendor"] == "B"
    assert normalize_docdata({"vendor": "V", "merchant": "M"})["vendor"] == "V"
    # null vendor falls to next alias (?? skips null)
    assert normalize_docdata({"vendor": None, "store_name": "S"})["vendor"] == "S"


def test_amount_alias_chain():
    assert normalize_docdata({"total": 5.0})["amount"] == 5.0
    assert normalize_docdata({"total_amount": "7.25"})["amount"] == 7.25
    assert normalize_docdata({"amount": 1.0, "total": 5.0})["amount"] == 1.0


def test_date_normalization_and_raw():
    r = normalize_docdata({"date": "04/15/24"})
    assert r["date"] == "2024-04-15"
    assert r["date_raw"] == "04/15/24"
    r = normalize_docdata({"date": "not a date"})
    assert r["date"] is None
    assert r["date_raw"] == "not a date"


# --- Zod validation failures (→ parse-failure metric rows) ---

def test_bad_amount_string_raises():
    with pytest.raises(ZodParseError):
        normalize_docdata({"amount": "abc"})


def test_bad_vendor_type_raises():
    with pytest.raises(ZodParseError):
        normalize_docdata({"vendor": 42})


def test_bad_items_shape_raises():
    with pytest.raises(ZodParseError):
        normalize_docdata({"items": "nope"})


def test_null_item_string_raises():
    # z.string().optional() rejects null (only undefined allowed)
    with pytest.raises(ZodParseError):
        normalize_line_item({"description": None})


def test_comma_grouped_amount_is_nan():
    with pytest.raises(ZodParseError):
        normalize_docdata({"amount": "1,250.00"})
