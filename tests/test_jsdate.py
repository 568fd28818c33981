"""JS semantics emulation goldens — every case verified against node 22
with TZ=UTC (the reference's runtime; see jsdate.py docstring)."""

import math

from doc_agent_spark.jsdate import js_num_to_str, js_number, normalize_date


def test_js_number_goldens():
    assert js_number("") == 0.0
    assert js_number(None) == 0.0
    assert js_number("  7.5 ") == 7.5
    assert js_number("0x1A") == 26.0
    assert math.isnan(js_number("abc"))
    assert math.isnan(js_number("1,250.00"))
    assert js_number(True) == 1.0
    assert js_number(False) == 0.0
    assert js_number("Infinity") == math.inf
    assert math.isnan(js_number("infinity"))
    assert js_number("3.50") == 3.5
    assert js_number("2") == 2.0
    assert js_number("-50.0") == -50.0
    assert js_number(".5") == 0.5
    assert js_number("5.") == 5.0
    assert js_number("1e3") == 1000.0
    assert math.isnan(js_number("1_000"))
    assert math.isnan(js_number("+0x10"))


def test_js_num_to_str():
    assert js_num_to_str(11.42) == "11.42"
    assert js_num_to_str(1250.0) == "1250"
    assert js_num_to_str(-52.1) == "-52.1"
    assert js_num_to_str(0.0) == "0"
    assert js_num_to_str(-0.0) == "0"
    assert js_num_to_str(3.5) == "3.5"


def test_normalize_date_node_goldens():
    # node: new Date(x).toISOString().split('T')[0] with TZ=UTC
    assert normalize_date("2024-01-15") == "2024-01-15"
    assert normalize_date("04/15/24") == "2024-04-15"
    assert normalize_date("04/15/2024") == "2024-04-15"
    assert normalize_date("Jan 5, 2024") == "2024-01-05"
    assert normalize_date("January 5, 2024") == "2024-01-05"
    assert normalize_date("2024-4-15") == "2024-04-15"
    assert normalize_date("2024-01-15T10:30:00Z") == "2024-01-15"
    assert normalize_date("04/15/24 10:30") == "2024-04-15"
    # fallback regex path: month 13 fails new Date, then '2024-13-05' fails too
    assert normalize_date("13/05/24") is None
    assert normalize_date("15/04/2024") is None  # day 15 as month → invalid
    assert normalize_date("garbage") is None
    assert normalize_date("") is None
    assert normalize_date(None) is None
    # 15.04.2024 (DE form): not parseable by either arm
    assert normalize_date("15.04.2024") is None
    # timezone shift across midnight
    assert normalize_date("2024-01-15T23:30:00-05:00") == "2024-01-16"
    # fallback prefix match when new Date fails but regex prefix exists
    assert normalize_date("04/15/24,extra") == "2024-04-15"


def test_two_digit_year_pivot():
    assert normalize_date("04/15/49") == "2049-04-15"
    assert normalize_date("04/15/50") == "1950-04-15"
