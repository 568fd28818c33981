"""Property-based tests (hypothesis) for the JS-semantics hard parts
(SURVEY §7.3): Number() coercion, date normalization, JSON salvage, page
assembly, money parsing. These are pure-Python spec functions — no Spark
session needed, so thousands of cases run in seconds."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from doc_agent_spark import spec
from doc_agent_spark.jsdate import js_num_to_str, js_number, normalize_date

settings.register_profile("ci", max_examples=300, deadline=None)
settings.load_profile("ci")


# --- js_number ------------------------------------------------------------

@given(st.floats(allow_nan=False, allow_infinity=False))
def test_js_number_roundtrips_floats(x):
    assert js_number(x) == x


@given(st.integers(min_value=-10**15, max_value=10**15))
def test_js_number_parses_decimal_strings(n):
    assert js_number(str(n)) == float(n)


@given(st.text(alphabet="0123456789., -+eE$", max_size=20))
def test_js_number_total_no_crash(s):
    v = js_number(s)
    assert isinstance(v, float)  # NaN allowed; never raises


@given(st.floats(allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15))
def test_js_num_to_str_reparses_to_same_value(x):
    s = js_num_to_str(x)
    assert float(s) == x
    if x == int(x):
        assert "." not in s  # String(1250.0) === '1250'


# --- normalize_date -------------------------------------------------------

@given(st.integers(1, 12), st.integers(1, 28), st.integers(1970, 2099))
def test_normalize_date_iso_identity(m, d, y):
    assert normalize_date(f"{y}-{m:02d}-{d:02d}") == f"{y}-{m:02d}-{d:02d}"


@given(st.integers(1, 12), st.integers(1, 28))
def test_normalize_date_mdy_two_digit_year(m, d):
    # 2-digit years: the reference's fallback expands YY -> 20YY; V8 new Date
    # maps <50 -> 20YY, so for 24 both arms agree
    assert normalize_date(f"{m:02d}/{d:02d}/24") == f"2024-{m:02d}-{d:02d}"


@given(st.integers(1, 12), st.integers(1, 28), st.integers(1970, 2099))
def test_normalize_date_mdy_four_digit(m, d, y):
    assert normalize_date(f"{m}/{d}/{y}") == f"{y}-{m:02d}-{d:02d}"


@given(st.integers(13, 99), st.integers(1, 28))
def test_normalize_date_invalid_month_rejected(m, d):
    assert normalize_date(f"{m:02d}/{d:02d}/2024") is None


@given(st.text(max_size=30))
def test_normalize_date_total(s):
    v = normalize_date(s)
    assert v is None or (len(v) == 10 and v[4] == "-" and v[7] == "-")


# --- salvage parse --------------------------------------------------------

json_objects = st.dictionaries(
    st.text(alphabet=st.characters(blacklist_characters="{}", blacklist_categories=("Cs",)), max_size=8),
    st.one_of(st.none(), st.integers(-1000, 1000), st.floats(-1e6, 1e6, allow_nan=False),
              st.text(alphabet=st.characters(blacklist_characters="{}", blacklist_categories=("Cs",)), max_size=12)),
    max_size=5,
)


@given(json_objects)
def test_salvage_recovers_wrapped_json(obj):
    raw = json.dumps(obj)
    assert spec.salvage_parse(raw) == obj
    # brace-slice salvage (ollama.ts:210-216): noise must not contain braces
    assert spec.salvage_parse(f"noise {raw} trailing") == obj


@given(st.text(alphabet=st.characters(blacklist_characters="{}", blacklist_categories=("Cs",)), max_size=40))
def test_salvage_rejects_braceless_garbage(s):
    try:
        v = spec.salvage_parse(s)
        assert isinstance(v, dict)  # only if s itself was a JSON object string
    except spec.ZodParseError:
        pass


# --- page assembly --------------------------------------------------------

@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=8))
def test_assemble_pages_invariants(pages):
    out = spec.assemble_pages(pages)
    kept = [(i + 1, (t or "").strip()) for i, t in enumerate(pages) if (t or "").strip()]
    # every kept page appears with its PRE-filter 1-based number (ocr.ts:46)
    for num, txt in kept:
        assert f"--- Page {num} ---\n{txt}" in out
    assert out.count("--- Page ") == len(kept)
    if not kept:
        assert out == ""


# --- money parsing --------------------------------------------------------

@given(st.integers(0, 10**6), st.integers(0, 99), st.booleans(), st.booleans())
def test_parse_money_tail(cents_units, cents, neg, grouped):
    v = cents_units + cents / 100.0
    s = f"{v:,.2f}" if grouped else f"{v:.2f}"
    if neg:
        s = "-" + s
    line = f"Total    {s}"
    got = spec._parse_money(line)
    assert got is not None
    assert math.isclose(got, -v if neg else v, abs_tol=1e-9)


@given(st.text(alphabet="abc $-.,", max_size=20))
def test_parse_money_total_no_crash(s):
    spec._parse_money(s)  # never raises


# --- curation functions ---------------------------------------------------

from doc_agent_spark.functions.redact import PII_PATTERNS
from doc_agent_spark.operators.sampling import hex_threshold


@given(st.floats(0, 1), st.floats(0, 1))
def test_hex_threshold_monotone(a, b):
    lo, hi = sorted((a, b))
    assert hex_threshold(lo) <= hex_threshold(hi)
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"       # sorts above every hex prefix


@given(st.text(alphabet="ab0123456789@.-+() <>ESNLACPHOT", max_size=60))
def test_redact_chain_idempotent(s):
    """Applying the PII pattern chain twice == once: placeholders contain
    no digits or @, so no pattern can match its own replacement."""
    import re

    def apply(x):
        for pat, rep in PII_PATTERNS:
            x = re.sub(pat, rep, x)
        return x

    once = apply(s)
    assert apply(once) == once



# --- guarded regex evaluation (spec.py hot path) --------------------------
# Each guard in classify/extract_fields must be a NECESSARY condition of its
# pattern AS APPLIED: keyword guards are gated on str.isascii() (re.IGNORECASE
# folds \u0131/\u017f/\u212a onto i/s/k, which str.lower() containment cannot
# see), while the digit/whitespace-shape guards hold over all of Unicode
# (\s == str.isspace and \d subset of str.isdigit — verified exhaustively
# below). The adversarial alphabet mixes keyword fragments, unicode
# whitespace/digits, money tails, case flips, and the three fold traps.

_GUARD_ALPHABET = (
    "total subtax due account balance invoice x@ \t \u00a0\u3000"
    "0123456789\u0660\u06f1.,-$TSDAB\ninv"
    "\u0131\u017f\u212a"  # dotless-i, long-s, Kelvin K
)

# Keyword guards exactly as applied in spec.py: non-ASCII input bypasses them.
_GUARD_PAIRS = [
    (spec._RE_RESERVED,
     lambda s: not s.isascii() or s.lstrip()[:1].lower() in spec._RESERVED_FIRST),
    (spec._RE_DUE, lambda s: not s.isascii() or "due" in s.lower()),
    (spec._RE_TOTAL_LINE, lambda s: not s.isascii() or s.lstrip()[:1] in "tT"),
    (spec._RE_SUBTOTAL, lambda s: not s.isascii() or s.lstrip()[:1] in "sS"),
    (spec._RE_TAX, lambda s: not s.isascii() or s.lstrip()[:1] in "sStT"),
    (spec._RE_ACCOUNT, lambda s: not s.isascii() or "account" in s.lower()),
    (spec._RE_BALANCE, lambda s: not s.isascii() or "balance" in s.lower()),
    (spec._RE_INVOICE, lambda s: not s.isascii() or "invoice" in s.lower()),
    (spec._RE_ENDING_BAL, lambda s: not s.isascii() or "balance" in s.lower()),
    # Shape guards: safe unconditionally (see test_shape_guard_unicode_safety).
    (
        spec._RE_TXN,
        lambda s: s.lstrip()[:1].isdigit()
        and bool(s.rstrip())
        and s.rstrip()[-1].isdigit()
        and "." in s.rstrip(),
    ),
    (
        spec._RE_ITEM_QTY,
        lambda s: s.lstrip()[:1].isdigit()
        and bool(s.rstrip())
        and s.rstrip()[-1].isdigit()
        and "." in s.rstrip(),
    ),
    (
        spec._RE_ITEM_PLAIN,
        lambda s: bool(s.rstrip()) and s.rstrip()[-1].isdigit() and "." in s.rstrip(),
    ),
]


@given(st.text(alphabet=_GUARD_ALPHABET, max_size=40))
def test_regex_guards_are_necessary_conditions(s):
    """Guard False => regex no-match, for every guarded pattern in the
    extraction hot path (spec.py). The search/match distinction matches the
    call sites: line-anchored patterns use match, containment ones search."""
    for pat, guard in _GUARD_PAIRS:
        if guard(s):
            continue  # guard passed: the regex runs, nothing to prove
        anchored = pat.pattern.startswith("^")
        hit = pat.match(s) if anchored else pat.search(s)
        assert hit is None, (pat.pattern, s)


def test_shape_guard_unicode_safety():
    """The money-tail/digit-start guards lean on two set relations that must
    hold over ALL of Unicode (no ASCII gate protects them): every char
    matched by regex \\s is str.isspace (lstrip/rstrip strip at least what
    \\s* would skip), and every char matched by \\d is str.isdigit."""
    import re as _re

    rs, rd = _re.compile(r"\s"), _re.compile(r"\d")
    assert not any(
        rs.match(chr(c)) and not chr(c).isspace() for c in range(0x110000)
    )
    assert not any(
        rd.match(chr(c)) and not chr(c).isdigit() for c in range(0x110000)
    )


def test_classify_unicode_case_folding_not_defeated_by_guards():
    """Regression: re.IGNORECASE matches '\u0131nvoice'/'\u017fubtotal'
    (dotless-i, long-s) but str.lower() substring guards do not — classify
    must take the unguarded path for non-ASCII text and still see them."""
    assert spec.classify("\u0131nvoice No: A-17\nTotal  5.00") == "invoice"
    # long-s subtotal counts as the sub-or-tax signal for receipt shape
    assert spec.classify("Total  5.00\n\u017fubtotal  4.00") == "receipt"
    # non-matching non-ASCII text still classifies as other
    assert spec.classify("\u212aiosk snacks") == "other"
