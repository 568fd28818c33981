"""Bit-exact emulation of the JavaScript semantics the reference relies on.

The reference's normalization layer (``packages/extract/src/schemas.ts``) runs
on V8: ``z.coerce.number()`` calls JS ``Number()``, and ``normalizeDate``
(``schemas.ts:44-66``) calls ``new Date(str)`` followed by
``toISOString().split('T')[0]``. Those semantics are NOT equal to SQL
``try_cast``/``to_date`` (``Number('') === 0`` but ``try_cast('' as double)``
is NULL; ``new Date('04/15/24')`` is 2024-04-15), so we encode them here as an
explicit, documented spec and use it from the Arrow-batched normalize UDF and
the test oracle alike.

Spec decisions (deterministic UTC subset of the V8 parser, verified against
node 22 with TZ=UTC — see tests/test_jsdate.py):
- date-only ISO forms are UTC (per ECMA-262); legacy forms (M/D/Y, month-name)
  are local time, which equals UTC because the engine pins ``TZ=UTC``
  (spark.sql.session.timeZone=UTC).
- 2-digit years in legacy M/D/Y: yy < 50 → 20yy else 19yy (V8 behavior).
- invalid calendar dates (month 13, day 32) → NaN (V8 rejects them).
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timedelta, timezone

# Sentinel for a JSON key that is absent (JS `undefined`), distinct from null.
ABSENT = object()

_HEX_RE = re.compile(r"^[+-]?0[xX][0-9a-fA-F]+$")
_OCT_RE = re.compile(r"^[+-]?0[oO][0-7]+$")
_BIN_RE = re.compile(r"^[+-]?0[bB][01]+$")
# JS StrDecimalLiteral: optional sign, digits with optional . and exponent.
_DEC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
# JS whitespace trimmed by Number(): WhiteSpace + LineTerminator.
_JS_WS = "\t\n\x0b\x0c\r \xa0                　﻿"


def js_number(v: object) -> float:
    """JS ``Number(v)``. Returns a float; ``math.nan`` when JS yields NaN.

    Mirrors: Number(null)=0, Number('')=0, Number(' 7.5 ')=7.5,
    Number('0x1A')=26, Number('1,250.00')=NaN, Number(true)=1,
    Number('Infinity')=inf, Number('infinity')=NaN.
    """
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip(_JS_WS)
        if s == "":
            return 0.0
        if s in ("Infinity", "+Infinity"):
            return math.inf
        if s == "-Infinity":
            return -math.inf
        if _HEX_RE.match(s):
            if s[0] in "+-":  # JS rejects signed hex/oct/bin literals
                return math.nan
            return float(int(s, 16))
        if _OCT_RE.match(s):
            if s[0] in "+-":
                return math.nan
            return float(int(s, 8))
        if _BIN_RE.match(s):
            if s[0] in "+-":
                return math.nan
            return float(int(s, 2))
        if _DEC_RE.match(s):
            return float(s)
        return math.nan
    # objects/arrays: JS would call toPrimitive; our data plane never feeds
    # those, treat as NaN (→ parse failure upstream, like the reference's
    # ZodError → failed extraction).
    return math.nan


def js_num_to_str(v: float) -> str:
    """JS ``String(number)`` for the doubles our pipeline emits.

    Integral doubles print without a fractional part (String(1250.0) ===
    '1250'); otherwise Python's repr (shortest round-trip) matches V8's
    double-to-string for the values in play.
    """
    if v != v:  # NaN
        return "NaN"
    if v == math.inf:
        return "Infinity"
    if v == -math.inf:
        return "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))  # also maps -0.0 -> '0'
    return repr(v)


_MONTHS = {
    m.lower(): i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}
_FULL_MONTHS = {
    m.lower(): i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June", "July",
            "August", "September", "October", "November", "December",
        ]
    )
}

_ISO_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
_ISO_DT_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6})\d*)?)?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)
_LEGACY_ISOISH_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$")
_MDY_RE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{2,4})(?:\s.*)?$")
_MONTHNAME_RE = re.compile(r"^([A-Za-z]+)\.?\s+(\d{1,2}),?\s+(\d{4})(?:\s.*)?$")
# The reference's explicit MM/DD/YY fallback regex (schemas.ts:55): prefix
# match, no anchoring at the end.
_MDY_FALLBACK_RE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{2,4})")


def _valid_ymd(y: int, m: int, d: int) -> datetime | None:
    try:
        return datetime(y, m, d, tzinfo=timezone.utc)
    except ValueError:
        return None


def _js_new_date(s: str):
    """Emulate ``new Date(s)`` under TZ=UTC for the whitelisted formats.

    Returns a UTC datetime, or None for NaN (Invalid Date).
    """
    s = s.strip()
    m = _ISO_DATE_RE.match(s)
    if m:
        return _valid_ymd(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = _ISO_DT_RE.match(s)
    if m:
        y, mo, d, hh, mi = (int(m.group(i)) for i in range(1, 6))
        ss = int(m.group(6) or 0)
        dt = _valid_ymd(y, mo, d)
        if dt is None or hh > 23 or mi > 59 or ss > 59:
            return None
        dt = dt + timedelta(hours=hh, minutes=mi, seconds=ss)
        tz = m.group(8)
        if tz and tz != "Z":
            sign = 1 if tz[0] == "+" else -1
            tzh, tzm = int(tz[1:3]), int(tz[-2:])
            dt -= sign * timedelta(hours=tzh, minutes=tzm)
        return dt
    m = _LEGACY_ISOISH_RE.match(s)
    if m:  # '2024-4-15' → legacy parser, local(=UTC) midnight
        return _valid_ymd(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = _MDY_RE.match(s)
    if m:
        mo, d = int(m.group(1)), int(m.group(2))
        ystr = m.group(3)
        if len(ystr) == 3:  # V8 treats 3-digit years as literal years 100-999
            y = int(ystr)
        elif len(ystr) == 2:
            yy = int(ystr)
            y = 2000 + yy if yy < 50 else 1900 + yy
        else:
            y = int(ystr)
        if mo < 1 or mo > 12:
            return None
        return _valid_ymd(y, mo, d)
    m = _MONTHNAME_RE.match(s)
    if m:
        name = m.group(1).lower()
        mo = _FULL_MONTHS.get(name) or _MONTHS.get(name[:3] if len(name) >= 3 else "")
        if not mo:
            return None
        return _valid_ymd(int(m.group(3)), mo, int(m.group(2)))
    return None


def normalize_date(date_str) -> str | None:
    """Port of ``normalizeDate`` (schemas.ts:44-66). Returns 'YYYY-MM-DD' or None.

    (a) ``new Date(str)`` valid → toISOString date part;
    (b) else the MM/DD/YY prefix regex → 20YY expansion → rebuilt ISO;
    (c) else None. Falsy input (None/'') → None (schemas.ts:45).
    """
    if date_str is None or date_str is ABSENT or date_str == "":
        return None
    dt = _js_new_date(date_str)
    if dt is not None:
        return dt.strftime("%Y-%m-%d")
    m = _MDY_FALLBACK_RE.match(date_str)
    if m:
        month, day, year = m.group(1), m.group(2), m.group(3)
        full_year = f"20{year}" if len(year) == 2 else year
        if len(full_year) != 4:  # '123-04-15' is not a valid ISO build
            return None
        dt = _valid_ymd(int(full_year), int(month), int(day))
        if dt is not None:
            return dt.strftime("%Y-%m-%d")
    return None
