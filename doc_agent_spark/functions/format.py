"""F15 — human-readable byte formatting as a column expression.

Reference: packages/cli/src/commands/extract.ts:34-39 (`formatBytes`):
1024-base thresholds, one decimal via toFixed(1), integer bytes below 1 KB.
Cosmetic/UI-side in the reference; here it is a pure JVM projection so any
metrics/listing surface can attach it without leaving codegen. Spark's
round() is HALF_UP on the decimal string like toFixed for these ranges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_KB, _MB, _GB = 1024.0, 1024.0 ** 2, 1024.0 ** 3


def _fixed1(x: Column) -> Column:
    # toFixed(1) analog WITHOUT format_number's thousands separators.
    # format_string/%.1f (java.util.Formatter) rounds HALF_UP on the exact
    # double value — same as toFixed — and NEVER switches to scientific
    # notation, unlike double→string casts which emit '1.0E7' at ≥1e7
    # (toFixed stays positional until 1e21, so a cast-based render breaks
    # parity for ≥ ~10 PB inputs on the no-TB-unit reference scale).
    return F.format_string("%.1f", x)


def format_bytes(b: Column) -> Column:
    b = b.cast("double")
    return (
        F.when(b < _KB, F.concat(b.cast("long").cast("string"), F.lit(" B")))
        .when(b < _MB, F.concat(_fixed1(b / _KB), F.lit(" KB")))
        .when(b < _GB, F.concat(_fixed1(b / _MB), F.lit(" MB")))
        .otherwise(F.concat(_fixed1(b / _GB), F.lit(" GB")))
    )
