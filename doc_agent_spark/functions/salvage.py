"""F10/F11 — JSON salvage parse + markdown fence strip as column expressions.

Reference: providers/ollama.ts:202-220 (JSON.parse, on failure slice
indexOf('{')..lastIndexOf('}') and retry); gemini.ts:42 (strip ```json
fences). Spark's ``from_json`` (PERMISSIVE) yields NULL for malformed
input, so the two attempts compose with ``coalesce`` — no Python in the
path; a NULL after both attempts is the parse-failure signal (metric row
downstream, mirroring ollama.ts:216-219).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_fences(resp: Column) -> Column:
    return F.regexp_replace(resp, r"```(json)?\n?", "")


def brace_slice(resp: Column) -> Column:
    """substring from first '{' to last '}' (NULL when either is absent)."""
    start = F.instr(resp, "{")
    rev_end = F.instr(F.reverse(resp), "}")
    end = F.length(resp) - rev_end + 1
    return F.when(
        (start > 0) & (rev_end > 0) & (end >= start),
        F.substring(resp, start, end - start + 1),
    ).otherwise(F.lit(None).cast("string"))


def _strict_from_json(s: Column, schema) -> Column:
    """from_json that yields NULL (not a null-field struct) on malformed
    input, via a corrupt-record sentinel — JSON.parse throw semantics."""
    from pyspark.sql.types import StringType, StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    with_corrupt = StructType(list(st.fields)).add("_corrupt", StringType())
    parsed = F.from_json(s, with_corrupt, {"columnNameOfCorruptRecord": "_corrupt"})
    return F.when(parsed["_corrupt"].isNull(), parsed.dropFields("_corrupt"))


def salvage_from_json(resp: Column, schema) -> Column:
    """Two-attempt parse: direct, then brace-sliced (ollama.ts:202-215)."""
    return F.coalesce(
        _strict_from_json(F.trim(resp), schema),
        _strict_from_json(brace_slice(resp), schema),
    )
