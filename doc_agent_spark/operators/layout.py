"""PDF layout segmentation into line/column runs (north_star: "PDF layout
segmentation into line/column runs"). The reference rasterizes pages and
lets OCR+LLM handle layout (packages/extract/src/pdf.ts, ocr.ts); our
deterministic equivalent segments the extracted page TEXT geometrically:

- a LINE is a newline-delimited row;
- a RUN is a maximal segment containing no 2+-space gap (the classic
  fixed-pitch column heuristic: tabular/column layouts separate cells with
  multi-space gutters, single spaces stay inside a cell);
- each run carries (line_no, run_idx, col_start, run_text); col_start is
  the exact 0-based character offset, so grouping by aligned col_start
  reconstructs columns.

Implementation trick: the line is tokenized into ALTERNATING run/gap
segments with one regex — ``\\S+(?: \\S+)*|\\s+`` (a run absorbs single
interior spaces and stops before any 2+-space gutter; whitespace segments
are the gutters) — so every segment's offset is the running sum of prior
segment lengths: pure array expressions, no UDF, exactly mirrorable in the
DuckDB oracle. Zero shuffle; the extractor's item/money regexes (spec.py
_RE_ITEM_*) use the same two-space gap convention, so layout runs and field
extraction agree on column boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEGMENT_RE = r"\S+(?: \S+)*|\s+"


def _segments(line: Column) -> Column:
    return F.regexp_extract_all(line, F.lit(f"({SEGMENT_RE})"), F.lit(1))


def _runs_with_offsets(line: Column) -> Column:
    """array<struct<col_start:int, run_text:string>> for one line."""
    segs = _segments(line)
    entries = F.transform(
        segs,
        lambda s, i: F.struct(
            F.aggregate(
                F.slice(segs, 1, i.cast("int")), F.lit(0), lambda a, x: a + F.length(x)
            ).alias("col_start"),
            s.alias("run_text"),
        ),
    )
    return F.filter(entries, lambda e: F.trim(e.run_text) != "")


def line_column_runs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, line_no, run_idx, col_start, run_text) — one row per run; all
    indices 0-based and data-derived (posexplode), never partition order."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("line_no", "line"),
    )
    runs = lines.select(
        "id", "line_no",
        F.posexplode(_runs_with_offsets(F.col("line"))).alias("run_idx", "r"),
    )
    return runs.select(
        "id", "line_no", "run_idx",
        F.col("r.col_start").alias("col_start"),
        F.col("r.run_text").alias("run_text"),
    )


def column_profile(runs: DataFrame) -> DataFrame:
    """Column anchors: col_starts shared by >1 line of a document —
    (id, col_start, n_lines). Grouping aligned starts reconstructs the
    column structure of tabular regions."""
    return (
        runs.groupBy("id", "col_start")
        .agg(F.countDistinct("line_no").alias("n_lines"))
        .filter(F.col("n_lines") > 1)
    )
