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
    """array<struct<col_start:int, run_text:string>> for one line.

    ``segs`` is let_-bound: the per-segment lambda slices it, and an
    unbound reference would re-run the segment regex once per segment —
    O(segments²) extraction per line (the assembly.let_ lesson)."""
    from doc_agent_spark.functions.assembly import let_

    def _with_segs(segs: Column) -> Column:
        entries = F.transform(
            segs,
            lambda s, i: F.struct(
                F.aggregate(
                    F.slice(segs, 1, i.cast("int")), F.lit(0),
                    lambda a, x: a + F.length(x),
                ).alias("col_start"),
                s.alias("run_text"),
            ),
        )
        return F.filter(entries, lambda e: F.trim(e.run_text) != "")

    return let_(_segments(line), _with_segs)


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


def line_signatures(runs: DataFrame) -> DataFrame:
    """Per-line column signature: (id, line_no, sig, n_cols) where sig is
    the comma-joined sorted col_start list — two lines with the same sig
    have their cells at IDENTICAL offsets (the fixed-pitch table test)."""
    return runs.groupBy("id", "line_no").agg(
        # sort NUMERICALLY before stringifying (lexicographic would put
        # "10" before "2" and diverge from the oracle's list_sort on ints)
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.col("col_start"))),
                lambda x: x.cast("string"),
            ),
        ).alias("sig"),
        F.count(F.lit(1)).cast("int").alias("n_cols"),
    )


def table_regions(runs: DataFrame, min_rows: int = 2, min_cols: int = 2) -> DataFrame:
    """Table-region detection over line/column runs — the layout stage that
    finds the LINE-ITEM TABLES the extractor reads out of invoices and
    statements (reference: the vision LLM does this implicitly;
    packages/extract/src/ocr.ts hands the raw page to the model).

    A table region is a maximal block of CONSECUTIVE lines sharing one
    column signature with ≥ ``min_cols`` cells, at least ``min_rows`` lines
    tall. Classic gaps-and-islands: island = line_no − row_number() within
    (id, sig), so a signature interrupted by a different line starts a new
    island. Returns (id, start_line, end_line, n_rows, n_cols, sig).

    Scale shape: one per-doc aggregation (signatures) + one window
    partitioned by (id, sig) — both key on the document, so partitions are
    bounded by a document's line count, never corpus-sized; no UDF."""
    from pyspark.sql import Window

    sigs = line_signatures(runs).filter(F.col("n_cols") >= min_cols)
    w = Window.partitionBy("id", "sig").orderBy("line_no")
    islands = sigs.withColumn(
        "island", F.col("line_no") - F.row_number().over(w)
    )
    return (
        islands.groupBy("id", "sig", "island")
        .agg(
            F.min("line_no").alias("start_line"),
            F.max("line_no").alias("end_line"),
            F.count(F.lit(1)).cast("int").alias("n_rows"),
            F.first("n_cols").alias("n_cols"),
        )
        .filter(F.col("n_rows") >= min_rows)
        .select("id", "start_line", "end_line", "n_rows", "n_cols", "sig")
    )


def table_regions_sql(runs_cte: str, min_rows: int = 2, min_cols: int = 2) -> str:
    """DuckDB mirror of :func:`table_regions` over a runs relation with
    columns (id, line_no, col_start)."""
    return f"""
SELECT id, start_line, end_line, n_rows, n_cols, sig FROM (
  SELECT id, sig, island,
         min(line_no) AS start_line, max(line_no) AS end_line,
         CAST(count(*) AS INTEGER) AS n_rows, any_value(n_cols) AS n_cols
  FROM (
    SELECT id, line_no, sig, n_cols,
           line_no - row_number() OVER (PARTITION BY id, sig ORDER BY line_no) AS island
    FROM (
      SELECT id, line_no,
             array_to_string(list_sort(list(col_start)), ',') AS sig,
             CAST(count(*) AS INTEGER) AS n_cols
      FROM {runs_cte} GROUP BY id, line_no)
    WHERE n_cols >= {min_cols})
  GROUP BY id, sig, island)
WHERE n_rows >= {min_rows}
""".strip()


def table_cells(runs: DataFrame, regions: DataFrame) -> DataFrame:
    """Cell extraction from detected table regions: every run inside a
    region becomes (id, line_no, row_idx, col_idx, cell) with row_idx
    0-based inside its table and col_idx the position of the run's
    col_start in the region signature — the typed grid the line-item
    field extractor (spec.py) reads descriptions/quantities/prices from.

    Region line ranges are disjoint by construction (an island is a
    maximal consecutive same-signature block, so two regions can never
    interleave lines), which makes the range join unambiguous. One equi-
    join on id narrowed by the line-range predicate; regions are
    tables-per-doc-sized, so AQE broadcasts them in practice."""
    r = regions.select("id", "start_line", "end_line", "sig")
    sig_arr = F.split(F.col("sig"), ",")
    return (
        runs.join(r, "id")
        .where(F.col("line_no").between(F.col("start_line"), F.col("end_line")))
        .select(
            "id", "line_no",
            (F.col("line_no") - F.col("start_line")).cast("int").alias("row_idx"),
            (F.array_position(sig_arr, F.col("col_start").cast("string")) - 1)
            .cast("int").alias("col_idx"),
            F.col("run_text").alias("cell"),
        )
    )


def table_cells_sql(runs_cte: str, regions_cte: str) -> str:
    """DuckDB mirror of :func:`table_cells`."""
    return f"""
SELECT r.id, r.line_no,
       CAST(r.line_no - g.start_line AS INTEGER) AS row_idx,
       CAST(list_position(string_split(g.sig, ','), CAST(r.col_start AS VARCHAR)) - 1
            AS INTEGER) AS col_idx,
       r.run_text AS cell
FROM {runs_cte} r JOIN {regions_cte} g ON r.id = g.id
WHERE r.line_no BETWEEN g.start_line AND g.end_line
""".strip()


def reading_order(runs: DataFrame, regions: DataFrame | None = None) -> DataFrame:
    """Reading-order repair for multi-column layout: linearize a page's
    runs so that COLUMN BANDS (the regions :func:`table_regions` detects —
    ≥2 aligned columns over ≥2 consecutive lines) read column-major
    (down the first column, then the next), while everything else keeps
    natural line-major order — the two-column-article / side-by-side-
    address case where naive line-major extraction interleaves unrelated
    sentences.

    Returns (id, seq, line_no, col_start, run_text) with ``seq`` the
    0-based linear reading position. Sort key: a band collapses onto its
    start_line (so the whole band sits where its first line was), then
    column, then line; non-band lines order by (line_no, run_idx).

    Scale shape: one left join of runs against the (tiny, metadata-sized)
    per-doc region list on doc + line-range, one doc-partitioned
    row_number window — bounded by lines-per-doc, no UDF, no corpus-wide
    state.
    """
    from pyspark.sql import Window

    if regions is None:
        regions = table_regions(runs)
    g = regions.select(
        F.col("id").alias("gid"), "start_line", "end_line"
    )
    j = runs.join(
        g,
        (runs["id"] == g["gid"])
        & (runs["line_no"] >= g["start_line"])
        & (runs["line_no"] <= g["end_line"]),
        "left",
    )
    major = F.coalesce(F.col("start_line"), F.col("line_no"))
    band_col = F.when(
        F.col("start_line").isNotNull(), F.col("col_start")
    ).otherwise(F.lit(-1))
    w = Window.partitionBy(runs["id"]).orderBy(
        major, band_col, F.col("line_no"), F.col("run_idx")
    )
    return j.select(
        runs["id"].alias("id"),
        (F.row_number().over(w) - 1).cast("int").alias("seq"),
        "line_no",
        "col_start",
        "run_text",
    )


def reading_order_sql(runs_cte: str, regions_cte: str) -> str:
    """DuckDB mirror of :func:`reading_order` over runs/regions relations."""
    return f"""
SELECT r.id AS id,
       CAST(row_number() OVER (PARTITION BY r.id
            ORDER BY coalesce(g.start_line, r.line_no),
                     CASE WHEN g.start_line IS NOT NULL THEN r.col_start ELSE -1 END,
                     r.line_no, r.run_idx) - 1 AS INTEGER) AS seq,
       r.line_no AS line_no, r.col_start AS col_start, r.run_text AS run_text
FROM {runs_cte} r LEFT JOIN {regions_cte} g
  ON g.id = r.id AND r.line_no BETWEEN g.start_line AND g.end_line
""".strip()
