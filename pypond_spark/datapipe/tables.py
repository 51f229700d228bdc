"""Embedded CSV/TSV table extraction — the tabular-attachment slice.

Crawl and document corpora carry tables as CSV/TSV blobs (data-portal
exports, supplementary files, spreadsheet dumps).  This module parses
them with Spark's built-in ``from_csv`` — the JVM Univocity parser,
zero Python — one blob to one row per record:

- newline-normalize, split to lines, drop blank lines, optionally
  skip the header line — all higher-order array ops BEFORE the
  explode, so ``row_idx`` is the exact record index with no window;
- ``from_csv`` parses each record against the caller's DDL schema:
  RFC 4180 quoting (embedded separators, doubled quotes) is the
  parser's, not a regex approximation;
- a record that cannot be parsed yields NULL fields (PERMISSIVE),
  never an exception — the triage law.

Multi-line quoted fields are a DOCUMENTED scope cut: the line split
precedes parsing, so a quoted embedded newline breaks that record
(and only that record) — the overwhelmingly common machine-written
export has none, and the failure is visible as NULL fields, not
silent corruption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["csv_rows"]


def csv_rows(df: DataFrame, schema: str,
             content_col: str = "content", id_col: str = "doc_id",
             sep: str = ",", header: bool = True) -> DataFrame:
    """One row per CSV record: ``(id, row_idx, <schema fields...>)``
    — ``schema`` is a Spark DDL string (``"name string, qty int"``);
    ``sep`` makes it TSV-capable; ``header=True`` skips line one."""
    raw = F.regexp_replace(F.col(content_col), r"\r\n?", "\n")
    lines = F.filter(F.split(raw, "\n"),
                     lambda l: l != F.lit(""))
    if header:
        lines = F.slice(
            lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))
    base = df.select(
        F.col(id_col),
        F.posexplode(lines).alias("row_idx", "line"))
    # escape='"' selects RFC 4180 doubled-quote escaping (Spark's
    # default escape is backslash, which no spreadsheet writes)
    row = F.from_csv(F.col("line"), F.lit(schema),
                     {"sep": sep, "mode": "PERMISSIVE",
                      "escape": '"'})
    return base.select(id_col, "row_idx", row.alias("r")) \
               .select(id_col, "row_idx", "r.*")
