"""Jupyter notebook (.ipynb) extraction — the code-corpus slice.

Notebooks are the dominant interchange format for data-science code
and a first-class slice of any code-pretraining corpus (the nbformat
4 JSON schema is public: ``https://nbformat.readthedocs.io``).  The
whole tier is pure JVM: :func:`pyspark.sql.functions.parse_json`
lifts the document into Spark 4's VARIANT type, and every cell access
is ``variant_get`` / higher-order array functions — zero Python, zero
shuffle, one blob = one row (or one row per cell after
``posexplode``).

The one genuinely irregular part of nbformat is ``source``: modern
writers emit a LIST of line strings (each keeping its ``\\n``), but
the spec also allows a single plain string, and both forms coexist in
real corpora — sometimes inside one notebook.  ``try_variant_get``
disambiguates for free: the ``array<string>`` cast is NULL for the
string form (and vice versa never matters, because the array form
wins the coalesce).

Malformed JSON never raises: :func:`ipynb_cells` /
:func:`ipynb_text` use ``try_parse_json``, so junk blobs yield NULL
cells / NULL text — triage rows, same law as
``document.route_document`` (a mixed corpus always contains junk;
label it, don't die on it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ipynb_cells", "ipynb_text"]


def _cell_source(cell: Column) -> Column:
    """One cell's source as a single string, whichever spelling the
    writer used (list-of-lines keeps its embedded newlines)."""
    arr = F.try_variant_get(cell, "$.source", "array<string>")
    return F.when(arr.isNotNull(), F.concat_ws("", arr)) \
            .otherwise(F.try_variant_get(cell, "$.source", "string"))


def ipynb_cells(df: DataFrame, content_col: str = "content",
                id_col: str = "doc_id") -> DataFrame:
    """Explode one notebook blob into one row per cell:
    ``(id, cell_idx, cell_type, source, n_chars)``.

    ``posexplode`` preserves document order as ``cell_idx``.  A blob
    that is not valid JSON (or has no ``cells``) contributes zero
    rows — the NULL variant explodes to nothing, which is the right
    triage shape for a per-cell frame."""
    v = F.try_parse_json(F.col(content_col))
    cells = df.select(
        F.col(id_col),
        F.posexplode(F.variant_get(v, "$.cells", "array<variant>"))
         .alias("cell_idx", "cell"))
    src = _cell_source(F.col("cell"))
    return cells.select(
        id_col, "cell_idx",
        F.variant_get("cell", "$.cell_type", "string")
         .alias("cell_type"),
        src.alias("source"),
        F.length(src).alias("n_chars"))


def ipynb_text(df: DataFrame, content_col: str = "content",
               id_col: str = "doc_id",
               sep: str = "\n\n") -> DataFrame:
    """One notebook blob -> one text row:
    ``(id, text, n_cells, n_code, n_markdown, language, nbformat)``.

    ``text`` is the markdown and code cell sources in document order
    joined by ``sep`` — the nbconvert script/text-exporter convention;
    ``raw`` cells are excluded by design (they are format-targeted
    passthrough, not prose or code).  Markdown bodies are kept
    verbatim here: stripping is the downstream scan-level
    ``textstats.strip_markdown`` stage, composed by the caller so the
    extractor stays a pure reader.  Everything is higher-order array
    functions over the variant — no explode, no shuffle, no Python."""
    v = F.try_parse_json(F.col(content_col))
    cells = F.variant_get(v, "$.cells", "array<variant>")
    typed = F.transform(
        cells,
        lambda c: F.struct(
            F.variant_get(c, "$.cell_type", "string").alias("t"),
            _cell_source(c).alias("s")))
    kept = F.filter(typed, lambda p: p["t"].isin("markdown", "code"))

    def count_of(kind):
        # ANSI size(NULL) is NULL; -1 marks the junk-blob triage row
        return F.coalesce(
            F.size(F.filter(typed, lambda p: p["t"] == kind)),
            F.lit(-1))

    return df.select(
        id_col,
        F.when(cells.isNotNull(), F.array_join(
            F.transform(kept, lambda p: p["s"]), sep))
         .alias("text"),
        F.coalesce(F.size(cells), F.lit(-1)).alias("n_cells"),
        count_of("code").alias("n_code"),
        count_of("markdown").alias("n_markdown"),
        F.variant_get(v, "$.metadata.kernelspec.language", "string")
         .alias("language"),
        F.variant_get(v, "$.nbformat", "int").alias("nbformat"))
