"""PII detection and redaction over text columns.

A pretraining pipeline has to find and scrub personally identifiable
information (emails, phone numbers, IP addresses, national-ID numbers)
before text reaches a training corpus. Both operations here are pure
regexp column expressions — zero shuffles, one projection over the scan,
whole-stage codegen — so they run at scan speed on 100 TB and compose for
free with the other per-document signals (:mod:`textstats`,
:func:`corpus.filter_corpus`).

Patterns are written in the common subset of java.util.regex (Spark) and
RE2 (DuckDB) — character classes, bounded repetition, ``\\b`` anchors, no
backreferences or lookaround — so the DuckDB oracle evaluates the
identical automaton and the driver gate can hash-match detection counts
AND redacted text value-for-value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pypond_spark.datapipe._util import spread

# Detection/redaction patterns. Order matters for redaction: ipv4 and ssn
# must be rewritten before the looser phone pattern, or phone would eat
# digit runs inside them (each placeholder breaks the digit run).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": (r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
             r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"),
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
}


def pii_exprs(text_col: str = "text",
              kinds: list[str] | None = None) -> list[Column]:
    """Per-kind non-overlapping match counts plus a ``has_pii`` flag.

    Counts are each taken against the ORIGINAL text (kinds are independent;
    a digit run may count as both phone and ssn — detection is a signal,
    not a partition of the string). Redaction (:func:`redact`) is the
    sequential, non-double-counting view.
    """
    kinds = list(kinds or PII_PATTERNS)
    cols = [F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k]))
            .alias(f"n_{k}") for k in kinds]
    flag = None
    for k in kinds:
        c = F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k])) > 0
        flag = c if flag is None else (flag | c)
    cols.append(flag.alias("has_pii"))
    return cols


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              kinds: list[str] | None = None) -> DataFrame:
    """One row per document: match count per PII kind + ``has_pii``."""
    return spread(df).select(F.col(id_col), *pii_exprs(text_col, kinds))


def redact(text_col: str = "text", kinds: list[str] | None = None,
           token_fmt: str = "<{kind}>") -> Column:
    """Replace every PII match with a typed placeholder, e.g. ``<email>``.

    Kinds are applied in :data:`PII_PATTERNS` order (email, ipv4, ssn,
    phone) so specific patterns win over the loose phone pattern; each
    rewrite operates on the previous rewrite's output.
    """
    kinds = list(kinds or PII_PATTERNS)
    out = F.col(text_col)
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k],
                               token_fmt.format(kind=k))
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", kinds: list[str] | None = None,
               token_fmt: str = "<{kind}>") -> DataFrame:
    """One row per document: ``redacted`` text + per-kind counts removed."""
    return spread(df).select(
        F.col(id_col),
        redact(text_col, kinds, token_fmt).alias("redacted"),
        *pii_exprs(text_col, kinds))


def k_anonymity(df: DataFrame, quasi_cols: Sequence[str], k: int = 5,
                sensitive_col: str | None = None) -> DataFrame:
    """k-anonymity (Sweeney 2002) audit over quasi-identifier columns —
    the re-identification risk gate a dataset release runs: every row
    whose quasi-identifier combination is shared by fewer than ``k``
    records is individually re-identifiable by linkage.

    One row per distinct QI combination: ``(*quasi_cols, group_size,
    at_risk)`` — plus, when ``sensitive_col`` is given, ``l_diversity``
    (distinct sensitive values in the group; Machanavajjhala et al.
    2007) and ``l_at_risk`` (``l_diversity < 2``: everyone in the group
    shares one sensitive value, so k-anonymity alone leaks it — the
    homogeneity attack).

    ONE corpus-sized groupBy on the QI key (map-side combinable counts
    and a distinct-count sketch-free exact agg) — the cheapest possible
    shape; no joins, no windows.  NULL quasi-identifier values are a
    legitimate combination of their own (NULL-linkage is still
    linkage).
    """
    qi = list(quasi_cols)
    if not qi:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    aggs = [F.count("*").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col))
                    .alias("l_diversity"))
    out = spread(df).groupBy(*qi).agg(*aggs) \
        .withColumn("at_risk", F.col("group_size") < k)
    if sensitive_col is not None:
        out = out.withColumn("l_at_risk", F.col("l_diversity") < 2)
    return out
