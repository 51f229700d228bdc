"""BPE tokenization at corpus scale — merge-table inference and training.

The trick that keeps BOTH stages JVM-side (no Python in the hot path) is
the separator-string encoding of a symbol sequence: every symbol is
individually bracketed with the unit separator ``\\x1f`` (never part of
any symbol) — ``"aba"`` is ``␟a␟␟b␟␟a␟`` — so applying merge
``(x, y) -> xy`` is ONE literal ``replace`` of ``␟x␟␟y␟`` with
``␟xy␟``.  Each symbol owning BOTH its separators matters: a match
consumes nothing the next pair needs, so replace-all's left-to-right
non-overlapping scan is exactly the classic greedy single pass
(``aaaa`` + ``(a,a)`` → ``aa aa``, not ``aa a a``).  SQL ``replace``
has the same scan semantics, so a DuckDB oracle replays tokenization
verbatim.

- :func:`bpe_apply`: inference over a fixed merge table = a chain of
  ``n_merges`` nested literal replaces — pure scan-level codegen
  expressions, no shuffle, stream-safe.
- :func:`bpe_train`: Sennrich et al. 2016 training loop — each rank is
  ONE adjacent-pair count aggregate over the corpus (shuffle on the
  pair key, map-side combinable) + a 1-row argmax pulled to the driver,
  then a scan-level rewrite; ``n_merges`` iterations total.  State per
  iteration is bounded by the distinct-pair vocabulary, never O(corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pypond_spark.datapipe._util import spread

SEP = "\x1f"


def _check_merges(merges: list[tuple[str, str]]) -> None:
    for m in merges:
        if len(m) != 2 or not m[0] or not m[1] or SEP in m[0] + m[1]:
            raise ValueError(f"invalid merge {m!r}: need two non-empty "
                             f"symbols without the \\x1f separator")


def symbolize(text_col: str = "text") -> Column:
    """Initial symbol string: every character becomes a bracketed symbol
    (``"ab"`` → ``"␟a␟␟b␟"``).  ``(?s)`` so newline characters are
    symbols like any other."""
    return F.regexp_replace(F.col(text_col), "(?s)(.)", SEP + "$1" + SEP)


def _merge_pat(x: str, y: str) -> tuple[str, str]:
    return SEP + x + SEP + SEP + y + SEP, SEP + x + y + SEP


def _tokens_from_symbols(s: Column) -> Column:
    # whitespace symbols separate words but are not tokens
    return F.filter(F.split(s, SEP),
                    lambda t: (t != F.lit("")) & (F.trim(t) != F.lit("")))


def bpe_apply(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokenize with a fixed BPE merge table: one left-to-right literal
    replace pass per merge, in rank order (see module docstring for why
    this is both the classic greedy semantics and SQL-replayable).

    Merges never cross words because whitespace characters are ordinary
    symbols that no merge contains — they end up dropped from the token
    list, not merged over.

    Output: ``id_col, tokens (array<string>), n_tokens``.
    """
    _check_merges(merges)
    s = symbolize(text_col)
    for x, y in merges:
        pat, rep = _merge_pat(x, y)
        s = F.replace(s, F.lit(pat), F.lit(rep))
    toks = _tokens_from_symbols(s)
    return spread(df).select(F.col(id_col), toks.alias("tokens"),
                             F.size(toks).alias("n_tokens"))


def bpe_train(df: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016):
    repeat ``n_merges`` times — count adjacent symbol pairs (whitespace
    symbols excluded, so pairs never span words), pick the most frequent
    (ties: lexicographic (left, right) — deterministic across engines),
    rewrite the corpus with that merge.

    Each iteration is one pair-count shuffle (map-side combinable,
    state bounded by the pair vocabulary) + an O(1) driver argmax +
    a scan-level rewrite pinned with ``localCheckpoint`` so plans stay
    flat.  Returns ``[(left, right, pair_count), ...]`` in rank order.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    cur = (spread(df).select(symbolize(text_col).alias("s"))
           .localCheckpoint())
    out: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        arr = F.filter(F.split(F.col("s"), SEP), lambda t: t != F.lit(""))
        # sequence(1, 0) counts DOWN ([1, 0]) — guard docs with <2 symbols
        idx = F.when(F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)) \
            .otherwise(F.array().cast("array<int>"))
        pair = (cur.select(arr.alias("a"), idx.alias("ks"))
                .select(F.explode(F.transform(
                    F.col("ks"),
                    lambda k: F.struct(
                        F.element_at(F.col("a"), k).alias("l"),
                        F.element_at(F.col("a"), k + 1).alias("r"))))
                    .alias("p"))
                .select("p.l", "p.r")
                .where((F.trim("l") != "") & (F.trim("r") != ""))
                .groupBy("l", "r").agg(F.count("*").alias("c"))
                .orderBy(F.desc("c"), "l", "r").limit(1).collect())
        if not pair:
            break
        l, r, c = pair[0]["l"], pair[0]["r"], pair[0]["c"]
        out.append((l, r, int(c)))
        pat, rep = _merge_pat(l, r)
        cur = cur.select(F.replace("s", F.lit(pat), F.lit(rep))
                         .alias("s")).localCheckpoint()
    return out
