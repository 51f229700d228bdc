"""Text analysis: quality scoring, language ID, token counting, fingerprints.

Everything here is built-in column expressions (JVM-side, codegen) — a
deliberate choice so these run at scan speed on 100 TB of documents. The
functions are also chosen to be SQL-portable (md5, length, regexp) so the
DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pypond_spark.datapipe._util import spread

TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "y"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _tokens(text_col: str) -> Column:
    """Whitespace tokens, empty strings dropped (split('') yields [''])."""
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != F.lit(""))


def _match_tokens(text_col: str) -> Column:
    """Tokens normalized for marker/stopword matching: lowercased with
    leading/trailing punctuation stripped ('The' / 'the,' both match 'the')."""
    return F.transform(
        _tokens(text_col),
        lambda t: F.regexp_replace(F.lower(t),
                                   "(^[^a-z0-9]+)|([^a-z0-9]+$)", ""))


def token_count(text_col: str = "text") -> Column:
    """BPE-ish token count: letter runs, digit runs, and single symbols."""
    return F.regexp_count(F.col(text_col), F.lit(TOKEN_RE))


def quality_stats(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: length, words, punct & stopword ratios."""
    toks = _tokens(text_col)
    n_words = F.size(toks)
    stop_hits = F.size(F.filter(_match_tokens(text_col),
                                lambda t: t.isin(*STOPWORDS)))
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"))
    return spread(df).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_words.alias("n_words"),
        token_count(text_col).alias("n_tokens"),
        (F.length(F.regexp_replace(text_col, r"\s+", "")) /
         F.greatest(n_words, F.lit(1))).alias("avg_word_len"),
        (n_punct.cast("double") /
         F.greatest(F.length(text_col), F.lit(1))).alias("punct_ratio"),
        (stop_hits.cast("double") /
         F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language,
    argmax wins (ties resolved in LANG_MARKERS order, 'und' if all zero)."""
    toks = _match_tokens(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # earlier languages win ties: lang_i is picked iff its score is >= every
    # later language's score and > 0
    best = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        later = [scores[l] for l in langs[i + 1:]]
        cond = (scores[lang] > 0)
        if later:
            cond = cond & (scores[lang] >= F.greatest(*later) if len(later) > 1
                           else scores[lang] >= later[0])
        best = F.when(cond, F.lit(lang)).otherwise(best)
    best_score = F.greatest(*scores.values())
    return df.select(F.col(id_col), best.alias("lang_pred"),
                     best_score.alias("lang_score"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shingle_n: int = 3,
                hash_fn: str = "md5") -> DataFrame:
    """Document fingerprint: min digest over word n-gram shingles
    (a 1-hash MinHash — the winnowing idea reduced to one band).

    ``hash_fn='md5'`` is cross-engine reproducible; ``'xxhash64'`` is the
    ~10x fast path (fingerprint column becomes a LONG rendered as string).
    """
    toks = _tokens(text_col)
    count = F.greatest(F.size(toks) - (shingle_n - 1), F.lit(1))
    if hash_fn == "md5":
        hasher = lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, shingle_n)))  # noqa: E731
    elif hash_fn == "xxhash64":
        hasher = lambda i: F.xxhash64(  # noqa: E731
            F.concat_ws(" ", F.slice(toks, i, shingle_n))).cast("string")
    else:
        raise ValueError(f"hash_fn must be md5|xxhash64, got {hash_fn!r}")
    shingles = F.transform(F.sequence(F.lit(1), count), hasher)
    return spread(df).select(F.col(id_col),
                             F.array_min(shingles).alias("fingerprint"))
