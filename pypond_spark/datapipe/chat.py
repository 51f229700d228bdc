"""Chat / SFT conversation operators — the instruction-tuning slice.

Fine-tuning corpora ship conversations as JSON in the now-ubiquitous
messages shape: ``{"messages": [{"role": "system|user|assistant",
"content": "..."}, ...]}``.  A training pipeline needs exactly three
things done at scale: explode to per-turn rows for filtering, score
the conversation shape (turn counts, strict user/assistant
alternation, termination), and render to the training string.  All
three are pure JVM here — ``try_parse_json`` lifts the blob to
VARIANT, and every access is ``variant_get`` / higher-order array
functions: zero Python, zero shuffle, one conversation = one row.

Malformed JSON follows the triage law (``notebook.py``,
``document.py``): NULL/-1 rows, never exceptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chat_turns", "chat_stats", "chat_render"]


def _messages(content_col: str) -> Column:
    v = F.try_parse_json(F.col(content_col))
    return F.variant_get(v, "$.messages", "array<variant>")


def _role(m: Column) -> Column:
    return F.variant_get(m, "$.role", "string")


def _content(m: Column) -> Column:
    return F.variant_get(m, "$.content", "string")


def chat_turns(df: DataFrame, content_col: str = "content",
               id_col: str = "doc_id") -> DataFrame:
    """One row per message: ``(id, turn_idx, role, content,
    n_chars)``, conversation order preserved by ``posexplode``.
    Junk blobs contribute zero rows."""
    t = df.select(
        F.col(id_col),
        F.posexplode(_messages(content_col)).alias("turn_idx", "m"))
    return t.select(
        id_col, "turn_idx",
        _role(F.col("m")).alias("role"),
        _content(F.col("m")).alias("content"),
        F.length(_content(F.col("m"))).alias("n_chars"))


def chat_stats(df: DataFrame, content_col: str = "content",
               id_col: str = "doc_id",
               extra_cols: tuple = ()) -> DataFrame:
    """Per-conversation shape scores, the standard SFT filters:

    - ``n_turns`` / ``n_user`` / ``n_assistant`` (``-1`` = junk blob)
    - ``has_system`` — a system message in position 0
    - ``alternates`` — after the optional leading system turn, roles
      are exactly ``user, assistant, user, ...`` starting with user
      (the shape every chat template assumes)
    - ``ends_assistant`` — last turn is the model side (a training
      example must end on the supervised turn)
    - ``user_chars`` / ``assistant_chars`` — per-side content volume
      (length ratios are a downstream one-liner)

    ``extra_cols`` pass through unchanged — a real pipeline keeps
    its shard key / digest columns alongside the scores, and a
    linear select (rather than a re-join) is what keeps the
    streaming twin a single-pass plan.
    """
    msgs = _messages(content_col)
    roles = F.transform(msgs, _role)
    has_sys = F.try_element_at(roles, F.lit(1)) == F.lit("system")
    body = F.when(has_sys, F.slice(
        roles, 2, F.greatest(F.size(roles) - 1, F.lit(0)))) \
            .otherwise(roles)
    nb = F.size(body)
    pairwise = F.zip_with(
        F.slice(body, 1, F.greatest(nb - 1, F.lit(0))),
        F.slice(body, 2, F.greatest(nb - 1, F.lit(0))),
        lambda a, b: a != b)
    alternates = ((nb > 0)
                  & (F.try_element_at(body, F.lit(1))
                     == F.lit("user"))
                  & F.forall(body,
                             lambda r: r.isin("user", "assistant"))
                  & F.forall(pairwise, lambda x: x))

    def role_count(kind):
        return F.coalesce(
            F.size(F.filter(roles, lambda r: r == kind)), F.lit(-1))

    def role_chars(kind):
        return F.coalesce(F.aggregate(
            F.filter(msgs, lambda m: _role(m) == kind),
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.coalesce(F.length(_content(m)),
                                            F.lit(0))), F.lit(-1))

    return df.select(
        id_col,
        F.coalesce(F.size(msgs), F.lit(-1)).alias("n_turns"),
        role_count("user").alias("n_user"),
        role_count("assistant").alias("n_assistant"),
        F.coalesce(has_sys, F.lit(False)).alias("has_system"),
        F.coalesce(alternates, F.lit(False)).alias("alternates"),
        F.coalesce(F.try_element_at(roles, F.lit(-1))
                   == F.lit("assistant"),
                   F.lit(False)).alias("ends_assistant"),
        role_chars("user").alias("user_chars"),
        role_chars("assistant").alias("assistant_chars"),
        *extra_cols)


def chat_render(df: DataFrame, content_col: str = "content",
                id_col: str = "doc_id",
                start: str = "<|im_start|>", end: str = "<|im_end|>",
                sep: str = "\n",
                extra_cols: tuple = ()) -> DataFrame:
    """Render to the training string (ChatML-style by default):
    ``<|im_start|>role\\ncontent<|im_end|>`` per turn, joined by
    ``sep``.  A pure ``transform`` + ``array_join`` — the template is
    a string identity, so the oracle prices every byte."""
    msgs = _messages(content_col)
    rendered = F.array_join(
        F.transform(msgs, lambda m: F.concat(
            F.lit(start), _role(m), F.lit("\n"), _content(m),
            F.lit(end))), sep)
    return df.select(
        F.col(id_col),
        F.when(msgs.isNotNull(), rendered).alias("text"),
        *extra_cols)
