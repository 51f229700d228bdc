"""Mergeable frequency sketches for corpus statistics at 100 TB.

Count-min sketch (Cormode & Muthukrishnan 2005): ``depth`` hash rows x
``width`` buckets of counters; every token increments one counter per
row; a term's estimate is the MIN over its row counters.  Estimates
never undercount (collisions only add), and overshoot is bounded by
``N / width`` per row w.h.p. — the standard sublinear-memory answer to
"approximate term frequencies without shuffling the whole vocabulary".

Why it matters at scale: the sketch is a fixed ``depth*width`` integer
grid regardless of vocabulary size, and it MERGES by element-wise add —
per-partition sketches combine map-side, streams union across time, and
two corpora's sketches sum.  Hashes are md5-derived (seedless,
SQL-portable), so a DuckDB oracle reproduces every counter exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypond_spark.datapipe._util import spread


def _bucket(row: int, term, width: int):
    return (F.conv(F.md5(F.concat_ws("|", F.lit(str(row)), term))
                   .substr(1, 8), 16, 10).cast("long") % F.lit(int(width)))


def _check(width: int, depth: int) -> None:
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, "
                         f"got {width}x{depth}")


def cms_token_counts(df: DataFrame, width: int = 1024, depth: int = 4,
                     text_col: str = "text") -> DataFrame:
    """Build the sketch over normalized corpus tokens.

    ONE shuffle keyed on the uniform (row, bucket) pair; the aggregate
    state is bounded by ``depth * width`` counters, never the
    vocabulary.  Output: ``(row, bucket, cnt)`` — the sketch as a skinny
    frame; element-wise-add two of these (union + re-aggregate) to merge
    corpora or stream batches.
    """
    from pypond_spark.datapipe.textstats import _match_tokens

    _check(width, depth)
    toks = (spread(df)
            .select(F.explode(F.filter(_match_tokens(text_col),
                                       lambda t: t != F.lit("")))
                    .alias("__t")))
    cells = toks.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("row"),
                 _bucket(d, F.col("__t"), width).alias("bucket"))
        for d in range(depth)])).alias("c"))
    return (cells.select("c.row", "c.bucket")
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))


def cms_audit(df: DataFrame, width: int = 8, depth: int = 3,
              text_col: str = "text") -> DataFrame:
    """Estimate-vs-truth audit: for every distinct token, the CMS
    estimate (min over rows of its counter), the exact count, and the
    overestimate (``est - exact``, always >= 0 — the sketch's one-sided
    guarantee, which the tests and the SQL oracle both pin).

    The exact side costs a vocabulary-bounded count (this is an AUDIT —
    production reads only the sketch); the estimate side joins the
    ``depth * width``-row sketch, broadcast.
    """
    from pypond_spark.datapipe.textstats import _match_tokens

    _check(width, depth)
    toks = (spread(df)
            .select(F.explode(F.filter(_match_tokens(text_col),
                                       lambda t: t != F.lit("")))
                    .alias("__t")))
    exact = toks.groupBy("__t").agg(F.count("*").alias("exact"))
    sketch = cms_token_counts(df, width, depth, text_col)
    probes = exact.select("__t", "exact", F.explode(F.array(*[
        F.struct(F.lit(d).alias("row"),
                 _bucket(d, F.col("__t"), width).alias("bucket"))
        for d in range(depth)])).alias("c")) \
        .select("__t", "exact", "c.row", "c.bucket")
    est = (probes.join(F.broadcast(sketch), ["row", "bucket"])
           .groupBy("__t", "exact").agg(F.min("cnt").alias("cms_est")))
    return est.select(F.col("__t").alias("token"), "exact", "cms_est",
                      (F.col("cms_est") - F.col("exact"))
                      .alias("overestimate"))


def _bloom_probes(h: int, key, m_bits: int):
    b = (F.conv(F.md5(F.concat_ws("|", F.lit(str(h)), key))
                .substr(1, 8), 16, 10).cast("long") % F.lit(int(m_bits)))
    return F.struct((b / 32).cast("int").alias("word"),
                    (b % 32).cast("int").alias("bit"))


def _check_bloom(m_bits: int, k: int) -> None:
    if m_bits < 32 or m_bits % 32 or k < 1:
        raise ValueError(f"m_bits must be a positive multiple of 32 and "
                         f"k >= 1, got m_bits={m_bits} k={k}")


def bloom_build(df: DataFrame, m_bits: int = 2048, k: int = 3,
                key_col: str = "digest") -> DataFrame:
    """Bloom filter over a key column (Bloom 1970) — the production
    membership structure for INCREMENTAL dedup at 100 TB: yesterday's
    corpus compresses to ``m_bits`` bits; today's batch probes it
    map-side, and "definitely new" documents skip the expensive exact
    anti-join entirely (the one-sided guarantee: no false negatives,
    false positives at the designed rate get re-checked exactly).

    Stored as unsigned 32-bit words ``(word, bits)``: one shuffle on the
    uniform bucket key, state bounded by ``m_bits/32`` rows, merged with
    any other filter by ``bit_or`` (union of key sets).  md5-derived
    probe positions make the filter byte-identical across engines.
    """
    _check_bloom(m_bits, k)
    probes = spread(df).select(F.explode(F.array(*[
        _bloom_probes(h, F.col(key_col), m_bits) for h in range(k)]))
        .alias("p"))
    # shift a LONG: 1 << 31 overflows int32 to a negative, which would
    # poison the word under bit_or and arithmetic >> on probe
    return (probes.select("p.word",
                          F.expr("shiftleft(cast(1 as bigint), p.bit)")
                          .alias("__b"))
            .groupBy("word").agg(F.bit_or("__b").alias("bits")))


def bloom_check(bloom: DataFrame, df: DataFrame, m_bits: int = 2048,
                k: int = 3, key_col: str = "digest",
                id_col: str = "doc_id") -> DataFrame:
    """Probe every row's key against a built filter: ``maybe_seen`` is
    true iff ALL ``k`` probe bits are set (one-sided — a false never).
    The filter broadcasts (it is at most ``m_bits/32`` rows), so the
    probe pass is map-side; the per-row verdict is one small groupBy on
    the id."""
    _check_bloom(m_bits, k)
    probes = (spread(df).select(F.col(id_col), F.explode(F.array(*[
        _bloom_probes(h, F.col(key_col), m_bits) for h in range(k)]))
        .alias("p"))
        .select(F.col(id_col), F.col("p.word"), F.col("p.bit")))
    hit = (probes.join(F.broadcast(bloom), "word", "left")
           .select(F.col(id_col),
                   F.coalesce(F.expr("shiftright(bits, bit)")
                              .bitwiseAND(F.lit(1)), F.lit(0))
                   .alias("__h")))
    return (hit.groupBy(id_col)
            .agg((F.min("__h") == 1).alias("maybe_seen")))
