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


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _check_hll(m: int) -> None:
    if m not in _HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(_HLL_ALPHA)}, got {m}")


def hll_registers(df: DataFrame, key_col: str, m: int = 64,
                  group_cols=()) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) over a key column —
    the mergeable cardinality sketch completing the trio (CMS =
    frequency, Bloom = membership, HLL = distinct count).  ``m``
    registers of "longest run of leading zeros seen"; two sketches merge
    by element-wise MAX, so per-partition registers combine map-side and
    per-day sketches union across time.

    Register index and rank come from INDEPENDENT md5 hex ranges
    (chars 1-8 / 9-16) instead of bit-slicing one word — equally valid,
    and replayable in any engine with md5 + string ops.  The rank is
    ``33 - len(regexp_replace(lpad(bin(w), 32, '0'), '^0*', ''))``:
    pure string math (the anchored pattern has exactly one match, so
    replace-first and replace-all engines agree).  ONE shuffle on
    (group, idx); state bounded by ``m`` rows per group, never the key
    cardinality.
    """
    _check_hll(m)
    hx = F.md5(F.col(key_col))
    idx = (F.conv(hx.substr(1, 8), 16, 10).cast("long")
           % F.lit(int(m))).alias("idx")
    w = F.conv(hx.substr(9, 8), 16, 10).cast("long")
    rho = (F.lit(33) - F.length(
        F.regexp_replace(F.lpad(F.bin(w), 32, "0"), "^0*", ""))) \
        .alias("__rho")
    gcols = [F.col(c) for c in group_cols]
    return (spread(df).select(*gcols, idx, rho)
            .groupBy(*group_cols, "idx").agg(F.max("__rho").alias("reg")))


def hll_estimate(regs: DataFrame, m: int = 64,
                 group_cols=()) -> DataFrame:
    """Cardinality estimate from a register frame.  The harmonic sum
    ``S = (m - presentCount) + sum(2^-reg)`` is a sum of dyadic
    rationals with denominator <= 2^33 — EXACTLY representable in a
    double regardless of summation order, so Spark and any SQL replay
    agree bit-for-bit with no rounding.  The small-range branch
    (raw <= 2.5m with empty registers) needs ``m*ln(m/V)``; V has only
    ``m`` possible values, so the logs are precomputed literals — the
    whole estimator stays bit-exact.  Input is at most ``m`` rows per
    group: this is driver-free scalar math on a tiny frame.
    """
    import math

    _check_hll(m)
    alpha = _HLL_ALPHA[m]
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("__h"))
    s = (F.lit(m) - F.col("__n")).cast("double") + F.col("__h")
    raw = F.lit(alpha * m * m) / s
    v = F.lit(m) - F.col("__n")          # empty registers
    linear = F.element_at(
        F.array(*[F.lit(m * math.log(m / i)) for i in range(1, m + 1)]),
        v.cast("int"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("hll_est"))


def hll_audit(df: DataFrame, key_col: str, m: int = 64,
              group_cols=()) -> DataFrame:
    """Estimate-vs-truth audit per group: the HLL estimate beside the
    exact distinct count and the relative error.  The exact side is the
    audit's cost (production reads only the ``m``-row register frame);
    both sides are one shuffle each, joined on the group key (or a
    broadcast scalar cross for the global case)."""
    _check_hll(m)
    est = hll_estimate(hll_registers(df, key_col, m, group_cols),
                       m, group_cols)
    exact = (spread(df).groupBy(*group_cols)
             .agg(F.count_distinct(F.col(key_col))
                  .alias("exact_distinct")))
    if group_cols:
        joined = est.join(exact, list(group_cols))
    else:
        joined = est.crossJoin(F.broadcast(exact))
    return joined.select(
        *group_cols, "hll_est", "exact_distinct",
        F.round((F.col("hll_est") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 6).alias("rel_err"))
