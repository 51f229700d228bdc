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
