"""Interval (time-range overlap) join — the range-join problem done
Spark-first.

A naive overlap join (``a.begin < b.end AND b.begin < a.end``) gives
Catalyst no equality to hash on, so it plans a broadcast-nested-loop or
cartesian — O(n·m) and a cluster-killer at scale. The standard fix is
bucketization: map every interval to the fixed time buckets it covers,
equi-join on the bucket, then apply the exact overlap predicate and
de-duplicate pairs that share several buckets.

Cost: shuffle volume is Σ(interval_length / bucket) rows per side — the
bucket size tunes the replication factor vs bucket-population tradeoff
(pick it near the median interval length). The join itself is a plain
hash shuffle join on a LONG key, so AQE skew handling applies. This is the
same strategy Databricks' range-join optimization and the interval-join
operators in stream processors use; here it composes from public DataFrame
ops only (reference semantics: pypond's TimeRange.overlaps,
``range.py:358-474``, lifted from predicate to join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms


def _bucketed(df: DataFrame, begin_col: str, end_col: str, dur_us: int,
              prefix: str, max_buckets: int | None = None) -> DataFrame:
    # microsecond bucketization: TimestampType carries micros, and the
    # exact overlap predicate compares full precision — millisecond
    # truncation here could miss an interval's last covered bucket
    b = F.unix_micros(F.col(begin_col))
    e = F.unix_micros(F.col(end_col))
    cols = [F.col(c).alias(f"{prefix}{c}") for c in df.columns]
    if max_buckets is not None:
        # long-interval skew guard: a single interval spanning k buckets
        # explodes into k rows INSIDE ONE TASK — a year-long outlier under
        # an hourly bucket would pin 8760 rows (and the sequence() array)
        # on whatever task holds it. Two-level explode instead: coarse
        # chunks of max_buckets buckets each, a redistribution on the
        # chunk key, then at most max_buckets bucket rows per chunk row —
        # no task ever materializes more than max_buckets rows per input
        # interval. Chunk boundaries are bucket-aligned, so the bucket set
        # (and therefore the join result) is identical to the direct form.
        span_us = max_buckets * dur_us
        chunks = F.when(
            e > b, F.sequence(F.floor(b / span_us), F.floor((e - 1) / span_us))
        ).otherwise(F.array().cast("array<bigint>"))
        pb, pe = f"{prefix}{begin_col}", f"{prefix}{end_col}"
        chunked = df.select(*cols, F.explode(chunks).alias("__chunk")) \
            .repartition(F.col("__chunk"))
        cb = F.unix_micros(F.col(pb))
        ce = F.unix_micros(F.col(pe))
        lo = F.greatest(cb, F.col("__chunk") * span_us)
        hi = F.least(ce, (F.col("__chunk") + 1) * span_us)
        buckets = F.sequence(F.floor(lo / dur_us), F.floor((hi - 1) / dur_us))
        return chunked.select(
            *[F.col(f"{prefix}{c}") for c in df.columns],
            F.explode(buckets).alias("__bucket"))
    # half-open [begin, end): the end-1 bucket is the last one covered;
    # empty/negative intervals cover no bucket and drop out via explode
    buckets = F.when(
        e > b, F.sequence(F.floor(b / dur_us), F.floor((e - 1) / dur_us))
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(*cols, F.explode(buckets).alias("__bucket"))


def interval_join(left: DataFrame, right: DataFrame,
                  begin_col: str = "begin", end_col: str = "end",
                  on: Sequence[str] = (), bucket: str = "1h",
                  suffixes: tuple[str, str] = ("l_", "r_"),
                  max_buckets: int | None = None) -> DataFrame:
    """All (left, right) pairs of overlapping half-open intervals
    ``[begin, end)``, optionally also matching on equality keys ``on``.

    Output columns are the left columns prefixed ``suffixes[0]`` and the
    right columns prefixed ``suffixes[1]`` (the equality keys appear once,
    unprefixed). ``bucket`` is the fixed bucketization window — set it
    near the typical interval length; longer interval outliers just
    replicate into more buckets, they never break correctness.

    ``max_buckets`` bounds per-task explode fan-out when interval lengths
    are heavy-tailed: intervals spanning more buckets are pre-split into
    bucket-aligned chunks and redistributed before the bucket explode
    (one extra shuffle per side, same join result — see ``_bucketed``).
    """
    dur_ms = window_duration_ms(bucket)
    if dur_ms is None:
        raise ValueError(f"bucket must be a fixed window spec, got {bucket!r}")
    if max_buckets is not None and max_buckets < 1:
        raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")
    dur_us = dur_ms * 1000
    lp, rp = suffixes
    a = _bucketed(left, begin_col, end_col, dur_us, lp, max_buckets)
    b = _bucketed(right, begin_col, end_col, dur_us, rp, max_buckets)
    keys = [F.col(f"{lp}{k}") == F.col(f"{rp}{k}") for k in on]
    overlap = (
        (F.col(f"{lp}{begin_col}") < F.col(f"{rp}{end_col}"))
        & (F.col(f"{rp}{begin_col}") < F.col(f"{lp}{end_col}")))
    # a pair overlapping across k buckets matches k times; keep only the
    # match in the bucket holding the overlap's start — exact single
    # emission that PRESERVES duplicate input rows (a trailing distinct()
    # would merge them) and adds no extra shuffle
    first_shared = F.floor(
        F.greatest(F.unix_micros(F.col(f"{lp}{begin_col}")),
                   F.unix_micros(F.col(f"{rp}{begin_col}"))) / dur_us)
    joined = a.join(b.withColumnRenamed("__bucket", "__rbucket"),
                    [F.col("__bucket") == F.col("__rbucket"), *keys])
    out_cols = ([F.col(f"{lp}{k}").alias(k) for k in on]
                + [F.col(f"{lp}{c}") for c in left.columns if c not in on]
                + [F.col(f"{rp}{c}") for c in right.columns if c not in on])
    return (joined.where(overlap & (F.col("__bucket") == first_shared))
            .select(*out_cols))


def span_sweep(df: DataFrame, keys: Sequence[str], b_col: str,
               e_col: str, min_gap: int = 0) -> DataFrame:
    """Window-sweep union of half-open ``[b, e)`` LONG intervals per key
    — the shared core of :func:`merge_intervals` (epoch-ms intervals)
    and ``datapipe.dedup.repeated_spans`` (character positions): an
    interval starts a new span when its begin clears the running max of
    previous ends (+ gap tolerance); the running count of starts is the
    span id; one groupBy emits ``(*keys, span_start, span_end,
    n_intervals)``. One hash exchange + one sort, both reused by the
    span groupBy.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(b_col, e_col)
    prev_max = F.max(F.col(e_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_span = F.when(
        prev_max.isNull()
        | (F.col(b_col) > prev_max + F.lit(int(min_gap))), 1).otherwise(0)
    spans = df.withColumn(
        "__span", F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (spans.groupBy(*keys, "__span")
            .agg(F.min(b_col).alias("span_start"),
                 F.max(e_col).alias("span_end"),
                 F.count("*").alias("n_intervals"))
            .drop("__span"))


def merge_intervals(df: DataFrame, begin_col: str = "begin",
                    end_col: str = "end",
                    partition_by: Sequence[str] = (),
                    min_gap_ms: int = 0) -> DataFrame:
    """Union of half-open ``[begin, end)`` intervals per key: coalesce
    every overlapping (or within ``min_gap_ms``) group into one maximal
    span — TimeRange algebra (the reference's ``TimeRange.overlaps``/
    extents, ``range.py:358-474``) lifted from two operands to a whole
    distributed table. The workhorse behind downtime/coverage math,
    SLA windows, and merging per-source availability ranges.

    The classic sweep, done with windows instead of a loop: order each
    key's intervals by begin; an interval STARTS a new span when its
    begin clears the running max of all previous ends (plus the gap
    tolerance); the running count of starts is the span id; one groupBy
    (key, span) emits the merged spans. All timestamps travel as LONG
    millis — every comparison is exact integer math.

    Scale: one hash exchange on the key + one in-partition sort feed
    BOTH window functions, and the span groupBy reuses the same
    partitioning (keys are a superset) — Spark plans exactly ONE
    shuffle. Output: ``(*keys, span_start_ms, span_end_ms, span_ms,
    n_intervals)``.
    """
    from pyspark.sql import Window

    keys = list(partition_by)
    b = F.unix_millis(F.col(begin_col))
    e = F.unix_millis(F.col(end_col))
    base = df.select(*keys, b.alias("__b"), e.alias("__e")) \
        .where(F.col("__e") > F.col("__b"))
    return (span_sweep(base, keys, "__b", "__e", min_gap_ms)
            .withColumnRenamed("span_start", "span_start_ms")
            .withColumnRenamed("span_end", "span_end_ms")
            .withColumn("span_ms",
                        F.col("span_end_ms") - F.col("span_start_ms")))


def coverage(df: DataFrame, begin_col: str = "begin",
             end_col: str = "end",
             partition_by: Sequence[str] = (),
             min_gap_ms: int = 0) -> DataFrame:
    """Total covered time per key — the scalar on top of
    :func:`merge_intervals`: ``covered_ms`` = union length (overlaps
    counted once), ``n_spans`` / ``n_intervals`` for density. Same ONE
    shuffle; the final per-key aggregation is partial-aggregable over
    the tiny merged-span frame.
    """
    keys = list(partition_by)
    merged = merge_intervals(df, begin_col, end_col, keys, min_gap_ms)
    return (merged.groupBy(*keys)
            .agg(F.sum("span_ms").alias("covered_ms"),
                 F.count("*").alias("n_spans"),
                 F.sum("n_intervals").alias("n_intervals")))
