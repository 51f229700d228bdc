"""Burst detection over bucketed event streams.

Kleinberg 2002 (*Bursty and Hierarchical Structure in Streams*, KDD),
two-state automaton: per series, bucket ``t`` holds ``c_t`` of the
stream's ``n_t`` events; the base state emits at the series' overall
rate ``p0 = sum(c)/sum(n)`` and the burst state at ``p1 = min(s*p0,
0.9999)``.  Bucket cost in state ``q`` is the binomial negative
log-likelihood ``-(c*ln(p_q) + (n-c)*ln(1-p_q))``; entering the burst
state costs ``tau = gamma * ln(T)`` (T = bucket count), leaving is
free.  The minimum-cost state path (Viterbi) labels each bucket, and
maximal burst runs are emitted as intervals.

Determinism: bucket costs and ``tau`` are pinned to micro-nat BIGINTs,
so the whole DP runs in exact integers (ties broken toward the base
state's path — mirrored by the SQL replay).  The Viterbi needs the
*path*, not just the cost, so the fold carries the two candidate state
strings alongside the two costs — state is two longs + two
buckets-length strings, the same bounded-by-series-span contract as
``holt_winters`` / ``dtw_to_template``.  Like those, the DP has no
within-step parallelism but each step touches O(1) state, so it folds
as ONE scan-level ``aggregate`` over the sorted bucket frame — no
Python, no extra shuffle beyond the bucket groupBy.

There is no pypond counterpart (the reference has no burst surface);
this extends the changepoint tier (``operators/changepoint.py``) the
way CUSUM does drift — CUSUM finds level SHIFTS, this finds bounded
episodes of elevated RATE.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms

__all__ = ["kleinberg_bursts"]


def kleinberg_bursts(
    df: DataFrame,
    bucket: str = "1h",
    partition_by: Sequence[str] = (),
    s: float = 2.0,
    gamma: float = 1.0,
    p_cap: float = 0.9999,
    time_col: str = "time",
) -> DataFrame:
    """One row per burst interval: ``(*partition_by, t_start_ms,
    t_end_ms, n_buckets, weight)`` — ``t_start_ms``/``t_end_ms`` are
    the first/last burst bucket starts (epoch ms), ``n_buckets`` the
    run length, and ``weight`` Kleinberg's burst weight ``sum(cost0 -
    cost1)`` over the run in nats (rounded to 6): how much likelihood
    the burst state buys.

    ``s`` is the burst-rate multiplier (>1), ``gamma`` scales the
    entry cost ``gamma * ln(T)``, ``p_cap`` bounds ``p1`` away from 1.
    Buckets are counted per series against the WHOLE frame's bucket
    totals, so a series bursts when its *share* surges, robust to
    global traffic swings.
    """
    if s <= 1.0:
        raise ValueError(f"s must be > 1, got {s}")
    if not partition_by:
        # Degenerate by construction: with one (implicit) series, every
        # bucket's per-series count equals the frame total (__c == __n),
        # so p0 = 1 and ln(1-p0) is NULL — the whole Viterbi would go
        # NULL and silently return zero rows.  The share-based model
        # needs >= 2 series; fail loudly instead.
        raise ValueError(
            "kleinberg_bursts needs partition_by: the share-based burst "
            "model compares each series' count against the whole frame's "
            "bucket totals, which is degenerate (p0 = 1) for a single "
            "unkeyed series. For single-series burst detection against "
            "bucket capacity, bucket the series yourself and pass the "
            "bucketing column as partition_by over >= 2 series.")
    b_ms = window_duration_ms(bucket)
    if b_ms is None or b_ms <= 0:
        raise ValueError(f"bucket must be a fixed window, got {bucket!r}")
    keys = list(partition_by)
    pos = (F.floor(F.unix_millis(F.col(time_col))
                   / F.lit(b_ms))).alias("__pos")
    # per-bucket totals across the whole frame, per-series counts;
    # series x bucket grid is the totals frame joined left so silent
    # buckets cost the base state nothing but can end a burst
    tot = df.groupBy(pos).agg(F.count("*").alias("__n"))
    per = (df.groupBy(*[F.col(k) for k in keys], pos)
           .agg(F.count("*").alias("__c")))
    series = per.select(*keys).distinct()
    grid = (tot.crossJoin(F.broadcast(series)) if keys
            else tot.select("*"))
    bf = (grid.join(per, [*keys, "__pos"], "left")
          .select(*keys, "__pos", "__n",
                  F.coalesce("__c", F.lit(0)).alias("__c")))
    per_key = bf.groupBy(*keys).agg(
        F.array_sort(F.collect_list(
            F.struct("__pos", "__n", "__c"))).alias("__b"),
        F.sum("__c").alias("__cs"),
        F.sum("__n").alias("__ns"))
    # guard p0 < 1: a series owning the ENTIRE stream (__cs == __ns)
    # makes ln(1-p0) NULL; by the share model such a series cannot
    # surge, so it legitimately has no bursts — drop it explicitly
    # rather than letting a NULL Viterbi path do it silently.
    per_key = per_key.where(F.col("__cs") < F.col("__ns"))
    sr = repr(float(s))
    cr = repr(float(p_cap))
    gr = repr(float(gamma))
    p0 = "(CAST(__cs AS DOUBLE) / CAST(__ns AS DOUBLE))"
    p1 = f"least({sr} * {p0}, {cr})"
    # micro-nat bucket costs and entry cost (T = size(__b))
    cost = ("CAST(round(-(x.__c * ln({p}) + (x.__n - x.__c) "
            "* ln(1 - {p})) * 1000000.0) AS BIGINT)")
    tau = (f"CAST(round({gr} * ln(CAST(size(__b) AS DOUBLE)) "
           "* 1000000.0) AS BIGINT)")
    c0 = cost.format(p=p0)
    c1 = cost.format(p=p1)
    # Viterbi fold; ties prefer the base state's path (<=)
    fold = f"""
      aggregate(
        __b,
        named_struct('d0', 0L, 'd1', {tau}, 's0', '', 's1', ''),
        (acc, x) -> named_struct(
          'd0', IF(acc.d0 <= acc.d1, acc.d0, acc.d1) + {c0},
          'd1', IF(acc.d0 + {tau} <= acc.d1, acc.d0 + {tau}, acc.d1)
                  + {c1},
          's0', concat(IF(acc.d0 <= acc.d1, acc.s0, acc.s1), '0'),
          's1', concat(IF(acc.d0 + {tau} <= acc.d1, acc.s0, acc.s1),
                       '1')),
        acc -> IF(acc.d0 <= acc.d1, acc.s0, acc.s1))
    """
    labeled = per_key.select(
        *keys, "__b", "__cs", "__ns", F.expr(fold).alias("__path"))
    # burst buckets -> gaps-and-islands on position index; per-bucket
    # gain g = cost0 - cost1 accumulates the run's weight
    gain = (f"({c0} - {c1})".replace("x.__c", "__b[i - 1].__c")
            .replace("x.__n", "__b[i - 1].__n"))
    hits = labeled.select(
        *keys,
        F.explode(F.expr(
            f"""filter(transform(sequence(1, size(__b)),
                 i -> named_struct(
                   'i', i, 'p', __b[i - 1].__pos, 'g', {gain})),
                 e -> substring(__path, e.i, 1) = '1')"""
        )).alias("__h"))
    w = (F.col("__h.i")
         - F.row_number().over(
             Window.partitionBy(*(keys or [F.lit(1)]))
             .orderBy("__h.i"))).alias("__isl")
    runs = (hits.select(*keys, "__h", w)
            .groupBy(*keys, "__isl")
            .agg(F.min(F.col("__h.p")).alias("__p0"),
                 F.max(F.col("__h.p")).alias("__p1"),
                 F.count("*").alias("n_buckets"),
                 F.round(F.sum(F.col("__h.g")) / 1e6, 6)
                 .alias("weight")))
    return runs.select(
        *keys,
        (F.col("__p0") * F.lit(b_ms)).alias("t_start_ms"),
        (F.col("__p1") * F.lit(b_ms)).alias("t_end_ms"),
        "n_buckets", "weight")
