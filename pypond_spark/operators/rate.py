"""Rate: per-second derivative between consecutive events.

Reference ``pypond/processor/rate.py:86-157``: for each consecutive pair emit
a TimeRangeEvent spanning ``[prev_ts, cur_ts]`` with
``<field>_rate = (cur - prev) / ((cur_ts - prev_ts) / 1000)``;
``allow_negative=False`` turns negative rates into NULL (counter-reset guard).

Spark recipe: ``lag()`` over a time-ordered window partitioned by the series
key — single projection, no UDF.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate(
    df: DataFrame,
    field_spec: str | Sequence[str] = "value",
    allow_negative: bool = True,
    partition_by: Sequence[str] = (),
    time_col: str = "time",
    counter_wrap: int | float | None = None,
) -> DataFrame:
    """Returns ``(*partition_by, begin, end, <field>_rate...)`` rows, one per
    consecutive event pair.

    ``counter_wrap`` (engine addition for the reference's home domain,
    SNMP-style monotone counters): treat the field as a counter of that
    modulus — a negative delta is a wrap, corrected to
    ``cur + wrap - prev`` (e.g. ``2**32``/``2**64`` for ifInOctets-style
    counters). ``allow_negative=False`` instead NULLs negative rates (the
    counter-RESET guard, reference ``rate.py:139-157``); the two options
    are mutually exclusive ways to read a decrease."""
    if counter_wrap is not None and not allow_negative:
        raise ValueError("counter_wrap corrects negative deltas; "
                         "allow_negative=False would mask the correction")
    fields = [field_spec] if isinstance(field_spec, str) else list(field_spec)
    keys = list(partition_by)

    w = Window.partitionBy(*keys).orderBy(time_col)
    ms = F.unix_millis(F.col(time_col))
    prev_ms = F.lag(ms).over(w)
    sec_delta = (ms - prev_ms) / F.lit(1000.0)

    out = []
    for f in fields:
        cur = F.col(f).try_cast("double")
        prev = F.lag(cur).over(w)
        delta = cur - prev
        if counter_wrap is not None:
            delta = F.when(delta < 0, delta + F.lit(float(counter_wrap))) \
                .otherwise(delta)
        # try_divide: duplicate timestamps yield NULL instead of an ANSI
        # DIVIDE_BY_ZERO crash (matches the streaming twin's dt==0 guard)
        r = F.try_divide(delta, sec_delta)
        if not allow_negative:
            r = F.when(r < 0, F.lit(None).cast("double")).otherwise(r)
        out.append(r.alias(f"{f}_rate"))

    return (
        df.select(*keys,
                  F.timestamp_millis(prev_ms).alias("begin"),
                  F.col(time_col).alias("end"), *out)
        .where(F.col("begin").isNotNull())
    )


def integrate(
    df: DataFrame,
    window: str = "1h",
    field: str = "value",
    partition_by: Sequence[str] = (),
    time_col: str = "time",
    tiebreak: str | None = None,
) -> DataFrame:
    """Trapezoidal integral + time-weighted average per fixed window
    (engine addition for the reference's monitoring home domain: TWA is
    the honest mean of an irregularly-sampled gauge, where the plain
    ``avg`` rollup over-weights bursts of dense samples).

    Each consecutive pair contributes a trapezoid
    ``(v_prev + v_cur) / 2 * dt_sec`` attributed to the window of its
    LEFT endpoint (segments are not split at window boundaries — the
    cheap, streaming-friendly convention); per (window, key):
    ``integral`` (value-seconds), ``twa`` = integral / covered seconds,
    and ``n_seg`` segments. Pairs with an invalid endpoint (NULL or
    NaN) are skipped, matching the reference's missing-data treatment
    in rate (``rate.py:139``); a window whose only segments are
    zero-length (duplicate timestamps) gets a NULL twa via try_divide
    rather than an ANSI DIVIDE_BY_ZERO abort.

    Scale shape: identical to :func:`rate` — one shuffle on the series
    key + one in-partition sort for the lag, then ONE partial-aggregable
    groupBy on (bucket, key) whose shuffle volume is bounded by
    windows x groups, never rows.
    """
    from ..index import window_duration_ms

    dur = window_duration_ms(window)
    if dur is None:
        raise ValueError(f"integrate needs a fixed window spec, "
                         f"got {window!r}")
    keys = list(partition_by)
    order = [F.col(time_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    ms = F.unix_millis(F.col(time_col))
    prev_ms = F.lag(ms).over(w)
    cur = F.col(field).try_cast("double")
    prev = F.lag(cur).over(w)
    dt_sec = (ms - prev_ms) / F.lit(1000.0)
    area = (prev + cur) / F.lit(2.0) * dt_sec
    pos = F.floor(prev_ms / F.lit(dur)).cast("long")
    pair_valid = (cur.isNotNull() & ~F.isnan(cur)
                  & prev.isNotNull() & ~F.isnan(prev))
    seg = (df.select(*keys, pos.alias("__pos"), area.alias("__area"),
                     dt_sec.alias("__dt"), pair_valid.alias("__ok"))
           .where(F.col("__ok") & F.col("__area").isNotNull()))
    return (seg.groupBy(*keys, "__pos")
            .agg(F.sum("__area").alias("integral"),
                 F.try_divide(F.sum("__area"), F.sum("__dt")).alias("twa"),
                 F.count("*").alias("n_seg"))
            .withColumnRenamed("__pos", "pos")
            .withColumn("begin_ms", F.col("pos") * F.lit(dur)))
