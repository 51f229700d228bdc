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
