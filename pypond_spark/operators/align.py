"""Align: resample events onto regular window boundaries.

Reference ``pypond/processor/align.py:30-258``. For each consecutive pair of
events that straddles one or more window boundaries, synthesize an event at
each boundary crossed:

- ``linear``: time-weighted interpolation
  ``prev + (cur - prev) * (boundary - prev_ts) / (cur_ts - prev_ts)``
  (``align.py:164-204``);
- ``hold``: carry the previous value (``align.py:141-162``);
- ``limit``: if the number of boundaries in one span exceeds the limit, the
  *whole span* is synthesized with NULL values (``align.py:240-243``);
- the first event is emitted only if it already sits exactly on a boundary
  (``align.py:224-230``).

Spark recipe: one pass of ``lag()`` over a time-ordered window, boundary grid
via ``sequence()`` + ``explode`` — fully JVM-side, no UDF. At scale the window
is partitioned by the series/group key (align is per-series by construction);
an unpartitioned align on one giant series is the documented single-partition
fallback.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms


def align(
    df: DataFrame,
    window: str,
    field_spec: str | Sequence[str] = "value",
    method: str = "linear",
    limit: int | None = None,
    partition_by: Sequence[str] = (),
    time_col: str = "time",
) -> DataFrame:
    """Returns a DataFrame of synthesized boundary events:
    columns ``(*partition_by, time, *fields)``."""
    if method not in ("linear", "hold"):
        raise ValueError(f"align method must be linear|hold, got {method!r}")
    dur = window_duration_ms(window)
    if dur is None:
        raise ValueError(f"align needs a fixed window spec, got {window!r}")
    fields = [field_spec] if isinstance(field_spec, str) else list(field_spec)
    keys = list(partition_by)

    w = Window.partitionBy(*keys).orderBy(time_col)
    ms = F.unix_millis(F.col(time_col))
    # ONE lag of a struct instead of 1 + len(fields) scalar lags (r15:
    # the old form's prev_ms was referenced 4x in the bounds expression
    # and Catalyst materialized 4 duplicate lag window columns, and the
    # pre-explode size() filter re-inlined the whole bounds sequence()
    # 3x per row — plan-verified).  The lag struct stages once; the
    # bounds array stages behind a 1:1 inline Generate so the size and
    # the explode both read the materialized array.
    prev_struct = F.lag(F.struct(
        ms.alias("ms"),
        *[F.col(f).try_cast("double").alias(f) for f in fields])).over(w)
    lev1 = df.select(
        *[F.col(c) for c in keys], ms.alias("__ms"),
        *[F.col(f).try_cast("double").alias(f"__cur_{f}") for f in fields],
        prev_struct.alias("__prev"))
    prev_ms = F.col("__prev").getField("ms")
    pos = F.floor(F.col("__ms") / dur)
    prev_pos = F.floor(prev_ms / dur)
    # boundary bucket positions crossed by (prev, cur]; for the first event,
    # its own position iff exactly aligned
    bounds = (
        F.when(prev_ms.isNull(),
               F.when(F.col("__ms") % dur == 0, F.array(pos))
               .otherwise(F.array().cast("array<bigint>")))
        .when(pos > prev_pos, F.sequence(prev_pos + 1, pos))
        .otherwise(F.array().cast("array<bigint>"))
    )
    staged = lev1.select(
        *keys, "__ms", prev_ms.alias("__prev_ms"),
        *[F.col(f"__cur_{f}") for f in fields],
        *[F.col("__prev").getField(f).alias(f"__prev_{f}")
          for f in fields],
        F.inline(F.array(F.struct(bounds.alias("__bounds")))))

    exploded = staged.select(
        *keys, "__ms", "__prev_ms", F.size("__bounds").alias("__n"),
        *[f"__cur_{f}" for f in fields], *[f"__prev_{f}" for f in fields],
        F.explode("__bounds").alias("__bpos"))

    b_ms = F.col("__bpos") * dur
    out_fields = []
    for f in fields:
        cur, prev = F.col(f"__cur_{f}"), F.col(f"__prev_{f}")
        if method == "linear":
            interp = prev + (cur - prev) * (b_ms - F.col("__prev_ms")) / \
                (F.col("__ms") - F.col("__prev_ms"))
        else:
            interp = prev
        val = (
            F.when(F.col("__prev_ms").isNull(), cur)  # first event, already aligned
            .when(F.lit(limit is not None) & (F.col("__n") > F.lit(limit or 0)),
                  F.lit(None).cast("double"))
            .otherwise(interp)
        )
        out_fields.append(val.alias(f))

    return exploded.select(
        *keys, F.timestamp_millis(b_ms.cast("long")).alias(time_col), *out_fields)
