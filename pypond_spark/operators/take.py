"""Taker: first N events per (window, group) key
(reference ``pypond/processor/taker.py:19-110``).

Spark recipe: ``row_number()`` over a window partitioned by (bucket, group)
ordered by time. At scale AQE handles the shuffle; no driver-side state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import CALENDAR_KINDS, window_duration_ms


def take(
    df: DataFrame,
    limit: int,
    window: str | None = None,
    group_by: str | Sequence[str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Keep the first ``limit`` events per (window bucket, group)."""
    groups = ([group_by] if isinstance(group_by, str) else list(group_by or []))
    parts: list = [F.col(g) for g in groups]
    if window is not None:
        if window in CALENDAR_KINDS:
            unit = {"daily": "day", "monthly": "month", "yearly": "year"}[window]
            parts.append(F.date_trunc(unit, F.col(time_col)))
        else:
            dur = window_duration_ms(window)
            if dur is None:
                raise ValueError(f"bad window spec {window!r}")
            parts.append(F.floor(F.unix_millis(F.col(time_col)) / F.lit(dur)))
    w = Window.partitionBy(*parts).orderBy(time_col) if parts else \
        Window.orderBy(time_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= limit).drop("__rn"))
