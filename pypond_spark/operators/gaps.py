"""Gap / outage detection: silent stretches between consecutive events.

The reference models outages as TimeRangeEvents (``pypond/timerangeevent.py``
is the vehicle; the docs' flow-outage examples build them by hand from
consecutive-sample gaps). Here the detector is first-class: one ``lag()``
over a time-ordered window per series emits a TimeRange row for every
consecutive pair further apart than ``min_gap``.

Scale: identical shape to ``rate`` — a single window shuffle on the series
key, one projection, no UDF. The output is bounded by the number of gaps,
not the number of events, so the post-filter frame is tiny.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms


def find_gaps(
    df: DataFrame,
    min_gap: str | int = "15m",
    partition_by: Sequence[str] = (),
    time_col: str = "time",
) -> DataFrame:
    """Emit ``(*partition_by, gap_start, gap_end, gap_ms)`` for every
    consecutive-event pair separated by MORE than ``min_gap``.

    ``min_gap`` is a window string (``"30s"/"15m"/"2h"/"1d"``) or a
    millisecond int. ``gap_start``/``gap_end`` are the bounding event
    timestamps (the last-seen and first-seen instants around the silence).
    """
    gap_ms = (window_duration_ms(min_gap)
              if isinstance(min_gap, str) else int(min_gap))
    if gap_ms is None:
        raise ValueError(f"min_gap needs a fixed window spec, got {min_gap!r}")
    if gap_ms <= 0:
        raise ValueError(f"min_gap must be positive, got {min_gap!r}")
    keys = list(partition_by)
    w = Window.partitionBy(*keys).orderBy(time_col)
    ms = F.unix_millis(F.col(time_col))
    prev_ms = F.lag(ms).over(w)
    return (
        df.select(*keys,
                  F.timestamp_millis(prev_ms).alias("gap_start"),
                  F.col(time_col).alias("gap_end"),
                  (ms - prev_ms).alias("gap_ms"))
        .where(F.col("gap_ms") > F.lit(gap_ms))
    )
