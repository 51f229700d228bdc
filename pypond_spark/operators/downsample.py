"""M4 visualization-oriented downsampling.

The reference is a charting-stack timeseries library; its rollup answers
"what is the average per bucket", but rendering needs "which POINTS must
survive so the line chart is pixel-identical". M4 (Jugel et al., VLDB
2014) keeps, per time bucket, the first/last/min/max points — provably
sufficient for pixel-perfect min-max line rendering at one bucket per
pixel column, and embarrassingly parallel (unlike LTTB, whose
triangle-area choice chains sequentially through the buckets).

Shape: drop invalid samples, ONE window shuffle on (series key, bucket)
computing four rank orders, keep rows ranked 1 by any criterion. Output
is bounded by 4 × buckets × groups regardless of input volume.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms


def m4(
    df: DataFrame,
    window: str = "1h",
    field: str = "value",
    partition_by: Sequence[str] = (),
    time_col: str = "time",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per (group, ``window``-bucket), keep the first / last / min / max
    points; a surviving row carries ``tags`` — the sorted comma-joined
    roles it plays (one physical point can be several, e.g. "first,min").

    ``tiebreak`` (a unique column) makes duplicate timestamps and
    duplicate values deterministic; without it ties fall to the earliest
    (time, value) ordering.
    """
    dur = window_duration_ms(window)
    keys = list(partition_by)
    col = F.col(field).cast("double")
    valid = col.isNotNull() & ~F.isnan(col)
    ms = F.unix_millis(F.col(time_col))
    base = df.where(valid).withColumn("__pos", F.floor(ms / F.lit(dur)))

    tb = [F.col(tiebreak)] if tiebreak else []

    def rank(*order):
        w = Window.partitionBy(*keys, "__pos").orderBy(*order, *tb)
        return F.row_number().over(w)

    t = F.col(time_col)
    tagged = base.select(
        *keys, "__pos", t, col.alias(field),
        rank(t.asc()).alias("__rf"),
        rank(t.desc()).alias("__rl"),
        rank(col.asc(), t.asc()).alias("__rn"),
        rank(col.desc(), t.asc()).alias("__rx"))
    tags = F.array_join(F.array_sort(F.filter(F.array(
        F.when(F.col("__rf") == 1, F.lit("first")),
        F.when(F.col("__rl") == 1, F.lit("last")),
        F.when(F.col("__rn") == 1, F.lit("min")),
        F.when(F.col("__rx") == 1, F.lit("max")),
    ), lambda x: x.isNotNull())), ",")
    return (tagged
            .withColumn("tags", tags)
            .where(F.col("tags") != "")
            .select(*keys, F.col("__pos").alias("pos"), time_col, field,
                    "tags"))
