"""Fixed-width histogram aggregation.

Value-distribution summaries (per series, per group, or global) — the
OLAP companion to the quantile reducers in ``functions.py``: quantiles
answer "what value sits at rank q", histograms answer "how much mass sits
in each bin", and at 100 TB the histogram is the cheap one: a map-side
``floor(value / width)`` projection plus ONE partial-aggregated shuffle
whose volume is bounded by (groups x occupied bins), never by rows.
Invalid samples (NULL/NaN) drop, mirroring the agg-spec reducers'
``ignore_missing`` default.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, field: str = "value", bin_width: float = 1.0,
              partition_by: Sequence[str] = ()) -> DataFrame:
    """Count rows per fixed-width value bin, optionally per group.

    Bins anchor at 0: bin k covers ``[k * bin_width, (k+1) * bin_width)``
    (negative values fall in negative bins — floor, not truncation).
    Output: ``partition_by..., bin, bin_lo, bin_hi, n``; empty bins are
    absent (at scale, materializing empties would dwarf the data).
    """
    if not bin_width > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    col = F.col(field).cast("double")
    valid = col.isNotNull() & ~F.isnan(col)
    bin_ = F.floor(col / F.lit(float(bin_width)))
    out = (df.where(valid)
           .groupBy(*partition_by, bin_.alias("bin"))
           .agg(F.count("*").alias("n")))
    w = F.lit(float(bin_width))
    return out.select(*partition_by, "bin",
                      (F.col("bin") * w).alias("bin_lo"),
                      ((F.col("bin") + 1) * w).alias("bin_hi"),
                      "n")


def heatmap(df: DataFrame, window: str = "1h", field: str = "value",
            bin_width: float = 1.0, partition_by: Sequence[str] = (),
            time_col: str = "time") -> DataFrame:
    """Time x value density matrix: count per (``window``-bucket, value
    bin) — the latency/utilization heatmap behind ops dashboards, and the
    distribution-over-time complement of :func:`histogram`.

    Same scale shape as the 1-D histogram: map-side floor-binning on both
    axes, ONE partial-aggregated shuffle bounded by buckets x occupied
    bins x groups (never rows). Output:
    ``partition_by..., pos, bin, bin_lo, bin_hi, n``.
    """
    from ..index import window_duration_ms
    dur = window_duration_ms(window)
    if dur is None:
        raise ValueError(f"heatmap needs a fixed window spec, got {window!r}")
    pos = F.floor(F.unix_millis(F.col(time_col)) / F.lit(dur))
    return histogram(df.withColumn("__pos", pos), field, bin_width,
                     [*partition_by, "__pos"]) \
        .withColumnRenamed("__pos", "pos")
