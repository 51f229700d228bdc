"""Cross-series correlation over aligned time buckets.

Companion to ``align``/``merge``: where the reference leaves you to merge
two TimeSeries and compute statistics by hand (``TimeSeries.timeseries_list_
merge`` + ``Collection`` reducers), this measures how two series move
together — Pearson r of their bucket-averaged values per outer window.

Shape (the part that matters at 100 TB): both series are bucketed in ONE
``groupBy(bucket)`` using conditional aggregation (``avg(CASE WHEN series=a
THEN v END)``) — a single shuffle on the bucket key whose output is one row
per bucket — then the corr() pass groups those bucket rows by the outer
window, a second shuffle over an already-tiny frame. No join, no pivot, no
second scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..index import window_duration_ms


def series_correlation(
    df: DataFrame,
    series_col: str,
    series_a: str,
    series_b: str,
    field: str = "value",
    bucket: str = "1h",
    window: str | None = "1d",
    partition_by: Sequence[str] = (),
    time_col: str = "time",
) -> DataFrame:
    """Pearson correlation between two series' bucket-mean values.

    Output: ``(*partition_by, pos?, r, n_buckets)`` — one row per outer
    ``window`` (``pos`` = epoch-anchored window position; ``window=None``
    correlates over the whole range, one row per group). ``n_buckets``
    counts buckets where BOTH series had data (corr's pairwise-complete
    semantics — a bucket missing either side contributes nothing).
    """
    b_ms = window_duration_ms(bucket)
    if b_ms is None:
        raise ValueError(f"bucket needs a fixed window spec, got {bucket!r}")
    keys = list(partition_by)
    col = F.col(field).cast("double")
    valid = col.isNotNull() & ~F.isnan(col)
    ms = F.unix_millis(F.col(time_col))
    bpos = F.floor(ms / F.lit(b_ms))

    # internal aliases, never derived from the user's series names (a name
    # with dots/spaces would break column resolution; a==b would collide)
    def side(name, alias: str) -> Column:
        return F.avg(F.when(F.col(series_col) == name, col)).alias(alias)

    buckets = (df.where(valid)
               .groupBy(*keys, bpos.alias("_bpos"))
               .agg(side(series_a, "__va"), side(series_b, "__vb")))

    va, vb = F.col("__va"), F.col("__vb")
    both = F.when(va.isNotNull() & vb.isNotNull(), 1)
    aggs = [F.corr(va, vb).alias("r"), F.count(both).alias("n_buckets")]
    if window is None:
        return buckets.groupBy(*keys).agg(*aggs)
    w_ms = window_duration_ms(window)
    if w_ms is None:
        raise ValueError(f"window needs a fixed window spec, got {window!r}")
    ratio = w_ms // b_ms
    if ratio <= 0 or w_ms % b_ms:
        raise ValueError(f"window {window!r} must be a multiple of "
                         f"bucket {bucket!r}")
    wpos = F.floor(F.col("_bpos") / F.lit(ratio))
    return buckets.groupBy(*keys, wpos.alias("pos")).agg(*aggs)
