"""Shared datapipe helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Fan a too-coarse scan out to the cluster's parallelism.

    Shingle/token explodes multiply rows ~50x and per-row hash work runs
    downstream of the scan, so their parallelism is capped by the scan's
    partition count. A small corpus in one parquet file arrives as a single
    partition and the whole pipeline runs on one core. When the input has
    fewer partitions than ``sparkContext.defaultParallelism``, repartition
    up (round-robin; one extra shuffle of the raw text, measured 2-3x
    end-to-end win at bench scale). At warehouse scale the scan already
    yields thousands of file-splits and this is a no-op — no shuffle added.
    """
    if df.isStreaming:
        # .rdd is illegal on streaming DataFrames; micro-batch parallelism
        # is the source's concern (maxFilesPerTrigger etc.), not ours
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
