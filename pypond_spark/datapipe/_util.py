"""Shared datapipe helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sums(df: DataFrame, order_exprs: list[Column],
                       cols: list[str],
                       prefix: str = "__pre_") -> DataFrame:
    """Exclusive prefix sums of ``cols`` in a GLOBAL order, with no
    single-partition window stage.

    ``Window.orderBy(...)`` with no partitionBy funnels the whole frame
    through ONE task — fine for a few thousand rows, fatal for the
    corpus-sized frames a web-scale run produces (a 10^8-value distinct
    frame is still 10^8 rows).  This is the distributed two-pass
    zipWithIndex recipe generalized from ranks to running sums
    (:meth:`pypond_spark.series.TimeSeries.slice`): range-repartition
    on the order, materialize once (localCheckpoint pins the sampled
    range boundaries so both passes see identical partitioning), pull
    the O(partitions) per-partition column totals to the driver, and
    add each partition's cumulative offset to a partition-LOCAL
    exclusive window sum.  Cost: one range exchange + one bounded
    collect; every stage is cluster-wide.

    Adds ``{prefix}{col}`` (BIGINT, exclusive — the sum over all
    strictly-earlier rows) per requested column.  Ties in the order are
    resolved by the caller's order_exprs; pass a tiebreak column when
    exclusive sums must be deterministic under ties.
    """
    spark = df.sparkSession
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    part = (df.repartitionByRange(n_parts, *order_exprs)
            .localCheckpoint()
            .withColumn("__gps_pid", F.spark_partition_id()))
    totals = sorted(
        (r["__gps_pid"], tuple(r[c] or 0 for c in cols))
        for r in part.groupBy("__gps_pid")
        .agg(*[F.sum(c).alias(c) for c in cols]).collect())
    offsets: dict[int, tuple[int, ...]] = {}
    acc = tuple(0 for _ in cols)
    for pid, sums in totals:
        offsets[pid] = acc
        acc = tuple(a + s for a, s in zip(acc, sums))
    w = (Window.partitionBy("__gps_pid").orderBy(*order_exprs)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = part
    for i, c in enumerate(cols):
        off = (F.element_at(
            F.create_map(*[F.lit(v) for pid in offsets
                           for v in (pid, offsets[pid][i])]),
            F.col("__gps_pid")) if offsets else F.lit(0))
        out = out.withColumn(
            prefix + c,
            F.coalesce(F.sum(c).over(w), F.lit(0)) + off)
    return out.drop("__gps_pid")


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
