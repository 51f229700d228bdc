"""Training-data export: deterministic, size-bounded shard writing.

A pretraining corpus is consumed by data loaders that want many
same-sized files (shards), not one giant or thousand tiny parquet parts.
The Spark-native way to bound shard size is NOT a custom writer loop —
it's the planner: ``spark.sql.files.maxRecordsPerFile`` caps records per
output file with zero extra stages, and a hash repartition on the shard
key picks the parallelism. Both compose with any downstream sink format.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(df: DataFrame, path: str, *,
                          records_per_shard: int = 100_000,
                          n_tasks: int | None = None,
                          order_col: str | None = None,
                          fmt: str = "parquet",
                          mode: str = "overwrite") -> int:
    """Write ``df`` as shards of at most ``records_per_shard`` rows each.

    ``order_col`` (e.g. a pack-sequence or sample-hash column) makes shard
    contents deterministic: rows are range-partitioned and sorted within
    each task, so the same input always produces the same shard layout —
    a plain round-robin repartition would not. ``n_tasks`` bounds write
    parallelism (default: enough tasks that each writes ~one shard).
    Returns the number of write tasks used.

    At 100 TB this is one exchange (range or hash partition) followed by
    an embarrassingly parallel write; maxRecordsPerFile splits any
    oversized task output without another shuffle.
    """
    # count only when the caller didn't pin parallelism — it's a full pass
    tasks = n_tasks or max(1, math.ceil(df.count() / records_per_shard))
    if order_col is not None:
        out = (df.repartitionByRange(tasks, F.col(order_col))
               .sortWithinPartitions(order_col))
    else:
        out = df.repartition(tasks)
    (out.write.format(fmt).mode(mode)
     .option("maxRecordsPerFile", records_per_shard)
     .save(path))
    return tasks


def write_bucketed(df: DataFrame, table: str, keys, n_buckets: int,
                   *, path: str | None = None, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) parquet
    table — the co-location layout that makes every later join or
    aggregation on ``keys`` exchange-free.

    The frame is hash-repartitioned on the bucket keys FIRST so each
    bucket lands in exactly ONE file: that is the layout under which
    Spark's reader can reuse the on-disk sort too (see
    :func:`colocated_scan_conf`), turning a join of two same-bucketed
    tables into a pure merge of pre-sorted files — zero exchange,
    zero sort, verified by ``plan_shape`` in the tests.

    At 100 TB this is THE storage answer for the repeated big-join
    (fact tables joined on the same key every day): pay the shuffle
    once at write time, never again at read time.  ``n_buckets``
    should be sized so one bucket of the LARGER table fits an
    executor's scan partition (buckets are the parallelism floor).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = (df.repartition(n_buckets, *[F.col(k) for k in keys])
         .write.format("parquet").mode(mode)
         .bucketBy(n_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_scan_conf(spark) -> None:
    """Session confs under which bucketed scans expose their on-disk
    ordering (``spark.sql.legacy.bucketedTableScan.outputOrdering``)
    — required for the zero-sort merge join; one-file-per-bucket
    layout (as :func:`write_bucketed` produces) is the precondition
    that makes it sound."""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")


def bucketed_join(spark, left_table: str, right_table: str, on,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.  With
    both sides written by :func:`write_bucketed` (same ``n_buckets``,
    same keys) and :func:`colocated_scan_conf` applied, the executed
    plan is a SortMergeJoin with ZERO exchanges and ZERO sorts."""
    colocated_scan_conf(spark)
    return spark.table(left_table).join(spark.table(right_table),
                                        on, how)


def plan_shape(df: DataFrame) -> dict[str, int]:
    """Physical-plan shape counters of the EXECUTED plan — the
    numbers SCALE.md and the co-location tests assert on."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"exchanges": plan.count("Exchange"),
            "smj": plan.count("SortMergeJoin"),
            "sorts": plan.count("Sort "),
            "bcast": plan.count("BroadcastHashJoin")}
