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
