"""File sources and sinks for TimeSeries.

The reference only ingests in-memory wire dicts (``series.py:95-163``); a
Spark engine's natural sources are columnar files. All readers return a lazy
TimeSeries; nothing is scanned until an action. Parquet is the scale path:
predicate pushdown + column pruning reach the scan (verify with
``df.explain``), and a time-partitioned layout (``to_parquet(partition_by=
...)``) gives partition pruning on crop()/window queries.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..series import TimeSeries
from ..wire import read_wire


def _normalize(df, time_col: str, payload: Sequence[str] | None):
    if time_col != "time":
        df = df.withColumnRenamed(time_col, "time")
    if dict(df.dtypes).get("time") in ("bigint", "long"):
        df = df.withColumn("time", F.timestamp_millis(F.col("time")))
    elif dict(df.dtypes).get("time") == "timestamp_ntz":
        # naive timestamps carry the stored instant; session tz is UTC
        df = df.withColumn("time", F.col("time").cast("timestamp"))
    if payload is not None:
        df = df.select("time", *payload)
    return df


def read_parquet(spark: SparkSession, path: str, time_col: str = "time",
                 payload: Sequence[str] | None = None,
                 name: str | None = None) -> TimeSeries:
    df = _normalize(spark.read.parquet(path), time_col, payload)
    return TimeSeries(df, "time", {"name": name or path})


def read_json_lines(spark: SparkSession, path: str, time_col: str = "time",
                    payload: Sequence[str] | None = None,
                    name: str | None = None, schema=None) -> TimeSeries:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = _normalize(reader.json(path), time_col, payload)
    return TimeSeries(df, "time", {"name": name or path})


def read_csv(spark: SparkSession, path: str, time_col: str = "time",
             payload: Sequence[str] | None = None,
             name: str | None = None, **options) -> TimeSeries:
    options.setdefault("header", "true")
    options.setdefault("inferSchema", "true")
    df = _normalize(spark.read.options(**options).csv(path), time_col, payload)
    return TimeSeries(df, "time", {"name": name or path})


def read_wire_file(spark: SparkSession, path: str) -> TimeSeries:
    """A pypond wire-format JSON document on disk -> TimeSeries."""
    with open(path) as fh:
        wire = json.load(fh)
    df, kind, meta = read_wire(spark, wire)
    return TimeSeries(df, kind, meta)


def to_parquet(ts: TimeSeries, path: str, mode: str = "overwrite",
               partition_by: Sequence[str] | None = None) -> None:
    """Persist a series columnar. ``partition_by`` time-derived columns
    (e.g. a date column) buys partition pruning for time-range queries."""
    writer = ts.df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(df, table: str, bucket_cols: Sequence[str],
                   n_buckets: int = 32,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist a DataFrame hash-bucketed on join/aggregation keys — the
    co-location contract that removes the shuffle from every later join or
    groupBy on those keys.

    Spark records bucketing in the catalog (``bucketBy`` requires
    ``saveAsTable``); two tables bucketed on the same keys with the same
    count join with ZERO Exchange operators — at 100 TB the dominant cost
    of a fact-fact join disappears. ``sort_cols`` additionally pre-sorts
    within buckets so sort-merge joins skip the per-task sort.
    """
    writer = df.write.mode(mode).format("parquet") \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str):
    """Read a catalog table (e.g. one persisted by :func:`write_bucketed`,
    whose bucketing metadata then feeds exchange-free planning)."""
    return spark.table(table)
