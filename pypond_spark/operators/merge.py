"""Time-keyed merges and combines (reference ``pypond/event.py:750-1029``).

- ``merge``: group events by key (time / index / [begin,end]), merge payloads,
  later values win on conflict (``event.py:750-843``) -> here: groupBy(key) +
  ``max_by(col, arrival)`` / ``last(col, ignorenulls)`` per column;
- ``combine``: group by key, reduce each field with a named reducer
  (``event.py:845-961``) -> ``groupBy(key).agg(...)``;
- ``dedup``: drop duplicate-key events, last wins (``collection.py:434-445``);
- series-list ops (``series.py:1526-1628``): union-by-name then merge/combine.

All of these are single-shuffle groupBy aggregations with map-side combine.
"""

from __future__ import annotations

from functools import reduce as _reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import compile_agg
from ..util import valid_or_null

KIND_KEYS = {"time": ["time"], "timerange": ["begin", "end"], "index": ["index"]}


def _keys_for(df: DataFrame, kind: str) -> list[str]:
    keys = KIND_KEYS[kind]
    if kind == "index":
        keys = [k for k in ("index", "begin", "end") if k in df.columns]
    return keys


def _merge_agg(col: F.Column, dtype) -> F.Column:
    """Per-column merge aggregate. Structs merge per LEAF (reference
    ``event.py:750-843`` deep-merges payload dicts), scalars take the last
    non-null/valid value."""
    from pyspark.sql import types as T
    if isinstance(dtype, T.StructType):
        return F.struct(*[
            _merge_agg(col.getField(f.name), f.dataType).alias(f.name)
            for f in dtype.fields
        ])
    return F.last(valid_or_null(col), ignorenulls=True)


def merge(df: DataFrame, kind: str = "time") -> DataFrame:
    """Deep-merge events sharing a key; later (by arrival order) non-null
    values win, per nested leaf for struct payloads. In a DataFrame there is
    no arrival order, so "later" is the last non-null value in the union's
    iteration order — for the dominant use (merging series with disjoint
    columns) results are identical."""
    keys = _keys_for(df, kind)
    payload = [c for c in df.columns if c not in keys]
    aggs = [_merge_agg(F.col(c), df.schema[c].dataType).alias(c)
            for c in payload]
    return df.groupBy(*keys).agg(*aggs)


def combine(df: DataFrame, field_spec: str | Sequence[str], func,
            kind: str = "time") -> DataFrame:
    """Group by event key, reduce each field with the named reducer
    (general form of Event.sum / Event.avg)."""
    keys = _keys_for(df, kind)
    fields = [field_spec] if isinstance(field_spec, str) else list(field_spec)
    time_col = keys[0]
    aggs = [compile_agg(func, f, "ignore_missing", time_col).alias(f)
            for f in fields]
    return df.groupBy(*keys).agg(*aggs)


def dedup(df: DataFrame, kind: str = "time",
          order_col: str | None = None) -> DataFrame:
    """Drop duplicate-key events, last one wins (via merge semantics).

    With ``order_col``, "last" is deterministic: the row with the max
    ``order_col`` per key survives whole (row_number over a desc window) —
    the scalable form for tables with a natural arrival column.
    """
    if order_col is None:
        return merge(df, kind)
    from pyspark.sql import Window
    keys = _keys_for(df, kind)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def union_series(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union N series DataFrames by column name, filling missing columns."""
    return _reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def timeseries_list_merge(dfs: Sequence[DataFrame], kind: str = "time") -> DataFrame:
    return merge(union_series(dfs), kind)


def timeseries_list_sum(dfs: Sequence[DataFrame],
                        field_spec: str | Sequence[str] = "value",
                        kind: str = "time") -> DataFrame:
    return combine(union_series(dfs), field_spec, "sum", kind)


def timeseries_list_reduce(dfs: Sequence[DataFrame],
                           field_spec: str | Sequence[str], func,
                           kind: str = "time") -> DataFrame:
    return combine(union_series(dfs), field_spec, func, kind)
