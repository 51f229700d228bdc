"""Event static-method parity layer (reference ``pypond/event.py:750-1154``).

The reference exposes merge/combine/sum/avg and a columnar map/reduce suite
as ``Event`` staticmethods over python lists of events. Here the same
operations act on DataFrames (events ARE rows); these wrappers exist so a
reference user finds the familiar names.
"""

from __future__ import annotations



from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import compile_agg
from .operators import merge as _merge_ops


def merge(df: DataFrame, kind: str = "time") -> DataFrame:
    """``Event.merge`` (``event.py:750-843``): deep-merge events per key."""
    return _merge_ops.merge(df, kind)


def combine(df: DataFrame, field_spec, reducer, kind: str = "time") -> DataFrame:
    """``Event.combine`` (``event.py:845-961``): per-key field reduction."""
    return _merge_ops.combine(df, field_spec, reducer, kind)


def sum(df: DataFrame, field_spec="value", kind: str = "time") -> DataFrame:  # noqa: A001
    """``Event.sum`` (``event.py:965-997``)."""
    return combine(df, field_spec, "sum", kind)


def avg(df: DataFrame, field_spec="value", kind: str = "time") -> DataFrame:
    """``Event.avg`` (``event.py:999-1029``)."""
    return combine(df, field_spec, "avg", kind)


def map(df: DataFrame, field_spec="value") -> DataFrame:  # noqa: A001
    """``Event.map`` (``event.py:1033-1092``): column -> list of its values.

    Returns one row per field: (field, values array). The reference returns
    ``{field: [v, ...]}``; collect to get exactly that shape.
    """
    fields = [field_spec] if isinstance(field_spec, str) else list(field_spec)
    rows = [df.select(F.lit(f).alias("field"),
                      F.collect_list(F.col(f)).alias("values"))
            for f in fields]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def reduce(mapped: DataFrame, reducer) -> DataFrame:  # noqa: A001
    """``Event.reduce`` (``event.py:1094-1125``): reduce each field's values.

    Array position stands in for arrival order so first/last are faithful.
    """
    exploded = mapped.select(
        "field", F.posexplode_outer("values").alias("pos", "__v"))
    return exploded.groupBy("field").agg(
        compile_agg(reducer, "__v", "ignore_missing", "pos").alias("value"))


def map_reduce(df: DataFrame, field_spec, reducer) -> DataFrame:
    """``Event.map_reduce`` (``event.py:1127-1154``)."""
    return reduce(map(df, field_spec), reducer)
