"""Wire format ⇄ DataFrame codec.

The reference interchange contract (``pypond/series.py:35-49``)::

    {"name": "traffic", "columns": ["time", "value", "status"],
     "points": [[1400425947000, 52, "ok"], ...]}

``columns[0]`` selects the event kind (``series.py:89-93``):
``time`` -> instant events, ``timerange`` -> ``[[begin_ms, end_ms], v...]``
points, ``index`` -> ``["5m-123", v...]`` points.

Schema is inferred once at ingest from the ``columns`` list plus sampled point
values (the reference unions per-event keys, ``series.py:554-577``; collections
are homogeneous so one inference is sound). Nested dict payloads become
``StructType`` so deep paths (``direction.in``) are native struct access.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .index import parse_index
from .util import dt_from_ms, ms_from_any

EVENT_KINDS = ("time", "timerange", "index")


def _infer_type(values: list[Any]) -> T.DataType:
    """Infer a leaf/struct type from sampled python values (None/NaN skipped)."""
    has_float = has_int = has_str = has_bool = False
    dicts: list[dict] = []
    for val in values:
        if val is None or (isinstance(val, float) and math.isnan(val)):
            has_float |= isinstance(val, float)
            continue
        if isinstance(val, bool):
            has_bool = True
        elif isinstance(val, int):
            has_int = True
        elif isinstance(val, float):
            has_float = True
        elif isinstance(val, str):
            has_str = True
        elif isinstance(val, dict):
            dicts.append(val)
        else:
            raise TypeError(f"unsupported wire payload value {val!r}")
    if dicts and (has_float or has_int or has_str or has_bool):
        raise TypeError(
            "wire column mixes nested dict and scalar values; "
            "payload columns must be homogeneous")
    if dicts:
        keys: list[str] = []
        for dct in dicts:
            for key in dct:
                if key not in keys:
                    keys.append(key)
        return T.StructType([
            T.StructField(k, _infer_type([d.get(k) for d in dicts]), True)
            for k in keys
        ])
    if has_str:
        return T.StringType()
    if has_float:
        return T.DoubleType()
    if has_int:
        return T.LongType()
    if has_bool:
        return T.BooleanType()
    return T.DoubleType()  # all-null column: default numeric


def _nan_to_none(val: Any) -> Any:
    if isinstance(val, float) and math.isnan(val):
        return None
    if isinstance(val, dict):
        return {k: _nan_to_none(v) for k, v in val.items()}
    return val


def _to_row_value(val: Any, dtype: T.DataType) -> Any:
    val = _nan_to_none(val)
    if val is None:
        return None
    if isinstance(dtype, T.StructType):
        return Row(**{f.name: _to_row_value(val.get(f.name), f.dataType)
                      for f in dtype.fields})
    if isinstance(dtype, T.DoubleType):
        return float(val)
    if isinstance(dtype, T.LongType):
        return int(val)
    return val


def read_wire(spark: SparkSession, wire: dict) -> tuple[DataFrame, str, dict]:
    """Wire dict -> (DataFrame, event_kind, metadata)."""
    columns = list(wire["columns"])
    points = wire.get("points", [])
    kind = columns[0]
    if kind not in EVENT_KINDS:
        raise ValueError(f"columns[0] must be one of {EVENT_KINDS}, got {kind!r}")
    payload_cols = columns[1:]

    # infer payload schema from all points (small driver-side data by contract)
    col_types = {
        name: _infer_type([p[i + 1] for p in points])
        for i, name in enumerate(payload_cols)
    }

    if kind == "time":
        key_fields = [T.StructField("time", T.TimestampType(), False)]
    elif kind == "timerange":
        key_fields = [T.StructField("begin", T.TimestampType(), False),
                      T.StructField("end", T.TimestampType(), False)]
    else:
        key_fields = [T.StructField("index", T.StringType(), False),
                      T.StructField("begin", T.TimestampType(), False),
                      T.StructField("end", T.TimestampType(), False)]
    schema = T.StructType(
        key_fields + [T.StructField(n, col_types[n], True) for n in payload_cols])

    rows = []
    for point in points:
        key, *vals = point
        if kind == "time":
            keyvals = (dt_from_ms(ms_from_any(key)),)
        elif kind == "timerange":
            keyvals = (dt_from_ms(ms_from_any(key[0])), dt_from_ms(ms_from_any(key[1])))
        else:
            _, bms, ems = parse_index(key)
            keyvals = (key, dt_from_ms(bms), dt_from_ms(ems))
        rows.append(tuple(keyvals) + tuple(
            _to_row_value(v, col_types[n]) for n, v in zip(payload_cols, vals)))

    meta = {k: v for k, v in wire.items() if k not in ("columns", "points")}
    return spark.createDataFrame(rows, schema), kind, meta


def _from_row_value(val: Any) -> Any:
    if isinstance(val, Row):
        return {k: _from_row_value(v) for k, v in val.asDict().items()}
    # NaN -> None: keeps the wire JSON valid (bare NaN is not JSON) and the
    # round trip symmetric with read_wire's NaN handling
    return _nan_to_none(val)


def to_wire(df: DataFrame, kind: str, meta: dict | None = None) -> dict:
    """DataFrame -> wire dict (an action: collects to the driver, time-sorted)."""
    meta = dict(meta or {})
    # epoch-ms keys are derived IN Spark (unix_millis): collecting raw
    # TimestampType yields naive datetimes in the driver's OS timezone,
    # which would shift every key on a non-UTC machine
    if kind == "time":
        first_col = "time"
        df = df.withColumn("__ms", F.unix_millis(F.col("time"))) \
            .orderBy("__ms")
    elif kind == "timerange":
        first_col = "timerange"
        df = (df.withColumn("__bms", F.unix_millis(F.col("begin")))
              .withColumn("__ems", F.unix_millis(F.col("end")))
              .orderBy("__bms"))
    elif kind == "index":
        first_col = "index"
        # time order, never lexicographic ('5m-9' > '5m-100' as strings)
        from .index import index_begin_col
        sort_key = "begin" if "begin" in df.columns \
            else index_begin_col(F.col("index"))
        df = df.orderBy(sort_key)
    else:
        raise ValueError(f"unknown event kind {kind!r}")

    payload_cols = [c for c in df.columns
                    if c not in ("time", "begin", "end", "index",
                                 "__ms", "__bms", "__ems")]
    points = []
    for row in df.collect():
        if kind == "time":
            key = row["__ms"]
        elif kind == "timerange":
            key = [row["__bms"], row["__ems"]]
        else:
            key = row["index"]
        points.append([key] + [_from_row_value(row[c]) for c in payload_cols])

    out = dict(meta)
    out["columns"] = [first_col] + payload_cols
    out["points"] = points
    return out


def _aware(dtime):
    import datetime
    if dtime.tzinfo is None:
        return dtime.replace(tzinfo=datetime.timezone.utc)
    return dtime
