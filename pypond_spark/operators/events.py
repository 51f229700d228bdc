"""Per-event Python-callable map / filter — the reference's lambda surface.

Reference semantics: ``processor/mapper.py:18-67`` (``op(event) -> Event``),
``processor/filter.py:18-68`` (``op(event) -> bool``), with the same
callables accepted by ``Collection.map/filter`` (``collection.py:574-631``)
and ``Pipeline.map/filter`` (``pipeline.py:896-937``).

This is the engine's *slow path by design*: the callable is opaque Python,
so rows leave the JVM. The adapter keeps the damage bounded:

- transport is Arrow-batched ``mapInPandas`` (columnar transfer, one Python
  worker per partition) — never a row-at-a-time Python UDF per column and
  never a driver collect; the operator stays fully distributed and
  pipeline-able (no shuffle is introduced);
- the callable sees a tiny :class:`Event` view built per row from the Arrow
  batch; returning an :class:`Event`, a plain dict of fields, or (for
  filter) a bool is all it takes to port a reference lambda verbatim.

Prefer column expressions (``TimeSeries.map`` expr-dict form) whenever the
logic is expressible — those stay in whole-stage codegen.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..series import KEY_COLS


class Event:
    """Minimal Event view handed to user callables (and constructible by
    them, mirroring ``Event(ts, data)`` — reference ``event.py:65-120``).

    ``get``/``value`` support dotted deep paths into struct payloads
    (reference ``event.py:421-468``).
    """

    __slots__ = ("_keys", "_data")

    def __init__(self, timestamp: Any = None, data: dict | None = None,
                 _keys: dict | None = None):
        if _keys is not None:
            self._keys = _keys
        else:
            self._keys = {} if timestamp is None else {"time": timestamp}
        if data is not None and not isinstance(data, dict):
            # reference event.py:65-120 accepts a scalar payload and wraps
            # it as {'value': scalar}
            data = {"value": data}
        self._data = dict(data or {})

    @classmethod
    def indexed(cls, index: str, data: dict | None = None) -> "Event":
        """IndexedEvent-shaped view (reference indexed_event.py)."""
        return cls(_keys={"index": str(index)}, data=data)

    @classmethod
    def timerange(cls, begin_end: tuple, data: dict | None = None) -> "Event":
        """TimeRangeEvent-shaped view (reference timerange_event.py)."""
        begin, end = begin_end
        return cls(_keys={"begin": begin, "end": end}, data=data)

    # -- accessors (the surface reference lambdas actually use) ------------
    def get(self, field_path: str = "value", default: Any = None) -> Any:
        cur: Any = self._data
        for part in field_path.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return default
        return cur

    value = get

    def timestamp(self) -> Any:
        return self._keys.get("time", self._keys.get("begin"))

    def begin(self) -> Any:
        return self._keys.get("begin", self._keys.get("time"))

    def end(self) -> Any:
        return self._keys.get("end", self._keys.get("time"))

    def index(self) -> Any:
        return self._keys.get("index")

    def data(self) -> dict:
        return dict(self._data)

    # -- functional updates ------------------------------------------------
    def set_data(self, data: dict) -> "Event":
        return Event(_keys=dict(self._keys), data=data)

    def with_field(self, field: str, value: Any) -> "Event":
        d = dict(self._data)
        d[field] = value
        return Event(_keys=dict(self._keys), data=d)

    def event_type(self) -> str:
        """Which reference event variant this row plays: ``"time"``
        (Event), ``"index"`` (IndexedEvent) or ``"timerange"``
        (TimeRangeEvent) — determined by the key columns present."""
        if "index" in self._keys:
            return "index"
        if "begin" in self._keys and "time" not in self._keys:
            return "timerange"
        return "time"

    def key(self) -> Any:
        """The event's identity key (reference ``event.py:579-600``):
        epoch-ms timestamp for time events (the reference's ``ms_from_dt``
        normalization), the index string for indexed events, an
        ``(begin_ms, end_ms)`` pair for timerange events
        (``timerange_event.py:93-101``).  Time keys are normalized through
        :meth:`_key_ms` so duplicates compare equal regardless of whether
        the event was built from a collected row (datetime keys) or from
        wire-format ints."""
        kind = self.event_type()
        if kind == "index":
            return self._keys["index"]
        if kind == "timerange":
            return (self._key_ms(self._keys.get("begin")),
                    self._key_ms(self._keys.get("end")))
        return self._key_ms(self._keys.get("time"))

    @staticmethod
    def _key_ms(value: Any) -> int:
        """Epoch ms from an event key value.

        Naive-input contract: naive ``datetime`` and naive ISO string
        are both **UTC wall time** — the wire-format convention, and
        the same contract as :func:`~pypond_spark.util.ms_from_any`'s
        naive-string branch (the reference pypond rejects naive
        datetimes outright, ``util.py:60-75``; accepting them *as UTC*
        is the one relaxation, and it is TZ-independent).

        Provenance note: PySpark's ``TimestampType.fromInternal``
        materializes raw ``.collect()``-ed timestamps as naive
        DRIVER-LOCAL wall times — those are recovered to aware UTC at
        the library's own collect boundaries (``TimeSeries.collect`` /
        ``at_*``), where the provenance is known, so rows obtained
        through this library carry unambiguous aware datetimes.  Pandas
        ``Timestamp``s from Arrow paths (``mapInPandas`` batches) are
        session-TZ (UTC) naive wall times, which this UTC contract
        interprets correctly.  Aware datetimes and ints are always
        unambiguous; prefer them at API boundaries."""
        import datetime as _dt

        from ..util import ms_from_any
        if isinstance(value, _dt.datetime) and value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        return ms_from_any(value)

    def timestamp_as_utc_string(self) -> str:
        """Reference ``event.py:476-484``."""
        from ..humanize import format_dt
        from ..util import dt_from_ms
        return format_dt(dt_from_ms(self._key_ms(self.timestamp())))

    def timestamp_as_local_string(self) -> str:
        """Reference ``event.py:486-494``."""
        from ..humanize import format_dt
        from ..util import dt_from_ms
        return format_dt(dt_from_ms(self._key_ms(self.timestamp())),
                         localize=True)

    def timerange_as_utc_string(self) -> str:
        """Reference ``timerange_event.py`` / ``indexed_event.py``."""
        from ..timerange import TimeRange
        return TimeRange(self._key_ms(self.begin()),
                         self._key_ms(self.end())).to_utc_string()

    def timerange_as_local_string(self) -> str:
        from ..timerange import TimeRange
        return TimeRange(self._key_ms(self.begin()),
                         self._key_ms(self.end())).to_local_string()

    def to_point(self, cols: list | None = None) -> list:
        """Wire point form ``[key, v1, v2, ...]`` (reference
        ``event.py:446-470`` and the indexed/timerange variants): the key
        is the epoch-ms timestamp, the index string, or an
        ``[begin_ms, end_ms]`` pair — time keys are normalized to ms so
        the point is JSON-serializable even when the event was built from
        a collected row (datetime/pandas-Timestamp keys); ``cols`` fixes
        the payload order for wire-format alignment."""
        kind = self.event_type()
        if kind == "index":
            key: Any = self._keys["index"]
        elif kind == "timerange":
            key = [self._key_ms(self.begin()), self._key_ms(self.end())]
        else:
            key = self._key_ms(self.timestamp())
        names = list(cols) if cols is not None else list(self._data)
        return [key] + [self._data.get(c) for c in names]

    @staticmethod
    def same(event1: "Event", event2: "Event") -> bool:
        """Value equality: same key columns (time/begin/end/index) and same
        payload (reference ``event.py:636-678`` — type + pmap compare)."""
        return (isinstance(event1, Event) and isinstance(event2, Event)
                and event1._keys == event2._keys
                and event1._data == event2._data)

    @staticmethod
    def is_duplicate(event1: "Event", event2: "Event",
                     ignore_values: bool = True) -> bool:
        """True when the two events are duplicates (reference
        ``event.py:602-632``): same variant and same key; with
        ``ignore_values=False``, a full value compare as well (the
        reference's ``type() == type() and Event.same(...)``)."""
        if not (isinstance(event1, Event) and isinstance(event2, Event)):
            return False
        if event1.event_type() != event2.event_type():
            return False
        if ignore_values:
            return bool(event1.key() == event2.key())
        return Event.same(event1, event2)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Event) and Event.same(self, other)

    def __hash__(self) -> int:
        return hash((tuple(sorted(self._keys.items())), len(self._data)))

    def __repr__(self) -> str:  # debugging aid only
        return f"Event({self._keys}, {self._data})"


def _row_to_event(row: dict, key_cols: list[str]) -> Event:
    keys = {k: row[k] for k in key_cols}
    data = {c: v for c, v in row.items() if c not in key_cols}
    return Event(_keys=keys, data=data)


def _call_op(op: Callable, ev: Event) -> Any:
    """Invoke a user callable with a guided error for the common porting
    mistake: handing ``map``/``filter`` a whole-DataFrame callable (the old
    escape hatch, now :meth:`TimeSeries.transform`). Such callables call
    DataFrame methods on the Event and die with a bare AttributeError deep
    inside an executor — chain a hint instead."""
    try:
        return op(ev)
    except AttributeError as exc:
        raise TypeError(
            "map/filter callables receive one Event per row (reference "
            f"op(event) semantics) but raised: {exc}. If this callable "
            "expects a whole DataFrame, use TimeSeries.transform instead"
        ) from exc


def map_events(df: DataFrame, op: Callable[[Event], Any],
               schema: T.StructType | str | None = None) -> DataFrame:
    """Apply ``op(event) -> Event | dict`` to every row.

    A returned :class:`Event` may change the timestamp and the payload; a
    returned dict replaces the payload and keeps the original key columns.
    ``schema`` (DDL string or StructType) declares the output when ``op``
    changes the column set; default: output schema == input schema.
    """
    import pandas as pd

    out_schema = schema if schema is not None else df.schema
    if isinstance(out_schema, str):
        out_schema = T._parse_datatype_string(out_schema)
    in_cols = list(df.columns)
    key_cols = [c for c in KEY_COLS if c in in_cols]
    out_cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_rows = []
            for tup in pdf.itertuples(index=False):
                row = dict(zip(in_cols, tup))
                ev = _row_to_event(row, key_cols)
                res = _call_op(op, ev)
                if isinstance(res, Event):
                    keys, data = res._keys, res._data
                elif isinstance(res, dict):
                    keys, data = ev._keys, res
                else:
                    raise TypeError(
                        f"map op must return Event or dict, got {type(res)}")
                merged = {**keys, **data}
                out_rows.append(tuple(merged.get(c) for c in out_cols))
            yield pd.DataFrame(out_rows, columns=out_cols)

    return df.mapInPandas(run, out_schema)


def derive_string_column(df: DataFrame, op: Callable[[dict], Any],
                         name: str,
                         payload_cols: list[str] | None = None) -> DataFrame:
    """Append a string column computed by ``op(row_dict)`` — the adapter
    behind ``Pipeline.group_by(callable)`` (reference
    ``pipeline.py:516-567`` accepts arbitrary key functions).

    Same transport discipline as :func:`map_events`: Arrow-batched
    ``mapInPandas``, no shuffle, no per-row ``F.udf``. ``payload_cols``
    restricts the dict handed to ``op`` (defaults to all non-key columns).
    """
    import pandas as pd

    in_cols = list(df.columns)
    key_cols = [c for c in KEY_COLS if c in in_cols]
    pay = payload_cols if payload_cols is not None else \
        [c for c in in_cols if c not in key_cols and c != name]
    # replace an existing column of the same name (withColumn semantics) —
    # appending a second StructField would make the declared schema one
    # column wider than the pandas frame (chained group_by(callable)
    # re-derives '__group')
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != name]
        + [T.StructField(name, T.StringType())])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            # one dict per row, only the payload columns (this is the
            # bounded slow path — no full-row dict materialization)
            pdf[name] = [str(op(dict(zip(pay, tup)))) for tup in
                         pdf[pay].itertuples(index=False)]
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(run, out_schema)


def filter_events(df: DataFrame, op: Callable[[Event], bool]) -> DataFrame:
    """Keep rows where ``op(event)`` is truthy. Output schema == input."""
    in_cols = list(df.columns)
    key_cols = [c for c in KEY_COLS if c in in_cols]

    def run(batches):
        for pdf in batches:
            mask = [
                bool(_call_op(op, _row_to_event(dict(zip(in_cols, tup)),
                                                key_cols)))
                for tup in pdf.itertuples(index=False)
            ]
            yield pdf[mask]

    return df.mapInPandas(run, df.schema)
