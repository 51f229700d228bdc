"""Pipeline: the reference's fluent dataflow API on lazy DataFrame plans.

Mirrors ``pypond/pipeline.py:164-211``: a linear chain with window/group/emit
*state* that downstream processors snapshot (state-before-operator ordering,
``pipeline.py:407-620``). Here the chain IS the Catalyst logical plan — each
fluent call appends a lazy transformation; ``to_keyed_collections()`` /
``to_event_list()`` are the actions.

The reference's result keying (``io/output.py:323-330``): collections are
keyed ``"<window>--<group>"``, or ``'all'`` when both are global.

``emit_on`` has no batch-mode effect beyond result timing in the reference
(every policy converges to the same final collections after flush); it is
recorded and used by the streaming mirror (see pypond_spark.streaming).
"""

from __future__ import annotations



from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import aggregate as agg_ops
from ..operators.take import take as take_op
from ..series import TimeSeries


class Pipeline:
    """Immutable fluent builder; every call returns a new Pipeline."""

    def __init__(self, state: dict | None = None):
        self._state = state or {
            "source": None,          # TimeSeries
            "window": None,          # None | '5m' | 'daily' | ...
            "group_by": None,        # column name(s) or Column expr
            "emit_on": "eachEvent",
            "utc": True,
            "tz": "UTC",
        }

    def _next(self, **updates) -> "Pipeline":
        state = dict(self._state)
        state.update(updates)
        return Pipeline(state)

    def _ts(self) -> TimeSeries:
        ts = self._state["source"]
        if ts is None:
            raise ValueError("no source; call from_source() first")
        return ts

    def _set_ts(self, ts: TimeSeries) -> "Pipeline":
        return self._next(source=ts)

    # -- sources ---------------------------------------------------------------
    def from_source(self, src: TimeSeries | DataFrame) -> "Pipeline":
        if isinstance(src, DataFrame):
            src = TimeSeries(src, "time")
        return self._next(source=src)

    # -- state setters (reference pipeline.py:407-620) ---------------------------
    def window_by(self, window: str | None, utc: bool = True,
                  tz: str = "UTC") -> "Pipeline":
        return self._next(window=window, utc=utc, tz=tz)

    def clear_window(self) -> "Pipeline":
        return self._next(window=None)

    def group_by(self, key) -> "Pipeline":
        """Group key: column name(s), a Column expression, or — reference
        parity (``pipeline.py:516-567``) — an arbitrary Python function of a
        row dict. Callables become an Arrow-batched '__group' column
        (:func:`operators.events.derive_string_column` — the slow path;
        prefer expressions)."""
        if callable(key) and not isinstance(key, Column):
            from ..operators.events import derive_string_column
            ts = self._ts()
            grouped = derive_string_column(
                ts.df, key, "__group", payload_cols=ts.columns())
            return self._next(
                source=TimeSeries(grouped, ts.kind, ts.meta()),
                group_by="__group")
        if isinstance(key, Column):
            ts = self._ts()
            grouped = ts.df.withColumn("__group", key.cast("string"))
            return self._next(
                source=TimeSeries(grouped, ts.kind, ts.meta()),
                group_by="__group")
        return self._next(group_by=key)

    def clear_group_by(self) -> "Pipeline":
        return self._next(group_by=None)

    # -- state getters (reference pipeline.py:252-300) ------------------------
    def get_window_type(self) -> str | None:
        """'fixed' for duration specs, the calendar kind for
        daily/monthly/yearly, 'global' when unwindowed."""
        win = self._state["window"]
        if win is None:
            return "global"
        return win if win in ("daily", "monthly", "yearly") else "fixed"

    def get_window_duration(self) -> str | None:
        """The window spec string ('5m', 'daily', ...), None when
        unwindowed."""
        return self._state["window"]

    def get_group_by(self):
        return self._state["group_by"]

    def get_emit_on(self) -> str:
        return self._state["emit_on"]

    def get_utc(self) -> bool:
        return bool(self._state["utc"])

    def emit_on(self, trigger: str) -> "Pipeline":
        if trigger not in ("eachEvent", "discard", "flush"):
            raise ValueError(f"bad emit_on trigger {trigger!r}")
        return self._next(emit_on=trigger)

    # -- row transforms ----------------------------------------------------------
    def select(self, field_spec) -> "Pipeline":
        return self._set_ts(self._ts().select(field_spec))

    def filter(self, predicate) -> "Pipeline":
        return self._set_ts(self._ts().filter(predicate))

    def map(self, exprs) -> "Pipeline":
        return self._set_ts(self._ts().map(exprs))

    def collapse(self, field_spec_list, name, reducer="sum",
                 append=True) -> "Pipeline":
        return self._set_ts(
            self._ts().collapse(field_spec_list, name, reducer, append))

    def offset_by(self, by, field_spec="value") -> "Pipeline":
        return self._set_ts(self._ts().offset_by(by, field_spec))

    def clean(self, field_spec="value") -> "Pipeline":
        return self._set_ts(self._ts().clean(field_spec))

    # -- group-aware operators -----------------------------------------------------
    def _group_cols(self) -> list[str]:
        gb = self._state["group_by"]
        if gb is None:
            return []
        return [gb] if isinstance(gb, str) else list(gb)

    def take(self, limit: int) -> "Pipeline":
        ts = self._ts()
        out = take_op(ts.df, limit, self._state["window"], self._group_cols(),
                      ts.time_col)
        return self._set_ts(TimeSeries(out, ts.kind, ts.meta()))

    def aggregate(self, spec: dict) -> "Pipeline":
        ts = self._ts()
        out = agg_ops.windowed_aggregate(
            ts.df, spec, window=self._state["window"],
            group_by=self._group_cols() or None,
            utc=self._state["utc"], tz=self._state["tz"],
            time_col=ts.time_col)
        kind = "timerange" if self._state["window"] is None else "index"
        return self._set_ts(TimeSeries(out, kind, ts.meta()))

    def rate(self, field_spec="value", allow_negative=True) -> "Pipeline":
        ts = self._ts()
        return self._set_ts(
            ts.rate(field_spec, allow_negative, self._group_cols()))

    def align(self, field_spec="value", window="5m", method="linear",
              limit=None) -> "Pipeline":
        ts = self._ts()
        return self._set_ts(
            ts.align(field_spec, window, method, limit, self._group_cols()))

    def fill(self, field_spec="value", method="zero",
             fill_limit=None) -> "Pipeline":
        ts = self._ts()
        return self._set_ts(
            ts.fill(field_spec, method, fill_limit, self._group_cols()))

    # -- converters ------------------------------------------------------------------
    def as_events(self, alignment="center") -> "Pipeline":
        return self._set_ts(self._ts().as_events(alignment))

    def as_time_range_events(self, duration=None,
                             alignment="center") -> "Pipeline":
        return self._set_ts(self._ts().as_timerange_events(duration, alignment))

    def as_indexed_events(self, duration) -> "Pipeline":
        return self._set_ts(self._ts().as_indexed_events(duration))

    # -- sinks (actions) ----------------------------------------------------------------
    def to_dataframe(self) -> DataFrame:
        return self._ts().df

    def to_time_series(self) -> TimeSeries:
        return self._ts()

    def to_event_list(self) -> list:
        return self._ts().collect()

    def to_keyed_collections(self) -> dict[str, TimeSeries]:
        """Result collections keyed '<window>--<group>' / 'all'
        (reference io/output.py:323-330).

        Materializes the keyed frame in ONE pass and regroups on the driver
        (results are bounded per-key collections by the reference's contract)
        — filtering the lazy plan once per key would re-execute the whole
        upstream aggregation K times.
        """
        ts = self._ts()
        groups = self._group_cols()
        windowed = "index" in ts.df.columns
        if not windowed and not groups:
            return {"all": ts}
        key_parts: list[Column] = []
        if windowed:
            key_parts.append(F.col("index"))
        for g in groups:
            key_parts.append(F.col(g).cast("string"))
        keyed = ts.df.withColumn("__key", F.concat_ws("--", *key_parts))
        schema = ts.df.schema
        spark = ts.df.sparkSession
        by_key: dict[str, list] = {}
        for row in keyed.collect():
            vals = row.asDict()
            key = vals.pop("__key")
            by_key.setdefault(key, []).append(tuple(vals.values()))
        return {
            key: TimeSeries(spark.createDataFrame(rows, schema), ts.kind,
                            ts.meta())
            for key, rows in by_key.items()
        }
