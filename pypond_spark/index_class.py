"""Index value class — API parity with the reference's ``Index``
(``pypond/index.py:41-92``): a string naming a canonical time bucket, with
range accessors. The heavy lifting lives in :mod:`pypond_spark.index`."""

from __future__ import annotations

import datetime

from . import index as codec
from .timerange import TimeRange


class Index:
    __slots__ = ("_string", "_kind", "_begin_ms", "_end_ms")

    def __init__(self, s: str):
        self._string = s
        self._kind, self._begin_ms, self._end_ms = codec.parse_index(s)

    @classmethod
    def get_index_string(cls, win: str, dtime: datetime.datetime) -> str:
        return codec.get_index_string(win, dtime)

    @classmethod
    def get_index_string_list(cls, win: str, timerange: TimeRange) -> list[str]:
        return codec.get_index_string_list(win, timerange.begin(),
                                           timerange.end())

    @classmethod
    def window_duration(cls, win: str) -> int | None:
        return codec.window_duration_ms(win)

    @classmethod
    def window_position_from_date(cls, win: str,
                                  dtime: datetime.datetime) -> int:
        """Bucket position for an aware datetime (ref index.py:386-405)."""
        return codec.window_position_from_date(win, dtime)

    def to_string(self) -> str:
        return self._string

    def as_string(self) -> str:
        """Alias for :meth:`to_string` (reference ``index.py:154-162``)."""
        return self._string

    def to_json(self) -> str:
        return self._string

    def __str__(self) -> str:
        return self._string

    def __repr__(self) -> str:
        return f"Index({self._string!r})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Index) and other._string == self._string

    def __hash__(self) -> int:
        return hash(self._string)

    @property
    def kind(self) -> str:
        return self._kind

    def begin(self) -> datetime.datetime:
        return self.as_timerange().begin()

    def end(self) -> datetime.datetime:
        return self.as_timerange().end()

    def as_timerange(self) -> TimeRange:
        return TimeRange(self._begin_ms, self._end_ms)

    def to_nice_string(self, fmt: str | None = None) -> str:
        begin = self.begin()
        if fmt:
            return begin.strftime(fmt)
        if self._kind == "day":
            return begin.strftime("%B %-d, %Y")
        if self._kind == "month":
            return begin.strftime("%B, %Y")
        if self._kind == "year":
            return begin.strftime("%Y")
        return self._string
