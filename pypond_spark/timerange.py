"""TimeRange value type + interval algebra (reference ``pypond/range.py``).

Python-side for driver logic (wire codec, crop arguments) and column-expression
duals for per-row predicates. Intervals are inclusive [begin, end] in epoch ms,
matching the reference (``range.py:131-182``; algebra ``range.py:358-474``).
"""

from __future__ import annotations

import datetime
import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import humanize
from .util import dt_from_ms, ms_from_any


class TimeRange:
    """Immutable inclusive [begin, end] interval of epoch-ms instants."""

    __slots__ = ("_begin", "_end")

    def __init__(self, begin: Any, end: Any = None):
        if end is None and isinstance(begin, (list, tuple)):
            begin, end = begin
        if end is None and isinstance(begin, TimeRange):
            begin, end = begin._begin, begin._end
        self._begin = ms_from_any(begin)
        self._end = ms_from_any(end)
        if self._begin > self._end:
            raise ValueError("TimeRange begin must be <= end")

    # -- accessors ----------------------------------------------------------
    def begin(self) -> datetime.datetime:
        return dt_from_ms(self._begin)

    def end(self) -> datetime.datetime:
        return dt_from_ms(self._end)

    def begin_ms(self) -> int:
        return self._begin

    def end_ms(self) -> int:
        return self._end

    def set_begin(self, when: Any) -> "TimeRange":
        """New TimeRange with a replaced begin bound (functional setter,
        reference ``range.py:287-312``)."""
        return TimeRange(when, self._end)

    def set_end(self, when: Any) -> "TimeRange":
        """New TimeRange with a replaced end bound (reference
        ``range.py:314-339``)."""
        return TimeRange(self._begin, when)

    def to_json(self) -> list[int]:
        return [self._begin, self._end]

    def duration(self) -> int:
        return self._end - self._begin

    # -- display strings (reference range.py:207-265) -------------------------
    def to_string(self) -> str:
        """``'[begin_ms, end_ms]'`` serialization form (ref range.py:207)."""
        return json.dumps(self.to_json())

    def to_local_string(self) -> str:
        """Range formatted in the machine's local time (ref range.py:217)."""
        return (f"[{humanize.format_dt(self.begin(), localize=True)}, "
                f"{humanize.format_dt(self.end(), localize=True)}]")

    def to_utc_string(self) -> str:
        """Range formatted in UTC (ref range.py:229)."""
        return (f"[{humanize.format_dt(self.begin())}, "
                f"{humanize.format_dt(self.end())}]")

    def humanize(self) -> str:
        """``'Mon, 01 Aug 2014 05:19:59 PDT to ...'`` — local-time display
        (ref range.py:240-252)."""
        return (f"{humanize.humanize_dt(self.begin())} to "
                f"{humanize.humanize_dt(self.end())}")

    def relative_string(self, now: datetime.datetime | None = None) -> str:
        """``'a day ago to now'`` — relative display (ref range.py:254-265).
        ``now`` is injectable so tests are deterministic."""
        return (f"{humanize.naturaltime(self.begin(), now)} to "
                f"{humanize.naturaltime(self.end(), now)}")

    def humanize_duration(self) -> str:
        """``'12 hours'`` — duration display (ref range.py:267-276)."""
        return humanize.humanize_duration(self.end() - self.begin())

    def __str__(self) -> str:
        return self.to_string()

    def __repr__(self) -> str:
        return f"TimeRange({self.begin().isoformat()}, {self.end().isoformat()})"

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, TimeRange) and self._begin == other._begin
                and self._end == other._end)

    def __hash__(self) -> int:
        return hash((self._begin, self._end))

    # -- algebra (reference range.py:358-474) --------------------------------
    def contains(self, other: "TimeRange | Any") -> bool:
        if isinstance(other, TimeRange):
            return self._begin <= other._begin and self._end >= other._end
        ms = ms_from_any(other)
        return self._begin <= ms <= self._end

    def within(self, other: "TimeRange") -> bool:
        return other.contains(self)

    def overlaps(self, other: "TimeRange") -> bool:
        """Strict partial overlap (reference ``range.py:396-412``): True
        only when exactly one endpoint of ``other`` falls inside this
        range — identical ranges and full containment are NOT overlaps
        in the reference's semantics.  For any-intersection, use
        :meth:`intersects`."""
        return ((self.contains(other.begin())
                 and not self.contains(other.end()))
                or (self.contains(other.end())
                    and not self.contains(other.begin())))

    def intersects(self, other: "TimeRange") -> bool:
        """Any shared instant (complement of :meth:`disjoint`) — the
        predicate interval joins want; the reference has no direct
        equivalent (its ``overlaps`` is strict partial overlap)."""
        return not self.disjoint(other)

    def disjoint(self, other: "TimeRange") -> bool:
        return self._end < other._begin or self._begin > other._end

    def extents(self, other: "TimeRange") -> "TimeRange":
        return TimeRange(min(self._begin, other._begin), max(self._end, other._end))

    def intersection(self, other: "TimeRange") -> "TimeRange | None":
        if self.disjoint(other):
            return None
        return TimeRange(max(self._begin, other._begin), min(self._end, other._end))

    # -- relative-window constructors (reference range.py:476-582) -----------
    @staticmethod
    def last(delta: datetime.timedelta,
             now: datetime.datetime | None = None) -> "TimeRange":
        end = now or datetime.datetime.now(datetime.timezone.utc)
        return TimeRange(end - delta, end)

    @classmethod
    def last_day(cls, now=None) -> "TimeRange":
        return cls.last(datetime.timedelta(days=1), now)

    @classmethod
    def last_seven_days(cls, now=None) -> "TimeRange":
        return cls.last(datetime.timedelta(days=7), now)

    @classmethod
    def last_thirty_days(cls, now=None) -> "TimeRange":
        return cls.last(datetime.timedelta(days=30), now)

    @classmethod
    def last_month(cls, now=None) -> "TimeRange":
        """Calendar-aware previous month (ref range.py:557-568): the begin
        is one month back with the day clamped to that month's length."""
        end = now or datetime.datetime.now(datetime.timezone.utc)
        return cls(humanize.monthdelta(end, -1), end)

    @classmethod
    def last_ninety_days(cls, now=None) -> "TimeRange":
        return cls.last(datetime.timedelta(days=90), now)

    @classmethod
    def last_year(cls, now=None) -> "TimeRange":
        return cls.last(datetime.timedelta(days=365), now)


# ---------------------------------------------------------------------------
# column-expression interval predicates over (begin, end) timestamp columns
# ---------------------------------------------------------------------------


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def range_contains_time(begin: Column | str, end: Column | str,
                        time: Column | str) -> Column:
    return (_c(begin) <= _c(time)) & (_c(time) <= _c(end))


def ranges_overlap(b1: Column | str, e1: Column | str,
                   b2: Column | str, e2: Column | str) -> Column:
    """Any-intersection ("intersects") — the interval-join predicate.
    Documented deviation: the reference's ``overlaps`` (range.py:396-412)
    is strict partial overlap; that dual is
    :func:`ranges_overlap_strict`."""
    return (_c(b1) <= _c(e2)) & (_c(b2) <= _c(e1))


def ranges_overlap_strict(b1: Column | str, e1: Column | str,
                          b2: Column | str, e2: Column | str) -> Column:
    """Column dual of reference ``overlaps`` (range.py:396-412): exactly
    one endpoint of [b2,e2] inside [b1,e1] — containment and identity
    are not overlaps."""
    in1 = range_contains_time(b1, e1, b2)
    in2 = range_contains_time(b1, e1, e2)
    return (in1 & ~in2) | (in2 & ~in1)


def ranges_disjoint(b1: Column | str, e1: Column | str,
                    b2: Column | str, e2: Column | str) -> Column:
    return (_c(e1) < _c(b2)) | (_c(b1) > _c(e2))


def range_within(b1: Column | str, e1: Column | str,
                 b2: Column | str, e2: Column | str) -> Column:
    """[b1,e1] within [b2,e2]."""
    return (_c(b2) <= _c(b1)) & (_c(e1) <= _c(e2))
