"""Pure-python kernel tests: time utils, index grammar, timerange algebra.

Golden values come from the reference's own tests (index_test.py:206-235,
range_test.py) — they encode exact semantics.
"""

import datetime

import pytest

from pypond_spark import index as idx
from pypond_spark.timerange import TimeRange
from pypond_spark.util import (dt_from_ms, is_valid_value, ms_from_any,
                               ms_from_dt, sanitize_dt)

UTC = datetime.timezone.utc


def test_ms_round_trip():
    ms = 1400425947000
    assert ms_from_dt(dt_from_ms(ms)) == ms


def test_naive_rejected():
    with pytest.raises(ValueError):
        sanitize_dt(datetime.datetime(2015, 1, 1))


def test_non_utc_coerced():
    tz = datetime.timezone(datetime.timedelta(hours=-5))
    dt = datetime.datetime(2015, 1, 1, 7, 0, tzinfo=tz)
    with pytest.warns(UserWarning):
        out = sanitize_dt(dt)
    assert out.hour == 12 and out.tzinfo == UTC


def test_ms_from_any():
    assert ms_from_any(1400425947000) == 1400425947000
    assert ms_from_any("1970-01-01T00:00:01Z") == 1000


def test_is_valid_value():
    assert not is_valid_value(None)
    assert not is_valid_value(float("nan"))
    assert not is_valid_value("")
    assert is_valid_value(0)
    assert is_valid_value("x")


# -- index grammar (reference index_test.py goldens) -------------------------

def test_get_index_string():
    dt = datetime.datetime(2015, 3, 14, 7, 32, 22, tzinfo=UTC)
    assert idx.get_index_string("5m", dt) == "5m-4754394"


def test_get_index_string_list():
    d1 = datetime.datetime(2015, 3, 14, 7, 30, 0, tzinfo=UTC)
    d2 = datetime.datetime(2015, 3, 14, 8, 29, 59, tzinfo=UTC)
    lst = idx.get_index_string_list("5m", d1, d2)
    assert len(lst) == 12
    assert lst[0] == "5m-4754394"
    assert lst[-1] == "5m-4754405"


def test_window_duration():
    assert idx.window_duration_ms("30s") == 30_000
    assert idx.window_duration_ms("5m") == 300_000
    assert idx.window_duration_ms("1h") == 3_600_000
    assert idx.window_duration_ms("2d") == 172_800_000
    assert idx.window_duration_ms("daily") is None


def test_parse_fixed_index():
    kind, b, e = idx.parse_index("5m-4754394")
    assert kind == "index"
    assert b == 4754394 * 300_000
    assert e == 4754395 * 300_000


def test_parse_calendar_index():
    kind, b, e = idx.parse_index("2015-07-14")
    assert kind == "day"
    assert dt_from_ms(b) == datetime.datetime(2015, 7, 14, tzinfo=UTC)
    assert dt_from_ms(e) == datetime.datetime(2015, 7, 14, 23, 59, 59, tzinfo=UTC)

    kind, b, e = idx.parse_index("2015-07")
    assert kind == "month"
    assert dt_from_ms(e) == datetime.datetime(2015, 7, 31, 23, 59, 59, tzinfo=UTC)

    kind, b, e = idx.parse_index("2015")
    assert kind == "year"
    assert dt_from_ms(e) == datetime.datetime(2015, 12, 31, 23, 59, 59, tzinfo=UTC)


def test_daily_monthly_yearly_strings():
    dt = datetime.datetime(2015, 3, 4, 7, 30, tzinfo=UTC)
    assert idx.get_daily_index_string(dt) == "2015-03-04"
    assert idx.get_monthly_index_string(dt) == "2015-03"
    assert idx.get_yearly_index_string(dt) == "2015"


# -- timerange algebra (reference range_test.py:266-404) ----------------------

def _tr(b, e):
    return TimeRange(b, e)


def test_timerange_algebra():
    ta = _tr(0, 10_000)
    tb = _tr(5_000, 15_000)
    tc = _tr(20_000, 30_000)
    assert ta.overlaps(tb) and tb.overlaps(ta)
    assert ta.intersects(tb)
    assert ta.disjoint(tc)
    assert not ta.disjoint(tb)
    # reference range.py:396-412: identity and containment are NOT
    # overlaps (strict partial overlap), though they do intersect
    assert not ta.overlaps(_tr(0, 10_000))
    outer, inner = _tr(0, 30_000), _tr(5_000, 15_000)
    assert not outer.overlaps(inner) and outer.intersects(inner)
    assert ta.contains(5_000)
    assert not ta.contains(15_000)
    assert ta.extents(tc) == _tr(0, 30_000)
    assert ta.intersection(tb) == _tr(5_000, 10_000)
    assert ta.intersection(tc) is None
    assert _tr(2_000, 8_000).within(ta)
    assert ta.contains(_tr(2_000, 8_000))


def test_timerange_validation():
    with pytest.raises(ValueError):
        TimeRange(10, 0)
    assert TimeRange([0, 10]).duration() == 10


def test_timerange_relative_windows():
    import datetime
    now = datetime.datetime(2026, 8, 13, tzinfo=datetime.timezone.utc)
    tr = TimeRange.last_seven_days(now)
    assert tr.end() == now
    assert tr.duration() == 7 * 86_400_000
    assert TimeRange.last_day(now).duration() == 86_400_000
    assert TimeRange.last_thirty_days(now).duration() == 30 * 86_400_000
    assert TimeRange.last_ninety_days(now).duration() == 90 * 86_400_000
    assert TimeRange.last_year(now).duration() == 365 * 86_400_000
    # calendar-aware month step with day clamping (ref util.py:281-302)
    lm = TimeRange.last_month(now)
    assert lm.begin() == datetime.datetime(
        2026, 7, 13, tzinfo=datetime.timezone.utc)
    mar31 = datetime.datetime(2026, 3, 31, tzinfo=datetime.timezone.utc)
    assert TimeRange.last_month(mar31).begin() == datetime.datetime(
        2026, 2, 28, tzinfo=datetime.timezone.utc)


# -- human-friendly display strings (reference range_test.py:199-263) ---------

def test_timerange_humanize_strings():
    """Ports the reference goldens from ``tests/range_test.py`` —
    ``test_human_friendly_strings`` and the humanize checks in
    ``test_accessors`` (ref range.py:207-276)."""
    import datetime
    utc = datetime.timezone.utc
    now = datetime.datetime(2026, 8, 13, 12, 0, 0, tzinfo=utc)

    # relative_string goldens (now injected so results are deterministic,
    # unlike the reference which asserts against wall-clock)
    assert TimeRange.last_day(now).relative_string(now) == "a day ago to now"
    assert TimeRange.last_seven_days(now).relative_string(now) \
        == "7 days ago to now"
    assert TimeRange.last_ninety_days(now).relative_string(now) \
        == "2 months ago to now"
    assert TimeRange.last_year(now).relative_string(now) == "a year ago to now"

    # duration goldens: ref asserts '12 hours' on the canned 12h range
    half_day = TimeRange(now - datetime.timedelta(hours=12), now)
    assert half_day.duration() == 43_200_000
    assert half_day.humanize_duration() == "12 hours"
    assert TimeRange(now - datetime.timedelta(seconds=30), now) \
        .humanize_duration() == "30 seconds"
    assert TimeRange(now - datetime.timedelta(days=1), now) \
        .humanize_duration() == "a day"
    assert TimeRange(now - datetime.timedelta(days=400), now) \
        .humanize_duration() == "1 year, 1 month"

    # sub-second deltas render as 'now' (published humanize grammar: any
    # <1s delta is 'a moment'; timedelta.seconds truncates so the
    # microseconds-only branch lands on seconds == 0 — r5 ADVICE golden)
    from pypond_spark.humanize import naturaltime
    assert naturaltime(now - datetime.timedelta(milliseconds=500),
                       now=now) == "now"
    assert naturaltime(now - datetime.timedelta(microseconds=1),
                       now=now) == "now"
    assert naturaltime(now, now=now) == "now"
    assert naturaltime(now - datetime.timedelta(seconds=1),
                       now=now) == "a second ago"

    # serialization + display forms
    tr = TimeRange(0, 86_400_000)
    assert tr.to_string() == "[0, 86400000]"
    assert str(tr) == tr.to_string()
    assert tr.to_utc_string() == \
        "[Thu, 01 Jan 1970 00:00:00 UTC, Fri, 02 Jan 1970 00:00:00 UTC]"
    # humanize/to_local_string display in machine-local time: only assert
    # shape, the ref test itself skips exact values for this reason
    human = tr.humanize()
    assert " to " in human and len(human.split(" to ")) == 2
    assert tr.to_local_string().startswith("[")


def test_index_window_position_from_date():
    import datetime
    dt = datetime.datetime(2015, 3, 14, 7, 32, 22,
                           tzinfo=datetime.timezone.utc)
    # ref index_test: get_index_string('5m', dt) == '5m-4754394'
    assert idx.window_position_from_date("5m", dt) == 4754394
    from pypond_spark.index_class import Index
    assert Index.window_position_from_date("5m", dt) == 4754394
    assert Index.get_index_string("5m", dt) == "5m-4754394"


def test_round6_parity_conveniences():
    """Small reference accessors added in round 6: Index.as_string
    (index.py:154-162), TimeRange.set_begin/set_end (range.py:287-339),
    Event.to_point (event.py:446-470)."""
    import datetime

    from pypond_spark.index_class import Index
    from pypond_spark.operators.events import Event

    idx = Index("5m-4855968")
    assert idx.as_string() == idx.to_string() == "5m-4855968"
    # calendar-form index round-trips to a range too
    month = Index("2014-07")
    tr = month.as_timerange()
    assert tr.begin() == datetime.datetime(2014, 7, 1,
                                           tzinfo=datetime.timezone.utc)

    base = TimeRange(0, 86_400_000)
    moved = base.set_begin(3_600_000)
    assert (moved.begin_ms(), moved.end_ms()) == (3_600_000, 86_400_000)
    assert (base.begin_ms(), base.end_ms()) == (0, 86_400_000)  # unchanged
    assert base.set_end(7_200_000).end_ms() == 7_200_000
    import pytest
    with pytest.raises(ValueError):
        base.set_end(-1)  # begin > end rejected

    e = Event(1429673400000, {"in": 1, "out": 2})
    assert e.to_point(["out", "in"]) == [1429673400000, 2, 1]
    assert Event.indexed("1d-123", {"v": 9}).to_point() == ["1d-123", 9]
    assert Event.timerange((0, 60_000), {"v": 5}).to_point() \
        == [[0, 60_000], 5]


def test_round6_series_accessors(spark):
    """TimeSeries.begin_timestamp/end_timestamp (reference
    series.py:298-318) and series-level index accessors
    (series.py:520-548)."""
    from pypond_spark import TimeSeries
    wire = {"index": "1d-625", "name": "traffic",
            "columns": ["time", "value"],
            "points": [[54_000_000_000, 1.0], [54_000_060_000, 2.0]]}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.begin_timestamp() == 54_000_000_000
    assert ts.end_timestamp() == 54_000_060_000
    assert ts.index_as_string() == "1d-625"
    rng = ts.index_as_range()
    assert rng.begin_ms() == 625 * 86_400_000
    assert rng.duration() == 86_400_000
    empty = TimeSeries.from_wire(
        spark, {"name": "e", "columns": ["time", "value"], "points": []})
    assert empty.begin_timestamp() is None and empty.index() is None
