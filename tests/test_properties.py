"""Property-based tests (hypothesis) — invariants the reference never tested.

Kernel properties run without Spark (fast, many examples); Spark-backed
properties use a handful of drawn fixtures per run to stay quick.
"""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from pypond_spark import Index, TimeRange
from pypond_spark import index as codec

UTC = datetime.timezone.utc

ms_strategy = st.integers(min_value=0, max_value=4_102_444_800_000)  # ..2100
win_strategy = st.tuples(
    st.integers(min_value=1, max_value=120),
    st.sampled_from(["s", "m", "h", "d"])).map(lambda t: f"{t[0]}{t[1]}")


@given(ms=ms_strategy, win=win_strategy)
@settings(max_examples=200, deadline=None)
def test_index_roundtrip_contains_time(ms, win):
    """The fixed index bucket for t always contains t."""
    dt = codec.dt_from_ms(ms)
    idx = Index(codec.get_index_string(win, dt))
    assert idx.as_timerange().contains(dt)
    dur = codec.window_duration_ms(win)
    assert idx.as_timerange().duration() == dur


@given(ms=ms_strategy, win=win_strategy)
@settings(max_examples=200, deadline=None)
def test_index_buckets_tile(ms, win):
    """Consecutive buckets tile time: end(b) == begin(b+1)."""
    dur = codec.window_duration_ms(win)
    pos = ms // dur
    _, b0, e0 = codec.parse_index(f"{win}-{pos}")
    _, b1, _ = codec.parse_index(f"{win}-{pos + 1}")
    assert e0 == b1
    assert e0 - b0 == dur


@given(ms=ms_strategy)
@settings(max_examples=200, deadline=None)
def test_calendar_index_roundtrip(ms):
    # reference quirk (index.py:280): calendar ranges end at
    # start-of-next-period MINUS 1s, so sub-second times inside the final
    # second fall outside the inclusive range — assert on the second floor
    dt = codec.dt_from_ms(ms - ms % 1000)
    for fn, kind in [(codec.get_daily_index_string, "day"),
                     (codec.get_monthly_index_string, "month"),
                     (codec.get_yearly_index_string, "year")]:
        idx = Index(fn(dt))
        assert idx.kind == kind
        assert idx.as_timerange().contains(dt)


@given(a=st.tuples(ms_strategy, ms_strategy).map(sorted),
       b=st.tuples(ms_strategy, ms_strategy).map(sorted))
@settings(max_examples=200, deadline=None)
def test_timerange_algebra_consistency(a, b):
    ta, tb = TimeRange(a[0], a[1]), TimeRange(b[0], b[1])
    assert ta.overlaps(tb) == tb.overlaps(ta)
    assert ta.disjoint(tb) == (not ta.overlaps(tb))
    inter = ta.intersection(tb)
    if inter is not None:
        assert ta.contains(inter) and tb.contains(inter)
        assert inter.duration() <= min(ta.duration(), tb.duration())
    ext = ta.extents(tb)
    assert ext.contains(ta) and ext.contains(tb)


@given(ms=ms_strategy)
@settings(max_examples=200, deadline=None)
def test_ms_dt_roundtrip(ms):
    from pypond_spark.util import dt_from_ms, ms_from_dt
    assert ms_from_dt(dt_from_ms(ms)) == ms


# -- Spark-backed invariants (few examples, module-scope session) -------------

def test_fill_zero_then_clean_is_identity(spark):
    """clean(fill_zero(x)) keeps every row: zero fill leaves no invalid."""
    from pypond_spark import TimeSeries
    pts = [[i * 1000, v] for i, v in
           enumerate([1.0, None, float("nan"), 4.0, None])]
    ts = TimeSeries.from_wire(
        spark, {"name": "p", "columns": ["time", "value"], "points": pts})
    filled = ts.fill(field_spec="value", method="zero")
    assert filled.clean("value").size() == len(pts)
    assert filled.size_valid("value") == len(pts)


def test_align_outputs_lie_on_grid(spark):
    from pypond_spark import TimeSeries
    from pypond_spark.util import ms_from_dt
    import random
    rnd = random.Random(7)
    t, pts = 0, []
    for _ in range(40):
        t += rnd.randint(1_000, 400_000)
        pts.append([t, rnd.uniform(0, 100)])
    ts = TimeSeries.from_wire(
        spark, {"name": "g", "columns": ["time", "value"], "points": pts})
    for win, dur in [("1m", 60_000), ("5m", 300_000)]:
        out = ts.align(window=win).to_wire()["points"]
        assert out, "alignment produced no points"
        for point in out:
            assert point[0] % dur == 0
        times = [p[0] for p in out]
        assert times == sorted(times) and len(set(times)) == len(times)


def test_rate_of_linear_series_is_constant(spark):
    from pypond_spark import TimeSeries
    pts = [[i * 10_000, 5.0 * i] for i in range(20)]
    ts = TimeSeries.from_wire(
        spark, {"name": "r", "columns": ["time", "value"], "points": pts})
    rates = [p[1] for p in ts.rate(field_spec="value").to_wire()["points"]]
    assert all(abs(r - 0.5) < 1e-12 for r in rates)
