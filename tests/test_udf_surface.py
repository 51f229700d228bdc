"""Per-event callable map/filter + custom callable reducers (SURVEY §2.10).

Ports the reference's lambda test cases: ``tests/pipeline_test.py:233-254``
(map swaps fields via set_data), ``:328-345`` (filter by value),
``:366-383`` (filter then take), and the custom-reducer golden
``tests/event_test.py:326-329`` (map_reduce avg -> in 5.0, out 14.25).
"""

import datetime

import pytest

from pypond_spark import Pipeline, TimeSeries
from pypond_spark.operators import merge as merge_ops

UTC = datetime.timezone.utc


def _ms(y, mo, d, h, mi):
    return int(datetime.datetime(y, mo, d, h, mi, tzinfo=UTC).timestamp() * 1000)


@pytest.fixture(scope="module")
def in_out(spark):
    pts = [
        [_ms(2015, 3, 14, 7, 57), 3, 1],
        [_ms(2015, 3, 14, 7, 58), 9, 2],
        [_ms(2015, 3, 14, 7, 59), 6, 6],
        [_ms(2015, 3, 14, 8, 0), 4, 7],
        [_ms(2015, 3, 14, 8, 1), 5, 9],
    ]
    return TimeSeries.from_wire(
        spark, {"name": "events", "columns": ["time", "in", "out"],
                "points": pts})


# -- per-event map / filter (reference processor/mapper.py, filter.py) -------


def test_map_callable_swaps_fields(in_out):
    """pipeline_test.py:233-254: op(event) -> event.set_data(swapped)."""
    def mapper(event):
        return event.set_data({"in": event.get("out"),
                               "out": event.get("in")})

    elist = Pipeline().from_source(in_out).map(mapper).to_event_list()
    assert [r["in"] for r in elist] == [1, 2, 6, 7, 9]
    assert [r["out"] for r in elist] == [3, 9, 6, 4, 5]
    # timestamps survive the round trip untouched
    assert [int(r["time"].replace(tzinfo=UTC).timestamp() * 1000)
            for r in elist] == [
        _ms(2015, 3, 14, 7, 57), _ms(2015, 3, 14, 7, 58),
        _ms(2015, 3, 14, 7, 59), _ms(2015, 3, 14, 8, 0),
        _ms(2015, 3, 14, 8, 1)]


def test_map_callable_dict_return(in_out):
    """Returning a plain dict replaces the payload, keeps the key columns."""
    ts = in_out.map(lambda ev: {"in": ev.get("in") * 10,
                                "out": ev.get("out")})
    assert [r["in"] for r in ts.collect()] == [30, 90, 60, 40, 50]


def test_map_callable_new_schema(in_out):
    """schema= declares changed output columns."""
    ts = in_out.map(
        lambda ev: {"total": float(ev.get("in") + ev.get("out"))},
        schema="time timestamp, total double")
    assert [r["total"] for r in ts.collect()] == [4.0, 11.0, 12.0, 11.0, 14.0]


def test_filter_callable(in_out):
    """pipeline_test.py:328-345: op(event) -> bool."""
    def filter_cb(event):
        return event.get("in") >= 5

    elist = Pipeline().from_source(in_out).filter(filter_cb).to_event_list()
    assert [r["in"] for r in elist] == [9, 6, 5]


def test_filter_callable_then_take(in_out):
    """pipeline_test.py:366-383: filter chained with take."""
    out = (Pipeline().from_source(in_out)
           .filter(lambda ev: ev.get("in") >= 5)
           .take(2)
           .to_event_list())
    assert [r["in"] for r in out] == [9, 6]


def test_event_view_deep_paths(spark):
    from pypond_spark.operators.events import Event
    ev = Event(1000, {"direction": {"in": 4, "out": 7}, "value": 1})
    assert ev.get("direction.in") == 4
    assert ev.get("missing.path") is None
    assert ev.get("value") == 1
    ev2 = ev.with_field("value", 9)
    assert ev.get("value") == 1 and ev2.get("value") == 9


# -- custom callable reducers (pandas-UDAF path) ----------------------------


def test_custom_reducer_scalar_aggregate(spark):
    """event_test.py:326-329 golden: custom avg -> in 5.0, out 14.25."""
    pts = [[1000 * i, v_in, v_out] for i, (v_in, v_out) in
           enumerate(zip([2, 4, 6, 8], [11, 13, 15, 18]))]
    ts = TimeSeries.from_wire(
        spark, {"name": "t", "columns": ["time", "in", "out"], "points": pts})

    def my_avg(values):
        return sum(values) / len(values)

    assert ts.aggregate(my_avg, "in") == 5.0
    assert ts.aggregate(my_avg, "out") == 14.25


def test_custom_reducer_combine(spark):
    """event_test.py:331-342 shape: combine fields at one timestamp with a
    user reducer (the general Event.sum)."""
    pts = [[7000, 5.0, 6.0, 7.0], [7000, 2.0, 3.0, 4.0], [7000, 1.0, 2.0, 3.0]]
    ts = TimeSeries.from_wire(
        spark, {"name": "t", "columns": ["time", "a", "b", "c"],
                "points": pts})
    out = merge_ops.combine(ts.df, ["a", "b", "c"], lambda vs: sum(vs))
    row = out.collect()[0]
    assert (row["a"], row["b"], row["c"]) == (8.0, 11.0, 14.0)


def test_custom_reducer_windowed_mixed_spec(in_out):
    """A custom reducer and a named agg in ONE spec: split/joined plan."""
    def spread(values):
        return max(values) - min(values)

    out = (Pipeline().from_source(in_out)
           .window_by("1h")
           .aggregate({"in_avg": {"in": "avg"}, "in_spread": {"in": spread}})
           .to_keyed_collections())
    r1 = out["1h-396199"].df.collect()[0]
    assert r1["in_avg"] == 6 and r1["in_spread"] == 6.0
    r2 = out["1h-396200"].df.collect()[0]
    assert r2["in_avg"] == 4.5 and r2["in_spread"] == 1.0


def test_custom_reducer_grouped_window(in_out):
    ts = in_out.map({"bucket": "CASE WHEN in >= 5 THEN 'high' ELSE 'low' END"})
    out = (Pipeline().from_source(ts)
           .window_by("1h").group_by("bucket")
           .aggregate({"in_sum2": {"in": lambda vs: sum(vs)}})
           .to_keyed_collections())
    assert out["1h-396199--high"].df.collect()[0]["in_sum2"] == 15.0
    assert out["1h-396199--low"].df.collect()[0]["in_sum2"] == 3.0


def test_custom_reducer_filters(spark):
    """Missing-value filters apply inside the pandas UDAF."""
    pts = [[0, 1.0], [1000, None], [2000, 3.0]]
    ts = TimeSeries.from_wire(
        spark, {"name": "t", "columns": ["time", "value"], "points": pts})

    def count_all(values):
        return float(len(values))

    assert ts.aggregate(count_all, "value") == 2.0  # ignore_missing drops
    assert ts.aggregate(count_all, "value", "keep_missing") == 3.0
    assert ts.aggregate(lambda v: sum(v), "value",
                        "propagate_missing") is None
    assert ts.aggregate(lambda v: sum(v), "value", "zero_missing") == 4.0


def test_collapse_callable(in_out):
    elist = (Pipeline().from_source(in_out)
             .collapse(["in", "out"], "io_max", lambda vs: max(vs))
             .to_event_list())
    assert [r["io_max"] for r in elist] == [3.0, 9.0, 6.0, 7.0, 9.0]
