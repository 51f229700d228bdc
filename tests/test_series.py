"""TimeSeries core: wire round-trip, row ops, slicing, scalar aggregations.

Goldens from reference series_test.py / event_test.py.
"""

import math

import pytest

from pyspark.sql import functions as F

from pypond_spark import TimeRange, TimeSeries

WIRE = {
    "name": "traffic",
    "columns": ["time", "value", "status"],
    "points": [
        [1400425947000, 52, "ok"],
        [1400425948000, 18, "ok"],
        [1400425949000, 26, "fail"],
        [1400425950000, 93, "offline"],
    ],
}

DEEP_WIRE = {
    "name": "Map Traffic",
    "columns": ["time", "direction"],
    "points": [
        [1400425947000, {"in": 123, "out": 456}],
        [1400425948000, {"in": 300, "out": 189}],
    ],
}


@pytest.fixture(scope="module")
def ts(spark):
    return TimeSeries.from_wire(spark, WIRE)


def test_wire_round_trip(ts):
    out = ts.to_wire()
    assert out["name"] == "traffic"
    assert out["columns"] == ["time", "value", "status"]
    assert out["points"] == WIRE["points"]


def test_deep_paths(spark):
    ts = TimeSeries.from_wire(spark, DEEP_WIRE)
    assert ts.avg("direction.in") == 211.5
    assert ts.avg("direction.out") == 322.5
    out = ts.to_wire()
    assert out["points"][0][1] == {"in": 123, "out": 456}


def test_size_and_columns(ts):
    assert ts.size() == 4
    assert set(ts.columns()) == {"value", "status"}
    assert ts.name() == "traffic"


def test_scalar_aggs(ts):
    assert ts.sum("value") == 189
    assert ts.avg("value") == 47.25
    assert ts.max("value") == 93
    assert ts.min("value") == 18
    assert ts.first("status") == "ok"
    assert ts.last("status") == "offline"
    assert ts.median("value") == 39.0


def test_stddev_is_population(ts):
    # population sigma, reference functions.py:299-313
    vals = [52, 18, 26, 93]
    mean = sum(vals) / 4
    expected = math.sqrt(sum((v - mean) ** 2 for v in vals) / 4)
    assert abs(ts.stdev("value") - expected) < 1e-9


def test_percentile_methods(spark):
    # reference series_test.py:707-763 goldens
    vals = [22.3, 32.4, 12.1, 76.8, 87.3, 54.6, 45.5, 87.9]
    wire = {"name": "p", "columns": ["time", "temperature"],
            "points": [[(i + 1) * 1000, v] for i, v in enumerate(vals)]}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.percentile(50, "temperature") == 50.05
    assert abs(ts.percentile(95, "temperature") - 87.69) < 1e-9
    assert abs(ts.percentile(99, "temperature") - 87.858) < 1e-9
    assert ts.percentile(99, "temperature", "lower") == 87.3
    assert ts.percentile(99, "temperature", "higher") == 87.9
    assert ts.percentile(99, "temperature", "nearest") == 87.9
    assert abs(ts.percentile(99, "temperature", "midpoint") - 87.6) < 1e-9
    assert ts.percentile(0, "temperature") == 12.1
    assert ts.percentile(100, "temperature") == 87.9

    single = TimeSeries.from_wire(
        spark, {"name": "s", "columns": ["time", "t"], "points": [[1000, 22.3]]})
    for q in (0, 50, 100):
        assert single.percentile(q, "t", "higher") == 22.3


def test_quantile(spark):
    wire = {"name": "q", "columns": ["time", "value"],
            "points": [[i * 1000, v] for i, v in
                       enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.quantile(4, "value") == [3.25, 5.5, 7.75]


def test_empty_avg_and_sum_are_zero(spark):
    wire = {"name": "e", "columns": ["time", "value"], "points": []}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.avg("value") == 0
    assert ts.sum("value") == 0


def test_select_collapse_rename_offset(ts):
    sel = ts.select("value")
    assert set(sel.columns()) == {"value"}

    wire = {"name": "c", "columns": ["time", "in", "out"],
            "points": [[1000, 1, 2], [2000, 3, 4]]}
    ts2 = TimeSeries.from_wire(ts.df.sparkSession, wire)
    col = ts2.collapse(["in", "out"], "in_out_sum", "sum")
    assert [p[3] for p in col.to_wire()["points"]] == [3, 7]

    ren = ts2.rename_columns({"in": "new_in"})
    assert "new_in" in ren.columns() and "in" not in ren.columns()

    off = ts2.offset_by(10, "in")
    assert [p[1] for p in off.to_wire()["points"]] == [11, 13]


def test_clean_and_size_valid(spark):
    wire = {"name": "n", "columns": ["time", "value"],
            "points": [[1000, 1.0], [2000, None], [3000, float("nan")],
                       [4000, 4.0]]}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.size() == 4
    assert ts.size_valid("value") == 2
    assert ts.clean("value").size() == 2
    assert ts.avg("value") == 2.5  # invalid ignored


def test_crop_slice_at(ts):
    tr = TimeRange(1400425948000, 1400425949000)
    assert ts.crop(tr).size() == 2
    assert ts.slice(1, 3).size() == 2
    assert ts.at(0)["value"] == 52
    assert ts.at_first()["value"] == 52
    assert ts.at_last()["value"] == 93
    assert ts.bisect(1400425949500) == 2
    assert ts.at_time(1400425949500)["value"] == 26
    # negative python-slice semantics (reference series.py:419-438) and
    # the r7 zipWithIndex recipe agreeing with plain head/tail expectations
    assert [r["value"] for r in ts.slice(-2).collect()] == [26, 93]
    assert [r["value"] for r in ts.slice(None, -1).collect()] == [52, 18, 26]
    assert [r["value"] for r in ts.slice(-3, -1).collect()] == [18, 26]
    assert ts.slice(0, 0).size() == 0
    assert ts.at(-1)["value"] == 93


def test_timerange_extents(ts):
    tr = ts.timerange()
    assert tr.begin_ms() == 1400425947000
    assert tr.end_ms() == 1400425950000


def test_dedup_and_merge(spark):
    wire = {"name": "d", "columns": ["time", "value"],
            "points": [[1000, 1], [1000, 2], [2000, 3]]}
    ts = TimeSeries.from_wire(spark, wire)
    dd = ts.dedup()
    assert dd.size() == 2
    assert [p[1] for p in dd.to_wire()["points"]] == [2, 3]  # last wins


def test_timeseries_list_ops(spark):
    w1 = {"name": "a", "columns": ["time", "in"],
          "points": [[1000, 1], [2000, 2]]}
    w2 = {"name": "b", "columns": ["time", "out"],
          "points": [[1000, 10], [2000, 20]]}
    t1 = TimeSeries.from_wire(spark, w1)
    t2 = TimeSeries.from_wire(spark, w2)
    merged = TimeSeries.timeseries_list_merge([t1, t2], name="m")
    pts = merged.to_wire()["points"]
    assert len(pts) == 2
    cols = merged.to_wire()["columns"]
    row0 = dict(zip(cols[1:], pts[0][1:]))
    assert row0 == {"in": 1, "out": 10}

    w3 = {"name": "c", "columns": ["time", "in"],
          "points": [[1000, 5], [2000, 7]]}
    t3 = TimeSeries.from_wire(spark, w3)
    summed = TimeSeries.timeseries_list_sum([t1, t3], field_spec="in")
    assert [p[1] for p in summed.to_wire()["points"]] == [6, 9]


def test_take(spark):
    wire = {"name": "t", "columns": ["time", "value"],
            "points": [[i * 60_000, i] for i in range(10)]}
    ts = TimeSeries.from_wire(spark, wire)
    taken = ts.take(2, window="5m")
    # 10 minutes of 1-minute points -> two 5m windows, 2 kept from each
    assert taken.size() == 4
    assert [p[1] for p in taken.to_wire()["points"]] == [0, 1, 5, 6]


def test_merge_deep_struct_per_leaf(spark):
    # reference compare_test.py:124-136: nested payloads merge per leaf
    w1 = {"name": "a", "columns": ["time", "direction"],
          "points": [[1000, {"in": 1, "out": None}]]}
    w2 = {"name": "b", "columns": ["time", "direction"],
          "points": [[1000, {"in": None, "out": 2}]]}
    t1 = TimeSeries.from_wire(spark, w1)
    t2 = TimeSeries.from_wire(spark, w2)
    merged = TimeSeries.timeseries_list_merge([t1, t2])
    row = merged.df.collect()[0]
    assert row["direction"]["in"] == 1 and row["direction"]["out"] == 2


def test_event_ops_parity(spark):
    # reference event_test.py:331 test_sum_events_with_combine shapes
    from pypond_spark import event_ops
    wire = {"name": "e", "columns": ["time", "in", "out"],
            "points": [[1000, 2, 6], [1000, 3, 7], [2000, 4, 8]]}
    ts = TimeSeries.from_wire(spark, wire)
    summed = event_ops.sum(ts.df, field_spec=["in", "out"])
    rows = {int(r["time"].timestamp() * 1000): (r["in"], r["out"])
            for r in summed.collect()}
    assert rows == {1000: (5.0, 13.0), 2000: (4.0, 8.0)}

    mr = event_ops.map_reduce(ts.sort_by_time().df, ["in", "out"], "max")
    got = {r["field"]: r["value"] for r in mr.collect()}
    assert got == {"in": 4, "out": 8}


def test_indexed_wire_ingest(spark):
    # F6-style fixture: calendar-month indexed events with string payload
    wire = {"name": "availability", "columns": ["index", "uptime"],
            "points": [["2014-07", "100%"], ["2014-08", "88%"],
                       ["2014-09", "95%"]]}
    ts = TimeSeries.from_wire(spark, wire)
    assert ts.kind == "index"
    assert ts.size() == 3
    out = ts.to_wire()
    assert out["columns"] == ["index", "uptime"]
    assert out["points"][0] == ["2014-07", "100%"]
    rows = {r["index"]: r for r in ts.df.collect()}
    import datetime
    assert rows["2014-07"]["begin"].replace(
        tzinfo=datetime.timezone.utc) == datetime.datetime(
            2014, 7, 1, tzinfo=datetime.timezone.utc)

    fixed = {"name": "f", "columns": ["index", "in", "out"],
             "points": [["5m-4855968", 5.0, 9.0], ["5m-4855969", 4.0, 3.0]]}
    tf = TimeSeries.from_wire(spark, fixed)
    assert tf.to_wire()["points"] == fixed["points"]
    tr = tf.timerange()
    assert tr.duration() == 600_000


def test_series_equal_same(spark):
    """equal = same instance internals, same = same values
    (reference series.py:1483-1524, collection.py:1104-1147)."""
    wire = {"name": "s", "columns": ["time", "value"],
            "points": [[60_000 * i, float(i)] for i in range(5)]}
    a = TimeSeries.from_wire(spark, wire)
    b = TimeSeries.from_wire(spark, wire)          # equal values, new frames
    c = a.map(exprs={"value": F.col("value") * 2})

    assert TimeSeries.equal(a, a)
    assert not TimeSeries.equal(a, b)
    assert TimeSeries.same(a, b)
    assert not TimeSeries.same(a, c)

    renamed = b.set_name("other")                   # metadata differs
    assert not TimeSeries.same(a, renamed)


def test_event_same():
    from pypond_spark.operators.events import Event
    e1 = Event(1000, {"value": 1.0, "tag": "a"})
    e2 = Event(1000, {"value": 1.0, "tag": "a"})
    e3 = Event(1000, {"value": 2.0, "tag": "a"})
    e4 = Event(2000, {"value": 1.0, "tag": "a"})
    assert Event.same(e1, e2) and e1 == e2
    assert not Event.same(e1, e3)
    assert not Event.same(e1, e4)
    assert e1 != "not an event"


def test_event_is_duplicate():
    """Reference compare_test.py:151-198 goldens: duplicate = same variant
    + same key; ignore_values=False adds a full value compare
    (reference event.py:602-632)."""
    from pypond_spark.operators.events import Event

    # time events — scalar payload wraps as {'value': scalar}
    e1 = Event(1429673400000, 23)
    e2 = Event(1429673400000, 23)
    assert Event.is_duplicate(e1, e2)
    assert Event.is_duplicate(e1, e2, ignore_values=False)
    e3 = Event(1429673400000, 25)
    assert Event.is_duplicate(e1, e3)
    assert not Event.is_duplicate(e1, e3, ignore_values=False)

    # indexed events
    ie1 = Event.indexed("1d-12355", {"value": 42})
    ie2 = Event.indexed("1d-12355", {"value": 42})
    assert Event.is_duplicate(ie1, ie2)
    assert Event.is_duplicate(ie1, ie2, ignore_values=False)
    ie3 = Event.indexed("1d-12355", {"value": 44})
    assert Event.is_duplicate(ie1, ie3)
    assert not Event.is_duplicate(ie1, ie3, ignore_values=False)

    # time range events
    b, e = 1429630000000, 1429673200000
    tre1 = Event.timerange((b, e), 11)
    tre2 = Event.timerange((b, e), 11)
    assert Event.is_duplicate(tre1, tre2)
    assert Event.is_duplicate(tre1, tre2, ignore_values=False)
    tre3 = Event.timerange((b, e), 22)
    assert Event.is_duplicate(tre1, tre3)
    assert not Event.is_duplicate(tre1, tre3, ignore_values=False)

    # cross-variant is never a duplicate (reference compare_test.py:120
    # test_new_same: Event vs IndexedEvent)
    assert not Event.is_duplicate(e1, ie1)
    assert not Event.same(e1, ie1)
    assert not Event.is_duplicate(e1, "not an event")


def test_event_key_normalizes_across_representations():
    """Event.key() normalizes to epoch-ms (reference ms_from_dt,
    event.py:579-587).  The public naive contract is **naive == UTC**
    (the wire-format convention; the reference rejects naive datetimes
    outright, util.py:60-75) — TZ-independent, verified here on a
    simulated non-UTC driver via TZ + tzset."""
    import datetime as dtm
    import os
    import time as time_mod

    from pypond_spark.operators.events import Event

    ms = 1429673400000
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time_mod.tzset()
    try:
        # naive == UTC wall time, regardless of the driver TZ
        naive_utc = dtm.datetime(2015, 4, 22, 3, 30, 0)
        aware = naive_utc.replace(tzinfo=dtm.timezone.utc)
        e_wire = Event(ms, 23)
        assert Event(naive_utc, 23).key() == ms
        e_row = Event(aware, 23)
        assert e_row.key() == ms
        assert Event.is_duplicate(e_wire, e_row)
        assert e_row.to_point() == [ms, 23]
        assert e_row.timestamp_as_utc_string() == \
            "Wed, 22 Apr 2015 03:30:00 UTC"

        b_ms, e_ms = 1429630000000, 1429673200000
        tre_wire = Event.timerange((b_ms, e_ms), 11)
        tre_row = Event.timerange(
            (dtm.datetime.fromtimestamp(b_ms / 1000, dtm.timezone.utc),
             dtm.datetime.fromtimestamp(e_ms / 1000, dtm.timezone.utc)), 11)
        assert tre_row.key() == (b_ms, e_ms)
        assert Event.is_duplicate(tre_wire, tre_row)
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time_mod.tzset()


def test_collect_boundary_tags_aware_utc(spark):
    """TimeSeries.collect()/at_* recover collected timestamps to aware
    UTC (the internal collect() boundary where naive-local provenance
    is known) — so an Event built from a collected row round-trips to
    the wire key on any driver TZ."""
    import datetime as dtm

    from pypond_spark.operators.events import Event
    from pypond_spark.series import TimeSeries

    ms = 1429673400000
    df = spark.createDataFrame(
        [(dtm.datetime.fromtimestamp(ms / 1000, dtm.timezone.utc), 7)],
        "time timestamp, value int")
    ts = TimeSeries(df)
    row = ts.collect()[0]
    assert row["time"].tzinfo is not None
    assert row["time"].utcoffset() == dtm.timedelta(0)
    assert Event(row["time"], row["value"]).key() == ms
    assert ts.at_first()["time"].tzinfo is not None
    assert ts.at_last()["time"] == row["time"]


def test_event_list_as_map(spark):
    """Reference compare_test.py:111-118 golden: dict keyed by epoch-ms
    with dup timestamps grouped (reference collection.py:414-432)."""
    wire = {"name": "dup", "columns": ["time", "in", "out"],
            "points": [[1429673400000, 1, 2], [1429673460000, 3, 4],
                       [1429673460000, 4, 5], [1429673520000, 5, 6]]}
    ts = TimeSeries.from_wire(spark, wire)
    cmap = ts.event_list_as_map()
    assert len(cmap) == 3
    assert len(cmap[1429673400000]) == 1
    assert len(cmap[1429673460000]) == 2
    assert sorted(r["in"] for r in cmap[1429673460000]) == [3, 4]

    # indexed variant keys by the index string
    iwire = {"name": "idx", "columns": ["index", "value"],
             "points": [["1d-12354", 42], ["1d-12355", 43],
                        ["1d-12355", 44], ["1d-12356", 45]]}
    its = TimeSeries.from_wire(spark, iwire)
    imap = its.event_list_as_map()
    assert len(imap) == 3
    assert [r["value"] for r in imap["1d-12355"]] == [43, 44]

    # rows pass the collect boundary: timestamps are aware UTC, so the
    # key recomputed from the row matches the Spark-computed map key on
    # any driver TZ (feeding rows back into Event/at_key is lossless)
    from pypond_spark.operators.events import Event
    for ms, rows in cmap.items():
        for r in rows:
            assert r["time"].tzinfo is not None
            assert Event(r["time"], {"in": r["in"]}).key() == ms


def test_event_display_strings_and_list(spark):
    """Event display helpers (reference event.py:476-494,
    timerange_event.py) and Collection.event_list_as_list
    (collection.py:404-412)."""
    from pypond_spark.operators.events import Event
    e = Event(1429673400000, {"v": 1})
    assert e.timestamp_as_utc_string() == "Wed, 22 Apr 2015 03:30:00 UTC"
    assert isinstance(e.timestamp_as_local_string(), str)
    tre = Event.timerange((0, 86_400_000), {"v": 1})
    assert tre.timerange_as_utc_string() == \
        "[Thu, 01 Jan 1970 00:00:00 UTC, Fri, 02 Jan 1970 00:00:00 UTC]"

    wire = {"name": "l", "columns": ["time", "value"],
            "points": [[120_000, 2.0], [60_000, 1.0]]}
    ts = TimeSeries.from_wire(spark, wire)
    lst = ts.event_list_as_list()
    assert [r["value"] for r in lst] == [1.0, 2.0]  # time-ordered
