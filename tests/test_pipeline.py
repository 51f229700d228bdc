"""Pipeline fluent API — reference pipeline_test.py behaviors."""

import datetime

import pytest

from pypond_spark import Pipeline, TimeSeries

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


def test_windowed_aggregate_keyed_collections(in_out):
    """pipeline_test.py:621-677 golden via the fluent API."""
    out = (
        Pipeline()
        .from_source(in_out)
        .window_by("1h")
        .emit_on("eachEvent")
        .aggregate({"in_avg": {"in": "avg"}, "out_avg": {"out": "avg"}})
        .to_keyed_collections()
    )
    assert set(out) == {"1h-396199", "1h-396200"}
    r1 = out["1h-396199"].df.collect()[0]
    assert r1["in_avg"] == 6 and r1["out_avg"] == 3
    r2 = out["1h-396200"].df.collect()[0]
    assert r2["in_avg"] == 4.5 and r2["out_avg"] == 8


def test_global_aggregate_flush(in_out):
    elist = (
        Pipeline().from_source(in_out).emit_on("flush")
        .aggregate({"in_max": {"in": "max"}, "out_max": {"out": "max"}})
        .to_event_list()
    )
    assert len(elist) == 1
    assert elist[0]["in_max"] == 9 and elist[0]["out_max"] == 9


def test_chain_offset_collapse(in_out):
    elist = (
        Pipeline().from_source(in_out)
        .offset_by(1, "in")
        .collapse(["in", "out"], "io_sum", "sum")
        .to_event_list()
    )
    assert [r["io_sum"] for r in elist] == [5, 12, 13, 12, 15]


def test_group_by_take(in_out):
    ts = in_out.map({"bucket": "CASE WHEN in >= 5 THEN 'high' ELSE 'low' END"})
    out = (
        Pipeline().from_source(ts)
        .group_by("bucket")
        .take(1)
        .to_dataframe()
    )
    rows = {r["bucket"]: r["in"] for r in out.collect()}
    assert rows == {"low": 3, "high": 9}


def test_grouped_keyed_collections(in_out):
    ts = in_out.map({"bucket": "CASE WHEN in >= 5 THEN 'high' ELSE 'low' END"})
    out = (
        Pipeline().from_source(ts)
        .window_by("1h").group_by("bucket")
        .aggregate({"in_sum": {"in": "sum"}})
        .to_keyed_collections()
    )
    assert set(out) == {"1h-396199--high", "1h-396199--low",
                        "1h-396200--high", "1h-396200--low"}
    assert out["1h-396199--high"].df.collect()[0]["in_sum"] == 15


def test_pipeline_rate_align_fill(spark):
    pts = [[0, 10.0], [120000, None], [240000, 50.0]]
    ts = TimeSeries.from_wire(
        spark, {"name": "t", "columns": ["time", "value"], "points": pts})
    filled = (Pipeline().from_source(ts)
              .fill(field_spec="value", method="linear")
              .to_event_list())
    assert [r["value"] for r in filled] == [10.0, 30.0, 50.0]

    rates = (Pipeline().from_source(ts.clean("value"))
             .rate(field_spec="value").to_event_list())
    assert [r["value_rate"] for r in rates] == [pytest.approx(40 / 240)]

    aligned = (Pipeline().from_source(ts.clean("value"))
               .align(field_spec="value", window="1m", method="hold")
               .to_event_list())
    assert len(aligned) == 5  # boundaries 0(aligned),60k,120k,180k,240k


def test_pipeline_converters(in_out):
    out = (Pipeline().from_source(in_out)
           .as_indexed_events("1h").to_time_series())
    assert out.kind == "index"
    assert {r["index"] for r in out.df.collect()} == {"1h-396199", "1h-396200"}


def test_emit_on_validation(in_out):
    with pytest.raises(ValueError):
        Pipeline().from_source(in_out).emit_on("bogus")
    with pytest.raises(ValueError):
        Pipeline().to_event_list()


def test_group_by_callable_and_expr(in_out):
    from pyspark.sql import functions as F
    out = (
        Pipeline().from_source(in_out)
        .group_by(lambda ev: "high" if ev["in"] >= 5 else "low")
        .window_by("1h")
        .aggregate({"in_sum": {"in": "sum"}})
        .to_keyed_collections()
    )
    assert out["1h-396199--high"].df.collect()[0]["in_sum"] == 15
    assert out["1h-396199--low"].df.collect()[0]["in_sum"] == 3

    out2 = (
        Pipeline().from_source(in_out)
        .group_by(F.when(F.col("in") >= 5, "high").otherwise("low"))
        .window_by("1h")
        .aggregate({"in_sum": {"in": "sum"}})
        .to_keyed_collections()
    )
    assert out2["1h-396199--high"].df.collect()[0]["in_sum"] == 15


def test_group_by_callable_chained(in_out):
    # a second group_by(callable) re-derives '__group': the adapter must
    # REPLACE the column (duplicate StructField crashed the Arrow path)
    out = (
        Pipeline().from_source(in_out)
        .group_by(lambda ev: "high" if ev["in"] >= 5 else "low")
        .group_by(lambda ev: "odd" if ev["in"] % 2 else "even")
        .window_by("1h")
        .aggregate({"in_sum": {"in": "sum"}})
        .to_keyed_collections()
    )
    keys = {k for k in out if k != "all"}
    assert {k.split("--")[1] for k in keys} == {"odd", "even"}


def test_at_key(spark):
    ts = TimeSeries.from_wire(
        spark, {"name": "k", "columns": ["time", "value"],
                "points": [[1000, 1], [1000, 2], [2000, 3]]})
    rows = ts.at_key(1000)
    assert sorted(r["value"] for r in rows) == [1, 2]
    assert ts.at_key(9999) == []


def test_pipeline_state_getters():
    """Reference pipeline.py:252-300 getter parity."""
    from pypond_spark import Pipeline
    p = Pipeline()
    assert p.get_window_type() == "global"
    assert p.get_window_duration() is None
    assert p.get_emit_on() == "eachEvent"
    assert p.get_utc() is True
    q = p.window_by("5m").group_by("event_type").emit_on("discard")
    assert q.get_window_type() == "fixed"
    assert q.get_window_duration() == "5m"
    assert q.get_group_by() == "event_type"
    assert q.get_emit_on() == "discard"
    assert p.get_window_type() == "global"  # immutability preserved
    assert q.window_by("daily", utc=False).get_window_type() == "daily"
    assert q.window_by("daily", utc=False).get_utc() is False
