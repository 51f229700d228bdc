"""PushStream: interactive add_event parity (reference io/input.py:83-114,
pipeline_test.py:628-675 golden — hourly avg over pushed in/out events)."""

import datetime

from pypond_spark.streaming import PushStream, windowed_stream_aggregate

UTC = datetime.timezone.utc


def _ms(h, mi):
    return int(datetime.datetime(2015, 3, 14, h, mi,
                                 tzinfo=UTC).timestamp() * 1000)

EVENTS = [
    (_ms(7, 57), 3.0, 1.0),
    (_ms(7, 58), 9.0, 2.0),
    (_ms(7, 59), 6.0, 6.0),
    (_ms(8, 0), 4.0, 7.0),
    (_ms(8, 1), 5.0, 9.0),
]


def test_push_stream_windowed_agg_golden(spark):
    """pipeline_test.py golden: 1h-396199 -> in_avg 6 / out_avg 3;
    1h-396200 -> in_avg 4.5 / out_avg 8."""
    got = {}
    emits = []

    def cback(row):
        pos = int(row["begin"].replace(tzinfo=UTC).timestamp() * 1000) // 3600000
        got[f"1h-{pos}"] = (row["in_avg"], row["out_avg"])
        emits.append(row)

    stream = PushStream(spark, "time timestamp, in double, out double")
    stream.pipe(lambda sdf: windowed_stream_aggregate(
        sdf, {"in_avg": {"in": "avg"}, "out_avg": {"out": "avg"}},
        "1h", emit_on="eachEvent"))
    stream.on_emit(cback)
    stream.start()
    try:
        # push the first two, drain: running aggregate visible mid-stream
        for ev in EVENTS[:2]:
            stream.add_event({"time": ev[0], "in": ev[1], "out": ev[2]})
        stream.process()
        assert got["1h-396199"] == (6.0, 1.5)

        # push the rest; stop() drains (flush-on-stop) and the running
        # aggregates update across the micro-batch boundary via state
        for ev in EVENTS[2:]:
            stream.add_event({"time": ev[0], "in": ev[1], "out": ev[2]})
        stream.stop()
    finally:
        stream.close()

    assert got["1h-396199"] == (6.0, 3.0)
    assert got["1h-396200"] == (4.5, 8.0)
    assert len(emits) >= 3  # update mode re-emitted the changed window

    # stopped stream drops pushes silently (reference add_event gate)
    stream.add_event({"time": _ms(9, 0), "in": 1.0, "out": 1.0})


def test_push_stream_passthrough_and_errors(spark):
    import pytest

    got = []
    stream = PushStream(spark, "time timestamp, value double")
    stream.on_emit(lambda row: got.append(row["value"]))
    stream.start()
    try:
        stream.add_event({"time": 1000, "value": 42.0})
        stream.add_event({"time": 2000, "value": 43.0})
        stream.process()
        with pytest.raises(TypeError):
            stream.events()
    finally:
        stream.close()
    assert sorted(got) == [42.0, 43.0]
