"""Order-dependent transforms: align, rate, fill — reference goldens.

Fixtures and expectations ported from reference tests/align_test.py and
tests/clean_test.py (they encode the exact semantics: limit behavior,
asymmetric linear fill, counter-reset guards).
"""

import pytest
from pyspark.sql import functions as F

from pypond_spark import TimeSeries

SIMPLE_GAP_DATA = {
    "name": "traffic",
    "columns": ["time", "value"],
    "points": [
        [1471824030000, 0.75],
        [1471824105000, 2],
        [1471824210000, 1],
        [1471824390000, 1],
        [1471824510000, 3],
        [1471824525000, 5],
    ],
}

RATE = {
    "name": "traffic",
    "columns": ["time", "in"],
    "points": [[0, 1], [30000, 3], [60000, 10], [90000, 40], [120000, 70],
               [150000, 130], [180000, 190], [210000, 220], [240000, 300],
               [270000, 390], [300000, 510]],
}


def _vals(ts, col="value"):
    cols = ts.to_wire()["columns"]
    i = cols.index(col)
    return [p[i] for p in ts.to_wire()["points"]]


# -- align (align_test.py:237-321) --------------------------------------------

def test_basic_linear_align(spark):
    ts = TimeSeries.from_wire(spark, SIMPLE_GAP_DATA)
    aligned = ts.align(window="1m")
    vals = _vals(aligned)
    assert len(vals) == 8
    assert vals == [1.25, 1.8571428571428572, 1.2857142857142856,
                    1.0, 1.0, 1.0, 1.5, 2.5]


def test_basic_hold_align(spark):
    ts = TimeSeries.from_wire(spark, SIMPLE_GAP_DATA)
    aligned = ts.align(window="1m", method="hold")
    assert _vals(aligned) == [0.75, 2, 2, 1, 1, 1, 1, 1]


def test_align_limit(spark):
    ts = TimeSeries.from_wire(spark, SIMPLE_GAP_DATA)
    hold = ts.align(window="1m", method="hold", limit=2)
    assert _vals(hold) == [0.75, 2, 2, None, None, None, 1, 1]

    lin = ts.align(field_spec="value", window="1m", method="linear", limit=2)
    assert _vals(lin) == [1.25, 1.8571428571428572, 1.2857142857142856,
                          None, None, None, 1.5, 2.5]


def test_align_invalid_point(spark):
    pts = [list(p) for p in SIMPLE_GAP_DATA["points"]]
    pts[-2][1] = "non_numeric_value"
    ts = TimeSeries.from_wire(
        spark, {"name": "bad", "columns": ["time", "value"], "points": pts})
    aligned = ts.align(window="1m")
    vals = _vals(aligned)
    assert vals[:6] == [1.25, 1.8571428571428572, 1.2857142857142856,
                        1.0, 1.0, 1.0]
    assert vals[6] is None and vals[7] is None


def test_align_first_point_aligned(spark):
    data = {"name": "traffic", "columns": ["time", "value"],
            "points": [[1473490770000, 10], [1473490800000, 20],
                       [1473490830000, 30], [1473490860000, 40]]}
    ts = TimeSeries.from_wire(spark, data)
    aligned = ts.align(window="30s", method="linear", limit=10)
    assert aligned.size() == 4
    assert _vals(aligned) == [10.0, 20.0, 30.0, 40.0]


# -- rate (align_test.py:324-407) ---------------------------------------------

def test_rate_mag(spark):
    ts = TimeSeries.from_wire(spark, RATE)
    rated = ts.rate(field_spec="in")
    vals = _vals(rated, "in_rate")
    assert len(vals) == len(RATE["points"]) - 1
    assert vals[2] == 1 and vals[3] == 1 and vals[4] == 2
    assert vals[8] == 3 and vals[9] == 4


def test_rate_bins(spark):
    raw = {"name": "traffic", "columns": ["time", "value"],
           "points": [[89000, 100], [181000, 200]]}
    ts = TimeSeries.from_wire(spark, raw)
    rates = ts.align(window="30s").rate()
    vals = _vals(rates, "value_rate")
    assert len(vals) == 3
    assert vals[0] == pytest.approx(1.0869565217391313)
    assert vals[1] == pytest.approx(1.0869565217391293)
    assert vals[2] == pytest.approx(1.0869565217391313)


def test_negative_rate_guard(spark):
    raw = {"name": "traffic", "columns": ["time", "value"],
           "points": [[89000, 100], [181000, 50]]}
    ts = TimeSeries.from_wire(spark, raw)
    rates = ts.align(window="30s").rate()
    assert _vals(rates, "value_rate") == pytest.approx(
        [-0.5434782608695656, -0.5434782608695646, -0.5434782608695653])

    guarded = ts.align(window="30s").rate(allow_negative=False)
    assert _vals(guarded, "value_rate") == [None, None, None]


def test_rate_rejects_non_instant(spark):
    tr = {"name": "outages", "columns": ["timerange", "t"],
          "points": [[[1000, 2000], "x"]]}
    ts = TimeSeries.from_wire(spark, tr)
    with pytest.raises(ValueError):
        ts.rate()
    with pytest.raises(ValueError):
        ts.align()


# -- fill (clean_test.py:234-777) ----------------------------------------------

MISSING = {
    "name": "traffic",
    "columns": ["time", "direction"],
    "points": [
        [1400425947000, {"in": 1, "out": None}],
        [1400425948000, {"in": None, "out": 4}],
        [1400425949000, {"in": 5, "out": None}],
        [1400425950000, {"in": None, "out": 8}],
        [1400425960000, {"in": 9, "out": None}],
        [1400425970000, {"in": None, "out": 12}],
    ],
}


def _deep(ts, path):
    a, b = path.split(".")
    cols = ts.to_wire()["columns"]
    i = cols.index(a)
    return [p[i][b] if p[i] is not None else None
            for p in ts.to_wire()["points"]]


def test_zero_fill(spark):
    ts = TimeSeries.from_wire(spark, MISSING)
    new = ts.fill(field_spec=["direction.in", "direction.out"])
    assert new.size() == 6
    assert _deep(new, "direction.out") == [0, 4, 0, 8, 0, 12]
    assert _deep(new, "direction.in") == [1, 0, 5, 0, 9, 0]

    one = ts.fill(field_spec="direction.in")
    assert _deep(one, "direction.in") == [1, 0, 5, 0, 9, 0]
    assert _deep(one, "direction.out") == [None, 4, None, 8, None, 12]


def test_linear_fill(spark):
    data = {
        "name": "traffic", "columns": ["time", "direction"],
        "points": [
            [1400425947000, {"in": 1, "out": 2}],
            [1400425948000, {"in": None, "out": None}],
            [1400425949000, {"in": None, "out": None}],
            [1400425950000, {"in": 3, "out": None}],
            [1400425960000, {"in": None, "out": None}],
            [1400425970000, {"in": 5, "out": 12}],
            [1400425980000, {"in": 6, "out": 13}],
        ],
    }
    ts = TimeSeries.from_wire(spark, data)
    new = ts.fill(field_spec=["direction.in", "direction.out"], method="linear")
    assert new.size() == 7
    assert _deep(new, "direction.in") == pytest.approx(
        [1, 1.6666666666666665, 2.333333333333333, 3, 4.0, 5, 6])
    assert _deep(new, "direction.out") == pytest.approx(
        [2, 2.4347826086956523, 2.8695652173913047, 3.304347826086957,
         7.6521739130434785, 12, 13])


def test_asymmetric_linear_fill(spark):
    data = {
        "name": "traffic", "columns": ["time", "direction"],
        "points": [
            [1400425947000, {"in": 1, "out": None}],
            [1400425948000, {"in": None, "out": None}],
            [1400425949000, {"in": None, "out": None}],
            [1400425950000, {"in": 3, "out": 8}],
            [1400425960000, {"in": None, "out": None}],
            [1400425970000, {"in": 5, "out": 12}],
            [1400425980000, {"in": 6, "out": 13}],
        ],
    }
    ts = TimeSeries.from_wire(spark, data)
    new = ts.fill(method="linear", field_spec=["direction.in", "direction.out"])
    assert _deep(new, "direction.in") == pytest.approx(
        [1, 1.6666666666666665, 2.333333333333333, 3, 4.0, 5, 6])
    out = _deep(new, "direction.out")
    assert out[:3] == [None, None, None]  # leading gap can't fill
    assert out[3:] == pytest.approx([8, 10.0, 12, 13])


def test_pad_fill(spark):
    data = {
        "name": "traffic", "columns": ["time", "direction"],
        "points": [
            [1400425947000, {"in": 1, "out": None, "drop": None}],
            [1400425948000, {"in": None, "out": 4, "drop": None}],
            [1400425949000, {"in": None, "out": None, "drop": 13}],
            [1400425950000, {"in": None, "out": None, "drop": 14}],
            [1400425960000, {"in": 9, "out": 8, "drop": None}],
            [1400425970000, {"in": 11, "out": 10, "drop": 16}],
        ],
    }
    ts = TimeSeries.from_wire(spark, data)
    new = ts.fill(method="pad",
                  field_spec=["direction.in", "direction.out", "direction.drop"])
    assert _deep(new, "direction.in") == [1, 1, 1, 1, 9, 11]
    assert _deep(new, "direction.out") == [None, 4, 4, 4, 8, 10]
    assert _deep(new, "direction.drop") == [None, None, 13, 14, 14, 16]


def test_pad_and_zero_limiting(spark):
    data = {
        "name": "traffic", "columns": ["time", "direction"],
        "points": [
            [1400425947000, {"in": 1, "out": None}],
            [1400425948000, {"in": None, "out": None}],
            [1400425949000, {"in": None, "out": None}],
            [1400425950000, {"in": 3, "out": 8}],
            [1400425960000, {"in": None, "out": None}],
            [1400425970000, {"in": None, "out": 12}],
            [1400425980000, {"in": None, "out": 13}],
            [1400425990000, {"in": 7, "out": None}],
            [1400426000000, {"in": 8, "out": None}],
            [1400426010000, {"in": 9, "out": None}],
            [1400426020000, {"in": 10, "out": None}],
        ],
    }
    ts = TimeSeries.from_wire(spark, data)

    zero = ts.fill(method="zero", fill_limit=2,
                   field_spec=["direction.in", "direction.out"])
    assert _deep(zero, "direction.in") == [1, 0, 0, 3, 0, 0, None, 7, 8, 9, 10]
    assert _deep(zero, "direction.out") == \
        [0, 0, None, 8, 0, 12, 13, 0, 0, None, None]

    pad = ts.fill(method="pad", fill_limit=2,
                  field_spec=["direction.in", "direction.out"])
    assert _deep(pad, "direction.in") == [1, 1, 1, 3, 3, 3, None, 7, 8, 9, 10]
    assert _deep(pad, "direction.out") == \
        [None, None, None, 8, 8, 12, 13, 13, 13, None, None]


def test_fill_empty(spark):
    ts = TimeSeries.from_wire(
        spark, {"name": "e", "columns": ["time", "temperature"], "points": []})
    assert ts.fill(field_spec="temperature").size() == 0


def test_fill_pad_max_gap(spark):
    from pyspark.sql import functions as F

    from pypond_spark import TimeSeries
    MIN = 60_000
    rows = [(0, 10.0), (MIN, None), (90 * MIN, None), (200 * MIN, 5.0),
            (201 * MIN, None)]
    df = spark.createDataFrame(rows, "ms long, value double").select(
        F.timestamp_millis("ms").alias("time"), "value")
    out = {r["time"].hour * 60 + r["time"].minute: r["value"] for r in
           TimeSeries(df, kind="time")
           .fill("value", method="pad", max_gap="1h").df.collect()}
    assert out[0] == 10.0
    assert out[1] == 10.0          # 1 min after anchor: filled
    assert out[90] is None         # 90 min after anchor: too stale
    assert out[200] == 5.0
    assert out[201] == 5.0


def test_fill_linear_max_gap(spark):
    from pyspark.sql import functions as F

    from pypond_spark import TimeSeries
    MIN = 60_000
    rows = [(0, 10.0), (30 * MIN, None), (60 * MIN, 40.0),
            (61 * MIN, None), (300 * MIN, 100.0)]
    df = spark.createDataFrame(rows, "ms long, value double").select(
        F.timestamp_millis("ms").alias("time"), "value")
    out = {r["time"].hour * 60 + r["time"].minute: r["value"] for r in
           TimeSeries(df, kind="time")
           .fill("value", method="linear", max_gap="2h").df.collect()}
    assert out[30] == 25.0         # 1h bracket: interpolated
    assert out[61] is None         # 4h bracket: refused
    import pytest as _pt
    with _pt.raises(ValueError):
        TimeSeries(df, kind="time").fill("value", method="zero",
                                         max_gap="1h")


def test_salted_join_matches_plain_inner_and_left(spark):
    from pypond_spark.operators.skew import salted_join
    # pathological skew: 90% of fact rows share key 1
    fact = spark.createDataFrame(
        [(1 if i < 90 else i, float(i)) for i in range(100)], "k long, v double")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in [1, 2, 95, 99, 777]], "k long, name string")
    for how in ("inner", "left"):
        plain = sorted(map(tuple, fact.join(dim, "k", how).collect()))
        salted = sorted(map(tuple,
                            salted_join(fact, dim, "k", salt=4, how=how)
                            .collect()))
        assert salted == plain, how
    # duplicate dim keys multiply matches identically on both paths
    dim_dup = dim.union(dim)
    assert (sorted(map(tuple, salted_join(fact, dim_dup, "k", 3).collect()))
            == sorted(map(tuple, fact.join(dim_dup, "k").collect())))


def test_salted_join_validation(spark):
    import pytest as _pt
    from pypond_spark.operators.skew import salted_join
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with _pt.raises(ValueError):
        salted_join(df, df, on=[], salt=4)
    with _pt.raises(ValueError):
        salted_join(df, df, "k", salt=1)
    with _pt.raises(ValueError):
        salted_join(df, df, "k", how="right")


def test_melt_wide_to_long(spark):
    from pypond_spark import TimeSeries
    df = spark.createDataFrame(
        [(0, 1.0, 10.0), (60_000, 2.0, 20.0)], "ms long, a double, b double"
    ).select(F.timestamp_millis("ms").alias("time"), "a", "b")
    out = TimeSeries(df, kind="time").melt(["a", "b"]).df.collect()
    got = {(r["time"].second + r["time"].minute * 60, r["metric"]):
           r["value_m"] for r in out}
    assert got == {(0, "a"): 1.0, (0, "b"): 10.0,
                   (60, "a"): 2.0, (60, "b"): 20.0}
    import pytest as _pt
    with _pt.raises(ValueError):
        TimeSeries(df, kind="time").melt([])


def test_quantile_bins_deterministic(spark):
    from pypond_spark import TimeSeries
    rows = [(i, i * 60_000, float(i % 3)) for i in range(9)]
    df = spark.createDataFrame(rows, "event_id long, ms long, value double") \
        .select("event_id", F.timestamp_millis("ms").alias("time"), "value")
    out = TimeSeries(df, kind="time").quantile_bins(
        3, "value", tiebreak="event_id").df.collect()
    got = {r["event_id"]: r["value_bin"] for r in out}
    # sorted by (value, event_id): values 0,0,0,1,1,1,2,2,2 ->
    # ids (0,3,6),(1,4,7),(2,5,8) -> bins 1,1,1,2,2,2,3,3,3
    assert got == {0: 1, 3: 1, 6: 1, 1: 2, 4: 2, 7: 2, 2: 3, 5: 3, 8: 3}
