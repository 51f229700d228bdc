"""Windowed/grouped aggregation and converters — reference goldens
(pipeline_test.py:621-677 windowed averages, converter semantics)."""

import datetime

import pytest

from pypond_spark import TimeSeries

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
        spark, {"name": "events", "columns": ["time", "in", "out"], "points": pts})


def test_windowed_average(in_out):
    """pipeline_test.py:621-677: 1h-396199 -> in_avg 6, out_avg 3."""
    rolled = in_out.fixed_window_rollup(
        "1h", {"in_avg": {"in": "avg"}, "out_avg": {"out": "avg"}})
    rows = {r["index"]: r for r in rolled.df.collect()}
    assert rows["1h-396199"]["in_avg"] == 6
    assert rows["1h-396199"]["out_avg"] == 3
    assert rows["1h-396200"]["in_avg"] == 4.5
    assert rows["1h-396200"]["out_avg"] == 8
    # index begin/end round-trip
    r = rows["1h-396199"]
    assert r["begin"].replace(tzinfo=UTC) == \
        datetime.datetime(2015, 3, 14, 7, 0, tzinfo=UTC)
    assert r["end"].replace(tzinfo=UTC) == \
        datetime.datetime(2015, 3, 14, 8, 0, tzinfo=UTC)


def test_grouped_windowed_aggregate(spark):
    pts = [
        [_ms(2015, 3, 14, 7, 57), "a", 3],
        [_ms(2015, 3, 14, 7, 58), "a", 9],
        [_ms(2015, 3, 14, 7, 59), "b", 6],
        [_ms(2015, 3, 14, 8, 0), "a", 4],
        [_ms(2015, 3, 14, 8, 1), "b", 5],
    ]
    ts = TimeSeries.from_wire(
        spark, {"name": "g", "columns": ["time", "type", "in"], "points": pts})
    out = ts.fixed_window_rollup("1h", {"in_sum": {"in": "sum"}},
                                 group_by="type")
    rows = {(r["index"], r["type"]): r["in_sum"] for r in out.df.collect()}
    assert rows[("1h-396199", "a")] == 12
    assert rows[("1h-396199", "b")] == 6
    assert rows[("1h-396200", "a")] == 4
    assert rows[("1h-396200", "b")] == 5


def test_global_aggregate_emits_timerange(in_out):
    out = in_out.window_aggregate({"in_max": {"in": "max"}})
    rows = out.df.collect()
    assert len(rows) == 1
    assert rows[0]["in_max"] == 9
    assert out.kind == "timerange"


def test_daily_rollup_utc_and_local(spark):
    # two points either side of midnight UTC; in US/Pacific they share a day
    pts = [[_ms(2015, 3, 14, 23, 30), 2], [_ms(2015, 3, 15, 0, 30), 4]]
    ts = TimeSeries.from_wire(
        spark, {"name": "d", "columns": ["time", "value"], "points": pts})

    utc_roll = ts.daily_rollup({"avg": {"value": "avg"}})
    assert {r["index"]: r["avg"] for r in utc_roll.df.collect()} == \
        {"2015-03-14": 2.0, "2015-03-15": 4.0}

    local = ts.daily_rollup({"avg": {"value": "avg"}}, utc=False,
                            tz="America/Los_Angeles")
    assert {r["index"]: r["avg"] for r in local.df.collect()} == \
        {"2015-03-14": 3.0}


def test_daily_rollup_local_dst_boundaries(spark):
    """DST goldens (r6 verdict item 5, reference series.py:1278-1331
    utc=False): an hourly UTC series mapped through America/New_York must
    land 23 events on the spring-forward local day (2025-03-09) and 25 on
    the fall-back one (2025-11-02) — the 2am hour vanishes / repeats in
    wall time while the UTC stream stays dense."""
    import datetime as dtm

    # 72 hourly points from 2025-03-08 00:00 EST (05:00 UTC)
    base = int(dtm.datetime(2025, 3, 8, 5,
                            tzinfo=dtm.timezone.utc).timestamp() * 1000)
    pts = [[base + i * 3600_000, 1] for i in range(72)]
    ts = TimeSeries.from_wire(
        spark, {"name": "dst", "columns": ["time", "value"], "points": pts})
    spring = {r["index"]: r["n"] for r in ts.daily_rollup(
        {"n": {"value": "count"}}, utc=False,
        tz="America/New_York").df.collect()}
    assert spring == {"2025-03-08": 24, "2025-03-09": 23, "2025-03-10": 24,
                      "2025-03-11": 1}

    # 72 hourly points from 2025-11-01 00:00 EDT (04:00 UTC)
    base = int(dtm.datetime(2025, 11, 1, 4,
                            tzinfo=dtm.timezone.utc).timestamp() * 1000)
    pts = [[base + i * 3600_000, 1] for i in range(72)]
    ts = TimeSeries.from_wire(
        spark, {"name": "dst2", "columns": ["time", "value"], "points": pts})
    fall = {r["index"]: r["n"] for r in ts.daily_rollup(
        {"n": {"value": "count"}}, utc=False,
        tz="America/New_York").df.collect()}
    assert fall == {"2025-11-01": 24, "2025-11-02": 25, "2025-11-03": 23}


def test_monthly_yearly_rollup(spark):
    pts = [[_ms(2015, 1, 10, 0, 0), 1], [_ms(2015, 1, 20, 0, 0), 3],
           [_ms(2015, 2, 10, 0, 0), 5], [_ms(2016, 2, 10, 0, 0), 7]]
    ts = TimeSeries.from_wire(
        spark, {"name": "m", "columns": ["time", "value"], "points": pts})
    mo = {r["index"]: r["avg"] for r in
          ts.monthly_rollup({"avg": {"value": "avg"}}).df.collect()}
    assert mo == {"2015-01": 2.0, "2015-02": 5.0, "2016-02": 7.0}
    yr = {r["index"]: r["sum"] for r in
          ts.yearly_rollup({"sum": {"value": "sum"}}).df.collect()}
    assert yr == {"2015": 9.0, "2016": 7.0}


def test_collect_by_fixed_window(in_out):
    out = in_out.collect_by_fixed_window("1h")
    rows = out.df.collect()
    assert len(rows) == 5
    assert {r["index"] for r in rows} == {"1h-396199", "1h-396200"}


def test_missing_filters(spark):
    pts = [[1000, 1.0], [2000, None], [3000, 3.0]]
    ts = TimeSeries.from_wire(
        spark, {"name": "f", "columns": ["time", "value"], "points": pts})
    assert ts.aggregate("avg", "value", "ignore_missing") == 2.0
    assert ts.aggregate("avg", "value", "zero_missing") == pytest.approx(4 / 3)
    assert ts.aggregate("avg", "value", "propagate_missing") is None
    assert ts.aggregate("sum", "value", "none_if_empty") == 4.0
    empty = TimeSeries.from_wire(
        spark, {"name": "e", "columns": ["time", "value"], "points": []})
    assert empty.aggregate("sum", "value", "none_if_empty") is None
    assert ts.aggregate("count", "value", "keep_missing") == 3
    assert ts.aggregate("count", "value", "ignore_missing") == 2
    assert ts.aggregate("keep", "value") is None
    same = TimeSeries.from_wire(
        spark, {"name": "s", "columns": ["time", "value"],
                "points": [[1000, 5.0], [2000, 5.0]]})
    assert same.aggregate("keep", "value") == 5.0
    assert ts.aggregate("difference", "value") == 2.0


# -- converters (converter.py semantics) ---------------------------------------

def test_events_to_timerange_events(spark):
    ts = TimeSeries.from_wire(
        spark, {"name": "c", "columns": ["time", "value"],
                "points": [[60_000, 1]]})
    front = ts.as_timerange_events("1m", alignment="front").to_wire()
    assert front["points"][0][0] == [60_000, 120_000]
    center = ts.as_timerange_events("1m", alignment="center").to_wire()
    assert center["points"][0][0] == [30_000, 90_000]
    behind = ts.as_timerange_events("1m", alignment="behind").to_wire()
    assert behind["points"][0][0] == [0, 60_000]


def test_events_to_indexed_and_back(spark):
    ts = TimeSeries.from_wire(
        spark, {"name": "c", "columns": ["time", "value"],
                "points": [[1426316542000, 3]]})
    idx = ts.as_indexed_events("5m")
    row = idx.df.collect()[0]
    assert row["index"] == "5m-4754388"
    back = idx.as_events(alignment="lag")
    t = back.df.collect()[0]["time"].replace(tzinfo=UTC)
    assert int(t.timestamp() * 1000) == 4754388 * 300_000


def test_timerange_to_events(spark):
    tr = {"name": "r", "columns": ["timerange", "value"],
          "points": [[[0, 60_000], 5]]}
    ts = TimeSeries.from_wire(spark, tr)
    assert ts.kind == "timerange"
    ev = ts.as_events(alignment="center").to_wire()
    assert ev["points"][0][0] == 30_000
    lead = ts.as_events(alignment="lead").to_wire()
    assert lead["points"][0][0] == 60_000
    with pytest.raises(ValueError):
        ts.as_indexed_events("1m")


def test_deep_path_group_by(spark):
    """F4 fixture: group by a nested struct field (pipeline_test.py:589-620)."""
    wire = {"name": "d", "columns": ["time", "direction"],
            "points": [[60_000 * i,
                        {"status": "OK" if i % 2 else "FAIL", "in": i}]
                       for i in range(6)]}
    ts = TimeSeries.from_wire(spark, wire)
    out = ts.fixed_window_rollup("1h", {"in_sum": {"direction.in": "sum"}},
                                 group_by="direction.status")
    rows = {r["status"]: r["in_sum"] for r in out.df.collect()}
    assert rows == {"FAIL": 6.0, "OK": 9.0}

    glob = ts.window_aggregate({"in_max": {"direction.in": "max"}},
                               group_by="direction.status")
    got = {r["status"]: r["in_max"] for r in glob.df.collect()}
    assert got == {"FAIL": 4, "OK": 5}


def test_approx_percentile_spec(spark):
    """('approx_percentile', q[, accuracy]) — the sketch-based scale path:
    within rank-error tolerance of the exact percentile, and valid inside
    the same windowed agg-spec language."""
    from pypond_spark import TimeSeries
    pts = [[i * 1000, float(i % 1000)] for i in range(5000)]
    ts = TimeSeries.from_wire(spark, {
        "name": "p", "columns": ["time", "value"], "points": pts})
    out = ts.window_aggregate(
        {"p95x": {"value": ("percentile", 95)},
         "p95a": {"value": ("approx_percentile", 95)},
         "p95c": {"value": ("approx_percentile", 95, 100)}}).df.collect()[0]
    assert abs(out["p95a"] - out["p95x"]) <= 10      # accuracy 10k on 5k rows
    assert abs(out["p95c"] - out["p95x"]) <= 60      # coarse sketch, looser
    import pytest as _pt
    with _pt.raises(ValueError):
        ts.window_aggregate({"x": {"value": ("bogus", 1)}})


def test_histogram_bins_and_validity(spark):
    from pypond_spark.operators.histogram import histogram
    df = spark.createDataFrame(
        [("a", -0.5), ("a", 0.0), ("a", 9.9), ("a", 10.0), ("b", 25.0),
         ("b", None), ("b", float("nan"))],
        "g string, value double")
    rows = histogram(df, "value", bin_width=10.0, partition_by=["g"]) \
        .collect()
    got = {(r["g"], r["bin"]): (r["bin_lo"], r["bin_hi"], r["n"])
           for r in rows}
    assert got == {("a", -1): (-10.0, 0.0, 1),   # negatives floor down
                   ("a", 0): (0.0, 10.0, 2),
                   ("a", 1): (10.0, 20.0, 1),
                   ("b", 2): (20.0, 30.0, 1)}    # NULL/NaN dropped
    import pytest as _pytest
    with _pytest.raises(ValueError):
        histogram(df, "value", bin_width=0.0)


def test_count_distinct_reducers(spark):
    from pypond_spark.functions import compile_agg_spec
    df = spark.createDataFrame(
        [(0, "a", 1), (0, "a", 1), (0, "a", 2), (0, "b", None)],
        "time long, g string, u int")
    out = df.groupBy("g").agg(*compile_agg_spec(
        {"u_exact": {"u": "count_distinct"},
         "u_approx": {"u": "approx_distinct"}}))
    got = {r["g"]: (r["u_exact"], r["u_approx"]) for r in out.collect()}
    assert got["a"] == (2, 2)
    assert got["b"][0] == 0      # NULLs don't count


def test_heatmap(spark):
    from pypond_spark import TimeSeries
    from pyspark.sql import functions as F
    rows = [(0, 5.0), (1000, 15.0), (3_600_000, 5.0), (3_600_001, None)]
    df = spark.createDataFrame(rows, "ms long, value double") \
        .select(F.timestamp_millis("ms").alias("time"), "value")
    out = {(r["pos"], r["bin"]): r["n"] for r in
           TimeSeries(df, kind="time").heatmap("1h", bin_width=10.0)
           .collect()}
    assert out == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_pivot_rollup_wide(spark):
    from pypond_spark import TimeSeries
    from pyspark.sql import functions as F
    MIN = 60_000
    rows = [(0, "a", 10.0), (MIN, "a", 20.0), (2 * MIN, "b", 7.0),
            (61 * MIN, "b", 3.0)]
    df = spark.createDataFrame(rows, "ms long, k string, value double") \
        .select(F.timestamp_millis("ms").alias("time"), "k", "value")
    out = TimeSeries(df, kind="time").pivot_rollup(
        "1h", "value", "k", ["a", "b", "c"]).df.orderBy("index").collect()
    assert [(r["index"], r["a"], r["b"], r["c"]) for r in out] == [
        ("1h-0", 15.0, 7.0, None), ("1h-1", None, 3.0, None)]
    # count agg: empty cells are 0, not NULL
    cnt = TimeSeries(df, kind="time").pivot_rollup(
        "1h", "value", "k", ["a", "c"], agg="count").df \
        .orderBy("index").collect()
    assert [(r["a"], r["c"]) for r in cnt] == [(2, 0), (0, 0)]


def test_pivot_rollup_sum_empty_is_zero(spark):
    from pypond_spark import TimeSeries
    from pyspark.sql import functions as F
    rows = [(0, "a", 10.0), (60_000, "a", 20.0)]
    df = spark.createDataFrame(rows, "ms long, k string, value double") \
        .select(F.timestamp_millis("ms").alias("time"), "k", "value")
    out = TimeSeries(df, kind="time").pivot_rollup(
        "1h", "value", "k", ["a", "b"], agg="sum").df.collect()[0]
    # empty 'b' cell follows the reference sum empty->0 convention
    assert (out["a"], out["b"]) == (30.0, 0.0)
    # non-instant input rejected like the sibling wrappers
    import pytest as _pt
    tr = TimeSeries(df.withColumnRenamed("time", "begin")
                    .withColumn("end", F.col("begin")), kind="timerange")
    with _pt.raises(ValueError):
        tr.pivot_rollup("1h", "value", "k", ["a"])


def test_merge_rollups_split_bucket_and_validation(spark):
    from pyspark.sql import functions as F
    from pypond_spark.operators.incremental import merge_rollups
    a = spark.createDataFrame([("1h-0", 10.0, 2, 3.0, 7.0)],
                              "idx string, v_sum double, n long, "
                              "v_min double, v_max double")
    b = spark.createDataFrame([("1h-0", 5.0, 1, 1.0, 5.0),
                               ("1h-1", 8.0, 2, 4.0, 4.0)],
                              "idx string, v_sum double, n long, "
                              "v_min double, v_max double")
    out = merge_rollups([a, b], ["idx"],
                        {"v_sum": "sum", "n": "count",
                         "v_min": "min", "v_max": "max"},
                        derive={"v_avg": ("v_sum", "n")}).collect()
    got = {r["idx"]: (r["v_sum"], r["n"], r["v_min"], r["v_max"],
                      r["v_avg"]) for r in out}
    assert got["1h-0"] == (15.0, 3, 1.0, 7.0, 5.0)
    assert got["1h-1"] == (8.0, 2, 4.0, 4.0, 4.0)
    # zero-count derive -> NULL (empty-window avg semantics)
    z = spark.createDataFrame([("1h-9", 0.0, 0, None, None)],
                              "idx string, v_sum double, n long, "
                              "v_min double, v_max double")
    r9 = merge_rollups([z], ["idx"], {"v_sum": "sum", "n": "count"},
                       derive={"v_avg": ("v_sum", "n")}).collect()[0]
    assert r9["v_avg"] is None
    # holistic aggregates are refused, not silently wrong
    import pytest as _pt
    with _pt.raises(ValueError):
        merge_rollups([a], ["idx"], {"v_sum": "median"})
    with _pt.raises(ValueError):
        merge_rollups([], ["idx"], {"v_sum": "sum"})


def test_densify_rollup_zero_fills_and_bounds(spark):
    from pyspark.sql import functions as F
    from pypond_spark import TimeSeries
    from pypond_spark.operators.aggregate import densify_rollup
    H = 3600_000
    # group a occupies hours 0 and 3 (1, 2 missing); group b hour 1 only
    rows = [(0, "a", 10.0), (3 * H, "a", 30.0), (1 * H, "b", 5.0)]
    df = spark.createDataFrame(rows, "ms long, g string, value double") \
        .select(F.timestamp_millis("ms").alias("time"), "g", "value")
    roll = TimeSeries(df, kind="time").fixed_window_rollup(
        "1h", {"v_sum": {"value": "sum"}, "n": {"value": "count"},
               "v_avg": {"value": "avg"}}, group_by="g").df
    out = densify_rollup(roll, "1h", group_by="g",
                         fill={"v_sum": 0.0, "n": 0}).collect()
    got = {(r["g"], r["index"]): (r["v_sum"], r["n"], r["v_avg"])
           for r in out}
    assert got[("a", "1h-0")] == (10.0, 1, 10.0)
    assert got[("a", "1h-1")] == (0.0, 0, None)  # scaffolded: avg NULL
    assert got[("a", "1h-2")] == (0.0, 0, None)
    assert got[("a", "1h-3")] == (30.0, 1, 30.0)
    assert got[("b", "1h-1")] == (5.0, 1, 5.0)
    assert len(got) == 5  # b gets NO scaffold outside its own span
    # begin/end rebuilt for scaffolded rows
    r1 = {(r["g"], r["index"]): r for r in out}[("a", "1h-1")]
    assert int(r1["begin"].timestamp() * 1000) == H
    assert int(r1["end"].timestamp() * 1000) == 2 * H
    import pytest as _pt
    with _pt.raises(ValueError):
        densify_rollup(roll, "1h", group_by="g", fill={"nope": 0})
    with _pt.raises(ValueError):
        densify_rollup(roll, "monthly", group_by="g")
