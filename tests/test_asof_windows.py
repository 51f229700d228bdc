"""As-of join and sliding/session windows (beyond-reference operators)."""

import pytest
from pyspark.sql import functions as F

from pypond_spark import TimeSeries


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = TimeSeries.from_wire(spark, {
        "name": "quotes", "columns": ["time", "sym", "bid"],
        "points": [
            [1_000, "A", 10.0], [5_000, "A", 11.0], [9_000, "A", 12.0],
            [2_000, "B", 20.0],
        ]})
    trades = TimeSeries.from_wire(spark, {
        "name": "trades", "columns": ["time", "sym", "qty"],
        "points": [
            [500, "A", 1], [5_000, "A", 2], [7_000, "A", 3],
            [1_000, "B", 4], [2_500, "B", 5],
        ]})
    return quotes, trades


def test_asof_join_union_trick(quotes_trades):
    quotes, trades = quotes_trades
    out = trades.asof_join(quotes, on="sym")
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.df.collect()}
    assert got == {
        ("A", 1): None,    # no quote yet at t=500
        ("A", 2): 11.0,    # exact-time quote matches (at-or-before)
        ("A", 3): 11.0,
        ("B", 4): None,
        ("B", 5): 20.0,
    }


def test_asof_join_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = trades.asof_join(quotes, on="sym", tolerance="1s")
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.df.collect()}
    assert got[("A", 3)] is None   # quote at 5s is 2s stale
    assert got[("B", 5)] == 20.0   # 500ms fresh


def test_asof_join_broadcast_matches_union(quotes_trades):
    quotes, trades = quotes_trades
    a = trades.asof_join(quotes, on="sym").df
    b = trades.asof_join(quotes, on="sym", broadcast=True).df
    ka = sorted(map(tuple, a.select("sym", "qty", "bid").collect()))
    kb = sorted(map(tuple, b.select("sym", "qty", "bid").collect()))
    assert ka == kb


def test_asof_collision_guard(quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        trades.asof_join(trades, on="sym")


def test_sliding_window_rollup(spark):
    pts = [[60_000 * i, float(i)] for i in range(6)]  # t=0..5min
    ts = TimeSeries.from_wire(
        spark, {"name": "s", "columns": ["time", "value"], "points": pts})
    out = ts.sliding_window_rollup("2m", "1m", {"n": {"value": "count"}})
    got = {int(r["begin"].timestamp() // 60): r["n"] for r in out.df.collect()}
    # window [-1m,1m) holds t=0; [0,2m) holds t=0,1m; ... [5m,7m) holds t=5m
    assert got[-1] == 1 and got[0] == 2 and got[4] == 2 and got[5] == 1


def test_session_window_rollup(spark):
    pts = [[0, 1.0], [30_000, 2.0], [200_000, 3.0], [230_000, 4.0]]
    ts = TimeSeries.from_wire(
        spark, {"name": "s", "columns": ["time", "value"], "points": pts})
    out = ts.session_window_rollup("1m", {"n": {"value": "count"},
                                          "v_sum": {"value": "sum"}})
    rows = sorted(out.df.collect(), key=lambda r: r["begin"])
    assert len(rows) == 2
    assert rows[0]["n"] == 2 and rows[0]["v_sum"] == 3.0
    assert rows[1]["n"] == 2 and rows[1]["v_sum"] == 7.0


def test_asof_preserves_left_cardinality(quotes_trades):
    # invariant: as-of join emits exactly one row per left row
    quotes, trades = quotes_trades
    for kwargs in [{}, {"tolerance": "1s"}, {"broadcast": True}]:
        out = trades.asof_join(quotes, on="sym", **kwargs)
        assert out.df.count() == trades.size()


def test_rolling_trailing_avg(spark):
    ts = TimeSeries.from_wire(spark, {
        "name": "r", "columns": ["time", "u", "value"],
        "points": [
            [0, "a", 10.0], [60_000, "a", 20.0], [120_000, "a", 30.0],
            [300_000, "a", 40.0],   # outside the 2m window of the previous
            [0, "b", 100.0],
        ]})
    out = ts.rolling("2m", {"avg_2m": {"value": "avg"},
                            "n_2m": {"value": "count"}},
                     partition_by=["u"])
    got = {(r["u"], r["time"].timestamp() * 1000): (r["avg_2m"], r["n_2m"])
           for r in out.df.collect()}
    # window (t-120000, t]: at 120s the 0s event is EXCLUDED (> t-2m)
    assert got[("a", 0)] == (10.0, 1)
    assert got[("a", 60_000)] == (15.0, 2)
    assert got[("a", 120_000)] == (25.0, 2)
    assert got[("a", 300_000)] == (40.0, 1)
    assert got[("b", 0)] == (100.0, 1)


def test_zscore_flags_outlier(spark):
    pts = [[i * 1_000, "a", 10.0 + (i % 2)] for i in range(20)]
    pts.append([21_000, "a", 1000.0])  # the outlier
    ts = TimeSeries.from_wire(spark, {
        "name": "z", "columns": ["time", "u", "value"], "points": pts})
    out = ts.zscore("value", partition_by=["u"], threshold=3.0)
    rows = out.df.collect()
    flagged = [r for r in rows if r["value_anomaly"]]
    assert len(flagged) == 1 and flagged[0]["value"] == 1000.0
    # constant series: no variance -> NULL z, nothing flagged
    const = TimeSeries.from_wire(spark, {
        "name": "c", "columns": ["time", "u", "value"],
        "points": [[i * 1000, "a", 5.0] for i in range(5)]})
    crows = const.zscore("value", partition_by=["u"]).df.collect()
    assert all(r["value_zscore"] is None and not r["value_anomaly"]
               for r in crows)


def test_zscore_trailing_window_no_future_leak(spark):
    # values rise sharply at the end; a trailing-window score must not see
    # the future spike when scoring early events
    pts = [[i * 1_000, "a", float(v)]
           for i, v in enumerate([10, 11, 10, 11, 10, 500])]
    ts = TimeSeries.from_wire(spark, {
        "name": "t", "columns": ["time", "u", "value"], "points": pts})
    out = ts.zscore("value", window="3s", partition_by=["u"], threshold=2.0)
    got = {r["time"].timestamp() * 1000: r["value_anomaly"]
           for r in out.df.collect()}
    assert got[5_000] is True         # the spike vs its trailing window
    assert not any(got[t] for t in (0, 1_000, 2_000, 3_000, 4_000))


def test_ewma_recurrence(spark):
    ts = TimeSeries.from_wire(spark, {
        "name": "e", "columns": ["time", "u", "value"],
        "points": [[0, "a", 10.0], [1_000, "a", 20.0], [2_000, "a", None],
                   [3_000, "a", 40.0], [0, "b", 8.0]]})
    out = ts.ewma("value", alpha=0.5, partition_by=["u"])
    got = {(r["u"], r["time"].timestamp() * 1000): r["value_ewma"]
           for r in out.df.collect()}
    assert got[("a", 0)] == 10.0
    assert got[("a", 1_000)] == 15.0
    assert got[("a", 2_000)] == 15.0      # None carries previous forward
    assert got[("a", 3_000)] == 27.5      # 0.5*40 + 0.5*15
    assert got[("b", 0)] == 8.0
    with pytest.raises(ValueError):
        ts.ewma("value", alpha=0.0)


def test_interval_join_overlaps(spark):
    from pypond_spark.operators.interval import interval_join
    mk = lambda rows: spark.createDataFrame(rows, ["name", "b_ms", "e_ms"]) \
        .select("name",
                F.timestamp_millis(F.col("b_ms")).alias("begin"),
                F.timestamp_millis(F.col("e_ms")).alias("end"))
    left = mk([("a1", 0, 7_200_000),          # spans 2 one-hour buckets
               ("a2", 10_800_000, 10_860_000),
               ("a3", 0, 0)])                 # empty interval: no matches
    right = mk([("b1", 3_600_000, 3_660_000),  # inside a1's 2nd hour
                ("b2", 7_200_000, 7_260_000),  # touches a1's end: no overlap
                ("b3", 10_850_000, 10_900_000)])  # overlaps a2
    out = interval_join(left, right, bucket="1h")
    got = {(r["l_name"], r["r_name"]) for r in out.collect()}
    assert got == {("a1", "b1"), ("a2", "b3")}
    # multi-bucket pair appears exactly once
    assert out.count() == 2
    # equality keys restrict the match
    lk = left.withColumn("k", F.lit("x"))
    rk = right.withColumn("k", F.lit("y"))
    assert interval_join(lk, rk, on=["k"], bucket="1h").count() == 0


def test_interval_join_matches_naive_on_random_intervals(spark):
    """Bucketized join == brute-force overlap on seeded random intervals,
    across bucket sizes (including buckets much smaller/larger than the
    intervals)."""
    import random
    from pypond_spark.operators.interval import interval_join
    rng = random.Random(1234)
    n = 40
    # min length 1ms: interval_join documents empty intervals as matching
    # nothing, while the naive predicate below would count a zero-length
    # interval strictly inside another as overlapping
    mk_rows = lambda pfx: [
        (f"{pfx}{i}", b, b + rng.randrange(1, 4 * 3_600_000))
        for i in range(n)
        for b in [rng.randrange(0, 48 * 3_600_000)]]
    lrows, rrows = mk_rows("L"), mk_rows("R")
    to_df = lambda rows: spark.createDataFrame(
        rows, ["name", "b_ms", "e_ms"]).select(
        "name", F.timestamp_millis(F.col("b_ms")).alias("begin"),
        F.timestamp_millis(F.col("e_ms")).alias("end"))
    expected = {(ln, rn) for ln, lb, le in lrows for rn, rb, re in rrows
                if lb < re and rb < le}
    for bucket in ("15m", "1h", "12h"):
        out = interval_join(to_df(lrows), to_df(rrows), bucket=bucket)
        got = {(r["l_name"], r["r_name"]) for r in out.collect()}
        assert got == expected, f"bucket={bucket}"


def test_interval_join_max_buckets_guard(spark):
    """A pathological interval spanning ~1000 buckets produces the same
    pairs with the split-long-intervals guard on, and the plan stays an
    equi-join (no nested loop / cartesian) with the explode fan-out
    bounded per task."""
    from pypond_spark.operators.interval import interval_join
    to_df = lambda rows: spark.createDataFrame(
        rows, ["name", "b_ms", "e_ms"]).select(
        "name", F.timestamp_millis(F.col("b_ms")).alias("begin"),
        F.timestamp_millis(F.col("e_ms")).alias("end"))
    hour = 3_600_000
    # one ~6-week interval under a 1h bucket (1000+ buckets) + normal ones
    left = to_df([("big", 0, 1000 * hour),
                  ("small", 2 * hour, 3 * hour)])
    right = to_df([("r0", 500 * hour + 1, 500 * hour + 2),   # inside big
                   ("r1", 999 * hour, 1001 * hour),          # tail overlap
                   ("r2", 1000 * hour, 1001 * hour),         # touches: no
                   ("r3", 2 * hour + 5, 2 * hour + 6)])      # inside small
    expected = {("big", "r0"), ("big", "r1"), ("big", "r3"),
                ("small", "r3")}
    plain = interval_join(left, right, bucket="1h")
    guarded = interval_join(left, right, bucket="1h", max_buckets=16)
    assert {(r["l_name"], r["r_name"]) for r in plain.collect()} == expected
    rows = guarded.collect()
    assert {(r["l_name"], r["r_name"]) for r in rows} == expected
    assert len(rows) == len(expected)          # still single-emission
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    with pytest.raises(ValueError):
        interval_join(left, right, bucket="1h", max_buckets=0)


def test_ewma_scan_matches_sequential(spark):
    """Parallel affine-scan EWMA == the sequential operator (to float
    tolerance) across chunk boundaries, NaN gaps, and a leading-gap
    chunk; alpha=0.5 keeps the affine compose exact so equality here is
    bit-for-bit."""
    from pypond_spark.operators.rolling import ewma, ewma_scan
    rows = [(i * 1000, float(v) if v is not None else None)
            for i, v in enumerate(
                [10, None, 30, 5, None, None, 8, 100, 2, 40, None, 7])]
    df = spark.createDataFrame(rows, "t_ms long, value double") \
        .select(F.timestamp_millis(F.col("t_ms")).alias("time"), "value")
    seq = {r["time"]: r["value_ewma"]
           for r in ewma(df, "value", alpha=0.5).collect()}
    par = {r["time"]: r["value_ewma"]
           for r in ewma_scan(df, "value", alpha=0.5, n_chunks=4).collect()}
    assert set(seq) == set(par) and len(par) == 12
    for t in seq:
        if seq[t] is None:
            assert par[t] is None, t
        else:
            assert par[t] == seq[t], t
    with pytest.raises(ValueError):
        ewma_scan(df, ["a", "b"])


def test_merge_intervals_sweep(spark):
    from pypond_spark.operators.interval import coverage, merge_intervals
    rows = [("a", 0, 10), ("a", 5, 20), ("a", 20, 25), ("a", 30, 40),
            ("b", 0, 5), ("b", 100, 101), ("b", 3, 4)]
    df = spark.createDataFrame(rows, "k string, b long, e long").select(
        "k", F.timestamp_millis("b").alias("begin"),
        F.timestamp_millis("e").alias("end"))
    spans = {(r["k"], r["span_start_ms"], r["span_end_ms"]): r["n_intervals"]
             for r in merge_intervals(df, partition_by=["k"]).collect()}
    # a: [0,10)+[5,20) merge; [20,25) touches 20 but half-open [ , ) with
    # begin > prev_max test: begin 20 > 20 is false -> merges too; [30,40) apart
    assert spans == {("a", 0, 25): 3, ("a", 30, 40): 1,
                     ("b", 0, 5): 2, ("b", 100, 101): 1}
    cov = {r["k"]: (r["covered_ms"], r["n_spans"], r["n_intervals"])
           for r in coverage(df, partition_by=["k"]).collect()}
    assert cov == {"a": (35, 2, 4), "b": (6, 2, 3)}


def test_merge_intervals_min_gap_and_invalid(spark):
    from pypond_spark.operators.interval import merge_intervals
    rows = [("a", 0, 10), ("a", 12, 20), ("a", 50, 50), ("a", 60, 55)]
    df = spark.createDataFrame(rows, "k string, b long, e long").select(
        "k", F.timestamp_millis("b").alias("begin"),
        F.timestamp_millis("e").alias("end"))
    # gap of 2ms bridged by min_gap_ms=2; empty/negative intervals drop
    out = merge_intervals(df, partition_by=["k"], min_gap_ms=2).collect()
    assert [(r["span_start_ms"], r["span_end_ms"], r["n_intervals"])
            for r in out] == [(0, 20, 2)]
