"""Tour of the timeseries analytics tier, end to end on sf0.001 events.

Run: python examples/analytics_tour.py

Every operator below is oracle-checked through the driver contract
(__spark_entry__.py); this script strings them together the way an
ops/product-analytics session would.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pypond_spark import TimeSeries, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("analytics_tour", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    df = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .withColumnRenamed("ts", "time"))
    ts = TimeSeries(df, kind="time")

    # 1. outage detection: where did each user go silent for > 4h?
    gaps = ts.find_gaps("4h", partition_by=["user_id"])
    print("silences > 4h:", gaps.count(),
          "| longest:", gaps.agg(F.max("gap_ms")).first()[0] // 3_600_000,
          "hours")

    # 2. OHLC per hour per event type (deterministic tiebreaks)
    ohlc = ts.ohlc_rollup("1h", group_by="event_type",
                          tiebreak="event_id")
    ohlc.df.orderBy("index", "event_type").show(3)

    # 3. seasonal rhythm + profile-relative anomalies
    anom = ts.seasonal_anomaly("value", partition_by=["event_type"])
    worst = (anom.df.where("deviation IS NOT NULL")
             .orderBy(F.desc(F.abs("deviation"))).first())
    print(f"most seasonal-anomalous event: id={worst['event_id']} "
          f"deviation={worst['deviation']:.2f}")

    # 4. do clicks and views move together day by day?
    corr = ts.series_correlation("event_type", "click", "view",
                                 bucket="1h", window="1d")
    print("daily click/view correlation range:",
          [round(x, 3) for x in corr.agg(F.min("r"), F.max("r")).first()])

    # 5. M4 downsampling: the points a pixel-perfect chart needs
    m4 = ts.m4_downsample("1h", partition_by=["event_type"],
                          tiebreak="event_id")
    print("chart points kept:", m4.df.count(), "of", ts.size())

    # 6. funnel: signup -> click -> purchase within 7 days
    fun = ts.funnel(["signup", "click", "purchase"], within="7d")
    steps = fun.agg(F.count("t1_ms"), F.count("t2_ms"),
                    F.count("t3_ms")).first()
    print("funnel signup -> click -> purchase:", list(steps))

    # 7. daily retention cohorts
    ret = ts.retention(period="1d", horizon=7)
    ret.orderBy("cohort", "offset").show(8)

    # 8. CUSUM drift detection: has value shifted off its own mean?
    drift = ts.cusum("value", slack=1.0, threshold=500.0,
                     partition_by=["event_type"], tiebreak="event_id",
                     side="both")
    n_alarm = drift.df.where(F.col("value_alarm")).count()
    print("CUSUM alarm events:", n_alarm)

    # 9. Holt level + trend forecasting state per user
    fc = ts.holt("value", alpha=0.3, beta=0.2, partition_by=["user_id"],
                 tiebreak="event_id")
    last = (fc.df.orderBy(F.desc("time")).select(
        "user_id", "value_level", "value_trend").first())
    print(f"user {last['user_id']} one-step forecast: "
          f"{last['value_level'] + last['value_trend']:.2f}")

    # 10. time-weighted hourly average (honest mean of an irregular gauge)
    twa = ts.integrate("1h", "value", partition_by=["user_id"])
    print("hourly TWA rows:", twa.count())

    # 11. interval coverage: union time of [ts, ts + value sec) per user
    from pypond_spark.operators.interval import coverage
    iv = ts.df.select(
        "user_id", F.col("time").alias("begin"),
        F.timestamp_millis(F.unix_millis("time")
                           + (F.col("value") * 1000).cast("long"))
        .alias("end"))
    cov = coverage(iv, partition_by=["user_id"])
    print("busiest user by covered time:",
          cov.orderBy(F.desc("covered_ms")).first()["user_id"])

    # 12. is there a daily cycle? ACF on the bucket axis, lag 24 = 1 day
    acf = ts.autocorrelation("value", lags=(1, 24),
                             bucket="1h", partition_by=["event_type"])
    acf.orderBy("event_type", "lag").show(4)

    # 13. robust trend: Theil-Sen shrugs off the outliers OLS chases
    rob = ts.theil_sen("value", bucket="1h", partition_by=["user_id"])
    print("median per-user Theil-Sen slope:",
          round(rob.agg(F.median("ts_slope")).first()[0], 4),
          "value-units/hour")

    # 14. rolling click/view correlation over the trailing day
    rc = ts.rolling_correlation("event_type", "click", "view",
                                bucket="1h", lookback=24)
    print("trailing-24h r range:",
          [round(x, 3) for x in rc.agg(F.min("r"), F.max("r")).first()])

    # 15. Holt-Winters: level + trend + a repeating 24-sample season
    from pypond_spark.operators.rolling import holt_winters
    hw = holt_winters(df, "value", period=24, partition_by=["user_id"],
                      tiebreak="event_id")
    hlast = hw.orderBy(F.desc("time")).select(
        "value_level", "value_trend", "value_seasonal").first()
    print(f"HW state at stream end: level={hlast['value_level']:.2f} "
          f"trend={hlast['value_trend']:.3f} "
          f"seasonal={hlast['value_seasonal']:.3f}")

    # 16. materialized-view upkeep: merge a new day into the rollup
    from pypond_spark.operators.aggregate import densify_rollup
    from pypond_spark.operators.incremental import merge_rollups
    cut = F.lit("2024-01-02").cast("timestamp")
    spec = {"v_sum": {"value": "sum"}, "n": {"value": "count"}}

    def roll(d):
        return TimeSeries(d, kind="time").fixed_window_rollup(
            "1h", spec, group_by="event_type").df \
            .select("index", "event_type", "v_sum", "n")

    merged = merge_rollups([roll(df.where(F.col("time") < cut)),
                            roll(df.where(F.col("time") >= cut))],
                           ["index", "event_type"],
                           {"v_sum": "sum", "n": "count"},
                           derive={"v_avg": ("v_sum", "n")})

    # 17. densify: every hour in each type's span, empty hours as zeros
    full = TimeSeries(df, kind="time").fixed_window_rollup(
        "1h", spec, group_by="event_type").df
    dense = densify_rollup(full, "1h", group_by="event_type",
                           fill={"v_sum": 0.0, "n": 0})
    print("merged rollup rows:", merged.count(),
          "| densified (empty hours as zeros):", dense.count())

    # 18. changepoints: WHERE did a user's hourly level actually shift?
    # (stage 8's cusum flags drifting EVENTS; this emits one restart-
    #  bounded alarm per level shift on the bucketed series)
    from pypond_spark.operators.changepoint import cusum_changepoints
    cp = cusum_changepoints(df, "value", bucket="1h",
                            partition_by=("user_id",), k=2.0, h=40.0)
    print("CUSUM changepoint alarms:", cp.count(), "| users alarmed:",
          cp.select("user_id").distinct().count())

    spark.stop()


if __name__ == "__main__":
    main()
