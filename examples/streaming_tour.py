"""Tour of the Structured Streaming mirror: stateful operators over
micro-batches, drained with availableNow.

Run: python examples/streaming_tour.py

The stream is fed from JSON chunk files with maxFilesPerTrigger=1 so
every stateful operator genuinely crosses micro-batch boundaries — the
same discipline the test suite uses.
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from pypond_spark import get_spark  # noqa: E402
from pypond_spark.streaming import (StreamPipeline,  # noqa: E402
                                    run_available_now)

SCHEMA = T.StructType([
    T.StructField("t_ms", T.LongType()),
    T.StructField("sensor", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def main() -> None:
    spark = get_spark("streaming_tour", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # two micro-batches of sensor readings; sensor b goes silent
    chunks = [
        [{"t_ms": i * 30_000, "sensor": s, "value": 100.0 + i * 10}
         for i in range(3) for s in ("a", "b")],
        [{"t_ms": (i + 3) * 30_000, "sensor": "a", "value": 130.0 + i * 10}
         for i in range(3)]
        + [{"t_ms": 300_000, "sensor": "b", "value": 999.0}],
    ]
    d = tempfile.mkdtemp(prefix="stream_tour_")
    for i, chunk in enumerate(chunks):
        with open(f"{d}/part{i}.json", "w") as fh:
            for rec in chunk:
                fh.write(json.dumps(rec) + "\n")

    def source():
        return (spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1).json(d)
                .withColumn("time", F.timestamp_millis(F.col("t_ms")))
                .drop("t_ms"))

    pipe = StreamPipeline(source()).group_by("sensor")

    # 1. windowed aggregate, reference emit_on semantics
    agg, mode = (StreamPipeline(source()).window_by("1m")
                 .group_by("sensor").emit_on("flush")
                 .aggregate({"v_avg": {"value": "avg"}}))
    print("per-minute averages:")
    run_available_now(agg, mode).orderBy("begin", "sensor").show(6)

    # 2. cross-batch rate with SNMP counter-wrap correction
    rates = run_available_now(
        pipe.rate("value", counter_wrap=1024), "append").collect()
    print("rates (first 3):",
          [(r["sensor"], r["value_rate"]) for r in rates[:3]])

    # 3. outage detection: sensor b's silence spans the batch boundary
    gaps = run_available_now(pipe.find_gaps("1m"), "append").collect()
    print("gaps:", [(r["sensor"], r["gap_ms"]) for r in gaps])

    # 4. running cumulative state (constant per-key footprint)
    cum = run_available_now(
        pipe.cumulative({"v_cum": {"value": "sum"}}), "append").collect()
    print("sensor a final cumsum:",
          max((r["t_ms"], r["v_cum"]) for r in cum
              if r["sensor"] == "a")[1])

    # 5. trailing z-score anomalies (sensor b's 999 spike)
    z = run_available_now(pipe.zscore("value", window="10m",
                                      threshold=2.0), "append").collect()
    anomalies = [(r["sensor"], r["value"]) for r in z if r["value_anomaly"]]
    print("anomalies:", anomalies)

    # 6. sessionization as events arrive: 3 longs of state per sensor,
    # sessions emitted the moment the next event closes them
    sess = run_available_now(pipe.sessions("1m"), "append").collect()
    print("closed sessions:",
          [(r["sensor"], r["begin_ms"], r["n"]) for r in sess])

    # 7. exact distinct sensors per minute: chained stateful dedup + agg
    # (ungrouped — the per-sensor pipeline would trivially count 1)
    from pypond_spark.streaming import stream_distinct_counts
    dc = run_available_now(stream_distinct_counts(source(), "sensor", "1m"),
                           "complete").collect()
    print("distinct sensors by minute:",
          sorted((int(r["begin"].timestamp() * 1000), r["u_sensor"])
                 for r in dc))

    # 8. round-9: bounded ingestion dedup — an event-time ttl= evicts
    # idle claims once the watermark passes (state plateaus instead of
    # growing forever; a post-expiry duplicate is re-admitted)
    from pypond_spark.streaming.stream import stream_first_seen
    keyed = source().selectExpr("sensor AS digest",
                                "CAST(value AS LONG) AS doc_id", "time")
    fs = run_available_now(
        stream_first_seen(keyed, ttl="2m"), "append").collect()
    print("first-seen claims (ttl=2m):",
          sorted((r["digest"], r["doc_id"]) for r in fs))

    # 9. round-9: stream-stream attribution join within a horizon;
    # unmatched='emit' surfaces expired conversions with NULL views
    from pypond_spark.streaming.stream import stream_attribution_join
    views = source().selectExpr("sensor AS user_id",
                                "CAST(value AS LONG) AS view_id", "time")
    clicks = source().selectExpr("sensor AS user_id",
                                 "CAST(value + 1 AS LONG) AS click_id",
                                 "time")
    pairs = run_available_now(
        stream_attribution_join(views, clicks, horizon="1m"),
        "append").collect()
    print("attributed pairs within 1m:", len(pairs))

    spark.stop()


if __name__ == "__main__":
    main()
