"""Quickstart: the pypond workflow on pypond_spark, end to end.

Run: python examples/quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pypond_spark import Pipeline, TimeRange, TimeSeries, get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("quickstart", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest the pypond wire format
    ts = TimeSeries.from_wire(spark, {
        "name": "traffic",
        "columns": ["time", "in", "out"],
        "points": [
            [1400425947000, 52, 34], [1400426007000, None, 41],
            [1400426067000, 26, 49], [1400426127000, 93, 155],
            [1400426187000, 84, 80], [1400426247000, 51, 62],
        ],
    })
    print("columns:", ts.columns(), "| size:", ts.size(),
          "| avg(in):", ts.avg("in"))

    # 2. repair, resample, differentiate
    repaired = ts.fill(field_spec="in", method="linear")
    aligned = repaired.align(field_spec="in", window="1m", method="linear")
    rates = aligned.rate(field_spec="in")
    print("rates:", [p[1] for p in rates.to_wire()["points"]])

    # 3. windowed rollup through the fluent Pipeline
    rolled = (
        Pipeline()
        .from_source(ts)
        .window_by("5m")
        .aggregate({"in_avg": {"in": "avg"}, "out_max": {"out": "max"}})
        .to_keyed_collections()
    )
    for key, series in sorted(rolled.items()):
        print(key, "->", series.df.drop("begin", "end").collect())

    # 4. crop + scalar stats
    window = TimeRange(1400426007000, 1400426187000)
    print("cropped p95(out):", ts.crop(window).percentile(95, "out"))

    # 5. wire round-trip
    print("back to wire:", ts.select("in").to_wire()["columns"])
    spark.stop()


if __name__ == "__main__":
    main()
