"""Plan audit: physical-plan shape counters for every driver query.

Usage::

    python tools/explain_audit.py [sf_dir] [query ...]

Prints, per query: number of exchanges (hash/range repartitions),
broadcast joins, sort-merge joins, sorts, and Python-eval operators in
the executed plan — the numbers the SCALE.md tables quote, reproducible
in one command. Streaming-drain queries (prefix ``stream_``) execute a
real query before returning a batch result, so they are skipped unless
named explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pypond_spark.session import get_spark  # noqa: E402

MARKS = {
    "exchange": ("Exchange hashpartitioning", "Exchange rangepartitioning"),
    "bcast": ("BroadcastHashJoin", "BroadcastNestedLoop"),
    "smj": ("SortMergeJoin",),
    "sort": ("Sort ",),
    "python": ("Python", "ArrowEval", "MapInPandas", "FlatMapGroupsInPandas"),
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("explain_audit")
    spark.sparkContext.setLogLevel("ERROR")
    entry._ensure_confs(spark)
    qs = entry.queries()
    targets = names or [n for n in qs if not n.startswith("stream_")]
    hdr = f"{'query':26s} " + " ".join(f"{k:>8s}" for k in MARKS)
    print(hdr)
    print("-" * len(hdr))
    for name in targets:
        if name not in qs:
            print(f"{name:26s} ?? unknown query")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            counts = {k: sum(plan.count(m) for m in marks)
                      for k, marks in MARKS.items()}
            print(f"{name:26s} " + " ".join(
                f"{counts[k]:8d}" for k in MARKS))
        except Exception as exc:  # keep auditing the rest
            print(f"{name:26s} !! {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
