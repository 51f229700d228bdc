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


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (respecting parens)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def window_specs(plan: str) -> list[tuple[list[str], list[str]]]:
    """Every windowspecdefinition in the plan as (partition_cols,
    order_cols).  In plan text the spec's arguments are
    ``partitionCols..., orderCols ASC/DESC ..., specifiedwindowframe(...)``
    — an argument is an order col iff it carries a sort direction."""
    specs = []
    needle = "windowspecdefinition("
    i = 0
    while (j := plan.find(needle, i)) != -1:
        depth, k = 1, j + len(needle)
        while k < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[k], 0)
            k += 1
        args = _split_top(plan[j + len(needle):k - 1])
        parts, orders = [], []
        for a in args:
            if a.startswith("specifiedwindowframe"):
                continue
            (orders if (" ASC" in a or " DESC" in a) else parts).append(a)
        specs.append((parts, orders))
        i = k
    return specs


def windows_audit(sf_dir: str, names: list[str]) -> int:
    """Suite-wide unpartitioned-window audit (r4 verdict item 7 / r5
    item 3): per query, window-node spec count and how many have NO
    partition spec — each of those moves its whole input to one
    partition (the WindowExec warning), acceptable only on bounded
    aggregated frames."""
    spark = get_spark("windows_audit")
    spark.sparkContext.setLogLevel("ERROR")
    entry._ensure_confs(spark)
    qs = entry.queries()
    targets = names or [n for n in qs if not n.startswith("stream_")]
    hits = 0
    print(f"{'query':26s} {'n_specs':>8s} {'unpart':>7s}  unpartitioned order cols")
    print("-" * 78)
    for name in targets:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:26s} !! {type(exc).__name__}: {exc}")
            continue
        specs = window_specs(plan)
        unpart = [o for p, o in specs if not p]
        if unpart:
            hits += 1
            desc = "; ".join(",".join(o) or "<global>" for o in unpart)
            print(f"{name:26s} {len(specs):8d} {len(unpart):7d}  {desc[:60]}")
        elif specs:
            print(f"{name:26s} {len(specs):8d} {0:7d}")
    print(f"\nqueries with unpartitioned window nodes: {hits}")
    spark.stop()
    return hits


def main() -> None:
    args = sys.argv[1:]
    wins = "--windows" in args
    args = [a for a in args if a != "--windows"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if wins:
        windows_audit(sf_dir, names)
        return
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
