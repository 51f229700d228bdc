"""Compare two bench_full artifacts per query: before vs after, ratio,
GC delta — sorted by absolute seconds saved. Usage:
    python tools/bench_compare2.py BEFORE.json AFTER.json [--min-sec 0.5]
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    before_f, after_f = sys.argv[1], sys.argv[2]
    min_sec = 0.3
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    b = json.load(open(before_f))
    a = json.load(open(after_f))
    bq, aq = b["queries"], a["queries"]
    common = sorted(set(bq) & set(aq))
    rows = []
    for n in common:
        if max(bq[n], aq[n]) < min_sec:
            continue
        rows.append((bq[n] - aq[n], n, bq[n], aq[n],
                     aq[n] / bq[n] if bq[n] else float("inf")))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'before':>8s} {'after':>8s} {'ratio':>6s} "
          f"{'saved':>7s}")
    for saved, n, bb, aa, r in rows:
        print(f"{n:34s} {bb:8.3f} {aa:8.3f} {r:6.2f} {saved:7.3f}")
    tb = sum(bq[n] for n in common)
    ta = sum(aq[n] for n in common)
    import statistics
    med = statistics.median(aq[n] / bq[n] for n in common if bq[n] > 0)
    print(f"\ncommon {len(common)} rows: total {tb:.1f}s -> {ta:.1f}s "
          f"({ta/tb:.3f}x), median per-query ratio {med:.3f}")
    for key in ("stream_queries",):
        if key in b and key in a:
            bs, as_ = b[key], a[key]
            sc = sorted(set(bs) & set(as_))
            tb = sum(bs[n] for n in sc)
            ta = sum(as_[n] for n in sc)
            print(f"stream common {len(sc)}: {tb:.1f}s -> {ta:.1f}s "
                  f"({ta/tb:.3f}x)")
            for n in sc:
                if max(bs[n], as_[n]) >= 1.0:
                    print(f"  {n:34s} {bs[n]:8.3f} {as_[n]:8.3f} "
                          f"{as_[n]/bs[n]:6.2f}")


if __name__ == "__main__":
    main()
