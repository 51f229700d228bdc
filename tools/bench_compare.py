"""Round-over-round bench comparison with GC-noise attribution.

Compares two ``bench_full_r*.json`` artifacts (written by bench.py) and
prints every query whose ratio crosses the threshold, annotated with the
GC-time delta so a reader can separate a genuine plan regression (time
up, GC flat) from shared-JVM GC/memory noise (time and GC up together —
the r7 verdict's `embedding_near_dups` 9.2s-shared vs 5.2s-isolated
case).  A query is tagged ``gc-suspect`` when the GC-time growth explains
at least half of the wall-time growth.

Usage:
    python tools/bench_compare.py bench_full_rA.json bench_full_rB.json \
        [--threshold 1.3]
"""

from __future__ import annotations

import json
import sys


def _min_or_none(xs):
    xs = [x for x in (xs or []) if x is not None]
    return min(xs) if xs else None


def compare(old_path: str, new_path: str, threshold: float = 1.3) -> int:
    with open(old_path) as fh:
        old = json.load(fh)
    with open(new_path) as fh:
        new = json.load(fh)
    o_t, n_t = old.get("queries", {}), new.get("queries", {})
    o_gc, n_gc = old.get("gc_ms", {}), new.get("gc_ms", {})
    common = sorted(set(o_t) & set(n_t))
    rows = []
    for q in common:
        a, b = o_t.get(q), n_t.get(q)
        if not a or b is None:
            continue
        ratio = b / a if a else float("inf")
        # GC of the best (min-time) run on each side, when recorded
        ga = _min_or_none(o_gc.get(q))
        gb = _min_or_none(n_gc.get(q))
        gc_note = ""
        if ga is not None and gb is not None:
            d_wall_ms = (b - a) * 1000.0
            d_gc_ms = gb - ga
            if ratio >= threshold and d_wall_ms > 0 \
                    and d_gc_ms >= 0.5 * d_wall_ms:
                gc_note = "gc-suspect"
            gc_note = f"gc {ga}->{gb}ms {gc_note}".rstrip()
        rows.append((ratio, q, a, b, gc_note))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] >= threshold]
    tot_n = sum(v for q, v in n_t.items() if q in common and v)
    tot_oc = sum(v for q, v in o_t.items() if q in common and v)
    print(f"{len(common)} comparable queries; "
          f"sum {tot_oc:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_oc:.2f}x); {len(flagged)} over "
          f"{threshold:.2f}x")
    for ratio, q, a, b, gc_note in rows[:25]:
        mark = " <-- " if ratio >= threshold else "     "
        print(f"{mark}{q:32s} {a:7.2f}s -> {b:7.2f}s  "
              f"{ratio:5.2f}x  {gc_note}")
    return 1 if any("gc-suspect" not in r[4] and r[0] >= threshold
                    and r[3] - r[2] > 0.5 for r in flagged) else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    if len(args) < 2:
        sys.exit(__doc__)
    sys.exit(compare(args[0], args[1], thr))
