"""Incremental rollup maintenance (algebraic view merge).

The 100 TB pattern this enables: keep a materialized rollup (hours x
groups — tiny next to the fact table), and when a new partition of
events lands, aggregate ONLY the delta and merge it in. Cost is
O(|delta| + |rollup|) instead of O(|history|) — the difference between
a nightly full rescan of 100 TB and a merge of one day's slice with a
few-million-row aggregate table.

Only ALGEBRAIC aggregates merge losslessly: sum/count merge by adding,
min/max by re-min/maxing, avg by carrying (sum, count) and deriving the
ratio after the merge. Holistic aggregates (exact median/percentile)
fundamentally do not — the honest options at scale are the quantile
sketch (``approx_percentile``, mergeable by design) or a recompute of
the affected windows only (time-bucketed rollups localize a delta to
its own buckets, so "recompute" is still delta-sized). This module
refuses anything it can't merge exactly rather than silently degrading.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,       # partial sums add
    "count": F.sum,     # partial counts add
    "min": F.min,
    "max": F.max,
}


def merge_rollups(
    parts: Sequence[DataFrame],
    keys: Sequence[str],
    merge_spec: Mapping[str, str],
    derive: Mapping[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Merge algebraic rollup outputs that share a schema.

    ``parts`` are rollup DataFrames (same columns) over disjoint or
    overlapping slices of the fact table; ``keys`` are the rollup's
    grouping columns (window position, group columns); ``merge_spec``
    maps each measure column to how it merges: ``sum``/``count`` (add),
    ``min``/``max``. ``derive`` adds ratio columns after the merge:
    ``{"v_avg": ("v_sum", "n")}`` emits ``v_sum / n`` as ``v_avg``
    (NULL when the merged count is 0 — matching the empty-window
    semantics of a direct rollup's ``avg``).

    Plan shape: union of the (tiny) rollup frames -> ONE groupBy on the
    rollup keys. The fact table is never touched; at steady state the
    delta side is one partition's aggregate and the base side is the
    materialized view. Exactness: merging partial aggregates is the
    SAME associativity Spark's own partial/final aggregation exploits
    inside every groupBy — the driver oracle checks the merged result
    hash-matches a from-scratch rollup over the full range.
    """
    if not parts:
        raise ValueError("merge_rollups needs at least one part")
    unknown = [f for f in merge_spec.values() if f not in _MERGE]
    if unknown:
        raise ValueError(
            f"non-algebraic merge function(s) {unknown!r}: only "
            f"{sorted(_MERGE)} merge exactly; use approx_percentile "
            "sketches or delta-bucket recompute for holistic aggregates")
    cols = list(keys) + list(merge_spec)
    base = reduce(lambda a, b: a.unionByName(b),
                  [p.select(*cols) for p in parts])
    aggs: list[Column] = [_MERGE[f](c).alias(c)
                          for c, f in merge_spec.items()]
    out = base.groupBy(*keys).agg(*aggs)
    for name, (num, den) in (derive or {}).items():
        out = out.withColumn(
            name, F.try_divide(F.col(num),
                               F.nullif(F.col(den), F.lit(0))))
    return out
