"""Aggregation functions + missing-value filters, compiled to Column exprs.

Reference semantics (``pypond/functions.py``):

- ``sum``: empty list -> 0 (``functions.py:143-155``)
- ``avg``: empty list -> 0, not NULL (``functions.py:157-172``)
- ``stddev``: **population** sigma (``functions.py:299-313``) -> ``stddev_pop``
- ``percentile(q, method)``: numpy-style interpolation with methods
  ``linear|lower|higher|nearest|midpoint`` (``functions.py:250-297``)
- ``median``: average of middle two (``functions.py:315-333``) == percentile 50
- ``first``/``last``: positional in arrival order (``functions.py:216-248``) —
  here: time order (documented deviation for true ties)
- ``difference``: max - min (``functions.py:335-347``)
- ``keep``: first value, NULL if values disagree (``functions.py:123-141``)

Missing-value ``Filters`` (``functions.py:21-96``) become pre-aggregation
column rewrites so everything stays inside Catalyst:

- ``keep_missing``/``ignore_missing``: invalid (NULL/NaN/'') -> NULL, SQL
  null-skip does the rest
- ``zero_missing``: invalid -> 0
- ``propagate_missing``: any invalid in group -> whole aggregate NULL
- ``none_if_empty``: empty group -> NULL (overrides sum/avg empty->0)

Named specs stay in whole-stage codegen. A *callable* reducer
``f(list_of_values) -> scalar`` (reference ``Collection.aggregate``
``collection.py:706-760``, ``Event.combine`` ``event.py:845-961``) compiles
to a pandas grouped-aggregate UDF (Arrow-batched; values arrive as one
Series per group). Spark cannot mix pandas UDAFs with builtin aggregates in
one ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT), so the missing-value filter is
applied *inside* the UDF and mixed specs are split/joined by the windowed
aggregator.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module-level: pandas_udf type hints resolve from here
from pyspark.sql import Column
from pyspark.sql import functions as F

from .util import is_valid_col, valid_or_null

FILTERS = ("keep_missing", "ignore_missing", "zero_missing",
           "propagate_missing", "none_if_empty")

FUNCTION_NAMES = ("sum", "avg", "mean", "max", "min", "count", "first", "last",
                  "percentile", "median", "stddev", "difference", "keep")


def _prefilter(col: Column, flt: str) -> Column:
    """Rewrite the input column per the missing-value filter."""
    if flt == "zero_missing":
        return F.when(is_valid_col(col), col).otherwise(F.lit(0))
    # keep_missing / ignore_missing / propagate_missing / none_if_empty:
    # normalize invalid -> NULL; propagate/none_if_empty post-process below.
    return valid_or_null(col)


def _percentile_expr(col: Column, q: float, method: str) -> Column:
    """Percentile with numpy-style interpolation methods.

    ``linear`` maps to the native ``F.percentile`` (exact, no collect on the
    driver). The other methods are a small expression over
    ``sort_array(collect_list(col))`` — acceptable because percentile groups in
    this engine are time buckets (bounded size), not the whole table.
    """
    if not 0 <= q <= 100:
        raise ValueError("percentile must be between 0 and 100")
    if method == "linear":
        return F.percentile(col, F.lit(q / 100.0))
    vals = F.sort_array(F.collect_list(col))  # collect_list drops NULLs
    size = F.size(vals)
    i = q / 100.0
    idx = F.floor((size - 1) * F.lit(i)).cast("int")
    frac = (size - 1) * F.lit(i) - idx
    v0 = F.element_at(vals, idx + 1)
    v1 = F.element_at(vals, F.least(idx + 2, size))
    if method == "lower":
        picked = v0
    elif method == "higher":
        picked = F.when(frac == 0, v0).otherwise(v1)
    elif method == "nearest":
        picked = F.when(frac < 0.5, v0).otherwise(v1)
    elif method == "midpoint":
        picked = F.when(frac == 0, v0).otherwise((v0 + v1) / 2)
    else:
        raise ValueError(f"unknown percentile method {method!r}")
    return (
        F.when(size == 0, F.lit(None))
        .when((size == 1) | (F.lit(q) == 0), F.element_at(vals, 1))
        .when(F.lit(q) == 100, F.element_at(vals, size))
        .otherwise(picked)
    )


def is_custom_reducer(func) -> bool:
    """True for an opaque Python reducer ``f(list) -> scalar``."""
    return callable(func) and not isinstance(func, str)


def _callable_agg_col(fn, col: Column, flt: str, time_col: str) -> Column:
    """Pandas grouped-agg UDF for a custom reducer. The reducer receives the
    group's values as a Python list **in time order** (reference
    ``Event.map_reduce`` semantics — a Collection's values are chronological,
    so order-sensitive reducers like ``vs[0]`` must see a deterministic
    sequence, not shuffle-arrival order). Ties on time keep arrival order
    (stable sort), same unspecified tie behavior as ``min_by``/``max_by`` in
    the named first/last paths. The missing-value filter runs inside the UDF
    because pandas UDAFs cannot be wrapped in builtin aggregate expressions."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _udaf(t: pd.Series, v: pd.Series) -> float:
        order = t.reset_index(drop=True).sort_values(kind="mergesort").index
        v = v.reset_index(drop=True).iloc[order]
        if flt == "keep_missing":
            vals = [None if pd.isna(x) else float(x) for x in v]
        elif flt == "propagate_missing":
            if v.isna().any():
                return None
            vals = [float(x) for x in v.dropna()]
        else:
            vals = [float(x) for x in v.dropna()]
        if flt == "none_if_empty" and not vals:
            return None
        out = fn(vals)
        return None if out is None else float(out)

    return _udaf(F.col(time_col), col.cast("double"))


def compile_agg(func, in_col: Column | str, flt: str = "ignore_missing",
                time_col: str = "time") -> Column:
    """Compile one aggregation spec to a Column expression.

    ``func``: name string, tuple ``('percentile', q)`` /
    ``('percentile', q, method)``, or a callable ``f(list) -> scalar``
    (pandas-UDAF slow path; numeric fields only). ``in_col``: input column
    (deep paths ok). ``time_col``: ordering column for first/last.
    """
    if flt not in FILTERS:
        raise ValueError(f"unknown filter {flt!r}; expected one of {FILTERS}")
    raw = F.col(in_col) if isinstance(in_col, str) else in_col
    col = _prefilter(raw, flt)

    if is_custom_reducer(func):
        return _callable_agg_col(func, col, flt, time_col)

    method = None
    accuracy = None
    tiebreak = None
    if isinstance(func, (tuple, list)):
        name, *rest = func
        if name == "percentile":
            q = rest[0]
            method = rest[1] if len(rest) > 1 else "linear"
        elif name == "approx_percentile":
            q = rest[0]
            accuracy = int(rest[1]) if len(rest) > 1 else 10_000
        elif name in ("first", "last"):
            # ('first'|'last', tiebreak_col): deterministic winner among
            # duplicate timestamps — the struct (time, tiebreak) compares
            # lexicographically, so equal times fall through to the column.
            # A bare ('first',) tuple degrades to the plain string spec.
            q = None
            tiebreak = rest[0] if rest else None
        else:
            raise ValueError(
                f"only (approx_)percentile/first/last take args, got {func!r}")
    else:
        name, q = func, None

    if name == "sum":
        agg = F.coalesce(F.sum(col), F.lit(0.0))
    elif name in ("avg", "mean"):
        agg = F.coalesce(F.avg(col), F.lit(0.0))
    elif name == "max":
        agg = F.max(col)
    elif name == "min":
        agg = F.min(col)
    elif name == "count":
        # keep_missing counts all arrivals; others count valid values only
        agg = F.count(F.lit(1)) if flt == "keep_missing" else F.count(col)
    elif name == "count_distinct":
        # exact distinct cardinality per group; Spark plans a two-phase
        # expand+agg (shuffle volume = distinct values, not rows)
        agg = F.count_distinct(col)
    elif name == "approx_distinct":
        # HLL++ sketch: fixed-size state per group — THE 100 TB path for
        # cardinality over huge groups; approximate, so (like
        # approx_percentile) it has no value-exact oracle twin
        agg = F.approx_count_distinct(col)
    elif name in ("first", "last"):
        if flt == "keep_missing":
            # faithful: the positionally first/last value INCLUDING invalid
            # ones (min_by/max_by skip nulls, so they can't express this) —
            # struct-collect keeps null payloads, sort recovers time order;
            # the tiebreak (when given) sorts between time and value so
            # duplicate timestamps stay deterministic here too
            tb = [F.col(tiebreak).alias("tb")] if tiebreak else []
            arr = F.sort_array(F.collect_list(
                F.struct(F.col(time_col).alias("t"), *tb, raw.alias("v"))))
            agg = F.element_at(arr, 1 if name == "first" else -1)["v"]
        else:
            order = (F.struct(F.col(time_col), F.col(tiebreak))
                     if tiebreak else F.col(time_col))
            pick = F.min_by if name == "first" else F.max_by
            agg = pick(col, F.when(col.isNotNull(), order))
    elif name == "percentile":
        agg = _percentile_expr(col, q, method)
    elif name == "approx_percentile":
        # the huge-group scale path: a fixed-size quantile sketch per group
        # (error <= 1/accuracy of the rank) instead of shuffling every
        # value; results are approximate, so no oracle twin — pair with
        # ('percentile', q) when exactness matters
        agg = F.approx_percentile(col, F.lit(q / 100.0), F.lit(accuracy))
    elif name == "median":
        agg = F.percentile(col, F.lit(0.5))
    elif name == "stddev":
        agg = F.stddev_pop(col)
    elif name == "difference":
        agg = F.max(col) - F.min(col)
    elif name == "keep":
        if flt == "keep_missing":
            # reference (functions.py:123-141): result = first value (which
            # may be invalid -> None); disagreement checked among valid
            # values only
            arr = F.sort_array(F.collect_list(
                F.struct(F.col(time_col).alias("t"), raw.alias("v"))))
            first_all = F.element_at(arr, 1)["v"]
            agg = (F.when(~is_valid_col(first_all), F.lit(None))
                   .when(F.min(col) != F.max(col), F.lit(None))
                   .otherwise(first_all))
        else:
            agg = F.when(F.min(col) == F.max(col), F.min(col))
    else:
        raise ValueError(f"unknown aggregation function {name!r}")

    if flt == "propagate_missing":
        agg = F.when(F.max((~is_valid_col(raw)).cast("int")) == 1,
                     F.lit(None)).otherwise(agg)
    elif flt == "none_if_empty":
        agg = F.when(F.count(col) == 0, F.lit(None)).otherwise(agg)
    return agg


def normalize_agg_spec(spec: dict) -> list[tuple[str, str, object, str]]:
    """Normalize the reference agg-spec dict to (out, in, func, filter) rows.

    Accepted forms per output column (mirrors ``aggregator.py:74-97``)::

        {'in_avg': {'in': 'avg'}}
        {'in_avg': {'in': ('avg', 'ignore_missing')}}
        {'p95':    {'in': ('percentile', 95, 'higher')}}
        {'in_avg': ('in', 'avg')}                    # shorthand
    """
    rows = []
    for out, body in spec.items():
        if isinstance(body, tuple) and len(body) >= 2 and isinstance(body[0], str) \
                and not isinstance(body[1], dict):
            in_col, func, *rest = body
            flt = rest[0] if rest else "ignore_missing"
        elif isinstance(body, dict):
            if len(body) != 1:
                raise ValueError(
                    f"agg spec for {out!r} must have exactly one input field")
            in_col, fspec = next(iter(body.items()))
            flt = "ignore_missing"
            if isinstance(fspec, (tuple, list)) and fspec \
                    and isinstance(fspec[-1], str) and fspec[-1] in FILTERS:
                # a trailing filter name applies to any function, including
                # percentile forms: ('percentile', q[, method], filter)
                *fparts, flt = fspec
                func = fparts[0] if len(fparts) == 1 else tuple(fparts)
            else:
                func = tuple(fspec) if isinstance(fspec, list) else fspec
        else:
            raise ValueError(f"bad agg spec for {out!r}: {body!r}")
        rows.append((out, in_col, func, flt))
    return rows


def compile_agg_spec(spec: dict, time_col: str = "time") -> list[Column]:
    """Full spec dict -> list of aliased aggregate Columns."""
    return [
        compile_agg(func, in_col, flt, time_col).alias(out)
        for out, in_col, func, flt in normalize_agg_spec(spec)
    ]


def compile_agg_spec_split(spec: dict, time_col: str = "time"
                           ) -> tuple[list[Column], list[Column]]:
    """Spec dict -> (builtin agg columns, pandas-UDAF agg columns).

    Spark refuses to run both families in one ``agg()``; callers run two
    aggregations over the same keys and join (see
    ``operators.aggregate._grouped_agg``).
    """
    named: list[Column] = []
    custom: list[Column] = []
    for out, in_col, func, flt in normalize_agg_spec(spec):
        target = custom if is_custom_reducer(func) else named
        target.append(compile_agg(func, in_col, flt, time_col).alias(out))
    return named, custom


# ---------------------------------------------------------------------------
# row-wise reducers (for collapse: reduce N columns of one row into 1 value)
# ---------------------------------------------------------------------------


def rowwise_reduce(func, cols: Sequence[Column | str]) -> Column:
    """Apply a reducer across N columns *within* a row (no shuffle).

    Used by ``collapse`` (reference ``event.py:544-577``). Named reducers
    stay column expressions; a callable ``f(list) -> scalar`` runs as a
    scalar pandas UDF over the packed value array (Arrow-batched, still
    map-side only).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if is_custom_reducer(func):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _rw(arr: pd.Series) -> pd.Series:
            def red(vs):
                if vs is None:
                    return None
                out = func([None if pd.isna(x) else float(x) for x in vs])
                return None if out is None else float(out)
            return arr.map(red)

        return _rw(F.array(*[c.cast("double") for c in cs]))
    if func == "sum":
        out = cs[0]
        for c in cs[1:]:
            out = out + c
        return out
    if func in ("avg", "mean"):
        return rowwise_reduce("sum", cs) / F.lit(n)
    if func == "max":
        return F.greatest(*cs) if n > 1 else cs[0]
    if func == "min":
        return F.least(*cs) if n > 1 else cs[0]
    if func == "count":
        arr = F.array(*cs)
        return F.size(F.filter(arr, lambda x: x.isNotNull()))
    if func == "first":
        return cs[0]
    if func == "last":
        return cs[-1]
    if func == "difference":
        return F.greatest(*cs) - F.least(*cs) if n > 1 else F.lit(0.0)
    raise ValueError(f"unknown row-wise reducer {func!r}")
