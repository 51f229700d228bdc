"""As-of join: for each left event, the latest right event at-or-before it.

Not in the reference (its only joins are time-keyed merges, SURVEY §2.3) but
the canonical timeseries join a pypond user graduates to. Two physical
strategies:

- ``asof_join`` (default): the union trick — tag both sides, union, one
  time-ordered window partitioned by key, ``last(right_value, ignorenulls)``
  carries the most recent right row onto each left row. ONE shuffle on
  (key, time); no range explosion; scales with total row count. This is the
  100 TB path.
- ``asof_join_broadcast``: when the right side is small (a dimension's
  history), broadcast + range-filtered join + max_by. No shuffle of the big
  side at all.

``tolerance``: optional max staleness (e.g. '5m') — right rows older than
that are not matched (NULLs), matching DuckDB/kdb semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import window_duration_ms


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = (),
    left_time: str = "time",
    right_time: str = "time",
    tolerance: str | None = None,
) -> DataFrame:
    """Union-trick as-of join.

    Output: every left row + right payload columns (NULL when no right row
    at-or-before, or none within tolerance). Right payload columns must not
    collide with left column names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lpay = [c for c in left.columns if c != left_time and c not in keys]
    rpay = [c for c in right.columns if c != right_time and c not in keys]
    collide = set(lpay) & set(rpay)
    if collide:
        raise ValueError(f"column collision between sides: {sorted(collide)}")

    # the whole right row travels as ONE struct so the latest right ROW wins
    # atomically — carrying columns independently would mix values from
    # different right rows whenever the latest row has a NULL column
    r_struct = F.struct(F.col(right_time).alias("__rt"),
                        *[F.col(c) for c in rpay])
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    l_tagged = left.select(
        *keys, F.col(left_time).alias("__t"), F.lit(1).alias("__is_left"),
        *lpay, F.lit(None).cast(r_struct_type).alias("__r"))
    r_tagged = right.select(
        *keys, F.col(right_time).alias("__t"), F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        r_struct.alias("__r"))

    # right rows sort before left rows at equal timestamps so an exact-time
    # right row matches ("at-or-before")
    w = (Window.partitionBy(*keys).orderBy("__t", "__is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c")

    unioned = l_tagged.unionByName(r_tagged)
    staged = unioned.select("*", carried).where(F.col("__is_left") == 1)

    out_cols = [F.col(k) for k in keys] + [F.col("__t").alias(left_time)] + \
        [F.col(c) for c in lpay]
    if tolerance is not None:
        tol_ms = window_duration_ms(tolerance)
        if tol_ms is None:
            raise ValueError(f"bad tolerance spec {tolerance!r}")
        fresh = (F.unix_millis(F.col("__t"))
                 - F.unix_millis(F.col("__c.__rt"))) <= tol_ms
        out_cols += [F.when(fresh, F.col(f"__c.{c}")).alias(c) for c in rpay]
    else:
        out_cols += [F.col(f"__c.{c}").alias(c) for c in rpay]
    return staged.select(*out_cols)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = (),
    left_time: str = "time",
    right_time: str = "time",
    tolerance: str | None = None,
) -> DataFrame:
    """Broadcast strategy: small right side, no shuffle of the left.

    Per left row: join all right rows at-or-before (range condition), keep
    the latest via ``max_by``. Right side must fit in a broadcast.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rpay = [c for c in right.columns if c != right_time and c not in keys]
    lcols = list(left.columns)
    # a surrogate row id keeps fully-duplicate left rows distinct through the
    # group-back (otherwise identical rows would collapse into one)
    left = left.withColumn("__lid", F.monotonically_increasing_id())
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    cond = cond & (right[right_time] <= left[left_time])
    if tolerance is not None:
        tol_ms = window_duration_ms(tolerance)
        if tol_ms is None:
            raise ValueError(f"bad tolerance spec {tolerance!r}")
        cond = cond & (F.unix_millis(left[left_time])
                       - F.unix_millis(right[right_time]) <= tol_ms)
    joined = left.join(F.broadcast(right), cond, "left")
    # whole right row via one max_by so ties can't mix columns across rows
    rstruct = F.struct(*[right[c] for c in rpay])
    grouped = (joined.groupBy(left["__lid"], *[left[c] for c in lcols])
               .agg(F.max_by(rstruct, right[right_time]).alias("__r")))
    return grouped.select(*lcols,
                          *[F.col(f"__r.{c}").alias(c) for c in rpay])
