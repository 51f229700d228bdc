"""Funnel progression and retention cohorts — event-sequence analytics.

The reference stops at windowed aggregation of one series; the questions
product/ops teams actually ask of an event stream are sequential: "of the
users who did A, how many later did B, then C?" (funnel) and "of the users
who first appeared in week W, how many were active in week W+k?"
(retention). Both reduce to per-entity ordered aggregates — no sessioniza-
tion state, no UDFs.

Scale shapes:

- ``funnel_steps``: one bounded aggregation per step over the rows of that
  step's event type (each pre-filtered at the scan), joined per entity.
  Every intermediate is one row per entity — corpus-sized data is touched
  once per step, aggregates flow through partial agg, and the per-entity
  join keys are uniform.
- ``retention_cohorts``: two bounded aggregations (first-seen per entity,
  then distinct (entity, period)) and one broadcast-sized join; the
  output is a cohort x offset matrix, rows = cohorts x horizon.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..index import window_duration_ms


def funnel_steps(
    df: DataFrame,
    steps: Sequence,
    step_col: str = "event_type",
    entity_col: str = "user_id",
    within: str | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Per entity, the first time it completed each funnel step IN ORDER:
    step k counts only events strictly after the entity's step k-1 instant
    (and, with ``within=``, no later than step 1's instant + the window).

    Output: ``entity_col, t1_ms .. tN_ms`` (epoch ms, NULL from the first
    uncompleted step onward). Aggregate the non-NULL counts per column for
    the classic funnel bar chart.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)!r}")
    win_ms = None
    if within is not None:
        win_ms = window_duration_ms(within)
        if win_ms is None:
            raise ValueError(f"within needs a fixed window, got {within!r}")
    ms = F.unix_millis(F.col(time_col))

    out = (df.where(F.col(step_col) == steps[0])
           .groupBy(entity_col)
           .agg(F.min(ms).alias("t1_ms")))
    for k, step in enumerate(steps[1:], start=2):
        ev = (df.where(F.col(step_col) == step)
              .select(F.col(entity_col), ms.alias("__t")))
        cond = F.col("__t") > F.col(f"t{k - 1}_ms")
        if win_ms is not None:
            cond = cond & (F.col("__t") <= F.col("t1_ms") + F.lit(win_ms))
        out = (out.join(ev, entity_col, "left")
               .groupBy(entity_col,
                        *[f"t{i}_ms" for i in range(1, k)])
               .agg(F.min(F.when(cond, F.col("__t")))
                    .alias(f"t{k}_ms")))
    return out


def retention_cohorts(
    df: DataFrame,
    entity_col: str = "user_id",
    period: str = "1d",
    horizon: int = 30,
    time_col: str = "time",
) -> DataFrame:
    """Cohort retention matrix: entities grouped by their first-seen
    period; for each offset ``0..horizon``, how many were active again.

    Output: ``cohort`` (first-seen period position), ``offset`` (periods
    since first seen), ``n_active``. Offset 0 row = cohort size.
    """
    p_ms = window_duration_ms(period)
    if p_ms is None:
        raise ValueError(f"period needs a fixed window, got {period!r}")
    pos = F.floor(F.unix_millis(F.col(time_col)) / F.lit(p_ms))
    first = (df.groupBy(entity_col)
             .agg(F.min(pos).alias("cohort")))
    active = df.select(F.col(entity_col), pos.alias("__p")).distinct()
    return (active.join(first, entity_col)
            .withColumn("offset", F.col("__p") - F.col("cohort"))
            .where(F.col("offset") <= horizon)
            .groupBy("cohort", "offset")
            .agg(F.count_distinct(entity_col).alias("n_active")))
