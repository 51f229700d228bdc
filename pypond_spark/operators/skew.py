"""Skew mitigation: deterministic salted equi-join.

Spark's AQE splits moderately skewed shuffle partitions at runtime
(``spark.sql.adaptive.skewJoin``), and a small dimension side should
always be ``broadcast()`` instead. Salting is the remaining tool: when
BOTH sides are too large to broadcast and one join key floods a reducer
beyond what AQE's partition-splitting can rebalance (a single hot key
is ONE map-output block per mapper — AQE can split it, but every split
still re-reads the same hot key's rows), replicate the smaller side
across ``salt`` sub-keys so the hot key's probe rows spread over
``salt`` reducers.

Everything here is deterministic — no ``rand()``. A task retry or
speculative duplicate must salt a row identically or the join silently
drops/duplicates rows; we derive the salt from a hash of the row's own
join-key + payload columns, which also means identical rows share a
salt (correct, merely less spread for pathological all-identical data).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt``
    reducers; the RIGHT side is replicated ``salt`` times.

    Result is row-for-row EXACTLY the plain ``left.join(right, on,
    how)`` — verified by the ``salted_join_revenue`` driver oracle and
    the property test. Supports ``inner`` and ``left`` (the replicated
    side must be the non-preserved one; for a right/full join swap the
    arguments yourself so the replication factor stays on the smaller
    input).

    Cost model, stated honestly: the right side's shuffle volume grows
    ``salt``x. Use this when |right| * salt << |left|'s hot-key excess —
    i.e. a fact/fact join where one side is 10-100x smaller but still
    too big to broadcast, and the big side's key histogram has a
    pathological spike. For uniform keys this is pure overhead; measure
    first (``df.groupBy(on).count()`` tails).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("salted_join needs at least one join key")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r} "
                         "(swap the inputs for right-preserving joins)")
    # deterministic per-row salt: retries/speculation re-derive the same
    # value (rand() here would silently corrupt the join)
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                    F.lit(salt)).cast("int")
    l = left.withColumn(_SALT, l_salt)
    # sequence(int, int) explodes to int, matching the left side's cast
    # (a generator can't be nested inside another expression)
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, keys + [_SALT], how)
    return out.drop(_SALT)
