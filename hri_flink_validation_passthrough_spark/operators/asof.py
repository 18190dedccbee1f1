"""As-of join — an operator Spark lacks natively (SURVEY.md §2B "as-of joins").

Implemented as union + window ``last(ignorenulls)`` rather than a range join:

- a range join (``l.key = r.key AND r.t <= l.t`` then max-per-row) explodes to
  |left| × |matches| intermediate rows — quadratic on hot keys, deadly at
  100 TB;
- the union plan is one shuffle on ``key`` plus one sort within partitions:
  O(n log n) per partition, no row explosion, AQE-skew-splittable. This is the
  plan that survives a 1000-executor scale-up.

Tie semantics: right rows at exactly ``t == left.t`` are included (<=), and
among equal-time right rows the one with the greatest tiebreak column wins —
deterministic, oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    value_cols: list[str],
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the latest ``right``
    row with the same ``key`` and ``right.time <= left.time``.

    Both inputs must already expose ``key`` and ``time`` under the same column
    names (rename upstream). ``value_cols`` must exist only on ``right``; the
    last of them is used as the deterministic tiebreak among equal-time rows.
    Returns all ``left`` columns plus ``value_cols`` (null when no match).
    """
    l = left.withColumn(_SIDE, F.lit(1))
    r = right.select(key, time, *value_cols).withColumn(_SIDE, F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal time (side 0 < 1) → inclusive
    # "<=" semantics; value_cols break ties among equal-time right rows.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time), F.col(_SIDE), *[F.col(c) for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # One projection: every last() references the ORIGINAL columns, so all
    # value_cols resolve against the same window ordering (and therefore the
    # same winning right-row).
    out_cols = [F.col(c) for c in left.columns] + [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return unioned.select(*out_cols, F.col(_SIDE)).filter(F.col(_SIDE) == 1).drop(_SIDE)
