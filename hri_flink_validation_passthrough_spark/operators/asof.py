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


_RT = "__asof_rt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the matching
    ``right`` row with the same ``key``:

    - ``direction="backward"`` (default): the LATEST right row with
      ``right.time <= left.time``; among equal-time rows the greatest
      ``value_cols`` tuple wins.
    - ``direction="forward"``: the EARLIEST right row with
      ``right.time >= left.time``; among equal-time rows the smallest
      ``value_cols`` tuple wins.

    ``tolerance_s`` bounds the match: a backward match older than
    ``left.time - tolerance_s`` (or a forward match beyond
    ``left.time + tolerance_s``) is nulled out. Because the unbounded match
    is the NEAREST one, nulling it exactly equals re-running the join with
    the time bound in the predicate — no second pass needed.

    Both inputs must already expose ``key`` and ``time`` under the same column
    names (rename upstream). ``value_cols`` must exist only on ``right``.
    Returns all ``left`` columns plus ``value_cols`` (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"

    # Side ordering makes "<="/">=" inclusive: backward puts right rows
    # BEFORE left at equal time (side 0 < 1) so the trailing frame sees
    # them; forward puts them AFTER (side 1 > 0) so the leading frame does.
    l = left.withColumn(_SIDE, F.lit(0 if fwd else 1))
    r = (
        right.select(key, time, *value_cols)
        .withColumn(_RT, F.col(time))
        .withColumn(_SIDE, F.lit(1 if fwd else 0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    picked = [*value_cols, _RT]
    w = Window.partitionBy(key).orderBy(
        F.col(time), F.col(_SIDE), *[F.col(c) for c in value_cols]
    )
    if fwd:
        w = w.rowsBetween(0, Window.unboundedFollowing)
        pick = {c: F.first(c, ignorenulls=True).over(w) for c in picked}
    else:
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        pick = {c: F.last(c, ignorenulls=True).over(w) for c in picked}
    # Every first()/last() resolves against the same window ordering, and
    # right rows are non-null in ALL picked columns — so each output column
    # comes from the same winning right-row.

    if tolerance_s is not None:
        # seconds-with-fraction timestamp difference: exact micro precision
        dt = pick[_RT].cast("double") - F.col(time).cast("double")
        in_tol = (dt <= tolerance_s) if fwd else (-dt <= tolerance_s)
        vals = [
            F.when(in_tol, pick[c]).alias(c) for c in value_cols
        ]
    else:
        vals = [pick[c].alias(c) for c in value_cols]

    out_cols = [F.col(c) for c in left.columns] + vals
    return unioned.select(*out_cols, F.col(_SIDE)).filter(
        F.col(_SIDE) == (0 if fwd else 1)
    ).drop(_SIDE)
