"""Range (interval) join — SURVEY.md §2B 'range/interval joins'.

Naive plan: equi-join on key, then filter the time predicate — the join
explodes to |key group|² intermediate rows before filtering, which dies on
hot keys at 100 TB. Scale-safe plan used here: bucketize time by the window
width so each left row joins at most two buckets per key, equi-join on
(key, bucket) — Catalyst gets a plain hash join — then apply the exact
range predicate. Row expansion is bounded by bucket occupancy, not key
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time_ms: str,
    right_time_ms: str,
    lower_ms: int,
    upper_ms: int,
) -> DataFrame:
    """Pairs (l, r) with ``l.key == r.key`` and
    ``l.time + lower_ms < r.time <= l.time + upper_ms``.

    Column names must be pre-disambiguated (no shared names except ``key``).
    Returns all left columns + all right columns.
    """
    if not upper_ms > lower_ms:
        raise ValueError("upper_ms must be > lower_ms")
    width = upper_ms - lower_ms

    def idiv(col, w):
        # exact integer division for non-negative longs: (a - a%w)/w is a
        # whole number computed exactly in double (float floor-division
        # would wobble at bucket boundaries for epoch-ms magnitudes)
        return ((col - col % w) / w).cast("long")

    # left row l matches right times in (l.t+lower, l.t+upper]: that interval
    # spans at most two width-sized buckets.
    lo_bucket = idiv(F.col(left_time_ms) + lower_ms + 1, width)
    l = left.withColumn(
        "__bucket", F.explode(F.array(lo_bucket, lo_bucket + 1))
    )
    r = right.withColumn("__bucket", idiv(F.col(right_time_ms), width))

    cond = (
        (l[key] == r[key])
        & (l["__bucket"] == r["__bucket"])
        & (F.col(right_time_ms) > F.col(left_time_ms) + lower_ms)
        & (F.col(right_time_ms) <= F.col(left_time_ms) + upper_ms)
    )
    out_cols = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c != key
    ]
    return l.join(r, cond).select(*out_cols)
