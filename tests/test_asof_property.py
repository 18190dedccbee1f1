"""Property test: the union+window as-of join equals a naive per-row
reference on randomized inputs (keys with ties, empty matches, duplicate
timestamps)."""

from __future__ import annotations

import random

import pytest


def naive_asof(left_rows, right_rows):
    """max value among right rows with same key, time <= left time, at the
    max matching time (mirrors the operator's tie semantics)."""
    out = {}
    for lid, (lk, lt) in enumerate(left_rows):
        matches = [(rt, rv) for rk, rt, rv in right_rows if rk == lk and rt <= lt]
        if not matches:
            out[lid] = None
        else:
            mt = max(m[0] for m in matches)
            out[lid] = max(v for t, v in matches if t == mt)
    return out


@pytest.mark.parametrize("seed", range(8))
def test_asof_join_matches_naive(spark, seed):
    from hri_flink_validation_passthrough_spark.operators.asof import asof_join

    rng = random.Random(seed)
    left_rows = [
        (rng.randint(0, 5), rng.randint(0, 50)) for _ in range(rng.randint(1, 40))
    ]
    right_rows = [
        (rng.randint(0, 5), rng.randint(0, 50), rng.randint(0, 999))
        for _ in range(rng.randint(0, 40))
    ]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(right_rows, "k long, t long, v long")
    got = {
        r.lid: r.v
        for r in asof_join(left, right, key="k", time="t", value_cols=["v"]).collect()
    }
    assert got == naive_asof(left_rows, right_rows), f"seed {seed}"


def naive_asof_forward(left_rows, right_rows, tol=None):
    """min value among right rows with same key at the min time >= left time
    (within tol when given) — mirrors the forward tie semantics."""
    out = {}
    for lid, (lk, lt) in enumerate(left_rows):
        matches = [(rt, rv) for rk, rt, rv in right_rows if rk == lk and rt >= lt]
        if matches:
            mt = min(m[0] for m in matches)
            if tol is not None and mt - lt > tol:
                matches = []
        if not matches:
            out[lid] = None
        else:
            out[lid] = min(v for t, v in matches if t == mt)
    return out


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("tol", [None, 7])
def test_asof_join_forward_matches_naive(spark, seed, tol):
    from hri_flink_validation_passthrough_spark.operators.asof import asof_join

    rng = random.Random(1000 + seed)
    left_rows = [
        (rng.randint(0, 5), rng.randint(0, 50)) for _ in range(rng.randint(1, 40))
    ]
    right_rows = [
        (rng.randint(0, 5), rng.randint(0, 50), rng.randint(0, 999))
        for _ in range(rng.randint(0, 40))
    ]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(right_rows, "k long, t long, v long")
    got = {
        r.lid: r.v
        for r in asof_join(
            left, right, key="k", time="t", value_cols=["v"],
            direction="forward", tolerance_s=tol,
        ).collect()
    }
    assert got == naive_asof_forward(left_rows, right_rows, tol), f"seed {seed}"
