"""Randomized differential for the bucketized range join (r13 deepening).

operators/rangejoin.py replaces the naive key-equi-join + time filter
(|key group|² expansion) with a bucketize-then-hash-join plan; its
registered query (range_join_event_pairs) oracle-checks ONE window shape
on real data. This differential pins the plan against the naive
definition across random window shapes — including NEGATIVE lower bounds
(look-back windows), width-1 windows, and adversarial right-times placed
EXACTLY at window boundaries (l.t+lower excluded, l.t+lower+1 first
included, l.t+upper last included, l.t+upper+1 excluded) and at bucket
multiples. A 12-seed exploratory sweep (incl. forced negative-lower
cases) was all-green before committing 6.
"""

from __future__ import annotations

import random

import pytest

from hri_flink_validation_passthrough_spark.operators.rangejoin import range_join

BASE = 1_700_000_000_000  # epoch-ms domain, the production magnitude


@pytest.mark.parametrize("seed", range(6))
def test_bucketized_range_join_matches_naive(spark, seed):
    rng = random.Random(0x2A7 + seed)
    lower = [-300_000, -60_000, 0][seed % 3]
    upper = lower + rng.choice([1, 60_000, 300_000])
    keys = ["u1", "u2", "u3"]
    lrows, rrows = [], []
    for i in range(40):
        lrows.append((rng.choice(keys), BASE + rng.randrange(0, 2_000_000), i))
    for j in range(60):
        if rng.random() < 0.5:
            lk, lt, _ = rng.choice(lrows)
            k, t = lk, lt + rng.choice(
                [lower, lower + 1, upper, upper + 1, upper - lower]
            )
        else:
            k, t = rng.choice(keys), BASE + rng.randrange(0, 2_000_000)
        rrows.append((k, t, j))

    left = spark.createDataFrame(lrows, "key string, lt long, lid long")
    right = spark.createDataFrame(rrows, "key string, rt long, rid long")
    got = {
        (r.lid, r.rid)
        for r in range_join(
            left, right, "key", "lt", "rt", lower, upper
        ).collect()
    }
    want = {
        (l[2], r[2])
        for l in lrows
        for r in rrows
        if l[0] == r[0] and l[1] + lower < r[1] <= l[1] + upper
    }
    assert got == want, (
        f"seed {seed} lower={lower} upper={upper}: "
        f"missing={want - got} extra={got - want}"
    )
