"""Differential test: the vectorized replay fast path must produce EXACTLY
the row-wise reference's outputs on randomized scenarios (pure pandas, no
Spark — this is the property pinning the bench optimization to the spec)."""

from __future__ import annotations

import json
import random

import pandas as pd
import pytest

from hri_flink_validation_passthrough_spark.operators.batch_state import (
    BatchStateMachine,
)
from hri_flink_validation_passthrough_spark.operators.passthrough import (
    _replay_rowwise,
    _replay_vectorized,
)

DELAY = 5000
STATUSES = ["started", "sendCompleted", "terminated", "completed", "failed"]


def _scenario(rng: random.Random) -> pd.DataFrame:
    rows = []
    t = 0
    n_events = rng.randint(0, 40)
    n_data_so_far = 0
    for i in range(n_events):
        t += rng.choice([0, 1, 10, 100, DELAY // 2, DELAY, DELAY * 2])
        if rng.random() < 0.25:
            status = rng.choice(STATUSES)
            notif = {
                "id": "B",
                "name": "n",
                "topic": "ingest.t.x.in",
                "dataType": "d",
                "status": status,
                "startDate": None,
                "endDate": None,
                "expectedRecordCount": (
                    rng.choice([None, 0, 1, 3, 5, 10, n_data_so_far])
                    if status == "sendCompleted"
                    else None
                ),
                "recordCount": None,
                "invalidThreshold": rng.choice([None, -1, 2]),
                "metadata": None,
            }
            rows.append(
                dict(batch_id="B", kind="control", time_ms=t, seq=i, key=None,
                     value=None, headers=None, notification=notif, kind_rank=0)
            )
        else:
            n_data_so_far += 1
            rows.append(
                dict(batch_id="B", kind="data", time_ms=t, seq=i,
                     key=f"k{i}".encode(), value=f"v{i}".encode(),
                     headers=[{"key": "batchId", "value": b"B"}],
                     notification=None, kind_rank=1)
            )
    cols = ["batch_id", "kind", "time_ms", "seq", "key", "value", "headers",
            "notification", "kind_rank"]
    return pd.DataFrame(rows, columns=cols)


def _canon(df: pd.DataFrame) -> list:
    out = []
    for r in df.itertuples(index=False):
        v = r.value
        if r.dest == "notification":
            v = json.dumps(json.loads(bytes(v)), sort_keys=True)
        out.append((r.dest, r.key, v if isinstance(v, str) else bytes(v)))
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed", range(300))
def test_fast_path_equals_rowwise(seed):
    rng = random.Random(seed)
    pdf = _scenario(rng)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["time_ms", "kind_rank", "seq"], na_position="first")
    a = _replay_rowwise(pdf, BatchStateMachine(DELAY), "B")
    b = _replay_vectorized(pdf, BatchStateMachine(DELAY), "B")
    assert _canon(a) == _canon(b), f"seed {seed} diverged"
