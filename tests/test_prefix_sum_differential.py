"""Randomized differentials for the two-level prefix-sum operators.

These four registered queries (`events_sessionize`,
`max_concurrent_sessions`, `sequence_packing`, `mixture_token_budget`)
carry hash-green driver receipts against their DuckDB oracles — but the
oracle SQL was WRITTEN TOGETHER with the Spark plan, so a shared
misunderstanding of the semantics would pass the gate. This suite is the
independent witness: random tie-heavy inputs, a sequential pure-Python
reference implementing the documented rule directly (no window algebra,
no prefix sums), staged as real parquet tables so the REGISTERED
function runs end-to-end (load_table, prepare, the two-level plan).

Tie stress is deliberate: event times are drawn on a 900 s grid so
per-user gaps land EXACTLY on the 1800 s sessionization boundary (the
rule is strictly `> gap`), duplicate timestamps force the
(ts, event_id) tiebreak, and single-event sessions make +1/-1 interval
endpoints collide at one instant (starts must sort before ends)."""

from __future__ import annotations

import hashlib
import random
import re
from collections import defaultdict
from datetime import datetime, timedelta

import pytest

BASE = datetime(2024, 3, 1, 0, 0, 0)
GAP_S = 1800


def _stage_events(spark, tmp, rows):
    """rows: (event_id, user_id, ts) — written as tmp/events.parquet with
    the driver table's column set so load_table reads it unchanged."""
    df = spark.createDataFrame(
        [(e, ts, u, "t", 0.0, "{}") for e, u, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{tmp}/events.parquet")


def _stage_documents(spark, tmp, rows):
    """rows: (doc_id, source, text)."""
    df = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, s, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")


def _random_events(seed, n=400, users=6, grid=50):
    rng = random.Random(seed)
    eids = list(range(1, n + 1))
    rng.shuffle(eids)
    return [
        (
            eids[i],
            rng.randrange(users),
            BASE + timedelta(seconds=900 * rng.randrange(grid)),
        )
        for i in range(n)
    ]


def _naive_sessions(rows):
    """Documented rule, straight line-by-line: per user in (ts, event_id)
    order, a session starts at the first event or when the gap from the
    previous event strictly exceeds GAP_S."""
    by_user = defaultdict(list)
    for eid, uid, ts in rows:
        by_user[uid].append((ts, eid))
    sessions = defaultdict(list)  # (uid, sess_id) -> [ts]
    for uid, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() > GAP_S:
                sid += 1
            sessions[(uid, sid)].append(ts)
            prev = ts
    return sessions


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_events_sessionize_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.plans.relational import (
        events_sessionize,
    )

    rows = _random_events(seed)
    _stage_events(spark, str(tmp_path), rows)
    got = {
        (r.user_id, r.sess_id): (r.n_events, r.session_start, r.duration_sec)
        for r in events_sessionize(spark, str(tmp_path)).collect()
    }
    want = {
        k: (
            len(ts),
            min(ts).strftime("%Y-%m-%d %H:%M:%S"),
            int((max(ts) - min(ts)).total_seconds()),
        )
        for k, ts in _naive_sessions(rows).items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_max_concurrent_sessions_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        max_concurrent_sessions,
    )

    rows = _random_events(seed)
    _stage_events(spark, str(tmp_path), rows)
    got = {
        r.hour: r.max_concurrent
        for r in max_concurrent_sessions(spark, str(tmp_path)).collect()
    }

    # naive sweep line over session intervals: +1/-1 endpoints, starts
    # before ends at the same instant, running sum, per-hour max of the
    # post-event concurrency
    endpoints = []
    for (uid, sid), ts in _naive_sessions(rows).items():
        endpoints.append((min(ts), -1, uid, sid))  # -1 sort key: starts first
        endpoints.append((max(ts), +1, uid, sid))
    endpoints.sort()
    conc, want = 0, {}
    for t, kind, _uid, _sid in endpoints:
        conc += 1 if kind == -1 else -1
        hour = t.replace(minute=0, second=0).strftime("%Y-%m-%d %H:%M:%S")
        want[hour] = max(want.get(hour, -(10**9)), conc)
    assert got == want


def _random_docs(seed, n=200):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "Gamma", "DELTA", "eps"]
    doc_ids = rng.sample(range(0, 5 * n), n)  # sparse, gap-heavy ids
    return [
        (
            d,
            rng.choice(["web", "books", "code"]),
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))),
        )
        for d in doc_ids
    ]


def _n_tok(text):
    # mirrors size(split(lower(trim(text)), '\s+')): an empty trimmed
    # string still splits to one (empty) element
    return len(re.split(r"\s+", text.strip().lower()))


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_sequence_packing_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        PACK_CTX,
        sequence_packing,
    )

    docs = _random_docs(seed)
    _stage_documents(spark, str(tmp_path), docs)
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.chunk_id)
        for r in sequence_packing(spark, str(tmp_path)).collect()
    }

    want, cum = {}, 0
    for d, _s, text in sorted(docs):
        n = _n_tok(text)
        want[d] = (n, cum, cum // PACK_CTX)
        cum += n
    assert got == want


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_mixture_token_budget_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        MIX_BUDGET,
        mixture_token_budget,
    )

    docs = _random_docs(seed)
    _stage_documents(spark, str(tmp_path), docs)
    got = {
        r.source: (r.n_docs, r.n_tokens)
        for r in mixture_token_budget(spark, str(tmp_path)).collect()
    }

    by_source = defaultdict(list)
    for d, s, text in docs:
        h = hashlib.md5(str(d).encode()).hexdigest()
        by_source[s].append((h, d, _n_tok(text)))
    want = {}
    for s, items in by_source.items():
        items.sort()
        cum, n_docs, n_tokens = 0, 0, 0
        for _h, _d, n in items:
            if cum >= MIX_BUDGET:  # greedy fill: budget-crossing doc kept
                break
            n_docs += 1
            n_tokens += n
            cum += n
        if n_docs:
            want[s] = (n_docs, n_tokens)
    assert got == want
