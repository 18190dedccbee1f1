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
    """rows: (event_id, user_id, ts[, event_type]) — written as
    tmp/events.parquet with the driver table's column set so load_table
    reads it unchanged."""
    df = spark.createDataFrame(
        [(r[0], r[2], r[1], r[3] if len(r) > 3 else "t", 0.0, "{}") for r in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{tmp}/events.parquet")


def _lang(doc_id):
    return ["en", "de", "fr"][doc_id % 3]


def _stage_documents(spark, tmp, rows):
    """rows: (doc_id, source, text); lang derived from doc_id so naive
    references can reproduce it."""
    df = spark.createDataFrame(
        [(d, t, _lang(d), s, len(t)) for d, s, t in rows],
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


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_scd2_history_matches_naive(spark, tmp_path, seed):
    """Tie-heavy on purpose: the r14 event_id tiebreak on the lead window
    is what makes same-(user_id, ts) change points well-defined at all —
    this differential is its pin (zero such ties exist in driver data)."""
    from hri_flink_validation_passthrough_spark.plans.relational import (
        scd2_user_state_history,
    )

    rng = random.Random(seed)
    rows, eids = [], list(range(1, 301))
    rng.shuffle(eids)
    for i in range(300):
        rows.append(
            (
                eids[i],
                rng.randrange(5),
                BASE + timedelta(seconds=900 * rng.randrange(30)),
                rng.choice(["A", "B", "C"]),
            )
        )
    df = spark.createDataFrame(
        [(e, ts, u, et, 0.0, "{}") for e, u, ts, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(2).write.parquet(f"{tmp_path}/events.parquet")

    got = sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_user_state_history(spark, str(tmp_path)).collect()
    )

    by_user = defaultdict(list)
    for e, u, ts, et in rows:
        by_user[u].append((ts, e, et))
    want = []
    for u, evs in by_user.items():
        evs.sort()
        changes = [
            (ts, e, et)
            for i, (ts, e, et) in enumerate(evs)
            if i == 0 or et != evs[i - 1][2]
        ]
        for i, (ts, _e, et) in enumerate(changes):
            nxt = (
                changes[i + 1][0].strftime("%Y-%m-%d %H:%M:%S")
                if i + 1 < len(changes)
                else "9999-12-31 00:00:00"
            )
            want.append(
                (
                    u,
                    et,
                    ts.strftime("%Y-%m-%d %H:%M:%S"),
                    nxt,
                    i + 1 == len(changes),
                )
            )
    assert got == sorted(want)


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_chunk_overlap_windows_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        CHUNK_C,
        CHUNK_S,
        chunk_overlap_windows,
    )

    # lengths straddle every edge: empty, 1, C-1, C, C+1, C+S, long tails
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (
            i,
            "web",
            " ".join(
                rng.choice(vocab)
                for _ in range(
                    rng.choice([0, 1, CHUNK_C - 1, CHUNK_C, CHUNK_C + 1,
                                CHUNK_C + CHUNK_S, rng.randrange(0, 150)])
                )
            ),
        )
        for i in range(120)
    ]
    _stage_documents(spark, str(tmp_path), docs)

    got = sorted(
        (r.doc_id, r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_md5)
        for r in chunk_overlap_windows(spark, str(tmp_path)).collect()
    )
    want = []
    for d, _s, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        n = len(toks)
        n_chunks = (
            1 if n <= CHUNK_C else (n - CHUNK_C + CHUNK_S - 1) // CHUNK_S + 1
        )
        for k in range(n_chunks):
            chunk = toks[k * CHUNK_S : k * CHUNK_S + CHUNK_C]
            want.append(
                (
                    d,
                    k,
                    k * CHUNK_S,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )
            )
    assert got == sorted(want)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_length_bucket_batching_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.functions import py_floor_nudge
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        LB_BATCH,
        LB_WIDTH,
        length_bucket_batching,
    )

    rng = random.Random(seed)
    docs = [
        (
            i,
            "web",
            " ".join("w" for _ in range(rng.randrange(0, 120))),
        )
        for i in range(180)
    ]
    _stage_documents(spark, str(tmp_path), docs)

    got = {
        r.bucket: (r.n_docs, r.n_batches, r.max_tokens, r.pad_waste_pct)
        for r in length_bucket_batching(spark, str(tmp_path)).collect()
    }
    buckets = defaultdict(list)
    for _d, _s, text in docs:
        n = len(re.split(r"\s+", text.strip().lower()))
        buckets[n // LB_WIDTH].append(n)
    want = {}
    for b, ns in buckets.items():
        n_docs, mx, tot = len(ns), max(ns), sum(ns)
        n_batches = (n_docs + LB_BATCH - 1) // LB_BATCH
        waste = 1.0 - tot / (n_batches * LB_BATCH * mx)
        want[b] = (n_docs, n_batches, mx, py_floor_nudge(waste, 4))
    assert got == want


@pytest.mark.parametrize("bar", [1, 4, 64])
def test_sequence_packing_recursion_depth_invariant(spark, tmp_path, bar):
    """r14: the block-summary prefix recurses (blocks-of-blocks) once a
    level exceeds PREFIX_SINGLE_TASK_BAR rows. Shrinking the bar to 1/4/64
    forces 1-3 extra recursion levels on driver-sized data; every depth
    must produce the identical packing (the production bar of 64k rows is
    unreachable in tests, so depth-invariance IS the pin that the
    recursive upper half computes the same exclusive prefix)."""
    from hri_flink_validation_passthrough_spark.operators import sampling

    docs = _random_docs(77, n=300)
    _stage_documents(spark, str(tmp_path), docs)
    want = sorted(
        tuple(r) for r in sampling.sequence_packing(spark, str(tmp_path)).collect()
    )
    assert want  # non-degenerate corpus

    prev = sampling.PREFIX_SINGLE_TASK_BAR
    sampling.PREFIX_SINGLE_TASK_BAR = bar
    try:
        got = sorted(
            tuple(r)
            for r in sampling.sequence_packing(spark, str(tmp_path)).collect()
        )
    finally:
        sampling.PREFIX_SINGLE_TASK_BAR = prev
    assert got == want


def _h8(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.mark.parametrize("seed", [81, 82])
def test_hash_sampling_family_matches_naive(spark, tmp_path, seed):
    """The deterministic-hash sampling/split family in one staged corpus:
    every op derives from salted md5(doc_id), so a naive hashlib replica
    is an exact reference (no floats, no ordering ambiguity)."""
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        SPLIT_TEST_PCT,
        SPLIT_VAL_PCT,
        corpus_train_val_test_split,
    )
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        SAMPLE_SALT,
        SHUFFLE_SALT,
        SHUFFLE_SHARDS,
        corpus_shuffle_assignment,
        sample_hash_10pct,
        stratified_sample_by_source,
        train_val_test_split,
    )

    docs = _random_docs(seed, n=250)
    _stage_documents(spark, str(tmp_path), docs)
    sf = str(tmp_path)

    # sample_hash_10pct: bucket = md5(doc_id+salt)[:8] % 100 < 10
    got = {
        r.doc_id: (r.source, r.n_chars, r.bucket)
        for r in sample_hash_10pct(spark, sf).collect()
    }
    want = {}
    for d, s, text in docs:
        b = _h8(f"{d}{SAMPLE_SALT}") % 100
        if b < 10:
            want[d] = (s, len(text), b)
    assert got == want

    # train_val_test_split: 80/10/10 per (split, lang)
    got = {
        (r.split, r.lang): (r.n_docs, r.total_chars)
        for r in train_val_test_split(spark, sf).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for d, _s, text in docs:
        b = _h8(f"{d}{SAMPLE_SALT}") % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        a = agg[(split, _lang(d))]
        a[0] += 1
        a[1] += len(text)
    assert got == {k: tuple(v) for k, v in agg.items()}

    # corpus_train_val_test_split: 5/5/90 with the independent split salt
    got = {
        (r.source, r.split): (r.n_docs, r.n_chars)
        for r in corpus_train_val_test_split(spark, sf).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for d, s, text in docs:
        b = _h8(f"{d}|split-v1") % 100
        split = (
            "test"
            if b < SPLIT_TEST_PCT
            else ("val" if b < SPLIT_TEST_PCT + SPLIT_VAL_PCT else "train")
        )
        a = agg[(s, split)]
        a[0] += 1
        a[1] += len(text)
    assert got == {k: tuple(v) for k, v in agg.items()}

    # stratified_sample_by_source: top-20 per source in (md5, doc_id) order
    got = {
        (r.source, r.rk): r.doc_id
        for r in stratified_sample_by_source(spark, sf).collect()
    }
    by_source = defaultdict(list)
    for d, s, _t in docs:
        by_source[s].append(
            (hashlib.md5(f"{d}{SAMPLE_SALT}".encode()).hexdigest(), d)
        )
    want = {}
    for s, items in by_source.items():
        items.sort()
        for rk, (_h, d) in enumerate(items[:20], start=1):
            want[(s, rk)] = d
    assert got == want

    # corpus_shuffle_assignment: shard from the sample hash, position from
    # the independently salted order hash
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle_assignment(spark, sf).collect()
    }
    shards = defaultdict(list)
    for d, _s, _t in docs:
        shard = _h8(f"{d}{SAMPLE_SALT}") % SHUFFLE_SHARDS
        ordh = hashlib.md5(f"{d}{SHUFFLE_SALT}".encode()).hexdigest()
        shards[shard].append((ordh, d))
    want = {}
    for shard, items in shards.items():
        items.sort()
        for pos, (_o, d) in enumerate(items, start=1):
            want[d] = (shard, pos)
    assert got == want


@pytest.mark.parametrize("seed", [91, 92])
def test_bpe_and_pmi_match_naive(spark, tmp_path, seed):
    """Adjacent/skip-gram pair statistics vs a plain token-loop reference.
    The tiny vocab makes counts collide heavily, stressing the
    (count desc, pair) / (pmi desc, pair) tiebreak cuts; short and empty
    documents stress the negative-slice clamp at gaps 1..3."""
    import math

    from hri_flink_validation_passthrough_spark.functions import py_floor_nudge
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        BPE_TOP,
        PMI_MIN,
        PMI_TOP,
        PMI_W,
        bpe_pair_merge_stats,
        pmi_cooccurrence_topk,
    )

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (
            i,
            "web",
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.choice([0, 1, 2, 3, rng.randrange(0, 40)]))
            ),
        )
        for i in range(150)
    ]
    _stage_documents(spark, str(tmp_path), docs)
    sf = str(tmp_path)

    tok_docs = [re.split(r"\s+", t.strip().lower()) for _d, _s, t in docs]

    # bpe: adjacent pairs, top-30 by (count desc, pair)
    got = [
        (r.pair, r.n_occurrences)
        for r in bpe_pair_merge_stats(spark, sf).collect()
    ]
    counts = defaultdict(int)
    for toks in tok_docs:
        for a, b in zip(toks, toks[1:]):
            counts[f"{a} {b}"] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    assert got == want

    # pmi: skip-grams k=1..3, min count, rounded PMI, top-25
    got = [
        (r.pair, r.n_pair, r.pmi)
        for r in pmi_cooccurrence_topk(spark, sf).collect()
    ]
    pc, tu = defaultdict(int), 0
    uc = defaultdict(int)
    for toks in tok_docs:
        for w in toks:
            uc[w] += 1
            tu += 1
        for k in range(1, PMI_W + 1):
            for a, b in zip(toks, toks[k:]):
                pc[f"{a} {b}"] += 1
    tp = sum(pc.values())
    scored = []
    for pair, c in pc.items():
        if c < PMI_MIN:
            continue
        a, b = pair.split(" ")
        pmi = math.log((c * 1.0 * tu * tu) / (tp * 1.0 * uc[a] * uc[b]))
        scored.append((pair, c, py_floor_nudge(pmi, 6)))
    want = sorted(scored, key=lambda r: (-r[2], r[0]))[:PMI_TOP]
    assert got == want


def _random_typed_events(seed, n=400, users=6, grid=50, types="ABCD"):
    rng = random.Random(seed)
    eids = list(range(1, n + 1))
    rng.shuffle(eids)
    return [
        (
            eids[i],
            rng.randrange(users),
            BASE + timedelta(seconds=900 * rng.randrange(grid)),
            rng.choice(types),
        )
        for i in range(n)
    ]


def _naive_typed_sessions(rows):
    """(uid, sess_id) -> [(ts, event_id, event_type)] in (ts, event_id)
    order under the 30-min strict-gap rule."""
    by_user = defaultdict(list)
    for eid, uid, ts, et in rows:
        by_user[uid].append((ts, eid, et))
    sessions = defaultdict(list)
    for uid, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid, et in evs:
            if prev is None or (ts - prev).total_seconds() > GAP_S:
                sid += 1
            sessions[(uid, sid)].append((ts, eid, et))
            prev = ts
    return sessions


@pytest.mark.parametrize("seed", [101, 102])
def test_session_transition_matrix_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.functions import py_floor_nudge
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        session_transition_matrix,
    )

    rows = _random_typed_events(seed)
    _stage_events(spark, str(tmp_path), rows)
    got = {
        (r.src, r.dst): (r.n_transitions, r.prob)
        for r in session_transition_matrix(spark, str(tmp_path)).collect()
    }

    counts = defaultdict(int)
    for evs in _naive_typed_sessions(rows).values():
        for (_t1, _e1, a), (_t2, _e2, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    src_tot = defaultdict(int)
    for (a, _b), c in counts.items():
        src_tot[a] += c
    want = {
        k: (c, py_floor_nudge(c * 1.0 / src_tot[k[0]], 6))
        for k, c in counts.items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [111, 112])
def test_session_path_topk_matches_naive(spark, tmp_path, seed):
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        PATH_LEN,
        PATH_TOP,
        session_path_topk,
    )

    # few types + tight grid -> many identical paths (rank-cut tie stress)
    rows = _random_typed_events(seed, types="AB")
    _stage_events(spark, str(tmp_path), rows)
    got = [
        (r.path, r.n_sessions, r.rnk)
        for r in session_path_topk(spark, str(tmp_path)).collect()
    ]

    counts = defaultdict(int)
    for evs in _naive_typed_sessions(rows).values():
        counts[">".join(et for _t, _e, et in evs[:PATH_LEN])] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP]
    want = [(p, c, i + 1) for i, (p, c) in enumerate(ranked)]
    assert got == want


@pytest.mark.parametrize("seed", [121, 122, 123])
def test_equi_depth_histogram_matches_naive(spark, tmp_path, seed):
    """Decile boundaries vs a sorted-loop reference on a COARSE price grid:
    duplicates pile onto few distinct values, so several deciles share one
    boundary and many 10*cum == k*n exact-tie cases arise (the rule is
    boundary_k = min v with 10*cum >= k*n; ties fall to the lower bin)."""
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        HIST_BINS,
        equi_depth_histogram,
    )

    rng = random.Random(seed)
    # 40 distinct 2-decimal values across price bands (cb = v div 1000
    # varies), counts up to 40 each — n is a multiple of small counts often
    vals = sorted(
        round(rng.uniform(900.0, 4100.0), 2) for _ in range(40)
    )
    prices = []
    for v in vals:
        prices.extend([v] * rng.randrange(1, 40))
    spark.createDataFrame(
        [(p,) for p in prices], "l_extendedprice double"
    ).coalesce(2).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r.bin: (r.n_rows, r.min_price, r.max_price, r.sum_price)
        for r in equi_depth_histogram(spark, str(tmp_path)).collect()
    }

    n = len(prices)
    dist = sorted(set(prices))
    counts = defaultdict(int)
    for p in prices:
        counts[p] += 1
    cum, cums = 0, {}
    for v in dist:
        cum += counts[v]
        cums[v] = cum
    bounds = []
    for k in range(1, HIST_BINS):
        bounds.append(min(v for v in dist if HIST_BINS * cums[v] >= k * n))
    agg = defaultdict(list)
    for p in prices:
        agg[sum(1 for b in bounds if p > b)].append(p)
    want = {
        b: (
            len(ps),
            round(min(ps), 2),
            round(max(ps), 2),
            round(sum(ps), 2),
        )
        for b, ps in agg.items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [131, 132])
def test_fingerprint_family_matches_naive(spark, tmp_path, seed):
    """doc_fingerprint (normalize -> md5) and rolling_hash_fingerprint
    (token stats -> modular sum) vs hashlib/integer replicas — punctuation,
    mixed case, repeated spaces, and empty docs in the mix."""
    from hri_flink_validation_passthrough_spark.operators.text import (
        doc_fingerprint,
        rolling_hash_fingerprint,
    )

    rng = random.Random(seed)
    pieces = ["Foo", "BAR,", "baz!", "q-7", "x", "", "42", "a.b", "##", "Mix3d"]
    docs = [
        (
            i,
            "web",
            (" " * rng.randrange(0, 3)).join(
                rng.choice(pieces) for _ in range(rng.randrange(0, 15))
            ),
        )
        for i in range(150)
    ]
    _stage_documents(spark, str(tmp_path), docs)
    sf = str(tmp_path)

    got = {
        r.doc_id: r.fingerprint for r in doc_fingerprint(spark, sf).collect()
    }
    want = {}
    for d, _s, text in docs:
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
        want[d] = hashlib.md5(norm.encode()).hexdigest()
    assert got == want

    got = {
        r.doc_id: r.rhash
        for r in rolling_hash_fingerprint(spark, sf).collect()
    }
    want = {}
    for d, _s, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        total = sum(len(t) + (ord(t[0]) if t else 0) * 31 for t in toks)
        want[d] = total % 1000000007
    assert got == want
