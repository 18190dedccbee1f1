"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates every registered query across the engine's modules;
``oracle_sql()`` returns the DuckDB-equivalent SQL for the hash-compare gate.
Registries live next to the implementations (see
``hri_flink_validation_passthrough_spark.plans`` / ``operators``).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hri_flink_validation_passthrough_spark.plans import QuerySpec

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

# In-place supersessions (COVERAGE.md r10 capacity policy rule #1; r10
# verdict ask #1): when a round changes a registered query's SEMANTICS
# inside its existing registration (the r10 trained-PQ-codebook swap),
# driver receipts from earlier rounds attest the RETIRED semantics. For
# rotation purposes those receipts are ERASED — the query re-enters the
# order as never-verified (front of the window) until the driver
# re-attests the new semantics. Maps query name -> the round whose build
# changed it; receipts from rounds strictly BELOW that value don't count.
SUPERSEDED_IN: dict[str, int] = {
    # r10: Lloyd-trained per-subspace PQ codebook superseded the frozen
    # first-PQ_K codebook in place (operators/similarity.py:1521,1929) —
    # every query whose oracle embeds _pq_oracle_encode_cte changed.
    "embedding_pq_codes": 10,
    "ann_pq_adc_topk": 10,
    "ann_ivfpq_topk": 10,
    "ann_ivfpq_durable_topk": 10,
    "ann_pq_depth_recall_sweep": 10,
    # r11: drift-adaptive probe pruning superseded the fixed-nprobe read
    # on the maintained-index queries (operators/similarity.py
    # _adaptive_probes; stream_ivfpq_maintenance registered new in r11 so
    # it has no pre-supersession receipt to erase).
    "stream_ann_index_maintenance": 11,
    # r12: explicit sufficient-statistic algebra superseded the
    # engine-internal F.corr/DuckDB-corr pair in place (the one query
    # whose moment algebra was delegated to engine internals with
    # differing association orders — the deferred COVERAGE.md r11
    # addendum-5 rounding-boundary flake risk).
    "numeric_corr_matrix": 12,
}

# Capacity-policy rule-#2c retirements (COVERAGE.md dated records): names
# REMOVED from the registry whose old driver receipts still sit in the
# CORRECTNESS history. They are not registered queries, so their receipts
# must not feed the staleness rotation or the ageing bar — the r13 judge
# found `test_no_receipt_ages_past_a_full_rotation` detonating the moment
# the driver's newest CORRECTNESS file landed, because the frozen receipts
# of retired names aged past a full rotation (they can never refresh).
# Each entry cites the round whose COVERAGE.md section records the
# retirement evidence (final receipts, surviving twin, pytest pin).
RETIRED: frozenset[str] = frozenset(
    {
        "dedup_simhash",  # r10 (survivor: dedup_simhash_md5)
        "sketch_cardinalities",  # r11 registry swap
        "passthrough_overcount_relational",  # r11 (survivor: passthrough_overcount)
        "passthrough_terminate_relational",  # r11 (survivor: passthrough_terminate)
        "passthrough_unknown_relational",  # r13 (survivor: passthrough_unknown_batch)
    }
)


def _correctness_paths() -> list[str]:
    """CORRECTNESS_r*.json oldest-first by the PARSED round number — a
    lexicographic sort would put r100 before r99 and make the retry-first
    rule read the wrong round (ADVICE r5)."""
    import re

    def _round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    return sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")), key=_round_no
    )


def _receipts() -> tuple[dict[str, int], set[str], int]:
    """ONE pass over every CORRECTNESS file (the three consumers below used
    to re-glob and re-parse with copy-pasted green predicates — r7 review).

    Returns ``(latest_green, ever_hash_green, newest_round)`` where
    ``latest_green[name]`` is the newest round holding a PRODUCTIVE receipt
    for the query — hash-green, or a documented rows-only check
    (err == "no_oracle") that produced rows, the strongest evidence the
    driver can record for an oracle-less query. Error/stall/0-row rows are
    NOT receipts: a failed refresh attempt must not mask staleness.

    Receipts older than the query's ``SUPERSEDED_IN`` round are skipped —
    they attest semantics that no longer exist, so they must neither keep
    the query out of the never-verified front partition nor feed the
    staleness sort (r10 verdict ask #1: the trained-codebook queries sat
    on r9 receipts ~3 rounds from a window). Receipts for ``RETIRED``
    names are skipped entirely — a retired registration's frozen receipts
    can only age, and letting them feed the rotation/ageing consumers
    made the ageing bar fail on names that are not queries (r13 verdict
    ask #1).
    """
    import re

    latest_green: dict[str, int] = {}
    ever_hash_green: set[str] = set()
    newest = -1
    for path in _correctness_paths():
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rno = int(m.group(1)) if m else -1
        newest = max(newest, rno)
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if name in RETIRED:
                continue  # receipt for a retired registration — not a query
            if rno < SUPERSEDED_IN.get(name, 0):
                continue  # receipt for retired semantics — erased
            if row.get("hash_match") is True:
                ever_hash_green.add(name)
                latest_green[name] = max(latest_green.get(name, -1), rno)
            elif row.get("err") == "no_oracle" and (
                row.get("spark_rows") or 0
            ) > 0:
                latest_green[name] = max(latest_green.get(name, -1), rno)
    return latest_green, ever_hash_green, newest


def _driver_verified_names() -> set[str]:
    """Names with a green driver receipt (hash-green or productive
    rows-only) in any past round."""
    latest_green, _, _ = _receipts()
    return set(latest_green)


def _latest_round_failures() -> list[str]:
    """Names whose row in the NEWEST CORRECTNESS file failed the hash
    compare (rows/schema present but hash_match false) — the fixed-oracle
    retries that must lead the next window."""
    paths = _correctness_paths()
    if not paths:
        return []
    try:
        with open(paths[-1]) as fh:
            rows = json.load(fh)
    except (OSError, ValueError):
        return []
    return [
        name
        for name, row in rows.items()
        if isinstance(row, dict) and row.get("hash_match") is False
    ]


def _stale_rows_only(stale_after: int = 3) -> list[str]:
    """Rows-only queries whose latest PRODUCTIVE driver receipt has gone
    stale.

    A query that can never hash-match (err == "no_oracle": sketches whose
    exact bit patterns differ across engines) is only ever as good as its
    most recent productive rows-only row. When that row is >= *stale_after*
    rounds behind the newest round, re-register it at the window's FRONT
    for a fresh receipt (r6 verdict ask #3: sketch_cardinalities's only row
    was r2, dedup_simhash's was r1). Staleness keys on the productive
    receipt, never on error/stall rows — a failed refresh attempt must not
    buy the query another *stale_after* rounds of looking fresh (r7
    review). General mechanism, not a hardcoded list — any future rows-only
    query ages into this partition automatically.
    """
    latest_green, ever_hash_green, newest = _receipts()
    return [
        name
        for name, rno in latest_green.items()
        if name not in ever_hash_green and newest - rno >= stale_after
    ]


def _all_specs() -> dict[str, QuerySpec]:
    from hri_flink_validation_passthrough_spark.plans import (
        bucketing,
        relational,
        scalar,
        tpch_extra,
    )

    # Registration order == the driver's execution order, and the driver
    # verifies only the FIRST ~50 registered queries each round. The round-2
    # verdict's top finding: 61/126 registered queries had never appeared in
    # any CORRECTNESS_r*.json because the already-green plans.* modules always
    # registered first. Fix: self-rotating order — queries with no green driver
    # row yet register FIRST (in the module-priority order below), and
    # already-verified queries go last. Each round this automatically promotes
    # whatever the previous rounds' windows never reached.
    modules = [
        f"hri_flink_validation_passthrough_spark.operators.{m}"
        for m in (
            "text",
            "quality",
            "sampling",
            "corpus",
            "multimodal",
            "similarity",
            "dedup",
            "linkage",
            "analytics",
            "graph",
            "ml",
            "maintenance",
            "passthrough",
            "passthrough_relational",
        )
    ] + [
        "hri_flink_validation_passthrough_spark.sources.formats",
        "hri_flink_validation_passthrough_spark.sources.pyds",
        "hri_flink_validation_passthrough_spark.streaming.windows",
        "hri_flink_validation_passthrough_spark.streaming.state_ttl",
    ]

    ordered: dict[str, QuerySpec] = {}
    for mod in (relational, scalar, tpch_extra, bucketing):
        ordered.update(mod.QUERIES)
    for modpath in modules:
        try:
            mod = __import__(modpath, fromlist=["QUERIES"])
            ordered.update(getattr(mod, "QUERIES", {}))
        except ImportError:
            pass  # module not built yet (round-incremental)

    verified = _driver_verified_names()
    specs: dict[str, QuerySpec] = {}
    # 0) RETRY-FIRST: queries whose LATEST driver row hash-failed register
    # before everything else — a fix must land its green row in the very
    # next window, not queue behind this round's new queries (r4's q12:
    # oracle fixed in r5, but 40 new registrations would otherwise push the
    # retry toward the window's edge). Deliberately NOT gated on verified:
    # a query green in a past round but red in the newest one is a
    # REGRESSION, which must resurface immediately, not wait for the
    # verified-tail rotation to cycle back around.
    for name in _latest_round_failures():
        if name in ordered:
            specs[name] = ordered[name]
    # 0.5) STALE ROWS-ONLY REFRESH: rows-only receipts age out; re-front
    # them for a current driver row (r6 verdict ask #3).
    for name in _stale_rows_only():
        if name in ordered and name not in specs:
            specs[name] = ordered[name]
    # Within each partition, module-priority order above is preserved — so the
    # unverified tail of the LLM-pipeline modules (text/quality/sampling/
    # corpus/multimodal/similarity/dedup), file formats, and the streaming
    # window family all land inside the driver's window before the remaining
    # tpch_extra/bucketing stragglers.
    priority = [
        f"hri_flink_validation_passthrough_spark.operators.{m}"
        for m in (
            "text",
            "quality",
            "sampling",
            "corpus",
            "multimodal",
            "similarity",
            "dedup",
            "linkage",
            "analytics",
            "graph",
            "ml",
            "maintenance",
        )
    ] + [
        "hri_flink_validation_passthrough_spark.sources.formats",
        "hri_flink_validation_passthrough_spark.sources.pyds",
        "hri_flink_validation_passthrough_spark.streaming.windows",
        "hri_flink_validation_passthrough_spark.streaming.state_ttl",
    ]
    prio_specs: dict[str, QuerySpec] = {}
    for modpath in priority:
        try:
            mod = __import__(modpath, fromlist=["QUERIES"])
            prio_specs.update(getattr(mod, "QUERIES", {}))
        except ImportError:
            pass
    # 1) never-verified, from the priority modules
    for name, spec in prio_specs.items():
        if name not in verified:
            specs[name] = spec
    # 2) never-verified, everything else (tpch_extra stragglers, bucketing, …)
    for name, spec in ordered.items():
        if name not in verified and name not in specs:
            specs[name] = spec
    # 3) already driver-verified — register last; a truncated budget cuts
    # these. Ordered by STALENESS: each round the window's tail re-checks
    # the verified queries whose latest green receipt is OLDEST, so a
    # regression in any verified query resurfaces within ceil(N/window)
    # rounds and no receipt ages unboundedly (round-3 ADVICE, medium;
    # replaces the r3 modular rotation, whose stride could collide with the
    # previous round's slice and re-verify the same queries twice — as it
    # would have in r7: offset 222 % 221 wraps to the r6-refreshed head).
    tail = [name for name in ordered if name not in specs]
    if tail:
        last_green, _, _ = _receipts()
        tail.sort(key=lambda n: last_green.get(n, -1))
    for name in tail:
        specs[name] = ordered[name]
    return specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference topology (passthrough routing + batch lifecycle
    state machine) replayed over the sf0.001 events table. Driver checks
    rows>0 and a stable schema."""
    from hri_flink_validation_passthrough_spark.operators.passthrough import (
        passthrough_route,
    )

    return passthrough_route(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _all_specs().items() if spec.oracle
    }
