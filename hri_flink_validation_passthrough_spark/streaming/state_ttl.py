"""Keyed-state TTL metrics and streaming top-k with eviction.

Round-6 verdict ask #4: make registered timers / state TTL a first-class
VERIFIED operator beyond the passthrough batch lifecycle (reference contract:
the completion-delay timer in hri-flink-validation's batch notification flow,
``PassthroughStreamingJob.java`` wiring at reference
``src/main/java/.../PassthroughStreamingJob.java:110-117``; its spec drives
the timer at ``flink_validation_passthrough_spec.rb:202``). Two operators,
each implemented on BOTH stateful backends:

- ``stream_state_ttl_metrics`` — per-key aggregate state with an idle-TTL
  eviction timer: every arriving row re-arms the key's timer; when a key
  goes idle for ``ttl_ms`` the timer fires, the key EMITS its aggregate and
  its state is evicted (``state.clear()`` / ``state.remove()``). This is the
  sessionization-by-inactivity shape (user session rollups, connection
  accounting) — emit-on-eviction, exactly one output row per key per idle
  period. The transformWithState path ALSO passes ``ttlDurationMs`` to the
  value state (engine-side TTL, set far above the flush timer) so the Spark 4
  TTL-config surface is exercised; the flush itself must be timer-driven
  because engine TTL eviction is silent — there is no on-evict callback to
  emit from.
- ``stream_windowed_topk_eviction`` — per-key bounded top-k list state with
  CAPACITY eviction: each batch merges arrivals into the key's ListState,
  sorts, and truncates to K (evicting dominated rows from state — state size
  is O(K) per key no matter how much data streams through); an idle timer
  flushes the surviving K rows with ranks and evicts the key.

Determinism contract (the driver hash-compares against a DuckDB batch
recompute): every EMITTED value is order-independent — counts, integer cent
sums (``floor(value*100 + 0.5)`` per row, summed exactly in int64), min/max
timestamps, and sort-merged top-k lists — so WHEN timers fire and how rows
batch cannot change the output, only when it appears. The finite replay
arrives in microbatch 0 (file source, no maxFilesPerTrigger cap), the idle
timers fire in a later no-data batch, and the harness polls the sink until
every key has flushed — same protocol as ``stream_passthrough_route``.

At 100 TB: keys are the unit of state; both operators keep O(1)/O(K) state
per key and emit once per idle period, so state size tracks LIVE key
cardinality, not stream volume. The users set kept per bucket for the
n_users metric is the one component that grows with key fanout — the
docstring'd scale path swaps it for MapState (per-user subkeys) or an HLL
register when per-key user cardinality is unbounded.
"""

from __future__ import annotations

import json
import math
import tempfile
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import QuerySpec, register
from ..session import prepare
from ..materialize import cut

QUERIES: dict[str, QuerySpec] = {}

TTL_MS = 1500  # idle-flush timer: fires after the finite replay drains
ENGINE_TTL_MS = 3_600_000  # Spark 4 state TTL (exercised, never fires here)
TOPK_K = 8
N_BUCKETS = 10

_METRICS_STATE_SCHEMA = (
    "n_events long, sum_cents long, min_ts long, max_ts long, "
    "users_json string, deadline long"
)
_METRICS_OUT_SCHEMA = (
    "bucket long, n_events long, n_users long, sum_cents long, "
    "min_ts long, max_ts long"
)
_TOPK_STATE_ROW = "event_id long, value double, ts long"
_TOPK_GS_STATE_SCHEMA = "items_json string, deadline long"
_TOPK_OUT_SCHEMA = "event_type string, rank int, event_id long, value double, ts long"


def _merge_metrics(st: dict, pdf: pd.DataFrame) -> None:
    """Fold a batch of rows into the aggregate dict — every field is
    order-independent (int sums, min/max, set union)."""
    st["n_events"] += int(len(pdf))
    # exact integer cents: floor(v*100 + 0.5) is identical in Python, Spark
    # and DuckDB on the same input double (banker's-rounding-free). NULL
    # values arrive as NaN in the Arrow batch and contribute nothing, the
    # same as SQL sum() skipping NULLs — int(floor(nan)) would instead
    # kill the worker and stall the whole query (r14 null-corpus sweep).
    # Ingest contract (ADVICE r14): `value` is a money amount — a genuine
    # NaN DATUM is out of contract and is treated as NULL here (SQL sum()
    # would instead poison the whole aggregate to NaN, which no consumer
    # of a cents total wants). pandas conversion folds the Arrow validity
    # bitmap into NaN for float columns, so the two cases are inherently
    # indistinguishable at this seam; a deployment that must carry
    # NaN-as-data would ingest `value` as decimal, where NULL stays NULL.
    st["sum_cents"] += int(
        sum(
            int(math.floor(v * 100.0 + 0.5))
            for v in pdf["value"]
            if v == v  # NaN-safe
        )
    )
    ts_min, ts_max = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
    st["min_ts"] = ts_min if st["min_ts"] is None else min(st["min_ts"], ts_min)
    st["max_ts"] = ts_max if st["max_ts"] is None else max(st["max_ts"], ts_max)
    st["users"].update(int(u) for u in pdf["user_id"].unique())


def _metrics_row(key, st: dict) -> pd.DataFrame:
    return pd.DataFrame(
        [
            (
                int(key),
                st["n_events"],
                len(st["users"]),
                st["sum_cents"],
                st["min_ts"],
                st["max_ts"],
            )
        ],
        columns=["bucket", "n_events", "n_users", "sum_cents", "min_ts", "max_ts"],
    )


def _empty_metrics() -> dict:
    return {
        "n_events": 0,
        "sum_cents": 0,
        "min_ts": None,
        "max_ts": None,
        "users": set(),
    }


# ---------------------------------------------------------------------------
# Backend A: applyInPandasWithState (GroupState + ProcessingTimeTimeout)
# ---------------------------------------------------------------------------
def metrics_with_group_state(ttl_ms: int = TTL_MS):
    """(key, pdf_iter, state) fn: idle-TTL aggregate with emit-on-eviction."""

    def fn(key, pdf_iter, state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            stored = state.getOption
            if stored is not None:
                st = _decode_metrics(stored)
                state.remove()  # EVICTION: key's state is gone after emit
                yield _metrics_row(key[0], st)
            return
        stored = state.getOption
        st = _decode_metrics(stored) if stored is not None else _empty_metrics()
        for pdf in pdf_iter:
            if len(pdf):
                _merge_metrics(st, pdf)
        state.update(_encode_metrics(st))
        # every arrival re-arms the idle timer (Spark clears the timeout on
        # each invocation — set it unconditionally)
        state.setTimeoutDuration(ttl_ms)

    return fn


def _encode_metrics(st: dict) -> tuple:
    return (
        st["n_events"],
        st["sum_cents"],
        st["min_ts"],
        st["max_ts"],
        json.dumps(sorted(st["users"])),
        None,
    )


def _decode_metrics(stored: tuple) -> dict:
    return {
        "n_events": int(stored[0]),
        "sum_cents": int(stored[1]),
        "min_ts": None if stored[2] is None else int(stored[2]),
        "max_ts": None if stored[3] is None else int(stored[3]),
        "users": set(json.loads(stored[4])),
    }


def topk_with_group_state(k: int = TOPK_K, ttl_ms: int = TTL_MS):
    """(key, pdf_iter, state) fn: capacity-evicting top-k + idle flush."""

    def fn(key, pdf_iter, state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            stored = state.getOption
            if stored is not None:
                items = json.loads(stored[0])
                state.remove()
                yield _topk_rows(key[0], items)
            return
        stored = state.getOption
        items = json.loads(stored[0]) if stored is not None else []
        for pdf in pdf_iter:
            items.extend(
                [int(e), float(v), int(t)]
                for e, v, t in zip(pdf["event_id"], pdf["value"], pdf["ts_us"])
            )
        items = _truncate_topk(items, k)
        state.update((json.dumps(items), None))
        state.setTimeoutDuration(ttl_ms)

    return fn


def _truncate_topk(items: list, k: int) -> list:
    # capacity eviction: value DESC, event_id ASC tiebreak; state stays O(K)
    items.sort(key=lambda r: (-r[1], r[0]))
    return items[:k]


def _topk_rows(key, items: list) -> pd.DataFrame:
    return pd.DataFrame(
        [
            (str(key), rank + 1, int(e), float(v), int(t))
            for rank, (e, v, t) in enumerate(items)
        ],
        columns=["event_type", "rank", "event_id", "value", "ts"],
    )


# ---------------------------------------------------------------------------
# Backend B: transformWithStateInPandas (Spark 4 — ValueState/ListState with
# ttlDurationMs + registered timers)
# ---------------------------------------------------------------------------
try:
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class TtlMetricsProcessor(StatefulProcessor):
        """ValueState (with engine ttlDurationMs) + an idle-flush timer that
        emits the key's aggregate and clears its state."""

        def __init__(self, ttl_ms: int = TTL_MS):
            self.ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState(
                "ttl_metrics", _METRICS_STATE_SCHEMA, ttlDurationMs=ENGINE_TTL_MS
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            stored = self.state.get()
            st = _decode_metrics(stored) if stored is not None else _empty_metrics()
            old_deadline = stored[5] if stored is not None else None
            for pdf in rows:
                if len(pdf):
                    _merge_metrics(st, pdf)
            deadline = timerValues.getCurrentProcessingTimeInMs() + self.ttl_ms
            if old_deadline is not None:
                self.handle.deleteTimer(old_deadline)
            self.handle.registerTimer(deadline)
            enc = _encode_metrics(st)
            self.state.update(enc[:5] + (deadline,))
            return iter(())

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            stored = self.state.get()
            if stored is None:  # stale timer after eviction: no-op
                return
            st = _decode_metrics(stored)
            self.state.clear()  # EVICTION
            yield _metrics_row(key[0], st)

        def close(self) -> None:
            pass

    class TopKEvictionProcessor(StatefulProcessor):
        """ListState bounded at K rows (capacity eviction on every merge) +
        an idle-flush timer; the flush deadline rides in a ValueState."""

        def __init__(self, k: int = TOPK_K, ttl_ms: int = TTL_MS):
            self.k = k
            self.ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.items = handle.getListState(
                "topk_items", _TOPK_STATE_ROW, ttlDurationMs=ENGINE_TTL_MS
            )
            self.deadline = handle.getValueState("topk_deadline", "deadline long")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            items = [
                [int(e), float(v), int(t)] for e, v, t in self.items.get()
            ]
            for pdf in rows:
                items.extend(
                    [int(e), float(v), int(t)]
                    for e, v, t in zip(pdf["event_id"], pdf["value"], pdf["ts_us"])
                )
            items = _truncate_topk(items, self.k)
            self.items.put([tuple(r) for r in items])
            old = self.deadline.get()
            if old is not None:
                self.handle.deleteTimer(old[0])
            deadline = timerValues.getCurrentProcessingTimeInMs() + self.ttl_ms
            self.handle.registerTimer(deadline)
            self.deadline.update((deadline,))
            return iter(())

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            items = [[int(e), float(v), int(t)] for e, v, t in self.items.get()]
            if not items:
                return
            self.items.clear()
            self.deadline.clear()
            yield _topk_rows(key[0], items)

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - older Spark
    TtlMetricsProcessor = None  # type: ignore[assignment]
    TopKEvictionProcessor = None  # type: ignore[assignment]


# ---------------------------------------------------------------------------
# Stream builders (backend dispatch — same seam as topology.build_routed_stream)
# ---------------------------------------------------------------------------
def _use_tws(prefer: bool | None) -> bool:
    from .topology import _protobuf_available

    if prefer is None:
        return _protobuf_available() and TtlMetricsProcessor is not None
    return prefer


_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _tws_session(spark: SparkSession) -> None:
    from ..protobuf_shim import ensure_protobuf

    if not ensure_protobuf(spark) or TtlMetricsProcessor is None:
        raise RuntimeError(
            "transformWithStateInPandas requested but no google.protobuf "
            "runtime reaches this session's Python workers"
        )
    _stash_and_set_rocksdb_provider(spark)


def _stash_and_set_rocksdb_provider(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB provider, but the conf is
    session-wide: without a restore, every LATER streaming query in the
    session (including group_state-backed ones) would silently switch
    provider too (ADVICE r6). Stash the prior value; restore_state_provider
    puts it back once the TWS query has stopped (the conf is read lazily at
    state-store init, so it must stay set for the query's whole lifetime —
    restoring right after .start() would be a race). Shared with
    topology.build_routed_stream's TWS branch (r11 self-review found it
    setting the conf raw)."""
    if not hasattr(spark, "_hri_prev_state_provider"):
        try:
            prev = spark.conf.get(_PROVIDER_CONF)
        except Exception:
            prev = None
        spark._hri_prev_state_provider = prev
    spark.conf.set(
        _PROVIDER_CONF,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )


def restore_state_provider(spark: SparkSession) -> None:
    """Undo _tws_session's provider switch (idempotent; no-op when the
    builder took the group_state path and never changed the conf)."""
    if not hasattr(spark, "_hri_prev_state_provider"):
        return
    prev = spark._hri_prev_state_provider
    del spark._hri_prev_state_provider
    if prev is None:
        spark.conf.unset(_PROVIDER_CONF)
    else:
        spark.conf.set(_PROVIDER_CONF, prev)


def build_ttl_metrics_stream(
    keyed: DataFrame,
    ttl_ms: int = TTL_MS,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    """keyed: streaming DF with (bucket, user_id, value, ts_us)."""
    grouped = keyed.groupBy("bucket")
    if _use_tws(prefer_transform_with_state):
        _tws_session(keyed.sparkSession)
        return grouped.transformWithStateInPandas(
            TtlMetricsProcessor(ttl_ms),
            outputStructType=_METRICS_OUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    return grouped.applyInPandasWithState(
        metrics_with_group_state(ttl_ms),
        outputStructType=_METRICS_OUT_SCHEMA,
        stateStructType=_METRICS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


def build_topk_eviction_stream(
    keyed: DataFrame,
    k: int = TOPK_K,
    ttl_ms: int = TTL_MS,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    """keyed: streaming DF with (event_type, event_id, value, ts_us)."""
    grouped = keyed.groupBy("event_type")
    if _use_tws(prefer_transform_with_state):
        _tws_session(keyed.sparkSession)
        return grouped.transformWithStateInPandas(
            TopKEvictionProcessor(k, ttl_ms),
            outputStructType=_TOPK_OUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    return grouped.applyInPandasWithState(
        topk_with_group_state(k, ttl_ms),
        outputStructType=_TOPK_OUT_SCHEMA,
        stateStructType=_TOPK_GS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


# ---------------------------------------------------------------------------
# Registered queries (finite replay + poll-until-flushed harness)
# ---------------------------------------------------------------------------
def _events_keyed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .windows import _events_stream

    e = _events_stream(spark, sf_dir)
    return e.select(
        (F.col("user_id") % N_BUCKETS).alias("bucket"),
        "user_id",
        "event_id",
        "event_type",
        "value",
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
    )


def _run_until_rows(
    spark: SparkSession, stream: DataFrame, expected_rows: int, prefix: str
) -> DataFrame:
    """Start the stream on the default (continuous-microbatch) trigger —
    availableNow would stop before the idle timers ever fire — and poll the
    memory sink until every key has flushed."""
    from .windows import _pinned_state

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"hri_{prefix}_")
    with _pinned_state(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
    try:
        t0 = time.time()
        got = 0
        while time.time() - t0 < 300:
            if q.exception() is not None:
                # a dead query can never fill the sink — surface ITS error
                # now instead of a 300 s stall that hides it (r14: a
                # worker-side crash class was only visible as the timeout)
                raise q.exception()
            got = spark.table(name).count()
            if got >= expected_rows:
                break
            time.sleep(0.3)
        else:
            # One final re-poll (the last rows may land during the last
            # sleep — the while exits on TIME, not count; r7 review). A
            # true stall must NOT degrade into a wrong-answer hash mismatch
            # indistinguishable from a semantics bug (ADVICE r6): raise
            # with got/expected so the driver-row failure is attributable.
            got = spark.table(name).count()
            if got < expected_rows:
                raise TimeoutError(
                    f"{prefix}: streaming poll expired after 300 s with "
                    f"{got}/{expected_rows} sink rows — stall, not a "
                    f"semantics result"
                )
        # localCheckpoint: detach the result from the (stopped) memory sink,
        # then DROP the sink view and remove the checkpoint dir (r12
        # self-review, same class as the streaming maintainers' r11 work-dir
        # leak: each invocation otherwise pins a result-sized catalog entry
        # and leaves a checkpoint tree in /tmp for the session lifetime)
        out = spark.table(name).transform(cut())
        spark.catalog.dropTempView(name)
        return out
    finally:
        q.stop()
        restore_state_provider(spark)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


@register(
    QUERIES,
    "stream_state_ttl_metrics",
    oracle=f"""
    SELECT user_id % {N_BUCKETS} AS bucket,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100
             AS sum_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    GROUP BY 1
    """,
    doc="Keyed aggregate state with IDLE-TTL EVICTION through the real "
    "streaming engine, on whichever stateful backend the session supports "
    "(both are tested): every arrival re-arms the key's processing-time "
    "timer; after ttl_ms of silence the timer fires, the key emits its "
    "rollup and its state is cleared. The emitted values are all "
    "order-independent (counts, exact int64 cent sums, min/max ts, user "
    "sets), so the oracle is a plain batch GROUP BY. Emit-on-eviction "
    "session accounting; state is O(live keys), not O(stream).",
)
def stream_state_ttl_metrics(
    spark: SparkSession,
    sf_dir: str,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    prepare(spark)
    from ..session import load_table

    # expected flush count from the BATCH table, not the constant: a scale
    # factor whose user ids miss a residue class must not hang the poll
    n_keys = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % N_BUCKETS).alias("b"))
        .distinct()
        .count()
    )
    keyed = _events_keyed_stream(spark, sf_dir).select(
        "bucket", "user_id", "value", "ts_us"
    )
    out = _run_until_rows(
        spark,
        build_ttl_metrics_stream(
            keyed, prefer_transform_with_state=prefer_transform_with_state
        ),
        n_keys,
        "ttlmet",
    )
    return out.select(
        "bucket",
        "n_events",
        "n_users",
        (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        F.date_format(F.expr("timestamp_micros(min_ts)"), "yyyy-MM-dd HH:mm:ss").alias(
            "first_ts"
        ),
        F.date_format(F.expr("timestamp_micros(max_ts)"), "yyyy-MM-dd HH:mm:ss").alias(
            "last_ts"
        ),
    )


@register(
    QUERIES,
    "stream_windowed_topk_eviction",
    oracle=f"""
    SELECT event_type, CAST(rn AS INT) AS rank, event_id, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
    FROM (
      SELECT event_type, event_id, value, ts,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id
             ) AS rn
      FROM events
    )
    WHERE rn <= {TOPK_K}
    """,
    doc="Streaming top-k with CAPACITY EVICTION in list state: each "
    "microbatch merges arrivals into the key's ListState, sorts (value "
    "DESC, event_id tiebreak) and truncates to K — dominated rows are "
    "evicted from state immediately, so state is O(K) per key regardless "
    "of stream volume; an idle timer flushes the survivors with ranks and "
    "clears the key. Sort-merge is order-independent, so the oracle is "
    "the batch row_number() top-k.",
)
def stream_windowed_topk_eviction(
    spark: SparkSession,
    sf_dir: str,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    prepare(spark)
    from ..session import load_table

    # expected flush rows = sum over keys of min(n_rows, K): a key with
    # fewer than K events flushes fewer rows and must not hang the poll
    n_expected = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.least(F.col("n"), F.lit(TOPK_K))))
        .collect()[0][0]
    ) or 0  # empty corpus: nothing staged, expect zero sink rows (r14)
    keyed = _events_keyed_stream(spark, sf_dir).select(
        "event_type", "event_id", "value", "ts_us"
    )
    out = _run_until_rows(
        spark,
        build_topk_eviction_stream(
            keyed, prefer_transform_with_state=prefer_transform_with_state
        ),
        int(n_expected),
        "topkev",
    )
    return out.select(
        "event_type",
        "rank",
        "event_id",
        "value",
        F.date_format(F.expr("timestamp_micros(ts)"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts"
        ),
    )


# ---------------------------------------------------------------------------
# MapState per-subkey accounting (completes the state-type matrix:
# ValueState = ttl metrics, ListState = top-k, MapState = this)
# ---------------------------------------------------------------------------
_MAP_OUT_SCHEMA = (
    "bucket long, n_users long, n_events long, max_user_events long"
)


def _user_activity_row(key, counts: dict) -> pd.DataFrame:
    return pd.DataFrame(
        [
            (
                int(key),
                len(counts),
                int(sum(counts.values())),
                int(max(counts.values())) if counts else 0,
            )
        ],
        columns=["bucket", "n_users", "n_events", "max_user_events"],
    )


def user_activity_with_group_state(ttl_ms: int = TTL_MS):
    """group_state twin: the per-user map rides the state struct as JSON
    (GroupState has no map primitive — the JSON dict is the same shape)."""

    def fn(key, pdf_iter, state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            stored = state.getOption
            if stored is not None:
                counts = {int(k): int(v) for k, v in json.loads(stored[0]).items()}
                state.remove()
                yield _user_activity_row(key[0], counts)
            return
        stored = state.getOption
        counts = (
            {int(k): int(v) for k, v in json.loads(stored[0]).items()}
            if stored is not None
            else {}
        )
        for pdf in pdf_iter:
            for u, c in pdf.groupby("user_id").size().items():
                counts[int(u)] = counts.get(int(u), 0) + int(c)
        state.update((json.dumps(counts), None))
        state.setTimeoutDuration(ttl_ms)

    return fn


try:
    from pyspark.sql.streaming.stateful_processor import (  # noqa: F811
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class UserActivityMapProcessor(StatefulProcessor):
        """MapState keyed by user_id inside each bucket key — per-subkey
        updateValue/getValue/iterator, engine TTL on the map, idle-flush
        timer like the other processors."""

        def __init__(self, ttl_ms: int = TTL_MS):
            self.ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.per_user = handle.getMapState(
                "per_user", "user_id long", "n long", ttlDurationMs=ENGINE_TTL_MS
            )
            self.deadline = handle.getValueState("ua_deadline", "deadline long")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            for pdf in rows:
                for u, c in pdf.groupby("user_id").size().items():
                    cur = self.per_user.getValue((int(u),))
                    base = int(cur[0]) if cur is not None else 0
                    self.per_user.updateValue((int(u),), (base + int(c),))
            old = self.deadline.get()
            if old is not None:
                self.handle.deleteTimer(old[0])
            deadline = timerValues.getCurrentProcessingTimeInMs() + self.ttl_ms
            self.handle.registerTimer(deadline)
            self.deadline.update((deadline,))
            return iter(())

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            counts = {
                int(k[0]): int(v[0]) for k, v in self.per_user.iterator()
            }
            if not counts:
                return
            self.per_user.clear()
            self.deadline.clear()
            yield _user_activity_row(key[0], counts)

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - older Spark
    UserActivityMapProcessor = None  # type: ignore[assignment]


def build_user_activity_stream(
    keyed: DataFrame,
    ttl_ms: int = TTL_MS,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    """keyed: streaming DF with (bucket, user_id)."""
    grouped = keyed.groupBy("bucket")
    if _use_tws(prefer_transform_with_state):
        _tws_session(keyed.sparkSession)
        return grouped.transformWithStateInPandas(
            UserActivityMapProcessor(ttl_ms),
            outputStructType=_MAP_OUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    return grouped.applyInPandasWithState(
        user_activity_with_group_state(ttl_ms),
        outputStructType=_MAP_OUT_SCHEMA,
        stateStructType="counts_json string, deadline long",
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


@register(
    QUERIES,
    "stream_user_activity_mapstate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id % {N_BUCKETS} AS bucket, user_id, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_user_events
    FROM per_user GROUP BY bucket
    """,
    doc="Per-subkey keyed state through MAP state — the third state "
    "primitive (ValueState = ttl metrics, ListState = top-k eviction, "
    "MapState = this): each bucket key holds a user_id -> count map "
    "updated per arrival (updateValue/getValue; engine ttlDurationMs on "
    "the map), flushed by the idle timer into per-bucket user-activity "
    "stats. The group_state twin carries the same map as JSON in the "
    "state struct. All emitted values are order-independent, so the "
    "oracle is the two-level batch GROUP BY. At scale MapState is the "
    "primitive that keeps per-subkey updates O(1) instead of "
    "rewrite-the-whole-blob.",
)
def stream_user_activity_mapstate(
    spark: SparkSession,
    sf_dir: str,
    prefer_transform_with_state: bool | None = None,
) -> DataFrame:
    prepare(spark)
    from ..session import load_table

    n_keys = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % N_BUCKETS).alias("b"))
        .distinct()
        .count()
    )
    keyed = _events_keyed_stream(spark, sf_dir).select("bucket", "user_id")
    out = _run_until_rows(
        spark,
        build_user_activity_stream(
            keyed, prefer_transform_with_state=prefer_transform_with_state
        ),
        n_keys,
        "uamap",
    )
    return out.transform(cut())
