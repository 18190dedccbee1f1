"""Batch-mode passthrough pipeline: the reference topology executed on
DataFrames (SURVEY.md §7 phase 1), plus oracle-checked scenario queries that
replay the ``events`` table through the REAL state machine.

Plan shape: normalize both planes → union → ``groupBy(batch_id)`` →
``applyInPandas`` replay (one shuffle on batchId, Arrow-batched). Scale note:
per-batch lifecycle needs single-key sequencing, so a hot batch is an
inherent serialization point — same as the reference's keyBy(batchId). The
streaming path bounds per-trigger work with ``maxOffsetsPerTrigger``; record
routing itself is embarrassingly parallel and the counter is the only
per-key state.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import SEND_COMPLETED, STARTED, TERMINATED, UNKNOWN_BATCH_FAILURE
from ..plans import QuerySpec, register
from ..session import load_table, prepare
from ..sources.envelope import (
    KIND_DATA,
    ROUTED_SCHEMA,
    control_to_envelope,
    data_to_envelope,
    events_as_records,
)
from .batch_state import (
    BatchState,
    BatchStateMachine,
    Outputs,
    failure_body,
    notification_json,
    outputs_to_rows,
    passthrough_validator,
)

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# pandas-side replay (runs inside applyInPandas, one call per batchId)
# ---------------------------------------------------------------------------
def _none_if_nan(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _headers_to_py(h) -> list:
    if h is None or (isinstance(h, float) and math.isnan(h)):
        return []
    out = []
    for item in h:
        if isinstance(item, dict):
            k, v = item.get("key"), item.get("value")
        else:  # Row-like / tuple
            k, v = item[0], item[1]
        out.append({"key": k, "value": bytes(v) if v is not None else None})
    return out


_notification_json = notification_json  # shared with the streaming processor


_OUT_COLS = ["dest", "batch_id", "key", "value", "headers"]

# ROUTED_SCHEMA with ``headers`` as its ``to_json`` string form — the
# fast-path boundary schema (decoded back to HEADER_TYPE right after the
# replay; see run_pipeline_batch).
_ROUTED_ENC_SCHEMA = T.StructType(
    [
        f
        if f.name != "headers"
        else T.StructField("headers", T.StringType(), True)
        for f in ROUTED_SCHEMA.fields
    ]
)


def _replay_rowwise(pdf: pd.DataFrame, machine: BatchStateMachine, batch_id):
    """Reference implementation: event-at-a-time through the pure core."""
    st = BatchState(batch_id=batch_id or "")
    outs = Outputs()
    for row in pdf.itertuples(index=False):
        now = _none_if_nan(row.time_ms)
        now = int(now) if now is not None else None
        if row.kind == "control":
            notif = {k: _none_if_nan(v) for k, v in dict(row.notification).items()}
            outs.extend(machine.on_control(st, notif, now))
        else:
            key = bytes(row.key) if row.key is not None else None
            value = bytes(row.value) if row.value is not None else None
            outs.extend(
                machine.on_data(st, key, value, _headers_to_py(row.headers), now)
            )
    outs.extend(machine.end_of_input(st))
    return pd.DataFrame(outputs_to_rows(outs, batch_id), columns=_OUT_COLS)


def _route_blocks(
    pdf: pd.DataFrame,
    machine: BatchStateMachine,
    batch_id,
    st: BatchState | None = None,
    now_ms: int | None = None,
    end_input: bool = True,
    encoded: bool = False,
) -> tuple[list, list]:
    """Passthrough fast path CORE: control rows still go one-by-one through
    the state machine, but runs of data rows between controls are routed in
    BULK (pandas slices, no per-row Python). Returns ``(parts, notifs)``
    where ``parts`` is ``[(block_slice, dest, body_override), ...]`` in
    replay order and ``notifs`` the emitted notification dicts — callers
    format parts either as payload rows (:func:`_replay_vectorized`) or as
    order-key intervals (:func:`_decide_intervals`). Valid ONLY for the
    passthrough validator with no external lookup — the per-row path covers
    everything else. The differential property test
    (tests/test_replay_equivalence.py) pins this to the row-wise reference
    on randomized scenarios.

    Two time modes:
    - batch replay (``now_ms=None``): logical time = each row's ``time_ms``,
      armed deadlines can fire mid-stream, ``end_input`` fires leftovers;
    - streaming (``now_ms`` set): every row shares the trigger's processing
      time, so an armed deadline can never fire inside the same invocation
      (deadline = now + delay > now) and the caller owns real timers.

    Why bulk routing is sound (given passthrough + no lookup):
    - unknown batch   → every row of the run is invalid(UNKNOWN), no counts;
    - terminated      → every row dropped;
    - completed       → every row invalid(already completed);
    - armed deadline  → if the run's FIRST row is past it, the timer fires
      before any data (→ completed, run handled above); otherwise the first
      row overflows the matched count, fails the batch and CLEARS the timer,
      so no later row in the run can fire it;
    - count catch-up  → split at the crossing row (batch mode) so the armed
      deadline governs the tail;
    - otherwise       → every row routes to .out; the only state change is
      processed += n and at most one sendCompleted-overage failure.

    ``encoded=True`` (r15, guide §4 boundary slimming): the ``headers`` and
    ``notification`` columns arrive as their ``to_json`` string forms
    instead of Arrow nested types. Data-row headers are pure passthrough
    here, so flat strings cross the boundary instead of per-row Python
    object trees (the dominant Arrow-conversion cost of the batch replay);
    control rows — a handful per batch — parse their notification with
    ``json.loads``. Only ``run_pipeline_batch``'s fast path sets this; the
    streaming processor and the row-wise core keep real structs.
    """
    from ..model import COMPLETED, SEND_COMPLETED, TERMINATED

    if st is None:
        st = BatchState(batch_id=batch_id or "")
    parts: list[tuple[pd.DataFrame, str, bytes | None]] = []  # slice, dest, body
    notifs: list[dict] = []

    def _block_now(block: pd.DataFrame, idx: int) -> int | None:
        if now_ms is not None:
            return now_ms
        t = _none_if_nan(block["time_ms"].iloc[idx])
        return int(t) if t is not None else None

    def flush_block(block: pd.DataFrame) -> None:
        n = len(block)
        if n == 0:
            return
        if st.deadline_ms is not None:
            t0 = _block_now(block, 0)
            if t0 is not None and t0 >= st.deadline_ms:
                out = Outputs()
                machine.advance_time(st, t0, out)  # fires → completed
                notifs.extend(out.notifications)
        if not st.known:
            parts.append((block, "invalid", failure_body(UNKNOWN_BATCH_FAILURE)))
            return
        if st.status == TERMINATED:
            return
        if st.status == COMPLETED:
            parts.append(
                (block, "invalid", failure_body("Batch is already completed"))
            )
            return
        if (
            st.status == SEND_COMPLETED
            and st.expected is not None
            and now_ms is None  # streaming: constant now → no mid-block fire
        ):
            # the count can catch UP to expected mid-block: the row-wise core
            # arms the completion timer at the crossing row, so split there —
            # the tail re-enters with the deadline armed (and may either
            # overflow → failed, or start past the deadline → completed).
            to_expected = st.expected - st.processed
            if 0 < to_expected < n:
                head, tail = block.iloc[:to_expected], block.iloc[to_expected:]
                parts.append((head, "out", None))
                st.processed += to_expected
                if st.expected > 0:
                    t_arm = _block_now(head, -1)
                    st.deadline_ms = (t_arm or 0) + machine.delay_ms
                flush_block(tail)
                return
        parts.append((block, "out", None))
        p0 = st.processed
        st.processed = p0 + n
        if (
            st.status == SEND_COMPLETED
            and st.expected is not None
            and st.processed > st.expected
        ):
            # the row-wise core fails at the CROSSING row, so the emitted
            # notification snapshots recordCount at that instant
            final = st.processed
            st.processed = max(p0 + 1, st.expected + 1)
            out = Outputs()
            machine._fail(st, out)
            notifs.extend(out.notifications)
            st.processed = final
        elif (
            st.status == SEND_COMPLETED
            and st.expected is not None
            and 0 < st.expected == st.processed
        ):
            # block ended exactly at the expected count → timer armed at the
            # last row's time (mirrors on_data catch-up arming)
            t_arm = _block_now(block, -1)
            st.deadline_ms = (t_arm or 0) + machine.delay_ms

    kinds = pdf["kind"].to_numpy()
    control_pos = [i for i, k in enumerate(kinds) if k == "control"]
    pos = 0
    for c in control_pos:
        flush_block(pdf.iloc[pos:c])
        row = pdf.iloc[c]
        if now_ms is not None:
            now = now_ms
        else:
            t = _none_if_nan(row["time_ms"])
            now = int(t) if t is not None else None
        if encoded:
            import json as _json

            raw = row["notification"]
            notif = _json.loads(raw) if isinstance(raw, str) else {}
        else:
            notif = {
                k: _none_if_nan(v) for k, v in dict(row["notification"]).items()
            }
        out = Outputs()
        out.extend(machine.on_control(st, notif, now))
        notifs.extend(out.notifications)
        pos = c + 1
    flush_block(pdf.iloc[pos:])
    if end_input:
        eoi = machine.end_of_input(st)
        notifs.extend(eoi.notifications)
    return parts, notifs


def _replay_vectorized(
    pdf: pd.DataFrame,
    machine: BatchStateMachine,
    batch_id,
    st: BatchState | None = None,
    now_ms: int | None = None,
    end_input: bool = True,
    encoded: bool = False,
):
    """Payload formatter over :func:`_route_blocks`: emits ROUTED-shaped
    pandas rows carrying each block's key/value/headers (the batch fast
    path's in-Python form, and the streaming processor's only form)."""
    parts, notifs = _route_blocks(
        pdf, machine, batch_id, st=st, now_ms=now_ms,
        end_input=end_input, encoded=encoded,
    )

    frames = []
    for block, dest, body in parts:
        frames.append(
            pd.DataFrame(
                {
                    "dest": dest,
                    "batch_id": batch_id,
                    "key": block["key"].values,
                    "value": (
                        block["value"].values if body is None else [body] * len(block)
                    ),
                    "headers": block["headers"].values,
                }
            )
        )
    if notifs:
        frames.append(
            pd.DataFrame(
                {
                    "dest": "notification",
                    "batch_id": batch_id,
                    "key": [(batch_id or "").encode("utf-8")] * len(notifs),
                    "value": [_notification_json(n) for n in notifs],
                    "headers": (["[]"] if encoded else [[]]) * len(notifs),
                }
            )
        )
    if not frames:
        return pd.DataFrame(columns=_OUT_COLS)
    return pd.concat(frames, ignore_index=True)[_OUT_COLS]


def make_replay(
    delay_ms: int, validator=passthrough_validator, lookup=None, encoded: bool = False
):
    """Build the per-group replay fn; closure is cloudpickled to executors.
    ``encoded`` (fast path only) — see ``_replay_vectorized``."""
    fast = validator is passthrough_validator and lookup is None
    if encoded and not fast:
        raise ValueError("encoded envelope is only valid for the fast path")

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        machine = BatchStateMachine(delay_ms, validator, lookup)
        pdf = pdf.sort_values(["time_ms", "kind_rank", "seq"], na_position="first")
        raw_bid = pdf["batch_id"].iloc[0]
        batch_id = raw_bid if isinstance(raw_bid, str) else None
        if fast:
            return _replay_vectorized(pdf, machine, batch_id, encoded=encoded)
        return _replay_rowwise(pdf, machine, batch_id)

    return replay


# ---------------------------------------------------------------------------
# interval-decision plan (r15, guide §8): the state machine decides on
# METADATA only; payload bytes never cross the Python boundary
# ---------------------------------------------------------------------------
# Decision rows emitted by the metadata replay. kind: 'interval' (a run of
# data rows sharing one routing decision, bounded INCLUSIVELY by the order
# keys of its first/last row), 'notification' (an emitted notification,
# body = its JSON bytes), or 'fallback' (the batch's in-batch sort key is
# ambiguous — see _decide_intervals — so the caller must use the
# payload-through-Python plan instead).
_DECISION_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("dest", T.StringType(), True),
        T.StructField("s_tnn", T.IntegerType(), True),
        T.StructField("s_t", T.LongType(), True),
        T.StructField("s_snn", T.IntegerType(), True),
        T.StructField("s_s", T.LongType(), True),
        T.StructField("e_tnn", T.IntegerType(), True),
        T.StructField("e_t", T.LongType(), True),
        T.StructField("e_snn", T.IntegerType(), True),
        T.StructField("e_s", T.LongType(), True),
        T.StructField("body", T.BinaryType(), True),
    ]
)

_DECISION_COLS = [f.name for f in _DECISION_SCHEMA.fields]


def _ord_key(time_v, seq_v) -> tuple[int, int, int, int]:
    """Replay order key of one row as a null-safe 4-tuple mirroring the
    pandas sort (``na_position='first'``): (time-not-null, time,
    seq-not-null, seq) — null sorts before every value."""
    t = _none_if_nan(time_v)
    s = _none_if_nan(seq_v)
    return (
        0 if t is None else 1,
        int(t) if t is not None else 0,
        0 if s is None else 1,
        int(s) if s is not None else 0,
    )


def _decide_intervals(
    pdf: pd.DataFrame, machine: BatchStateMachine, batch_id
) -> pd.DataFrame:
    """Run the metadata replay and emit DECISIONS instead of payload rows.

    An interval [first-row key, last-row key] identifies a block's rows only
    if no two rows of the batch share the (time_ms, kind_rank, seq) sort
    key — duplicate keys make any boundary inside the tie-run inexpressible
    (the JVM join cannot discriminate tied rows), so such a batch emits a
    single 'fallback' marker and the caller reverts to the encoded plan.
    Deterministic producers (unique seq per batch — events_as_records, the
    envelope's monotonic default) never hit this."""
    row = {c: None for c in _DECISION_COLS}
    row["batch_id"] = batch_id
    if bool(pdf.duplicated(subset=["time_ms", "kind_rank", "seq"]).any()):
        row["kind"] = "fallback"
        return pd.DataFrame([row], columns=_DECISION_COLS)
    parts, notifs = _route_blocks(pdf, machine, batch_id, encoded=True)
    recs = []
    for block, dest, body in parts:
        s = _ord_key(block["time_ms"].iloc[0], block["seq"].iloc[0])
        e = _ord_key(block["time_ms"].iloc[-1], block["seq"].iloc[-1])
        r = dict(row, kind="interval", dest=dest, body=body)
        r["s_tnn"], r["s_t"], r["s_snn"], r["s_s"] = s
        r["e_tnn"], r["e_t"], r["e_snn"], r["e_s"] = e
        recs.append(r)
    for n in notifs:
        recs.append(
            dict(row, kind="notification", dest="notification",
                 body=_notification_json(n))
        )
    return pd.DataFrame(recs, columns=_DECISION_COLS)


def _make_decide(delay_ms: int):
    """Per-group decision fn for applyInPandas over the METADATA envelope
    (batch_id, kind, time_ms, seq, kind_rank, notification-as-json)."""

    def decide(pdf: pd.DataFrame) -> pd.DataFrame:
        machine = BatchStateMachine(delay_ms, passthrough_validator, None)
        pdf = pdf.sort_values(["time_ms", "kind_rank", "seq"], na_position="first")
        raw_bid = pdf["batch_id"].iloc[0]
        batch_id = raw_bid if isinstance(raw_bid, str) else None
        return _decide_intervals(pdf, machine, batch_id)

    return decide


def _interval_plan(env: DataFrame, completion_delay_ms: int) -> DataFrame | None:
    """Guide §8 boundary for the fast path: ship ONLY metadata through the
    grouped Python replay; route the payload JVM-side with a broadcast join
    against the returned decision intervals.

    The old (encoded) fast path shuffled every key/value/headers byte into
    Python and back — two Arrow conversions plus a payload shuffle — yet
    the passthrough decisions depend only on (batch_id, kind, time_ms, seq,
    notification). Here the metadata replay returns O(#controls) interval
    rows per batch; the payload leg is one scan + one BroadcastHashJoin
    (no payload shuffle at all — rows are dropped/tagged where they are
    read). Returns None when any batch reports an ambiguous sort key (the
    caller then builds the encoded plan; the spent metadata pass is the
    probe's price, never hit by deterministic unique-seq producers)."""
    from ..materialize import materialize
    from ..model import HEADER_TYPE

    meta = env.select(
        "batch_id", "kind", "time_ms", "seq", "kind_rank",
        F.to_json("notification").alias("notification"),
    )
    # decisions are consumed three times (fallback probe, interval join,
    # notifications leg) and are per-batch/control cardinality — tiny at
    # any scale; one eager materialization runs the metadata pass now.
    decisions = materialize(
        meta.groupBy("batch_id").applyInPandas(
            _make_decide(completion_delay_ms), _DECISION_SCHEMA
        ),
        eager=True,
    )
    if decisions.where(F.col("kind") == "fallback").limit(1).count():
        return None
    iv = decisions.where(F.col("kind") == "interval").select(
        F.col("batch_id").alias("iv_batch_id"),
        "dest",
        "body",
        F.struct(
            F.col("s_tnn").alias("tnn"), F.col("s_t").alias("t"),
            F.col("s_snn").alias("snn"), F.col("s_s").alias("s"),
        ).alias("iv_start"),
        F.struct(
            F.col("e_tnn").alias("tnn"), F.col("e_t").alias("t"),
            F.col("e_snn").alias("snn"), F.col("e_s").alias("s"),
        ).alias("iv_end"),
    )
    data = env.where(F.col("kind") == KIND_DATA).withColumn(
        "ord",
        F.struct(
            F.col("time_ms").isNotNull().cast("int").alias("tnn"),
            F.coalesce(F.col("time_ms"), F.lit(0)).cast("long").alias("t"),
            F.col("seq").isNotNull().cast("int").alias("snn"),
            F.coalesce(F.col("seq"), F.lit(0)).cast("long").alias("s"),
        ),
    )
    j = data.join(
        F.broadcast(iv),
        data["batch_id"].eqNullSafe(F.col("iv_batch_id"))
        & (F.col("ord") >= F.col("iv_start"))
        & (F.col("ord") <= F.col("iv_end")),
        "inner",
    )
    routed = j.select(
        "dest",
        "batch_id",
        "key",
        F.when(F.col("body").isNotNull(), F.col("body"))
        .otherwise(F.col("value"))
        .alias("value"),
        "headers",
    )
    notifs = decisions.where(F.col("kind") == "notification").select(
        F.lit("notification").alias("dest"),
        "batch_id",
        F.encode(F.coalesce(F.col("batch_id"), F.lit("")), "UTF-8").alias("key"),
        F.col("body").alias("value"),
        F.array().cast(HEADER_TYPE).alias("headers"),
    )
    return routed.unionByName(notifs)


def run_pipeline_batch(
    records: DataFrame,
    notifications: DataFrame,
    completion_delay_ms: int = 5000,
    validator=passthrough_validator,
    lookup=None,
) -> DataFrame:
    """The whole topology as one pure function over DataFrames (the
    source/sink-agnostic seam of SURVEY.md §3.2). Returns destination-tagged
    Kafka-shaped rows (ROUTED_SCHEMA); callers fan out by ``dest``."""
    env = control_to_envelope(notifications).unionByName(
        data_to_envelope(records), allowMissingColumns=False
    )
    env = env.withColumn(
        "kind_rank", F.when(F.col("kind") == "control", 0).otherwise(1)
    )
    fast = validator is passthrough_validator and lookup is None
    if not fast:
        return env.groupBy("batch_id").applyInPandas(
            make_replay(completion_delay_ms, validator, lookup), ROUTED_SCHEMA
        )
    # Fast path boundary choice (HRI_PASSTHROUGH_BOUNDARY):
    #   'encoded' (default) — the flat-column Arrow boundary below (also the
    #     automatic fallback when a batch's sort key is ambiguous).
    #   'interval' — metadata-only replay + JVM broadcast-interval routing
    #     (_interval_plan); requires caller-provided time_ms AND seq on the
    #     records frame, because the envelope subtree is evaluated by two
    #     plan legs and a generated monotonically_increasing_id seq is not
    #     guaranteed identical across evaluations.
    # Default chosen by measurement (guide §1.1 — the "ideal" plan lost the
    # empirical loop at driver scale): interval never moves payload bytes
    # through Python or a shuffle, but at sf0.1 the boundary cost is
    # row-count-bound, not byte-bound — the metadata pass alone (~0.92 s)
    # costs as much as the whole encoded replay, so interval benched 2.04 s
    # vs encoded 1.38 s; at 20x payload width the two tie (1.91 vs 1.95).
    # On a real cluster, where the payload shuffle crosses NICs and records
    # are KB-MB blobs, 'interval' is the right arm — it is kept tested
    # (row-level differential vs encoded) and selectable here.
    import os as _os

    boundary = _os.environ.get("HRI_PASSTHROUGH_BOUNDARY", "encoded")
    # The notifications frame must carry its own time_ms AND seq too
    # (ADVICE r15): control_to_envelope otherwise defaults every control's
    # seq to 0 with null time_ms, so any batch with >= 2 controls
    # deterministically trips the duplicate-key fallback — interval mode
    # would pay the full eager metadata pass (localCheckpoint + count at
    # plan-build time) on EVERY batch only to revert to the encoded plan.
    if (
        boundary == "interval"
        and "seq" in records.columns
        and "time_ms" in records.columns
        and "seq" in notifications.columns
        and "time_ms" in notifications.columns
    ):
        routed = _interval_plan(env, completion_delay_ms)
        if routed is not None:
            return routed
    # Encoded fast path (r15, guide §4): the passthrough validator never
    # inspects headers and notifications only matter on the handful of
    # control rows, yet the nested ARRAY<STRUCT<..binary>> / notification
    # STRUCT columns dominated the Arrow boundary cost — each crossing
    # builds per-row Python object trees both ways (measured ~0.6 s of the
    # sf0.1 replay; flat-width identity A/B in OPTIMIZATION_r15.md). Encode
    # both as their ``to_json`` strings JVM-side, ship flat strings through
    # the replay (headers are pure passthrough there), and decode back with
    # ``from_json`` after — a lossless roundtrip incl. binary header values
    # (base64) and null/empty shapes, pinned by tests.
    from ..model import HEADER_TYPE

    enc = env.select(
        "batch_id", "kind", "time_ms", "seq", "kind_rank", "key", "value",
        F.to_json("headers").alias("headers"),
        F.to_json("notification").alias("notification"),
    )
    routed_enc = enc.groupBy("batch_id").applyInPandas(
        make_replay(completion_delay_ms, validator, lookup, encoded=True),
        _ROUTED_ENC_SCHEMA,
    )
    return routed_enc.select(
        "dest",
        "batch_id",
        "key",
        "value",
        F.from_json("headers", HEADER_TYPE).alias("headers"),
    )


# ---------------------------------------------------------------------------
# scenario queries over the events table (oracle-checked)
# ---------------------------------------------------------------------------
def _derive_control(
    events: DataFrame,
    batch_col: str = "event_type",
    expected_delta: dict[str, int] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """One started (before first record) + one sendCompleted (after last
    record) per batch, expected = true count (+ optional per-batch delta)."""
    g = (
        events.groupBy(F.col(batch_col).cast("string").alias("id"))
        .agg(
            (F.min(F.unix_millis("ts")) - 10_000).alias("start_ms"),
            (F.max(F.unix_millis("ts")) + 10_000).alias("end_ms"),
            F.count(F.lit(1)).cast("int").alias("cnt"),
        )
    )
    if exclude:
        g = g.filter(~F.col("id").isin(exclude))
    delta = F.lit(0)
    for k, v in (expected_delta or {}).items():
        delta = F.when(F.col("id") == k, F.lit(v)).otherwise(delta)
    base = g.select(
        "id",
        F.col("id").alias("name"),
        F.lit("ingest.t.events.in").alias("topic"),
        F.lit("events").alias("dataType"),
        F.lit(-1).alias("invalidThreshold"),
        "start_ms",
        "end_ms",
        (F.col("cnt") + delta).cast("int").alias("expectedRecordCount"),
    )
    started = base.select(
        "id", "name", "topic", "dataType", "invalidThreshold",
        F.lit(STARTED).alias("status"),
        F.lit(None).cast("int").alias("expectedRecordCount"),
        F.col("start_ms").alias("time_ms"),
        F.lit(0).cast("long").alias("seq"),
    )
    send_completed = base.select(
        "id", "name", "topic", "dataType", "invalidThreshold",
        F.lit(SEND_COMPLETED).alias("status"),
        "expectedRecordCount",
        F.col("end_ms").alias("time_ms"),
        F.lit(1).cast("long").alias("seq"),
    )
    return started.unionByName(send_completed)


def _derive_control_agg(
    events: DataFrame,
    batch_col: str = "event_type",
    expected_delta: dict[str, int] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """The per-batch aggregate ``_outcomes`` would compute from
    ``_derive_control``'s expanded rows, produced DIRECTLY in the same
    single groupBy (round-4 verdict ask #7): one events pass instead of
    aggregate → explode to started/sendCompleted rows → re-aggregate.
    Only for the canonical derived pattern (no terminate rows — term_t is
    null by construction, so the sc_t/expected guards are vacuous);
    scenario queries that splice custom control rows keep the generic
    ``_derive_control`` path."""
    g = events.groupBy(F.col(batch_col).cast("string").alias("batch_id")).agg(
        (F.min(F.unix_millis("ts")) - 10_000).alias("started_t"),
        (F.max(F.unix_millis("ts")) + 10_000).alias("sc_t"),
        F.count(F.lit(1)).cast("int").alias("cnt"),
    )
    if exclude:
        g = g.filter(~F.col("batch_id").isin(exclude))
    delta = F.lit(0)
    for k, v in (expected_delta or {}).items():
        delta = F.when(F.col("batch_id") == k, F.lit(v)).otherwise(delta)
    return g.select(
        "batch_id",
        "started_t",
        "sc_t",
        (F.col("cnt") + delta).cast("int").alias("expected"),
        F.lit(None).cast("long").alias("term_t"),
    )


def _summarize(routed: DataFrame) -> DataFrame:
    """One row per batch: out/invalid counts + terminal status from the
    emitted notifications (single pass over the pipeline output)."""
    return routed.groupBy("batch_id").agg(
        F.count(F.when(F.col("dest") == "out", 1)).alias("n_out"),
        F.count(F.when(F.col("dest") == "invalid", 1)).alias("n_invalid"),
        F.max(
            F.when(
                F.col("dest") == "notification",
                F.get_json_object(F.col("value").cast("string"), "$.status"),
            )
        ).alias("final_status"),
    )


@register(
    QUERIES,
    "passthrough_route",
    oracle="""
    SELECT event_type            AS batch_id,
           count(*)              AS n_out,
           CAST(0 AS BIGINT)     AS n_invalid,
           'completed'           AS final_status
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Happy path (spec.rb:99-132) at table scale: every event_type is a "
        "batch, counts reconcile, all batches complete through the delay "
        "timer. Runs the REAL state machine via applyInPandas."
    ),
)
def passthrough_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    routed = run_pipeline_batch(events_as_records(e), _derive_control(e))
    return _summarize(routed)


@register(
    QUERIES,
    "passthrough_unknown_batch",
    oracle="""
    SELECT event_type AS batch_id,
           CAST(CASE WHEN event_type = 'error' THEN 0 ELSE count(*) END AS BIGINT) AS n_out,
           CAST(CASE WHEN event_type = 'error' THEN count(*) ELSE 0 END AS BIGINT) AS n_invalid,
           CASE WHEN event_type = 'error' THEN NULL ELSE 'completed' END AS final_status
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Unknown-batchId routing (spec.rb:264-290): the 'error' batch is "
        "never started, so its records land on .invalid with the failure "
        "body and its counters stay untouched."
    ),
)
def passthrough_unknown_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    ctrl = _derive_control(e, exclude=["error"])
    return _summarize(run_pipeline_batch(events_as_records(e), ctrl))


@register(
    QUERIES,
    "passthrough_overcount",
    oracle="""
    SELECT event_type AS batch_id,
           count(*)   AS n_out,
           CASE WHEN event_type = 'click' THEN 'failed' ELSE 'completed' END
             AS final_status
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Overcount → failed (spec.rb:292-318): 'click' declares 5 fewer than "
        "arrived; the batch fails at sendCompleted but every record still "
        "reaches .out (routing and lifecycle are decoupled, spec.rb:349-353)."
    ),
)
def passthrough_overcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    ctrl = _derive_control(e, expected_delta={"click": -5})
    routed = run_pipeline_batch(events_as_records(e), ctrl)
    return _summarize(routed).select("batch_id", "n_out", "final_status")


@register(
    QUERIES,
    "passthrough_terminate",
    oracle="""
    WITH v AS (
      SELECT epoch_ms(ts) AS ms,
             row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'view'
    )
    SELECT event_type AS batch_id,
           CAST(CASE WHEN event_type = 'view'
                THEN (SELECT count(*) FROM v WHERE ms < (SELECT ms FROM v WHERE rn = 100))
                ELSE count(*) END AS BIGINT) AS n_out,
           CASE WHEN event_type = 'view' THEN NULL ELSE 'completed' END
             AS final_status
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Terminate (spec.rb:229-262): 'view' is terminated at its 100th "
        "record's timestamp; later records are dropped (no .out, no .invalid) "
        "and the batch never completes."
    ),
)
def passthrough_terminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")  # scenario construction only
    cutoff = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 100)
        .select(F.unix_millis("ts").alias("time_ms"))
    )
    term = cutoff.select(
        F.lit("view").alias("id"),
        F.lit("view").alias("name"),
        F.lit("ingest.t.events.in").alias("topic"),
        F.lit("events").alias("dataType"),
        F.lit(-1).alias("invalidThreshold"),
        F.lit(TERMINATED).alias("status"),
        F.lit(None).cast("int").alias("expectedRecordCount"),
        "time_ms",
        F.lit(0).cast("long").alias("seq"),
    )
    ctrl = _derive_control(e).unionByName(term)
    routed = run_pipeline_batch(events_as_records(e), ctrl)
    return _summarize(routed).select("batch_id", "n_out", "final_status")
