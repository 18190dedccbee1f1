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

import json
import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..model import SEND_COMPLETED, STARTED, TERMINATED
from ..plans import QuerySpec, register
from ..session import load_table, prepare
from ..sources.envelope import (
    ROUTED_SCHEMA,
    control_to_envelope,
    data_to_envelope,
    events_as_records,
)
from .batch_state import BatchState, BatchStateMachine, Outputs, passthrough_validator

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


def _notification_json(payload: dict) -> bytes:
    p = dict(payload)
    meta = p.get("metadata")
    if isinstance(meta, str):
        try:
            p["metadata"] = json.loads(meta)  # round-trip arbitrary objects
        except (ValueError, TypeError):
            pass
    return json.dumps(p, ensure_ascii=False).encode("utf-8")


def make_replay(delay_ms: int, validator=passthrough_validator, lookup=None):
    """Build the per-group replay fn; closure is cloudpickled to executors."""

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        machine = BatchStateMachine(delay_ms, validator, lookup)
        pdf = pdf.sort_values(["time_ms", "kind_rank", "seq"], na_position="first")
        raw_bid = pdf["batch_id"].iloc[0]
        batch_id = raw_bid if isinstance(raw_bid, str) else None
        st = BatchState(batch_id=batch_id or "")
        outs = Outputs()
        for row in pdf.itertuples(index=False):
            now = _none_if_nan(row.time_ms)
            now = int(now) if now is not None else None
            if row.kind == "control":
                notif = {
                    k: _none_if_nan(v) for k, v in dict(row.notification).items()
                }
                outs.extend(machine.on_control(st, notif, now))
            else:
                key = bytes(row.key) if row.key is not None else None
                value = bytes(row.value) if row.value is not None else None
                outs.extend(
                    machine.on_data(st, key, value, _headers_to_py(row.headers), now)
                )
        outs.extend(machine.end_of_input(st))

        rows = [
            {
                "dest": r.dest,
                "batch_id": batch_id,
                "key": r.key,
                "value": r.value,
                "headers": r.headers,
            }
            for r in outs.routed
        ] + [
            {
                "dest": "notification",
                "batch_id": batch_id,
                "key": (batch_id or "").encode("utf-8"),
                "value": _notification_json(n),
                "headers": [],
            }
            for n in outs.notifications
        ]
        return pd.DataFrame(
            rows, columns=["dest", "batch_id", "key", "value", "headers"]
        )

    return replay


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
    return env.groupBy("batch_id").applyInPandas(
        make_replay(completion_delay_ms, validator, lookup), ROUTED_SCHEMA
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
