"""End-to-end Structured Streaming tests: file-source streams drive the real
topology (keyed state + processing-time timers) into a memory sink — the
port of the reference's MiniCluster tier (SURVEY.md §5).

NOTE: with ProcessingTimeTimeout the engine keeps planning timer-evaluation
microbatches, so ``processAllAvailable()`` never converges — tests poll the
sink with a deadline instead.
"""

from __future__ import annotations

import json
import time
import uuid

import pytest

from pyspark.sql import types as T

from hri_flink_validation_passthrough_spark.model import (
    HRI_RECORD_SCHEMA,
    NOTIFICATION_SCHEMA,
)
from hri_flink_validation_passthrough_spark.streaming.topology import (
    build_routed_stream,
    start_memory_query,
)

DELAY_MS = 1500

CTRL_SCHEMA = T.StructType(
    list(NOTIFICATION_SCHEMA.fields)
    + [T.StructField("time_ms", T.LongType()), T.StructField("seq", T.LongType())]
)
REC_SCHEMA = T.StructType(
    list(HRI_RECORD_SCHEMA.fields)
    + [T.StructField("time_ms", T.LongType()), T.StructField("seq", T.LongType())]
)


def _notif_row(status, bid="batch-42", expected=None, t=0, seq=0):
    base = {f.name: None for f in NOTIFICATION_SCHEMA.fields}
    base.update(
        id=bid, status=status, name="Б", topic="ingest.t.x.in",
        dataType="d", expectedRecordCount=expected, invalidThreshold=-1,
        metadata=json.dumps({"test": "ᚠᛇᚻ"}),
    )
    return tuple(base[f.name] for f in NOTIFICATION_SCHEMA.fields) + (t, seq)


def _rec_row(i, bid=b"batch-42", t=100):
    return (
        str(i).encode(),
        b"\x00\xff" + str(i).encode(),
        [("batchId", bid), ("passThru", b"tail")],
        "ingest.t.x.in",
        1,
        i,
        t + i,
        i,
    )


@pytest.fixture(params=["group_state", "tws"])
def stream_env(request, spark, tmp_path):
    """The MiniCluster scenario matrix runs over BOTH stateful backends:
    ``group_state`` = applyInPandasWithState (path A), ``tws`` =
    transformWithStateInPandas (path B, Spark 4 timers — needs a protobuf
    runtime, provided by protobuf_shim.pre_jvm_env in conftest)."""
    prefer = request.param == "tws"
    if prefer:
        from hri_flink_validation_passthrough_spark.protobuf_shim import (
            ensure_protobuf,
        )

        if not ensure_protobuf(spark):
            pytest.skip("no google.protobuf runtime reaches Python workers")
    data_dir = str(tmp_path / "data")
    ctrl_dir = str(tmp_path / "ctrl")
    ckpt = str(tmp_path / "ckpt")

    def write_ctrl(rows):
        spark.createDataFrame(rows, CTRL_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(ctrl_dir)

    def write_recs(rows):
        spark.createDataFrame(rows, REC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(data_dir)

    # both dirs must exist before readStream starts
    write_ctrl([_notif_row("started", t=0, seq=0)])
    write_recs([])

    records = spark.readStream.schema(REC_SCHEMA).parquet(data_dir)
    notifs = spark.readStream.schema(CTRL_SCHEMA).parquet(ctrl_dir)
    routed = build_routed_stream(
        records,
        notifs,
        completion_delay_ms=DELAY_MS,
        prefer_transform_with_state=prefer,
        per_trigger_bound=1000,  # per-scenario staged rows, all tiny
    )
    name = f"routed_{uuid.uuid4().hex[:8]}"
    q = start_memory_query(routed, name, ckpt)

    def rows():
        return spark.sql(f"SELECT * FROM {name}").collect()

    def wait_for(cond, timeout=30.0, msg=""):
        t0 = time.time()
        while time.time() - t0 < timeout:
            r = rows()
            if cond(r):
                return r
            time.sleep(0.3)
        pytest.fail(f"timed out waiting for: {msg}\nlast rows: {rows()[:10]}")

    yield q, rows, wait_for, write_ctrl, write_recs
    q.stop()


def _dest(rows, d):
    return [r for r in rows if r.dest == d]


def _notifs(rows):
    return [json.loads(bytes(r.value)) for r in rows if r.dest == "notification"]


def test_streaming_lifecycle_end_to_end(spark, stream_env):
    q, rows, wait_for, write_ctrl, write_recs = stream_env

    write_recs([_rec_row(i) for i in range(15)])
    r = wait_for(lambda r: len(_dest(r, "out")) == 15, msg="15 routed records")
    # byte + header fidelity through the streaming path
    r0 = {bytes(x.key): x for x in _dest(r, "out")}[b"0"]
    assert bytes(r0.value) == b"\x00\xff0"
    assert [h.key for h in r0.headers] == ["batchId", "passThru"]

    sc_written = time.time()
    write_ctrl([_notif_row("sendCompleted", expected=15, t=200, seq=1)])
    r = wait_for(lambda r: _notifs(r), timeout=30, msg="terminal notification")
    elapsed_ms = (time.time() - sc_written) * 1000
    n = _notifs(r)
    assert [x["status"] for x in n] == ["completed"]
    assert n[0]["recordCount"] == 15 and n[0]["expectedRecordCount"] == 15
    assert n[0]["metadata"] == {"test": "ᚠᛇᚻ"}
    # the completion-delay contract: completed arrives ≥ delay after
    # sendCompleted reached the job (quantized by trigger interval)
    assert elapsed_ms >= DELAY_MS * 0.9, f"completed too early: {elapsed_ms}ms"

    # late record after completion → invalid, batch stays completed
    write_recs([_rec_row(77, t=9000)])
    r = wait_for(lambda r: _dest(r, "invalid"), msg="late record on invalid")
    assert json.loads(bytes(_dest(r, "invalid")[0].value)) == {
        "failure": "Batch is already completed"
    }
    assert [x["status"] for x in _notifs(r)] == ["completed"]  # unchanged


def test_streaming_unknown_batch_and_overcount(spark, stream_env):
    q, rows, wait_for, write_ctrl, write_recs = stream_env

    # unknown batchId → invalid with the reference failure body
    write_recs([_rec_row(50, bid=b"rspecUnknownBatch", t=50)])
    r = wait_for(lambda r: _dest(r, "invalid"), msg="unknown-batch invalid")
    assert json.loads(bytes(_dest(r, "invalid")[0].value)) == {
        "failure": "Bad Message - Unknown batchId"
    }

    # overcount at sendCompleted → failed; records still routed
    write_recs([_rec_row(i) for i in range(5)])
    wait_for(lambda r: len(_dest(r, "out")) == 5, msg="5 routed")
    write_ctrl([_notif_row("sendCompleted", expected=3, t=200, seq=1)])
    r = wait_for(lambda r: _notifs(r), msg="failed notification")
    assert [x["status"] for x in _notifs(r)] == ["failed"]
    assert len(_dest(r, "out")) == 5


def test_streaming_multi_batch_interleaving(spark, stream_env):
    """IVT multi-batch scenario (spec.rb:134-227): two interleaved batches,
    each tracked independently, both complete with their own counts."""
    q, rows, wait_for, write_ctrl, write_recs = stream_env

    write_ctrl([_notif_row("started", bid="batch-B", t=10, seq=2)])
    # interleave records of batch-42 (fixture-started) and batch-B
    write_recs(
        [_rec_row(i) for i in range(0, 10, 2)]
        + [_rec_row(i, bid=b"batch-B") for i in range(1, 10, 2)]
    )
    wait_for(lambda r: len(_dest(r, "out")) == 10, msg="10 routed")
    write_ctrl(
        [
            _notif_row("sendCompleted", expected=5, t=200, seq=3),
            _notif_row("sendCompleted", bid="batch-B", expected=5, t=201, seq=4),
        ]
    )
    r = wait_for(lambda r: len(_notifs(r)) == 2, msg="both batches complete")
    by_id = {n["id"]: n for n in _notifs(r)}
    assert set(by_id) == {"batch-42", "batch-B"}
    assert all(n["status"] == "completed" for n in by_id.values())
    assert all(n["recordCount"] == 5 for n in by_id.values())
    # every routed record kept its own batchId header
    for x in _dest(r, "out"):
        bid = dict((h.key, bytes(h.value)) for h in x.headers)["batchId"]
        expected = b"batch-42" if int(bytes(x.key)) % 2 == 0 else b"batch-B"
        assert bid == expected


def test_streaming_terminate_drops_later_records(spark, stream_env):
    q, rows, wait_for, write_ctrl, write_recs = stream_env

    write_recs([_rec_row(i) for i in range(10)])
    wait_for(lambda r: len(_dest(r, "out")) == 10, msg="10 routed")
    write_ctrl([_notif_row("terminated", t=300, seq=1)])
    # ensure the terminate is absorbed before sending more records: poke with
    # a second control for another batch and wait for a progress tick
    time.sleep(2.0)
    write_recs([_rec_row(i, t=400 + i) for i in range(10, 15)])
    time.sleep(4.0)
    r = rows()
    assert len(_dest(r, "out")) == 10  # post-terminate records dropped
    assert not _notifs(r)  # job emits nothing for terminated batches


def test_kafka_fanout_writer_routes_by_dest(spark):
    """Drive the foreachBatch fan-out with an injected sink (the Kafka write
    itself needs a broker): out/invalid go to their topics, notification is
    PUT to the notifier in mgmt mode and NOT written to the topic."""
    import json

    from hri_flink_validation_passthrough_spark.model import derive_topics
    from hri_flink_validation_passthrough_spark.streaming.topology import (
        kafka_fanout_writer,
    )

    topics = derive_topics("ingest.t1.events.in")
    rows = [
        ("out", b"k1", b"v1", []),
        ("out", b"k2", b"v2", []),
        ("invalid", b"k3", b'{"failure": "bad"}', []),
        ("notification", b"b1", json.dumps({"id": "b1", "status": "completed"}).encode(), []),
    ]
    batch = spark.createDataFrame(
        rows,
        "dest string, key binary, value binary, "
        "headers array<struct<key:string,value:binary>>",
    )

    written: dict[str, list] = {}
    seen_options: dict[str, dict] = {}

    def sink(part, topic, options):
        seen_options[topic] = options
        written.setdefault(topic, []).extend(
            (bytes(r.key), bytes(r.value)) for r in part.collect()
        )

    # standalone mode: notification topic written directly
    kafka_fanout_writer(topics, "broker:9092", sink=sink)(batch, epoch_id=0)
    assert sorted(written[topics.output]) == [(b"k1", b"v1"), (b"k2", b"v2")]
    assert written[topics.invalid] == [(b"k3", b'{"failure": "bad"}')]
    assert [k for k, _ in written[topics.notification]] == [b"b1"]
    # exact per-topic write options (what the default Kafka sink would use)
    assert seen_options[topics.output] == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": topics.output,
        "includeHeaders": "true",
    }

    # mgmt mode: notifier receives the terminal transition, topic untouched
    written.clear()
    puts = []

    class Notifier:
        def notify(self, body):
            puts.append(body)

    kafka_fanout_writer(topics, "broker:9092", notifier=Notifier(), sink=sink)(
        batch, epoch_id=1
    )
    assert puts == [{"id": "b1", "status": "completed"}]
    assert topics.notification not in written
    assert len(written[topics.output]) == 2


def test_idempotent_sink_replay_does_not_duplicate(spark, tmp_path):
    """Replaying an epoch (foreachBatch at-least-once) must replace, not
    append: after a double write of epoch 0, totals are unchanged."""
    from hri_flink_validation_passthrough_spark.streaming.topology import (
        idempotent_parquet_sink,
    )

    out = str(tmp_path / "sink")
    sink = idempotent_parquet_sink(out)
    batch0 = spark.range(100).withColumnRenamed("id", "v")
    batch1 = spark.range(100, 150).withColumnRenamed("id", "v")
    sink(batch0, epoch_id=0)
    sink(batch1, epoch_id=1)
    first = spark.read.parquet(out).count()
    assert first == 150
    # crash-replay of epoch 0: same data written again under the same epoch
    sink(batch0, epoch_id=0)
    again = spark.read.parquet(out)
    assert again.count() == 150
    assert again.agg({"v": "sum"}).collect()[0][0] == sum(range(150))


def test_passthrough_route_auto_bounded_replay(spark, monkeypatch):
    """r13: stream_passthrough_route's auto-bound branch (corpus past the
    whole-trigger bar → re-staged as small files + maxFilesPerTrigger=1,
    declared 'source-option') must produce the SAME per-batch summary as
    the single-trigger fast path — the multi-trigger replay exercises
    control rows and data rows landing in DIFFERENT triggers, which the
    keyed state machine must absorb. The bar is shrunk so the sf0.001
    corpus (1000 events) takes the branch: 1000 > 400 → ≤80-row files,
    one file per trigger."""
    from hri_flink_validation_passthrough_spark.streaming import (
        topology,
        windows,
    )

    want = {
        tuple(r)
        for r in windows.QUERIES["stream_passthrough_route"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    monkeypatch.setattr(topology, "TRIGGER_GROUP_WARN_ROWS", 400)
    got = {
        tuple(r)
        for r in windows.QUERIES["stream_passthrough_route"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want


def test_passthrough_route_empty_corpus_returns_empty_summary(spark, tmp_path):
    """r13 ADVICE: an empty events table used to declare per_trigger_bound=0,
    which the build-time contract rejects as outside (0, bar] — a degenerate
    corpus must come back as an empty summary, not a ValueError. Staged via
    pyarrow so the parquet physical types (TIMESTAMP(NANOS)) match the
    driver tables byte-for-byte."""
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.streaming import windows

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    pq.write_table(
        src.schema.empty_table(), str(tmp_path / "events.parquet")
    )
    out = windows.QUERIES["stream_passthrough_route"].fn(spark, str(tmp_path))
    assert out.count() == 0


def _cold_start_env(spark, tmp_path, ctrl_rows, rec_rows):
    """Start the topology AFTER staging all control/data files: the first
    microbatch ingests everything, so the per-trigger whole-group sort by
    (time_ms, kind_rank, seq) — not file-arrival races — defines the
    processing order. This is how 'mid-trigger' scenarios are staged
    deterministically (r15 adversarial streaming pins)."""
    data_dir = str(tmp_path / "data")
    ctrl_dir = str(tmp_path / "ctrl")
    spark.createDataFrame(ctrl_rows, CTRL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ctrl_dir)
    spark.createDataFrame(rec_rows, REC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(data_dir)
    records = spark.readStream.schema(REC_SCHEMA).parquet(data_dir)
    notifs = spark.readStream.schema(CTRL_SCHEMA).parquet(ctrl_dir)
    routed = build_routed_stream(
        records, notifs, completion_delay_ms=DELAY_MS, per_trigger_bound=1000
    )
    name = f"routed_{uuid.uuid4().hex[:8]}"
    q = start_memory_query(routed, name, str(tmp_path / "ckpt"))

    def rows():
        return spark.sql(f"SELECT * FROM {name}").collect()

    return q, rows


def test_streaming_empty_control_topic_routes_all_unknown(spark, tmp_path):
    """Adversarial shape the registry sweeps can't stage (r15 stretch,
    spec.rb:264-290): the control topic is EMPTY — no batch ever started,
    notifications never arrive. Every data record must route invalid with
    the reference's unknown-batch body, nothing reaches out, and the job
    emits zero notifications (there is no batch to complete or fail)."""
    recs = [_rec_row(i, bid=(b"batch-A" if i % 2 else b"batch-B"), t=100)
            for i in range(40)]
    q, rows = _cold_start_env(spark, tmp_path, [], recs)
    try:
        t0 = time.time()
        while time.time() - t0 < 30:
            r = rows()
            if len(_dest(r, "invalid")) == 40:
                break
            time.sleep(0.3)
        r = rows()
        inv = _dest(r, "invalid")
        assert len(inv) == 40, f"expected 40 invalid, got {len(inv)}"
        for x in inv:
            assert json.loads(bytes(x.value)) == {
                "failure": "Bad Message - Unknown batchId"
            }
        # the batchId header survives onto the invalid route, per batch
        by_bid = {}
        for x in inv:
            bid = dict((h.key, bytes(h.value)) for h in x.headers)["batchId"]
            by_bid[bid] = by_bid.get(bid, 0) + 1
        assert by_bid == {b"batch-A": 20, b"batch-B": 20}
        assert not _dest(r, "out") and not _notifs(r)
    finally:
        q.stop()


def test_streaming_terminate_mid_trigger_splits_by_event_order(
    spark, tmp_path
):
    """Adversarial shape (r15 stretch, spec.rb:229-262): `terminated`
    lands in the SAME microbatch as data records on both sides of it. The
    whole-group event-time sort must route exactly the records ordered
    BEFORE the terminate to out, drop the ones after, and emit no
    notification — the routing table, not mere survival."""
    ctrl = [
        _notif_row("started", t=0, seq=0),
        _notif_row("terminated", t=545, seq=1),
    ]
    # records at t=500,510,...,590: five strictly before 545, five after
    recs = [_rec_row(i, t=500 + 10 * i - i) for i in range(10)]
    # (_rec_row adds i to t: effective time_ms = 500+10*i; keep it explicit)
    q, rows = _cold_start_env(spark, tmp_path, ctrl, recs)
    try:
        t0 = time.time()
        while time.time() - t0 < 30:
            r = rows()
            if len(_dest(r, "out")) >= 5:
                break
            time.sleep(0.3)
        time.sleep(3.0)  # settle: any late mis-routed rows would appear
        r = rows()
        out_keys = sorted(int(bytes(x.key)) for x in _dest(r, "out"))
        assert out_keys == [0, 1, 2, 3, 4], (
            f"pre-terminate records mis-routed: {out_keys}"
        )
        assert not _dest(r, "invalid")  # dropped, not invalidated
        assert not _notifs(r)  # terminated batches emit nothing
    finally:
        q.stop()


def test_streaming_data_before_started_at_volume(spark, stream_env):
    """Adversarial shape (r15 stretch): a VOLUME of records for a batch
    arrives before its `started` notification. All of them route invalid
    as unknown-batch and are NOT counted; once the batch starts, its real
    records flow and the completion count covers only them."""
    q, rows, wait_for, write_ctrl, write_recs = stream_env

    write_recs([_rec_row(i, bid=b"batch-pre", t=50) for i in range(200)])
    r = wait_for(
        lambda r: len(_dest(r, "invalid")) == 200,
        timeout=45,
        msg="200 pre-started records on invalid",
    )
    for x in _dest(r, "invalid"):
        assert json.loads(bytes(x.value)) == {
            "failure": "Bad Message - Unknown batchId"
        }
    assert not _dest(r, "out")

    write_ctrl([_notif_row("started", bid="batch-pre", t=300, seq=5)])
    time.sleep(1.5)  # let the control absorb before data follows
    write_recs([_rec_row(i, bid=b"batch-pre", t=400) for i in range(25)])
    wait_for(lambda r: len(_dest(r, "out")) == 25, msg="25 routed post-start")
    write_ctrl(
        [_notif_row("sendCompleted", bid="batch-pre", expected=25, t=600, seq=6)]
    )
    r = wait_for(lambda r: _notifs(r), msg="completion for batch-pre")
    n = _notifs(r)
    assert [x["status"] for x in n] == ["completed"]
    # the 200 unknown-batch rejects are NOT in the batch's record count
    assert n[0]["recordCount"] == 25 and n[0]["expectedRecordCount"] == 25
