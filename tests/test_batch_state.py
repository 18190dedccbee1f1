"""Scenario corpus from FIXTURES.md §4 against the pure state-machine core.

Each test replays (control sequence, data sequence) and asserts the routed
outputs + notification statuses the reference's RSpec/MiniCluster suites
assert at the Kafka boundary (citations in operators/batch_state.py).
"""

from __future__ import annotations

import json

import pytest

from hri_flink_validation_passthrough_spark.model import (
    COMPLETED,
    FAILED,
    SEND_COMPLETED,
    STARTED,
    TERMINATED,
    UNKNOWN_BATCH_FAILURE,
)
from hri_flink_validation_passthrough_spark.operators.batch_state import (
    BatchState,
    BatchStateMachine,
    Outputs,
)

DELAY = 5000


def mk(machine=None, **kw):
    return machine or BatchStateMachine(completion_delay_ms=DELAY, **kw)


def started(bid="batch-42", **extra):
    return {
        "id": bid,
        "status": STARTED,
        "name": "TestБатчName",  # Cyrillic per spec.rb:101
        "topic": "ingest.t.data.in",
        "dataType": "クレーム",  # Japanese per spec.rb:102
        "startDate": "2020-04-08T03:02:23Z",
        "metadata": json.dumps({"test": "ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ"}),
        "invalidThreshold": -1,
        **extra,
    }


def send_completed(bid="batch-42", expected=15):
    return {"id": bid, "status": SEND_COMPLETED, "expectedRecordCount": expected}


HDRS = [
    {"key": "batchId", "value": b"batch-42"},
    {"key": "testUtf8あいうえおか", "value": "あいうえおか".encode()},
    {"key": "passThru", "value": b"tail-header"},  # trailing, order asserted
]
RAW = bytes([0x00, 0xFF, 0x80, 0x7F]) + "日本語".encode()  # non-UTF-8 + UTF-8 bytes


def record(i: int):
    return (str(i).encode(), RAW + str(i).encode(), HDRS)


def run(events, machine=None):
    """events: list of ('c', notif, t) / ('d', i, t). Returns (st, Outputs)."""
    m = mk(machine)
    st = BatchState(batch_id="batch-42")
    out = Outputs()
    for kind, payload, t in events:
        if kind == "c":
            out.extend(m.on_control(st, payload, t))
        else:
            k, v, h = record(payload)
            out.extend(m.on_data(st, k, v, h, t))
    out.extend(m.end_of_input(st))
    return st, out


def outs(o, dest):
    return [r for r in o.routed if r.dest == dest]


def statuses(o):
    return [n["status"] for n in o.notifications]


def test_happy_path_byte_fidelity():
    ev = [("c", started(), 0)] + [("d", i, 100 + i) for i in range(15)]
    ev.append(("c", send_completed(expected=15), 1000))
    st, o = run(ev)
    assert st.status == COMPLETED
    assert statuses(o) == [COMPLETED]
    assert len(outs(o, "out")) == 15 and not outs(o, "invalid")
    r0 = outs(o, "out")[0]
    assert r0.key == b"0" and r0.value == RAW + b"0"  # byte-for-byte
    assert r0.headers == HDRS  # order + duplicates + UTF-8 keys preserved
    assert r0.headers[-1]["key"] == "passThru"  # trailing header positional
    n = o.notifications[0]
    assert n["recordCount"] == 15 and n["expectedRecordCount"] == 15
    assert n["id"] == "batch-42" and n["name"] == "TestБатчName"


def test_completion_waits_for_delay():
    """completed fires only after ≥ delay (kafka_record_validator.rb:67-71)."""
    m = mk()
    st = BatchState(batch_id="batch-42")
    o = Outputs()
    o.extend(m.on_control(st, started(), 0))
    for i in range(3):
        o.extend(m.on_data(st, *record(i), 10 + i))
    o.extend(m.on_control(st, send_completed(expected=3), 100))
    assert st.status == SEND_COMPLETED and st.deadline_ms == 100 + DELAY
    # a record for ANOTHER purpose advancing time before deadline: no fire
    m.advance_time(st, 100 + DELAY - 1, o)
    assert st.status == SEND_COMPLETED
    m.advance_time(st, 100 + DELAY, o)
    assert st.status == COMPLETED and statuses(o) == [COMPLETED]


def test_multi_batch_independent_states():
    m = mk()
    sa, sb = BatchState(batch_id="A"), BatchState(batch_id="B")
    oa, ob = Outputs(), Outputs()
    oa.extend(m.on_control(sa, started("A"), 0))
    ob.extend(m.on_control(sb, started("B"), 0))
    for i in range(15):
        oa.extend(m.on_data(sa, *record(i), 10))
        ob.extend(m.on_data(sb, *record(i), 10))
    oa.extend(m.on_control(sa, send_completed("A", 15), 20))
    ob.extend(m.on_control(sb, send_completed("B", 15), 20))
    oa.extend(m.end_of_input(sa))
    ob.extend(m.end_of_input(sb))
    assert len(outs(oa, "out")) == 15 and len(outs(ob, "out")) == 15
    assert sa.status == COMPLETED and sb.status == COMPLETED


def test_terminate_stops_forwarding():
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(10)]
    ev.append(("c", {"id": "batch-42", "status": TERMINATED}, 100))
    ev += [("d", i, 200 + i) for i in range(10, 15)]
    st, o = run(ev)
    assert len(outs(o, "out")) == 10  # only pre-terminate records
    assert not outs(o, "invalid")
    assert st.status == TERMINATED and statuses(o) == []  # job emits nothing


def test_unknown_batch_routes_invalid():
    st, o = run([("d", i, 10 + i) for i in range(15)])
    inv = outs(o, "invalid")
    assert len(inv) == 15 and not outs(o, "out")
    assert json.loads(inv[0].value) == {"failure": UNKNOWN_BATCH_FAILURE}
    assert inv[0].headers == HDRS  # original headers kept
    assert st.processed == 0  # counters untouched


def test_lookup_fallback_resolves_unknown():
    lookup = lambda bid: started(bid) if bid == "batch-42" else None
    st, o = run([("d", 0, 10)], machine=mk(lookup=lookup))
    assert len(outs(o, "out")) == 1 and not outs(o, "invalid")
    assert st.known and st.processed == 1


def test_overcount_at_send_completed_fails():
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(15)]
    ev.append(("c", send_completed(expected=5), 100))
    st, o = run(ev)
    assert st.status == FAILED and statuses(o) == [FAILED]
    assert len(outs(o, "out")) == 15  # overage still routed


def test_overcount_within_delay_window_fails():
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(15)]
    ev.append(("c", send_completed(expected=15), 100))
    ev += [("d", i, 100 + DELAY - 10) for i in range(15, 17)]  # inside window
    st, o = run(ev)
    assert st.status == FAILED and statuses(o) == [FAILED]
    assert len(outs(o, "out")) == 17  # all 17 reach .out (spec.rb:349-353)


def test_late_records_after_completed_go_invalid():
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(15)]
    ev.append(("c", send_completed(expected=15), 100))
    ev += [("d", i, 100 + DELAY + 1000) for i in range(15, 30)]  # after delay
    st, o = run(ev)
    assert st.status == COMPLETED  # stays completed (spec.rb:399-401)
    assert statuses(o) == [COMPLETED]
    assert len(outs(o, "out")) == 15 and len(outs(o, "invalid")) == 15


def test_count_catchup_after_send_completed_completes():
    """sendCompleted may be observed BEFORE the last records (no cross-topic
    ordering): the timer must arm when the count catches up."""
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(10)]
    ev.append(("c", send_completed(expected=15), 50))  # count not yet matched
    ev += [("d", i, 100 + i) for i in range(10, 15)]  # catch-up
    st, o = run(ev)
    assert st.status == COMPLETED and statuses(o) == [COMPLETED]
    assert len(outs(o, "out")) == 15
    assert o.notifications[0]["recordCount"] == 15


def test_count_catchup_then_overage_fails():
    ev = [("c", started(), 0)] + [("d", i, 10 + i) for i in range(10)]
    ev.append(("c", send_completed(expected=15), 50))
    ev += [("d", i, 100 + i) for i in range(10, 17)]  # catches up then +2
    st, o = run(ev)
    assert st.status == FAILED and statuses(o) == [FAILED]
    assert len(outs(o, "out")) == 17  # still all routed


def test_zero_record_batch_emits_nothing():
    st, o = run([("c", started(), 0), ("c", send_completed(expected=1), 10)])
    assert statuses(o) == [] and not o.routed
    assert st.status == SEND_COMPLETED  # never completes


def test_invalid_threshold_fails_batch():
    rejecting = lambda k, v, h: (False, "bad record")
    m = mk(BatchStateMachine(DELAY, validator=rejecting))
    st = BatchState(batch_id="batch-42")
    o = Outputs()
    o.extend(m.on_control(st, started(invalidThreshold=2), 0))
    for i in range(4):
        o.extend(m.on_data(st, *record(i), 10 + i))
    assert st.status == FAILED and FAILED in statuses(o)
    inv = outs(o, "invalid")
    assert len(inv) == 4  # routing decoupled from lifecycle
    assert json.loads(inv[0].value) == {"failure": "bad record"}


def test_metadata_round_trips_in_notification():
    st, o = run(
        [("c", started(), 0), ("d", 0, 10), ("c", send_completed(expected=1), 20)]
    )
    n = o.notifications[0]
    assert json.loads(n["metadata"]) == {"test": "ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ"}


@pytest.mark.parametrize("terminal_first", [COMPLETED, FAILED])
def test_terminal_status_not_regressed_by_started(terminal_first):
    m = mk()
    st = BatchState(batch_id="b", known=True, status=terminal_first)
    o = Outputs()
    o.extend(m.on_control(st, started("b"), 0))
    assert st.status == terminal_first
